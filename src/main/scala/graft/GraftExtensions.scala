package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.Expressions._

/** SparkSessionExtensions installer: exposes the engine's custom Catalyst
  * expressions to the SQL-text entry point (same registry the DataFrame
  * wrappers in [[graft.functions.Expressions]] use), so
  * `spark.sql("SELECT graft_cosine_sim(a, b) ...")` plans the identical
  * codegen'd expression as the DSL path.
  *
  * Deployment path: `spark.sql.extensions=graft.GraftExtensions` (set by
  * [[Graft.session]]; any spark-submit can set the same conf).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // accepts any FOLDABLE integer expression (64, 2*32, ...), not just bare
  // Literals — function resolution runs before constant folding, so a
  // Literal-only match would reject constant arithmetic users may write
  private def constLong(e: Expression, fn: String, pos: Int): Long = {
    val v =
      if (e.foldable)
        try e.eval() catch { case _: Exception => null }
      else null
    v match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long    => l.longValue
      case s: java.lang.Short   => s.longValue
      case b: java.lang.Byte    => b.longValue
      case _ => throw new IllegalArgumentException(
        s"$fn: argument $pos must be a constant integer expression, got $e")
    }
  }

  private def intArg(e: Expression, fn: String, pos: Int): Int =
    constLong(e, fn, pos).toInt

  private def longArg(e: Expression, fn: String, pos: Int): Long =
    constLong(e, fn, pos)

  // a usable arity error beats the planner's IndexOutOfBoundsException
  private def arity(fn: String, args: Seq[Expression], min: Int,
                    max: Int): Unit =
    if (args.length < min || args.length > max)
      throw new IllegalArgumentException(
        s"$fn expects ${if (min == max) s"$min" else s"$min to $max"} " +
        s"argument${if (max == 1) "" else "s"}, got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // edit-distance comparisons plan through the banded threshold DP +
    // length prefilter (see the rule's scaladoc for the rewrite)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBoundRewrite)

    // stats-driven join ORDER, then broadcast decisions, from
    // registered ANALYZE manifests (no-ops while the stats registry is
    // empty). Order matters: reordering matches only hint-free joins,
    // so it must see the chain before the broadcast rule stamps hints
    // within the same fixed-point iteration.
    ext.injectOptimizerRule(_ => graft.plans.StatsJoinOrderRule)
    ext.injectOptimizerRule(_ => graft.plans.StatsBroadcastRule)

    // manifest-backed zone-map FILE SKIPPING on unmodified scans (no-op
    // while the zone registry is empty)
    ext.injectOptimizerRule(_ => graft.plans.ZoneSkipRule)

    // whole-operator extension: the native as-of join plan node
    // (graft.plans.AsOfJoinPlan) plans through its merge-scan exec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)

    def register(name: String, usage: String,
                 builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Expressions", name, usage),
        builder))

    register("graft_cosine_sim",
      "graft_cosine_sim(a, b) - cosine similarity of two float arrays",
      args => { arity("graft_cosine_sim", args, 2, 2)
        CosineSim(args(0), args(1)) })

    register("graft_word_shingles",
      "graft_word_shingles(text, n) - distinct lowercased word n-grams",
      args => { arity("graft_word_shingles", args, 2, 2)
        WordShingles(args(0), intArg(args(1), "graft_word_shingles", 2)) })

    register("graft_word_windows",
      "graft_word_windows(text, n) - positional word n-gram windows " +
        "(in order, with multiplicity)",
      args => { arity("graft_word_windows", args, 2, 2)
        WordWindows(args(0), intArg(args(1), "graft_word_windows", 2)) })

    register("graft_simhash64",
      "graft_simhash64(tokens) - 64-bit SimHash of a token array",
      args => { arity("graft_simhash64", args, 1, 1); SimHash64(args(0)) })

    register("graft_minhash_sig",
      "graft_minhash_sig(tokens, k[, seed]) - k-element MinHash signature",
      args => { arity("graft_minhash_sig", args, 2, 3)
        MinHashSig(args(0), intArg(args(1), "graft_minhash_sig", 2),
          if (args.length > 2) longArg(args(2), "graft_minhash_sig", 3)
          else 42L) })

    register("graft_minhash_band_keys",
      "graft_minhash_band_keys(shingles, bands, rows[, seed]) - LSH band bucket keys",
      args => { arity("graft_minhash_band_keys", args, 3, 4)
        MinHashBandKeys(args(0),
          intArg(args(1), "graft_minhash_band_keys", 2),
          intArg(args(2), "graft_minhash_band_keys", 3),
          if (args.length > 3) longArg(args(3), "graft_minhash_band_keys", 4)
          else 42L) })

    register("graft_rolling_hash",
      "graft_rolling_hash(s) - Karp-Rabin polynomial fingerprint of a string",
      args => { arity("graft_rolling_hash", args, 1, 1); RollingHash(args(0)) })

    register("graft_top_gram_frac",
      "graft_top_gram_frac(words, n) - fraction of n-grams taken by the most frequent one",
      args => { arity("graft_top_gram_frac", args, 2, 2)
        TopGramFrac(args(0), intArg(args(1), "graft_top_gram_frac", 2)) })

    register("graft_hyperplane_sigs",
      "graft_hyperplane_sigs(vec, dim, bits, tables[, seed]) - packed LSH signatures, one per table",
      args => { arity("graft_hyperplane_sigs", args, 4, 5)
        HyperplaneSigs(args(0),
          intArg(args(1), "graft_hyperplane_sigs", 2),
          intArg(args(2), "graft_hyperplane_sigs", 3),
          intArg(args(3), "graft_hyperplane_sigs", 4),
          if (args.length > 4) longArg(args(4), "graft_hyperplane_sigs", 5)
          else 42L) })

    register("graft_quantize_int8",
      "graft_quantize_int8(vec) - struct(scale, q, max_abs_err) symmetric int8 quantization",
      args => { arity("graft_quantize_int8", args, 1, 1); QuantizeInt8(args(0)) })

    register("graft_sentences",
      "graft_sentences(text) - generator: one (sent_idx, sentence) row per sentence",
      args => { arity("graft_sentences", args, 1, 1); SentenceSplit(args(0)) })

    register("graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]",
      args => { arity("graft_jaro_winkler", args, 2, 2)
        JaroWinkler(args(0), args(1)) })

    register("graft_unaccent",
      "graft_unaccent(s) - strip diacritics via NFD + combining-mark removal",
      args => { arity("graft_unaccent", args, 1, 1); Unaccent(args(0)) })
  }
}
