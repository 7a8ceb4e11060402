package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Round-8 part-10 queries: the Gramian kept LIVE as streaming state
  * (the covariance feed a continuously-retrained PCA/whitening stage
  * reads), and an order-free table fingerprint (the one-pass
  * cross-engine equality check a 100-TB migration signs off with).
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries70 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // REAL streamed Gramian maintenance: s20's exact-integer cells as
    // Complete-mode streaming aggregation state (≤ d(d+1)/2 rows
    // however long the stream runs). Integer SUM commutes with
    // batching, so the post-stream table must equal the batch Gramian
    // bit-for-bit — it is declared against s20's IDENTICAL oracle,
    // which is the whole proof.
    "e35_stream_gram" -> ((s, d) => {
      val work = Scratch.fresh("e35", d)
      graft.streaming.Streams.streamedGramCells(
          s, s"$d/embeddings.parquet", work,
          s"graft_e35_sink_${System.nanoTime}")
        .orderBy(col("i"), col("j"))
    }),

    // order-free table fingerprints: per row, one FNV-1a64 over a
    // canonical '|'-joined rendering (exact integer cents for money,
    // explicit date formatting — no float ever reaches the hash); per
    // table, the row count and the hash SUM mod 10¹⁸. Sum-of-hashes
    // commutes, so ANY engine that scans the table in ANY order must
    // reproduce it — the cheap migration/replication audit at 100 TB
    // (one scan, two-cell aggregate, no shuffle of data rows).
    "q203_table_fingerprint" -> ((s, d) => {
      def fp(df: DataFrame, name: String, keyExpr: String): DataFrame = df
        .select(Expressions.fnv_hash(expr(keyExpr)).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("CAST(SUM(CAST(h AS DECIMAL(38,0))) % " +
               "1000000000000000000 AS BIGINT)").as("hash_mod"))
        .select(lit(name).as("tbl"), col("n_rows"), col("hash_mod"))
      val o = fp(Tables.orders(s, d), "orders",
        "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
          "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), " +
          "date_format(o_orderdate, 'yyyy-MM-dd'))")
      val l = fp(Tables.lineitem(s, d), "lineitem",
        "concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
          "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT), " +
          "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT), " +
          "l_returnflag, l_linestatus, " +
          "date_format(l_shipdate, 'yyyy-MM-dd'))")
      l.unionByName(o).orderBy(col("tbl"))
    }))

  val oracleSql: Map[String, String] = Map(
    // the streamed Gramian must equal the BATCH Gramian exactly —
    // same oracle as s20, verbatim
    "e35_stream_gram" -> Queries69.oracleSql("s20_gram_matrix"),

    // identical canonical rendering, FNV replay (FnvSql yields the
    // UNSIGNED 64-bit value — re-wrap to the engine's signed two's
    // complement before summing), commutative hash sum
    "q203_table_fingerprint" ->
      s"""WITH lk AS (SELECT concat_ws('|', l_orderkey, l_linenumber,
         |      l_partkey, l_suppkey,
         |      CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT),
         |      CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
         |        AS BIGINT),
         |      l_returnflag, l_linestatus,
         |      strftime(l_shipdate, '%Y-%m-%d')) AS t FROM lineitem),
         |lh AS (SELECT ${ExtensionQueries.FnvSql("t")} AS hu FROM lk),
         |ls AS (SELECT CASE WHEN hu >= 9223372036854775808::HUGEINT
         |         THEN hu - 18446744073709551616::HUGEINT ELSE hu END
         |         AS h FROM lh),
         |ok AS (SELECT concat_ws('|', o_orderkey, o_custkey,
         |      o_orderstatus,
         |      CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT),
         |      strftime(o_orderdate, '%Y-%m-%d')) AS t FROM orders),
         |oh AS (SELECT ${ExtensionQueries.FnvSql("t")} AS hu FROM ok),
         |os AS (SELECT CASE WHEN hu >= 9223372036854775808::HUGEINT
         |         THEN hu - 18446744073709551616::HUGEINT ELSE hu END
         |         AS h FROM oh)
         |SELECT 'lineitem' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(h) % 1000000000000000000 AS BIGINT)
         |    AS hash_mod FROM ls
         |UNION ALL
         |SELECT 'orders', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(h) % 1000000000000000000 AS BIGINT) FROM os
         |ORDER BY tbl""".stripMargin)
}
