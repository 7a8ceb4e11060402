package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinOpt

/** Round-8 part-21 queries: the join-size sketch kept LIVE as
  * streaming state (the planner stat a long-running ingest maintains
  * continuously), and exact-integer degree assortativity over the
  * co-supply graph (the graph-shape diagnostic that predicts whether
  * degree-keyed skew handling is needed before running the heavy
  * g-family operators). Oracle-parity conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries78 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // q207's estimate with the EVENTS side maintained as Complete-mode
    // streaming state: the CM counter table is a sum aggregate (≤4×1024
    // rows forever), so the streamed table equals the batch table
    // bit-for-bit and the whole query is declared against q207's
    // IDENTICAL oracle — a continuously-fresh join-size stat over an
    // unbounded event stream, for the price of a 4096-row state store.
    "e38_stream_join_size" -> ((s, d) => {
      val work = Scratch.fresh("e38", d)
      val evCounters = graft.streaming.Streams.streamedComplete(
        s, s"$d/events.parquet", work,
        s"graft_e38_sink_${System.nanoTime}",
        df => JoinOpt.cmCounters(df, col("user_id").cast("string"), "ca"))
      val dots = evCounters
        .join(broadcast(JoinOpt.cmCounters(
          Tables.orders(s, d), col("o_custkey").cast("string"), "cb")),
          Seq("j", "b"))
        .groupBy(col("j")).agg(sum(col("ca") * col("cb")).as("dot"))
      val est = dots.agg(min(col("dot")).as("cm_est"))
      val exact = Tables.events(s, d).select(col("user_id").as("k"))
        .join(Tables.orders(s, d).select(col("o_custkey").as("k")),
              Seq("k"))
        .agg(count(lit(1)).as("exact_size"))
      est.crossJoin(broadcast(exact))
        .select(col("cm_est"), col("exact_size"),
          (col("cm_est") - col("exact_size")).as("overcount"))
    }),

    // degree assortativity of the (undirected, deduped) part↔supplier
    // co-supply graph — g01's graph — as EXACT integers: with the edge
    // list symmetrized, source- and dest-degree distributions are
    // identical, so Pearson r needs NO square root:
    // r = (m·Σxy − Σx·Σy) / (m·Σxx − Σx²) exactly. Moments ride as
    // DECIMAL(38,0) (m·Σxy ~ 10^20 at sf1 overflows BIGINT), the ratio
    // lands as sign-aware truncating ppm (JVM div truncates toward
    // zero; DuckDB replays with abs + CASE sign so '//' flooring can't
    // skew a negative r). Negative r here = high-degree parts pair
    // with low-degree suppliers — the skew signature that says salt
    // before joining.
    "g14_assortativity" -> ((s, d) => {
      val e0 = Tables.lineitem(s, d).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint() // feeds degrees AND the moment join
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val m = edges
        .join(deg.select(col("node").as("src"), col("deg").as("dx")),
              Seq("src"))
        .join(deg.select(col("node").as("dst"), col("deg").as("dy")),
              Seq("dst"))
        .agg(count(lit(1)).as("m"),
          sum(col("dx")).as("sx"),
          expr("SUM(CAST(dx AS DECIMAL(38,0)) * dx)").as("sxx"),
          expr("SUM(CAST(dx AS DECIMAL(38,0)) * dy)").as("sxy"))
      // moments fit BIGINT (≤ ~10^15 at sf1) — only the m·Σxy
      // intermediates need 128-bit headroom, kept in DECIMAL(38,0)
      m.select(col("m"), col("sx").cast("long").as("sx"),
          expr("CAST(sxx AS BIGINT)").as("sxx"),
          expr("CAST(sxy AS BIGINT)").as("sxy"),
          expr("""CAST(
            CASE WHEN m * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0 THEN 0
                 ELSE (CASE WHEN m * sxy - CAST(sx AS DECIMAL(38,0)) * sx
                            < 0 THEN -1 ELSE 1 END) *
                   (abs(m * sxy - CAST(sx AS DECIMAL(38,0)) * sx)
                     * 1000000
                    div (m * sxx - CAST(sx AS DECIMAL(38,0)) * sx))
            END AS BIGINT)""").as("assort_ppm"))
    }))

  val oracleSql: Map[String, String] = Map(
    // the streamed counter table must equal the batch table exactly —
    // q207's oracle, verbatim
    "e38_stream_join_size" -> Queries77.oracleSql("q207_join_size_cm"),

    // same symmetrized distinct edges, same degree join, same
    // HUGEINT moments, same sign-aware truncating ppm
    "g14_assortativity" ->
      """WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS src,
        |      l_suppkey * 2 + 1 AS dst FROM lineitem),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM e0
        |  UNION ALL SELECT dst, src FROM e0),
        |deg AS MATERIALIZED (
        |  SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
        |mom AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m,
        |    CAST(SUM(a.deg) AS HUGEINT) AS sx,
        |    SUM(CAST(a.deg AS HUGEINT) * a.deg) AS sxx,
        |    SUM(CAST(a.deg AS HUGEINT) * b.deg) AS sxy
        |  FROM edges e
        |  JOIN deg a ON a.node = e.src
        |  JOIN deg b ON b.node = e.dst)
        |SELECT CAST(m AS BIGINT) AS m, CAST(sx AS BIGINT) AS sx,
        |  CAST(sxx AS BIGINT) AS sxx,
        |  CAST(sxy AS BIGINT) AS sxy,
        |  CAST(CASE WHEN m * sxx - sx * sx = 0 THEN 0
        |       ELSE (CASE WHEN m * sxy - sx * sx < 0
        |                  THEN -1 ELSE 1 END) *
        |         (abs(m * sxy - sx * sx) * 1000000 //
        |          (m * sxx - sx * sx))
        |  END AS BIGINT) AS assort_ppm
        |FROM mom""".stripMargin)
}
