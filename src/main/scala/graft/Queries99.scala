package graft

import org.apache.spark.sql.functions._

/** Round-13 queries: closing the last global-window candidate path in
  * the entity-resolution family (VERDICT r12 task 3).
  *
  * d33 — d20's Jaro-Winkler sorted-neighborhood pairing through the
  * d23 scale path: candidate (row, next-row) pairs under the
  * (sort-key, id) total order come from an equi-join on the
  * range-partitioned global rank
  * ([[operators.Entity.jaroNeighborPairsScalable]]) instead of a
  * whole-corpus `lead()` window — LOSSLESS (rank j pairs with ranks
  * j+1..j+window, exactly what lead() emits under the same order), so
  * it hash-matches d20's own DuckDB oracle, while no stage anywhere
  * funnels through one task (PlanAuditSpec pins the plan).
  *
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries99 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    "d33_jaro_neighbors_scale" -> ((s, d) =>
      operators.Entity.jaroNeighborPairsScalable(
          Tables.documents(s, d), "text", "doc_id",
          window = 2, minSim = 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    // q246 — DELETION VECTORS (merge-on-read DELETE, the Delta DV /
    // Iceberg v2 position-delete shape): `deleteWhereVectors`
    // tombstones matching rows as (file, row-position) metadata — the
    // query PINS that not one data file changed (the 100 TB point:
    // a selective delete costs O(tombstones), not O(buckets)) — then a
    // batch upsert recomputed from the LIVE state lands on top: the
    // rewritten buckets purge their tombstones physically, untouched
    // buckets stay masked by the carried set, and no deleted row
    // resurrects. The oracle replays delete + bump from first
    // principles on the events table.
    "q246_sink_delete_vectors" -> ((s, d) => {
      val (base, v0) = Queries98.seedSnapshotSink(
        s, d, "q246_sink", 4, _ => None)
      val filesBefore = sources.Loader.readSnapshot(s, v0).inputFiles
        .filterNot(_.contains("/_dv/")).toSet
      val (v1, deleted) = sources.Loader.deleteWhereVectors(s, base,
          col("cents") % 3 === 0)
        .getOrElse(sys.error("q246: nothing matched the tombstone"))
      val filesAfter = sources.Loader.readSnapshot(s, v1).inputFiles
        .filterNot(_.contains("/_dv/")).toSet
      require(filesAfter == filesBefore,
        "q246: merge-on-read DELETE rewrote data files")
      // the upsert recomputes from the LIVE (tombstone-filtered) state
      val bump = sources.Loader.readSnapshot(s, v1)
        .filter(col("user_id") % 5 === 0)
        .select(col("user_id"), (col("cents") + 7L).as("cents"))
      val v2 = sources.Loader.upsertBatch(s, base, bump,
        key = "user_id", orderCols = Seq("user_id"))
      val after = sources.Loader.readSnapshot(s, v2)
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      cust.join(after, col("c_custkey") === col("user_id"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_users"),
             sum(col("cents")).as("cents_sum"))
        .withColumn("n_tombstoned", lit(deleted))
        .withColumn("files_unchanged", lit(1L))
        .orderBy(col("c_mktsegment"))
    }),

    // q247 — MERGE INTO: the general conditional write verb (of which
    // upsert is the unconditional special case) in one transaction:
    // matched rows whose TARGET cents divide by 5 are DELETED, the
    // remaining matched rows UPDATE to the source value, and brand-new
    // keys INSERT — SQL clause order, three-valued logic, copy-on-write
    // on exactly the source keys' buckets. The oracle replays all
    // three clauses from first principles on the events table; the
    // negative insert keys prove unmatched-source routing without
    // colliding with any seeded user.
    "q247_sink_merge" -> ((s, d) => {
      val (base, v0) = Queries98.seedSnapshotSink(
        s, d, "q247_sink", 4, _ => None)
      val snap0 = sources.Loader.readSnapshot(s, v0)
      val source = snap0.filter(col("user_id") % 3 === 0)
          .select(col("user_id"), (col("cents") + 50L).as("cents"))
        .unionByName(snap0.filter(col("user_id") % 11 === 0)
          .select((-col("user_id") - 1L).as("user_id"),
                  (col("cents") + 7L).as("cents")))
      val ndir = sources.Loader.mergeInto(s, base, source, "user_id",
        deleteWhen = Some(col("t_cents") % 5 === 0))
      sources.Loader.readSnapshot(s, ndir)
        .groupBy((col("user_id") % 4).cast("long").as("grp"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
        .orderBy(col("grp"))
    }),

    // q248 — metadata-only DROP COLUMN: a score column evolves IN via
    // one upsert era, drops OUT via a manifest-schema-only commit (not
    // one data file rewritten — pinned), stays dropped through the
    // next upsert (the mergeSchema-resurrection regression the
    // recorded-schema prior read prevents), while the pre-drop era
    // still shows it under time travel. The column never influences
    // cents, so the oracle replays the final state as if it never
    // existed — which is exactly the drop contract.
    "q248_sink_drop_column" -> ((s, d) => {
      val (base, v0) = Queries98.seedSnapshotSink(
        s, d, "q248_sink", 4, _ => None)
      val snap0 = sources.Loader.readSnapshot(s, v0)
      sources.Loader.upsertBatch(s, base,
        snap0.filter(col("user_id") % 3 === 0)
          .select(col("user_id"), col("cents"),
                  (col("cents") % 97L).as("score")),
        key = "user_id", orderCols = Seq("user_id"))
      def latestDir = s"$base/v${sources.Loader
        .snapshotVersions(s, base).map(_._1).max}"
      val vScore = latestDir
      val filesBefore = sources.Loader.readSnapshot(s, vScore)
        .inputFiles.toSet
      sources.Loader.dropColumn(s, base, "score", key = "user_id")
      val droppedView = sources.Loader.readSnapshot(s, latestDir)
      require(droppedView.inputFiles.toSet == filesBefore,
        "q248: the metadata-only drop rewrote data files")
      sources.Loader.upsertBatch(s, base,
        droppedView.filter(col("user_id") % 5 === 0)
          .select(col("user_id"), (col("cents") + 7L).as("cents")),
        key = "user_id", orderCols = Seq("user_id"))
      val after = sources.Loader.readSnapshot(s, latestDir)
      val scoreNow = if (after.columns.contains("score")) 1L else 0L
      val scoreEra2 = if (sources.Loader.readSnapshot(s, vScore)
        .columns.contains("score")) 1L else 0L
      after
        .groupBy((col("user_id") % 4).cast("long").as("grp"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
        .withColumn("score_now", lit(scoreNow))
        .withColumn("score_era2", lit(scoreEra2))
        .orderBy(col("grp"))
    }),

    // q249 — bucket-count evolution: the 4-bucket layout migrates to 7
    // FNV buckets in one OCC commit (the honest full-shuffle rewrite —
    // no metadata trick re-homes keys across a different modulus), a
    // batch write lands against the NEW modulus, and the oracle
    // replays the new version's bucket-dir count from the FNV bucket
    // assignment itself.
    "q249_sink_rebucket" -> ((s, d) => {
      val (base, v0) = Queries98.seedSnapshotSink(
        s, d, "q249_sink", 4, _ => None)
      val vNew = sources.Loader.rebucket(s, base, newBuckets = 7,
        key = "user_id")
      val nDirs = new java.io.File(vNew).listFiles()
        .count(_.getName.startsWith("graft_bucket=")).toLong
      sources.Loader.upsertBatch(s, base,
        sources.Loader.readSnapshot(s, vNew)
          .filter(col("user_id") % 5 === 0)
          .select(col("user_id"), (col("cents") + 7L).as("cents")),
        key = "user_id", orderCols = Seq("user_id"))
      val latest = s"$base/v${sources.Loader
        .snapshotVersions(s, base).map(_._1).max}"
      sources.Loader.readSnapshot(s, latest)
        .groupBy((col("user_id") % 4).cast("long").as("grp"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
        .withColumn("n_bucket_dirs", lit(nDirs))
        .orderBy(col("grp"))
    }),

    // q250 — CHANGE DATA FEED: three commits (conditional upsert with
    // an insert; a deletion-vector delete; a copy-on-write delete) and
    // then `tableChanges(0, 3)` replays them as typed events — one
    // row per insert/delete, update rows as pre+post image pairs, each
    // stamped with its commit version. The oracle reconstructs every
    // step's state from first principles and re-derives the event
    // multiset, so the feed is proven equal to "what actually changed"
    // rather than merely plausible. Derivation is read-side O(churn):
    // only the buckets whose manifest pointer moved at a step (plus
    // the step's new tombstones) are read.
    "q250_sink_changes" -> ((s, d) => {
      val ss = s
      import ss.implicits._
      val (base, v0) = Queries98.seedSnapshotSink(
        s, d, "q250_sink", 4, _ => None)
      val snap0 = sources.Loader.readSnapshot(s, v0)
      sources.Loader.upsertBatch(s, base,
        snap0.filter(col("user_id") % 5 === 0)
          .select(col("user_id"), (col("cents") + 7L).as("cents"))
          .unionByName(Seq((-1L, 4200L)).toDF("user_id", "cents")),
        key = "user_id", orderCols = Seq("user_id"))
      sources.Loader.deleteWhereVectors(s, base, col("cents") % 7 === 0)
        .getOrElse(sys.error("q250: the tombstone matched nothing"))
      sources.Loader.deleteWhere(s, base, col("user_id") % 9 === 0)
        .getOrElse(sys.error("q250: the CoW delete matched nothing"))
      sources.Loader.tableChanges(s, base, "user_id", 0L, 3L)
        .groupBy(col("_commit_version"), col("_change_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
        .orderBy(col("_commit_version"), col("_change_type"))
    }),

    // q251 — OPTIMIZE ZORDER BY, end-to-end: the sink lays each rolled
    // file out along the Morton interleave of (user_id, cents)
    // (`Maintain.zorderBy` — q205 measured WHY: a concatenated sort
    // answers one dimension and touches every file for the other), so
    // per-file zone maps are tight little bounding boxes and a 2-D
    // RANGE probe prunes files on BOTH columns. The query PINS the
    // pruning (kept ≤ half the files) and the oracle replays the box
    // aggregate; box bounds derive from min/max by floor-division
    // arithmetic both engines share.
    "q251_sink_zorder_skip" -> ((s, d) => {
      val (_, v0) = Queries98.seedSnapshotSink(
        s, d, "q251_sink", 1, nUsers => {
          val m = (nUsers + Queries95.TargetFiles - 1) /
            Queries95.TargetFiles
          Some(sources.Loader.Maintain(
            zoneCols = Seq("user_id", "cents"),
            maxRecordsPerFile = Some(m),
            zorderBy = Some(("user_id", "cents"))))
        })
      val snap = sources.Loader.readSnapshot(s, v0)
      val total = snap.inputFiles.count(!_.contains("/_dv/"))
      require(total > 4, s"q251: unfragmented fixture ($total files)")
      val b = snap.agg(
        min(col("user_id")).as("mnu"), max(col("user_id")).as("mxu"),
        min(col("cents")).as("mnc"), max(col("cents")).as("mxc"))
        .head()
      val (mnu, mxu, mnc, mxc) =
        (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      // the middle-quarter box on both dimensions (floorDiv == the
      // oracle's // — sign-safe)
      val (loU, hiU) = (Math.floorDiv(3 * mnu + mxu, 4L),
                        Math.floorDiv(mnu + mxu, 2L))
      val (loC, hiC) = (Math.floorDiv(3 * mnc + mxc, 4L),
                        Math.floorDiv(mnc + mxc, 2L))
      val res = sources.Loader.readSnapshot(s, v0)
        .filter(col("user_id").between(loU, hiU) &&
                col("cents").between(loC, hiC))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
      val kept = res.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation => lr.relation }
        .collect { case h: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation => h.location.inputFiles.length }
        .sum
      require(kept * 2 <= total,
        s"q251: the Z-ordered layout kept $kept of $total files for " +
        "the 2-D box — zones are not pruning both dimensions")
      res.withColumn("pruned_2d", lit(1L))
    }),

    // t25's compression signal cannot be value-oracled (deflate output
    // bytes are zlib-implementation-defined — DuckDB cannot replay
    // them), but its INVARIANTS can (VERDICT r12 task 8): this
    // companion reduces the whole corpus to replayable integers plus
    // genuinely-computed violation counts the oracle asserts are zero.
    // A zlib regression (overhead past the stored-block worst case, or
    // concatenation shrinking the stream beyond slack) flips a count
    // to nonzero → hash mismatch → the gate fails. n_docs/sum_bytes
    // tie the row to the real corpus so the check cannot pass vacuously.
    "t69_compression_invariants" -> ((s, d) => {
      val sig = Tables.documents(s, d)
        .filter(octet_length(col("text")) > 0)
        .select(octet_length(col("text")).cast("long").as("n_bytes"),
          functions.Expressions.deflate_len(col("text")).as("d1"),
          functions.Expressions.deflate_len(
            concat(col("text"), col("text"))).as("d2"))
      sig.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("sum_bytes"),
        // zlib worst case: 5 bytes per ≤16383-byte stored block + 2
        // header + 4 adler; 11 covers both plus rounding
        sum(when(col("d1") > col("n_bytes") + lit(11L) +
            (col("n_bytes") / 16383L + 1L) * 5L, 1L).otherwise(0L))
          .as("n_overhead_violations"),
        // doubling the text must not SHRINK the stream (64-byte slack
        // absorbs block-boundary re-decisions near the seam)
        sum(when(col("d2") < col("d1") - 64L, 1L).otherwise(0L))
          .as("n_concat_violations"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // output-identical to the global-window form, so the scale path
    // answers to the SAME oracle — any divergence is a hash mismatch
    "d33_jaro_neighbors_scale" -> Queries39.oracleSql("d20_jaro_neighbors"),

    // delete + bump replayed from first principles on the events
    // table: snap = the seeded latest-per-key state, live = snap minus
    // the tombstoned residue class, fin = live with the %5 bump
    // (recomputed FROM live — a tombstoned %5 row must not come back)
    "q246_sink_delete_vectors" ->
      """WITH snap AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1),
        |live AS MATERIALIZED (
        |  SELECT user_id, cents FROM snap WHERE cents % 3 <> 0),
        |fin AS MATERIALIZED (
        |  SELECT user_id, cents
        |    + (CASE WHEN user_id % 5 = 0 THEN 7 ELSE 0 END) AS cents
        |  FROM live)
        |SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM snap WHERE cents % 3 = 0)
        |    AS n_tombstoned,
        |  CAST(1 AS BIGINT) AS files_unchanged
        |FROM fin JOIN customer ON c_custkey = user_id
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // the three MERGE clauses replayed: upd = the matched source rows,
    // ins = the unmatched (negative-key) ones; a matched target row
    // with cents % 5 = 0 deletes, the rest of the matched update, the
    // unmatched targets stand, the inserts append
    "q247_sink_merge" ->
      """WITH snap AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1),
        |upd AS MATERIALIZED (
        |  SELECT user_id, cents + 50 AS s_cents FROM snap
        |  WHERE user_id % 3 = 0),
        |ins AS MATERIALIZED (
        |  SELECT -user_id - 1 AS user_id, cents + 7 AS cents FROM snap
        |  WHERE user_id % 11 = 0),
        |fin AS MATERIALIZED (
        |  SELECT s.user_id,
        |    CASE WHEN u.user_id IS NOT NULL THEN u.s_cents
        |         ELSE s.cents END AS cents
        |  FROM snap s LEFT JOIN upd u USING (user_id)
        |  WHERE NOT (u.user_id IS NOT NULL AND s.cents % 5 = 0)
        |  UNION ALL SELECT user_id, cents FROM ins)
        |SELECT CAST(user_id % 4 AS BIGINT) AS grp,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    // the drop contract IS "as if the column never existed" for the
    // live view: final cents = seeded state + the %5 bump, the column
    // flags pinned (live 0, pre-drop era 1)
    "q248_sink_drop_column" ->
      """WITH snap AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1),
        |fin AS MATERIALIZED (
        |  SELECT user_id, cents
        |    + (CASE WHEN user_id % 5 = 0 THEN 7 ELSE 0 END) AS cents
        |  FROM snap)
        |SELECT CAST(user_id % 4 AS BIGINT) AS grp,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
        |  CAST(0 AS BIGINT) AS score_now,
        |  CAST(1 AS BIGINT) AS score_era2
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    // n_bucket_dirs replayed from the FNV bucket assignment at the new
    // modulus (the q245 device): the layout cannot fake its re-shard
    "q249_sink_rebucket" -> {
      val fnv = ExtensionQueries.FnvSql("CAST(user_id AS VARCHAR)")
      s"""WITH snap AS MATERIALIZED (
         |  SELECT user_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) = 1),
         |bk AS MATERIALIZED (
         |  SELECT ((((CASE WHEN fu >= 9223372036854775808::HUGEINT
         |       THEN fu - 18446744073709551616::HUGEINT
         |       ELSE fu END) % 7) + 7) % 7) AS b
         |  FROM (SELECT user_id, $fnv AS fu FROM snap)),
         |fin AS MATERIALIZED (
         |  SELECT user_id, cents
         |    + (CASE WHEN user_id % 5 = 0 THEN 7 ELSE 0 END) AS cents
         |  FROM snap)
         |SELECT CAST(user_id % 4 AS BIGINT) AS grp,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
         |  (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) FROM bk)
         |    AS n_bucket_dirs
         |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // each step's state reconstructed from first principles; the event
    // multiset re-derived from consecutive states (updates always fire
    // — +7 never leaves cents unchanged; the inserted -1/4200 row can
    // itself be tombstoned at step 2: 4200 % 7 = 0 — replayed the same
    // way on both sides)
    "q250_sink_changes" ->
      """WITH snap AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1),
        |upd AS MATERIALIZED (
        |  SELECT user_id, cents FROM snap WHERE user_id % 5 = 0),
        |st1 AS MATERIALIZED (
        |  SELECT user_id, cents
        |    + (CASE WHEN user_id % 5 = 0 THEN 7 ELSE 0 END) AS cents
        |  FROM snap
        |  UNION ALL SELECT CAST(-1 AS BIGINT), CAST(4200 AS BIGINT)),
        |del2 AS MATERIALIZED (
        |  SELECT user_id, cents FROM st1 WHERE cents % 7 = 0),
        |st2 AS MATERIALIZED (
        |  SELECT user_id, cents FROM st1 WHERE cents % 7 <> 0),
        |del3 AS MATERIALIZED (
        |  SELECT user_id, cents FROM st2 WHERE user_id % 9 = 0)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS _commit_version,
        |    'insert' AS _change_type, CAST(1 AS BIGINT) AS n,
        |    CAST(4200 AS BIGINT) AS cents_sum
        |  UNION ALL SELECT 1, 'update_preimage',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM upd),
        |    (SELECT CAST(SUM(cents) AS BIGINT) FROM upd)
        |  UNION ALL SELECT 1, 'update_postimage',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM upd),
        |    (SELECT CAST(SUM(cents + 7) AS BIGINT) FROM upd)
        |  UNION ALL SELECT 2, 'delete',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM del2),
        |    (SELECT CAST(SUM(cents) AS BIGINT) FROM del2)
        |  UNION ALL SELECT 3, 'delete',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM del3),
        |    (SELECT CAST(SUM(cents) AS BIGINT) FROM del3))
        |ORDER BY _commit_version, _change_type""".stripMargin,

    // the 2-D box aggregate over the latest-per-key state; the pruning
    // itself is pinned by the query's own kept*2 <= total require
    "q251_sink_zorder_skip" ->
      """WITH snap AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1),
        |b AS MATERIALIZED (
        |  SELECT MIN(user_id) AS mnu, MAX(user_id) AS mxu,
        |         MIN(cents) AS mnc, MAX(cents) AS mxc FROM snap)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
        |  CAST(1 AS BIGINT) AS pruned_2d
        |FROM snap, b
        |WHERE user_id BETWEEN (3 * mnu + mxu) // 4 AND (mnu + mxu) // 2
        |  AND cents BETWEEN (3 * mnc + mxc) // 4 AND (mnc + mxc) // 2"""
        .stripMargin,

    "t69_compression_invariants" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT)
        |    AS sum_bytes,
        |  CAST(0 AS BIGINT) AS n_overhead_violations,
        |  CAST(0 AS BIGINT) AS n_concat_violations
        |FROM documents
        |WHERE octet_length(CAST(text AS BLOB)) > 0""".stripMargin
  )
}
