package graft

import org.apache.spark.sql.functions._

/** Dev tool: builds a K×-scale BENCH fixture from an existing testdata
  * scale factor by unioning K key-shifted copies of each fact table
  * (dims `region`/`nation` stay single — copies share them, exactly how a
  * larger TPC-H SF shares its dims). Keys are shifted by a 10M stride per
  * copy so join cardinalities scale linearly and no cross-copy key ever
  * collides; all other columns (including payloads and timestamps) are
  * byte-identical to the source, so query semantics are unchanged.
  *
  * BENCH-ONLY data (written under the repo, gitignored): correctness runs
  * stay on the driver's immutable /root/testdata fixtures.
  *
  * Usage: runMain graft.MakeBenchData [srcDir] [outDir] [K]
  */
object MakeBenchData {
  val shiftedKeys: Map[String, Seq[String]] = Map(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/root/repo/benchdata/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val stride = 10000000L
    val spark = Graft.session(appName = "make-bench-data")
    for ((table, keys) <- shiftedKeys) {
      val df = spark.read.parquet(s"$src/$table.parquet")
      // cross-copy keys collide if a source key reaches the stride (e.g.
      // running the tool on an already-scaled dir) — fail loudly; one
      // aggregate pass for all key columns, null max (empty table) passes
      if (keys.nonEmpty) {
        val aggs = keys.map(c => max(col(c).cast("long")).as(c))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        for ((c, i) <- keys.zipWithIndex if !r.isNullAt(i)) {
          require(r.getLong(i) < stride,
            s"MakeBenchData: $table.$c max ${r.getLong(i)} >= stride " +
            s"$stride — source keys would collide across copies")
          // the LAST copy's shifted keys must still fit the source dtype —
          // an int32 key silently wraps under non-ANSI casts once
          // max + (k-1)*stride exceeds Int.MaxValue
          val dtypeMax: Long = df.schema(c).dataType match {
            case org.apache.spark.sql.types.IntegerType => Int.MaxValue.toLong
            case org.apache.spark.sql.types.ShortType => Short.MaxValue.toLong
            case _ => Long.MaxValue
          }
          val shiftedMax = r.getLong(i) + (k - 1).toLong * stride
          require(shiftedMax <= dtypeMax && shiftedMax >= r.getLong(i),
            s"MakeBenchData: $table.$c shifted max $shiftedMax overflows " +
            s"the source dtype (${df.schema(c).dataType.simpleString}) — " +
            "reduce K or widen the key column")
        }
      }
      val scaled =
        if (keys.isEmpty) df
        else (0 until k).map { i =>
          keys.foldLeft(df) { (d, c) =>
            // preserve the source dtype — key arithmetic must not widen
            // int32 keys to long and silently change the fixture schema
            d.withColumn(c,
              (col(c) + lit(i * stride)).cast(df.schema(c).dataType))
          }
        }.reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[bench-data] $table: ${spark.read.parquet(s"$out/$table.parquet").count()} rows")
    }
    spark.stop()
  }
}
