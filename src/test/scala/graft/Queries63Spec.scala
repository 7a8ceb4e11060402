package graft

import org.apache.spark.sql.functions._

/** Contracts for the round-7 training-pipeline primitives beyond the
  * oracle hash-match: d29's leakage guard is structural (a cluster can
  * never straddle a split), q198's shuffle is a true permutation and
  * bit-stable across runs.
  */
class Queries63Spec extends SparkSpec {
  import spark.implicits._

  test("d29: every near-dup cluster lands in exactly one split") {
    val out = SparkEntry.queries("d29_cluster_split")(spark, sf)
      .localCheckpoint()
    // structural leakage guard: split is a function of cluster
    val straddlers = out.groupBy($"cluster")
      .agg(countDistinct($"split").as("k"))
      .filter($"k" > 1).count()
    assert(straddlers == 0L)
    // every document is assigned, and all three splits exist at 500 docs
    assert(out.count() ==
      Tables.documents(spark, sf).count())
    val splits = out.select($"split").distinct().as[String].collect().toSet
    assert(splits == Set("train", "valid", "test"), splits.toString)
    // known near-dup pair (d03's corpus plants exact dups): members of a
    // multi-doc cluster share the split
    val multi = out.groupBy($"cluster").agg(count(lit(1)).as("n"),
        countDistinct($"split").as("k"))
      .filter($"n" > 1)
    assert(multi.count() > 0, "fixture should contain >=1 near-dup cluster")
    assert(multi.filter($"k" =!= 1).count() == 0L)
  }

  test("q198: epoch shuffle is a bit-stable permutation of 0..n-1") {
    val a = SparkEntry.queries("q198_global_shuffle")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = a.length
    assert(a.map(_._2).sorted.toSeq == (0L until n.toLong))
    // deterministic: a second independent run assigns identical positions
    val b = SparkEntry.queries("q198_global_shuffle")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(b.toSeq == a.toSeq)
    // and it is not the identity (the hash actually permutes)
    assert(a.exists { case (id, pos) => id != pos })
  }
}
