package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-4 part 29: variant extraction null path and the collated
  * group-by actually merging case variants (real-data values pinned by
  * the q145/q149 oracles).
  */
class Queries36Spec extends SparkSpec {
  import spark.implicits._

  private def evDir(rows: Seq[(Long, String, String)]): String = {
    val df = rows.map { case (id, t, p) =>
      (id, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L, t, 1.0, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = Files.createTempDirectory("graft-q36").toString
    df.write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q145 variant: typed extraction, missing path counts zero") {
    val dir = evDir(Seq(
      (1L, "click", """{"k": 7}"""),
      (2L, "click", """{"k": 5}""")))
    val r = Queries36.sparkQueries("q145_variant")(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_k") === 2L)
    assert(row.getAs[Long]("sum_k") === 12L)
    assert(row.getAs[Long]("n_missing") === 0L)
  }

  test("q149 collation: UPPER and lower variants land in one group") {
    // ids 1,3 uppercase 'CLICK'; id 2 stays 'click' -> one merged group
    val dir = evDir(Seq(
      (1L, "click", "{}"), (2L, "click", "{}"), (3L, "click", "{}")))
    val r = Queries36.sparkQueries("q149_collation")(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("event_type") === "click")
    assert(r.head.getAs[Long]("n") === 3L)
    assert(r.head.getAs[Long]("n_click_ci") === 3L)
  }
}
