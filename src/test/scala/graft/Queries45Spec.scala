package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-4 part 42: label-propagation and assortativity contracts on
  * hand-built graphs with known answers.
  */
class Queries45Spec extends SparkSpec {
  import spark.implicits._

  test("LPA separates two cliques joined by a bridge") {
    // cliques {1,2,3} and {10,11,12} + bridge 3-10
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
                    (10L, 11L), (10L, 12L), (11L, 12L),
                    (3L, 10L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, "a", "b", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1) === got(2), "clique 1 must agree")
    assert(got(10) === got(12), "clique 2 must agree")
    assert(got(1) !== got(12), "bridge must not merge the cliques")
  }

  test("LPA rejects node ids >= 1e8 loudly") {
    val edges = Seq((100000000L, 1L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Graph.labelPropagation(edges, "a", "b", rounds = 1).collect()
    }
    assert(e.getMessage.contains("1e8"))
  }

  test("star graph has assortativity -1; corpus value lies in [-1, 1]") {
    // K_{1,4}: hub 1 (degree 4) joined to leaves (degree 1) — the
    // textbook maximally disassortative graph
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("p1", "p2")
    val sym = star.select($"p1".as("u"), $"p2".as("v"))
      .union(star.select($"p2".as("u"), $"p1".as("v")))
    val deg = sym.groupBy($"u").agg(count(lit(1)).as("d"))
    val pairs = sym.join(deg, Seq("u"))
      .join(deg.select($"u".as("v"), $"d".as("dv")), Seq("v"))
    val t = pairs.agg(count(lit(1)).as("m"), sum($"d").as("sx"),
        sum($"dv").as("sy"), sum($"d" * $"d").as("sxx"),
        sum($"dv" * $"dv").as("syy"), sum($"d" * $"dv").as("sxy"))
      .collect().head
    val m = t.getAs[Long]("m").toDouble
    val r = (m * t.getAs[Long]("sxy") - t.getAs[Long]("sx").toDouble * t.getAs[Long]("sy")) /
      math.sqrt((m * t.getAs[Long]("sxx") - t.getAs[Long]("sx").toDouble * t.getAs[Long]("sx")) *
                (m * t.getAs[Long]("syy") - t.getAs[Long]("sy").toDouble * t.getAs[Long]("sy")))
    assert(math.abs(r - (-1.0)) < 1e-9)

    val corpus = SparkEntry.queries("g07_assortativity")(spark, sf)
      .collect().head.getAs[Double]("assortativity")
    assert(corpus >= -1.0 && corpus <= 1.0)
  }
}
