package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract specs for the co-occurrence / triangle operators on known
  * graphs — closed-form counts the SF-data gate can't pin. */
class GraphOpsSpec extends SparkSpec {

  test("coOccurrencePairs: exact pair counts, cap drops oversized baskets") {
    import spark.implicits._
    // baskets: {1,2,3}, {1,2}, {2,3}, and one oversized {1..5}
    val bp = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 2L), (13L, 3L), (13L, 4L), (13L, 5L)
    ).toDF("g", "it")
    val pairs = GraphOps.coOccurrencePairs(bp, "g", "it", maxBasket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // basket 13 (size 5 > cap 4) contributes nothing
    assert(pairs == Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 2L))
    // duplicate (group, item) rows must not inflate counts
    val dup = bp.unionAll(Seq((10L, 1L)).toDF("g", "it"))
    val pairs2 = GraphOps.coOccurrencePairs(dup, "g", "it", maxBasket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs2 == pairs)
  }

  test("triangleCensus: closed forms on K5, a path, and a star") {
    import spark.implicits._
    def census(edges: Seq[(Long, Long)]): (Long, Long) = {
      val r = GraphOps.triangleCensus(edges.toDF("u", "v")).head()
      (r.getLong(0), r.getLong(1))
    }
    // K5: C(5,3)=10 triangles, wedges Σ C(4,2)=30
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assert(census(k5) == ((10L, 30L)))
    // path 1-2-3-4: no triangles, 2 wedges
    assert(census(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((0L, 2L)))
    // star around hub 1 (degree-ordering stresses the hub): 0 and C(4,2)
    assert(census(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) == ((0L, 6L)))
    // K4 plus a pendant: 4 triangles; wedges 3·C(3,2)+C(4,2)+0 = 15
    val k4p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    assert(census(k4p) == ((4L, 15L)))
  }

  test("q85/q86 on sf0.001: edges are exactly the support-2 pairs") {
    val pairs = GraphOps.q86Copurchase.fn(spark, sf("sf0.001")).cache()
    assert(pairs.filter(col("n_orders") < 2).count() == 0)
    assert(pairs.filter(col("part_a") >= col("part_b")).count() == 0)
    val Array(tri, wedges) = GraphOps.q85Triangles.fn(spark, sf("sf0.001"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    // every triangle closes exactly 3 of the counted 2-paths
    assert(tri >= 0 && wedges >= 3 * tri, s"tri=$tri wedges=$wedges")
    pairs.unpersist()
  }
}
