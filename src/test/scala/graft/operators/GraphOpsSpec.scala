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

  test("khop: exact-distance counts on a known graph") {
    import spark.implicits._
    // graph (every edge needs support 2 → two size-2 baskets each):
    // 20—1, 1—2, 2—3, 20—40, 40—3. Seeds are the %20==0 nodes.
    // seed 20: h1 {1,40}; h2 nbrs(1)∪nbrs(40) = {20,2}∪{20,3} minus
    // seed/h1 → {2,3}. seed 40: h1 {20,3}; h2 {1,2}.
    val edges = Seq((20L, 1L), (1L, 2L), (2L, 3L), (20L, 40L), (40L, 3L))
    val li = edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((2L * i, u), (2L * i, v), (2L * i + 1, u), (2L * i + 1, v))
    }.toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-khop").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphOps.q101Khop.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(20L -> ((2L, 2L)), 40L -> ((2L, 2L))), out.toString)
  }

  test("khop on sf0.001 matches driver-side BFS over the same edges") {
    val d = sf("sf0.001")
    val edges = GraphOps.q86Copurchase.fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val out = GraphOps.q101Khop.fn(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val seeds = adj.keySet.filter(_ % 20 == 0)
    assert(out.keySet == seeds)
    for (s <- seeds) {
      val h1 = adj(s)
      val h2 = h1.flatMap(adj(_)) -- h1 - s
      assert(out(s) == ((h1.size.toLong, h2.size.toLong)), s"seed $s")
    }
  }

  test("item-sim: cosine values and tiebreak rank on a closed form") {
    import spark.implicits._
    // baskets {1,2}×2 and {1,3}×2: n1=4, n2=n3=2, nab=2 both pairs →
    // sim(1,2) = sim(1,3) = 2/√8 — an exact-tie rank broken by nbr
    val li = Seq(
      (0L, 1L), (0L, 2L), (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 3L), (3L, 1L), (3L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-isim").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphOps.q102ItemSim.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val s12 = 2.0 / math.sqrt(8.0)
    assert(out((1L, 2L)) == ((2L, s12, 1L)), out.toString) // tie → nbr order
    assert(out((1L, 3L)) == ((2L, s12, 2L)))
    assert(out((2L, 1L)) == ((2L, s12, 1L)))
    assert(out((3L, 1L)) == ((2L, s12, 1L)))
    assert(out.size == 4) // 2 and 3 never co-occur: no edge, no row
  }

  test("item-sim on sf0.001: top-3, symmetric sims, exact formula") {
    val d = sf("sf0.001")
    val out = GraphOps.q102ItemSim.fn(spark, d).cache()
    assert(out.filter(col("rnk") > 3 || col("rnk") < 1).count() == 0)
    assert(out.filter(col("sim") <= 0 || col("sim") > 1.0 + 1e-12)
      .count() == 0)
    // per item, rank is dense from 1 and sim is non-increasing in rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("item").orderBy("rnk")
    assert(out.withColumn("ps", lag(col("sim"), 1).over(w))
      .filter(col("ps").isNotNull && col("sim") > col("ps"))
      .count() == 0)
    // an edge's sim is identical in both directions when both survive
    val ab = out.select(col("item").as("a"), col("nbr").as("b"),
      col("sim").as("s1"))
    val ba = out.select(col("nbr").as("a"), col("item").as("b"),
      col("sim").as("s2"))
    assert(ab.join(ba, Seq("a", "b")).filter(col("s1") =!= col("s2"))
      .count() == 0)
    out.unpersist()
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

  test("q126 on sf0.001: never recommends owned items; scores recompute") {
    val d = sf("sf0.001")
    val owned = graft.Tables.orders(spark, d)
      .select(col("o_orderkey").as("o"), col("o_custkey").as("cust"))
      .join(graft.Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("item")),
        Seq("o"))
      .select("cust", "item").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nbrs = GraphOps.q102ItemSim.fn(spark, d)
      .select(col("item"), col("nbr"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val out = GraphOps.q126Recommend.fn(spark, d).collect()
    assert(out.nonEmpty)
    // anti-join contract: a recommendation the customer already owns
    // is a bug by definition
    out.foreach { r =>
      assert(!owned.contains((r.getLong(0), r.getLong(2))),
        s"owned item recommended: $r")
    }
    // ranks are 1..k contiguous per customer
    out.groupBy(_.getLong(0)).foreach { case (cust, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"cust $cust ranks $ranks")
      assert(ranks.length <= 3)
    }
    // score = Σ quantized sims of the customer's owned source items
    out.take(20).foreach { r =>
      val (cust, rec) = (r.getLong(0), r.getLong(2))
      val fp = nbrs.collect {
        case (item, nbr, sim) if nbr == rec && owned.contains((cust, item)) =>
          math.floor(sim * 1000000 + 0.5).toLong
      }
      assert(fp.length == r.getLong(3), s"n_src mismatch for $r")
      assert(fp.sum.toDouble / 1000000 == r.getDouble(4),
        s"score mismatch for $r")
    }
    ()
  }

  test("q148: degrees count distinct partners; log2 buckets are bit-length") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-deg").toString
    // baskets: o1 {1,2,3}, o2 {1,2} → parts 1,2,3 each degree 2
    // (distinct partners, multi-basket co-occurrence not double-counted);
    // o3 {4,5} → parts 4,5 degree 1; o4 {9} is below the 2-item cap
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 4L), (3L, 5L), (4L, 9L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphOps.q148DegreeDist.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      0L -> ((2L, 1L, 1L)), // degree 1 → bin length 1 − 1 = bucket 0
      1L -> ((3L, 2L, 2L))), out) // degree 2 → "10" → bucket 1
  }

  test("q160: sketched degrees land within the p=8 error band of exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-degsk").toString
    // one hub part (id 0) co-purchased with 200 distinct partners —
    // two partners per basket keeps every basket inside the cap
    val rows = (1 to 100).flatMap { b =>
      Seq((b.toLong, 0L), (b.toLong, (2 * b).toLong),
        (b.toLong, (2 * b + 1).toLong))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val est = GraphOps.q160DegreeSketch.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // the 200 leaf parts have exact degree 2 (hub + one basket mate);
    // linear counting estimates 2 when the two hashes land in distinct
    // registers (V=254 → 2.008) and 1 on a register collision
    // (V=255 → 1.002, ~1/256 chance per leaf) — so leaves fill
    // buckets 0/1 and nothing else
    val leafParts = est.collect {
      case (b, (n, _, hi)) if b <= 1 => assert(hi <= 2, est); n
    }.sum
    assert(leafParts == 200L, est)
    // the hub's 200-distinct estimate must land within ~3·RSD ≈ 20%
    val hub = est.collect {
      case (b, (n, lo, hi)) if b >= 6 => (b, n, lo, hi)
    }
    assert(hub.size == 1, est)
    val hubEst = hub.head._3
    assert(math.abs(hubEst - 200L) <= 40,
      s"hub estimate $hubEst too far from 200")
  }

  test("q182: holdout hit-rate is closed-form on a planted train/test split") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-reco").toString
    // train (1999): {1,2}, {1,2}, {1,3} -> only pair (1,2) has
    // support >= 2, so nbrs(1)=[2], nbrs(2)=[1], item 3 is cold.
    // test (2001): o10 {1,2,9} -> items 1 and 2 hit (each other), 9
    // cold; o11 {3,9} -> both cold (3 has no surviving neighbors);
    // o12 {1} -> size-1 basket, excluded.
    // => baskets 2, items 5, warm 2, hits 2, rate 0.4, warm rate 1.0
    def day(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, day("1999-01-01")), (2L, day("1999-02-01")),
      (3L, day("1999-03-01")), (10L, day("2001-01-01")),
      (11L, day("2001-02-01")), (12L, day("2001-03-01")))
      .toDF("o_orderkey", "o_orderdate")
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderpriority", lit("1-URGENT"))
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (3L, 3L), (10L, 1L), (10L, 2L), (10L, 9L), (11L, 3L), (11L, 9L),
      (12L, 1L)).toDF("l_orderkey", "l_partkey")
      .withColumn("l_quantity", lit(1.0))
      .withColumn("l_extendedprice", lit(1.0))
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = GraphOps.q182RecoHoldout.fn(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5)) == ((2L, 5L, 2L, 2L, 0.4, 1.0)), r)
  }
}
