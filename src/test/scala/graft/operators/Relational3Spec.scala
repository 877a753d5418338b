package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Invariant specs for the third relational tranche + graph ops —
  * properties the DuckDB hash-match can't express (cross-query
  * consistency, determinism across reruns). */
class Relational3Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf("sf0.001"))

  test("q77: funnel stage counts are monotone non-increasing") {
    val r = q("q77_funnel").head()
    val (s, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s >= c && c >= p && p >= 0, (s, c, p))
    assert(s > 0, "fixture must produce signups")
  }

  test("q73: salted aggregate is EXACTLY the plain aggregate") {
    val salted = q("q73_salted_agg")
    val plain = Tables.events(spark, sf("sf0.001"))
      .groupBy(col("event_type"))
      .agg(
        (sum(floor(col("value") * 100 + 0.5).cast("long")).cast("double")
          / 100.0).as("total_value"),
        count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
  }

  test("q2n: grouping-set marginals are consistent with the grand total") {
    val rows = q("q2n_grouping_sets").collect()
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1)
    val flagRows = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 1)
    val statusRows = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 0)
    val n = grand.head.getAs[Long]("n")
    assert(flagRows.map(_.getAs[Long]("n")).sum == n)
    assert(statusRows.map(_.getAs[Long]("n")).sum == n)
  }

  test("q75: pagerank ranks respect the damping bounds and determinism") {
    val r1 = q("q75_pagerank").cache()
    val nNodes = r1.count()
    // every node keeps at least the teleport mass; total never exceeds
    // the initial mass (floor-division only sheds micro-units)
    assert(r1.filter(col("rank_micro") < 150000L).count() == 0)
    val total = r1.agg(sum(col("rank_micro"))).head().getLong(0)
    assert(total <= nNodes * 1000000L, s"total=$total nodes=$nNodes")
    assert(total >= nNodes * 150000L)
    // some node must have accumulated more than the uniform share —
    // otherwise the recurrence never circulated any mass
    assert(r1.filter(col("rank_micro") > 1000000L).count() > 0)
    // integer recurrence ⇒ bit-identical rerun
    val r2 = q("q75_pagerank")
    assert(r1.exceptAll(r2).count() == 0 && r2.exceptAll(r1).count() == 0)
    r1.unpersist()
  }

  test("pagerank checkpoint path (iterations > threshold) matches the lazy path") {
    import spark.implicits._
    // tiny directed graph, deep enough that 6 rounds move mass around
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val lazyPath = GraphOps.pagerank(e, iterations = 6, checkpointAfter = 99)
    val checkpointed = GraphOps.pagerank(e, iterations = 6, checkpointAfter = 2)
    assert(lazyPath.exceptAll(checkpointed).count() == 0 &&
      checkpointed.exceptAll(lazyPath).count() == 0)
    assert(lazyPath.count() == 4)
  }

  test("q132: hand-computed step latencies, rank-based median and p90") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-funlat").toString
    // u1: signup@10 click@11 purchase@12 (plus a pre-signup click@9
    //     that the ts>t1 filter must ignore) → s2c 1s, c2p 1s
    // u2: signup@10 click@14                → s2c 4s
    // u3: signup@10 purchase@11 click@12    → s2c 2s; the purchase
    //     PRECEDES the first post-signup click, so no c2p row
    // u4: click@11 only                     → no signup, excluded
    // u5: signup@10 click@13 purchase@20    → s2c 3s, c2p 7s
    val rows = Seq(
      (1L, 1L, "click", 9L), (2L, 1L, "signup", 10L),
      (3L, 1L, "click", 11L), (4L, 1L, "purchase", 12L),
      (5L, 2L, "signup", 10L), (6L, 2L, "click", 14L),
      (7L, 3L, "signup", 10L), (8L, 3L, "purchase", 11L),
      (9L, 3L, "click", 12L),
      (10L, 4L, "click", 11L),
      (11L, 5L, "signup", 10L), (12L, 5L, "click", 13L),
      (13L, 5L, "purchase", 20L))
    rows.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q132_funnel_latency")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out.size == 2, out)
    // s2c lats sorted: [1,2,3,4]s → n=4, med=(2+3)/2 s, p90=rank 4
    assert(out("signup_to_click") == ((4L, 2500000.0, 4000000L)), out)
    // c2p lats sorted: [1,7]s → n=2, med=4s, p90=rank ⌈1.8⌉=2 → 7s
    assert(out("click_to_purchase") == ((2L, 4000000.0, 7000000L)), out)
  }

  test("q74: exact quartiles are ordered and the approx flag holds") {
    q("q74_approx_quantile").collect().foreach { r =>
      val (p25, med, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= med && med <= p75, r)
      assert(r.getBoolean(5), s"approx_percentile outside [p45,p55]: $r")
    }
  }
}
