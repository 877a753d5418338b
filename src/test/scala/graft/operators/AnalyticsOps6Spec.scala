package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form contracts for the experiment/monitoring tranche: CUPED
  * on a perfectly-correlated covariate (theta, adjusted means, and
  * variance reduction all have exact answers) and CUSUM on a planted
  * level shift (the peak location and height are hand-computable).
  */
class AnalyticsOps6Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("q172: perfectly correlated covariate gives theta=2, var_reduction=1") {
    val dir = tmp("graft-cuped")
    // user u: one pre event of u cents, one post event of 2u cents ->
    // y = 2x exactly, so theta = 2, var_reduction = corr^2 = 1, and
    // every variant's adjusted mean collapses to the POOLED post mean
    // (CUPED removes all between-variant covariate imbalance):
    // sum y = 2 * (1+..+8) = 72 over 8 users -> 9.0
    val evs = (1 to 8).flatMap { u =>
      Seq((u.toLong * 2, "2024-01-05 00:00:00", u.toLong, u / 100.0),
        (u.toLong * 2 + 1, "2024-01-20 00:00:00", u.toLong, 2 * u / 100.0))
    }
    evs.toDF("event_id", "tss", "user_id", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
      .withColumn("event_type", lit("purchase"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = AnalyticsOps6.q172Cuped.fn(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == 8L, rows.toSeq) // all users
    rows.foreach { r =>
      assert(r.getDouble(4) == 2.0, r)   // theta
      assert(r.getDouble(5) == 1.0, r)   // var_reduction
      assert(r.getDouble(3) == 9.0, r)   // mean_y_adj = pooled mean
    }
  }

  test("q173: planted level shift peaks the CUSUM at the last low day") {
    val dir = tmp("graft-cusum")
    // type 'a': days 0..4 have 1 event/day, days 5..9 have 3 ->
    // n_days=10, total=20, scaled steps are -10 then +10, so |S'|
    // peaks at 50 on day index 4 (epoch day 19727); norm = 50/200
    val evs = (0 until 10).flatMap { d =>
      val n = if (d < 5) 1 else 3
      (0 until n).map(k => (d.toLong * 10 + k,
        java.sql.Timestamp.from(java.time.Instant
          .parse("2024-01-01T00:00:00Z").plusSeconds(86400L * d + k))))
    }
    evs.toDF("event_id", "ts")
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("a"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = AnalyticsOps6.q173CusumChangepoint.fn(spark, dir).collect()
    assert(rows.length == 1, rows.toSeq)
    val r = rows.head
    assert(r.getLong(1) == 10L, r)          // n_days
    assert(r.getLong(2) == 20L, r)          // total
    assert(r.getLong(3) == 19723L + 4, r)   // cp_day
    assert(r.getLong(4) == 50L, r)          // max_abs_cusum (scaled)
    assert(r.getDouble(5) == 0.25, r)       // cusum_norm
  }
}
