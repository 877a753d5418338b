package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 analytics tranche, part two: experiment readouts and
  * monitoring statistics whose 100 TB shape is "one user-keyed or
  * day-keyed aggregate, then metadata" — the class where the only
  * scale hazard is sneaking a second data pass or an unpartitioned
  * window into what should be pure rollup algebra.
  *
  * Cross-engine conventions as AnalyticsOps5: cents-exact money,
  * epoch-µs int64 time, exact integer moments with the final
  * divisions done once in IEEE double and rounded (1e-6 outputs,
  * 1e-9 for the reused regression slope), identical expression trees
  * on both engines.
  */
object AnalyticsOps6 {

  /** 2024-01-16 00:00 UTC in epoch-µs: the fixed pre/post boundary
    * splitting the 30-day event window in half. */
  private val PreEnd = 1705363200000000L

  /** CUPED-adjusted A/B readout — the variance-reduction layer on top
    * of q104's plain two-proportion test: per-user post-period spend
    * is adjusted by the pre-period covariate (theta = pooled
    * cov(X,Y)/var(X)), which shrinks metric variance by exactly the
    * squared pre/post correlation and is the standard way large
    * experiment platforms cut required sample size. Variant
    * assignment is the deterministic 60-bit md5 user hash mod 2
    * (reproducible anywhere); users with no pre-period activity
    * carry X = 0 (the zero-imputation convention).
    *
    * Scale shape: ONE user-keyed aggregate (map-side partial) builds
    * (x, y) per user; every statistic after that is moment algebra —
    * a 2-row variant rollup plus a 1-row pooled moment frame joined
    * back by broadcast. No second data pass, no windows. The moment
    * cross-products (n·Σxy − ΣxΣy etc.) are computed EXACTLY —
    * int64 per-user products summed into int64, cross-multiplied in
    * decimal(38,0) (DuckDB: int128) — so both engines cast the SAME
    * integer to double before the one theta division; theta is
    * rounded at 1e-9 before reuse, final columns at 1e-6.
    * var_reduction = corr²(x, y) — the fraction of metric variance
    * CUPED removes. */
  val q172Cuped: QueryDef = QueryDef.withOracle(
    s"""WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS t,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |u AS (
      |  SELECT user_id,
      |    sum(CASE WHEN t < $PreEnd THEN cents ELSE 0 END) AS x,
      |    sum(CASE WHEN t >= $PreEnd THEN cents ELSE 0 END) AS y
      |  FROM e GROUP BY 1),
      |p AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM u),
      |th AS (
      |  SELECT n, sx,
      |    floor((CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE)) * 1000000000 + 0.5)
      |      / 1000000000 AS theta,
      |    floor(((CAST(n * sxy - sx * sy AS DOUBLE)
      |        * CAST(n * sxy - sx * sy AS DOUBLE))
      |      / (CAST(n * sxx - sx * sx AS DOUBLE)
      |        * CAST(n * syy - sy * sy AS DOUBLE))) * 1000000 + 0.5)
      |      / 1000000 AS var_reduction
      |  FROM p),
      |v AS (
      |  SELECT CASE WHEN ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
      |      1, 15))::BIGINT % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |    count(*) AS nv, sum(x) AS sxv, sum(y) AS syv
      |  FROM u GROUP BY 1)
      |SELECT variant, nv AS n_users,
      |  floor((CAST(syv AS DOUBLE) / nv) * 1000000 + 0.5) / 1000000
      |    AS mean_y,
      |  floor(((CAST(syv AS DOUBLE) / nv) - theta
      |    * ((CAST(sxv AS DOUBLE) / nv) - (CAST(sx AS DOUBLE) / n)))
      |    * 1000000 + 0.5) / 1000000 AS mean_y_adj,
      |  theta, var_reduction
      |FROM v CROSS JOIN th""".stripMargin
  ) { (s, d) =>
    val perUser = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("t") < PreEnd, col("cents")).otherwise(0L)).as("x"),
        sum(when(col("t") >= PreEnd, col("cents")).otherwise(0L)).as("y"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val pooled = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
      .select(col("n"), col("sx"),
        (dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy")))
          .cast("double").as("numd"),
        (dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx")))
          .cast("double").as("dend"),
        (dec(col("n")) * dec(col("syy")) - dec(col("sy")) * dec(col("sy")))
          .cast("double").as("denyd"))
      .select(col("n"), col("sx"),
        (floor((col("numd") / col("dend")) * 1000000000 + 0.5)
          / 1000000000).as("theta"),
        (floor(((col("numd") * col("numd")) / (col("dend") * col("denyd")))
          * 1000000 + 0.5) / 1000000).as("var_reduction"))
    val variant = expr("CASE WHEN CAST(conv(substring(md5(CAST(user_id " +
      "AS STRING)), 1, 15), 16, 10) AS BIGINT) % 2 = 0 " +
      "THEN 'A' ELSE 'B' END")
    perUser.groupBy(variant.as("variant"))
      .agg(count(lit(1)).as("nv"), sum(col("x")).as("sxv"),
        sum(col("y")).as("syv"))
      .crossJoin(broadcast(pooled))
      .select(col("variant"), col("nv").as("n_users"),
        (floor((col("syv").cast("double") / col("nv")) * 1000000 + 0.5)
          / 1000000).as("mean_y"),
        (floor(((col("syv").cast("double") / col("nv")) - col("theta") *
          ((col("sxv").cast("double") / col("nv")) -
            (col("sx").cast("double") / col("n")))) * 1000000 + 0.5)
          / 1000000).as("mean_y_adj"),
        col("theta"), col("var_reduction"))
  }

  /** CUSUM level-shift detection on daily per-type event volume — the
    * pipeline-monitoring statistic that flags WHEN a volume regime
    * changed, complementing q123's seasonal residual anomalies (which
    * day is odd) and q153's KS drift (whether two distributions
    * differ) with the classic cumulative-sum changepoint locator.
    * S_k = Σ_{i≤k} (c_i − mean) peaks at the most likely shift
    * point; kept EXACT by scaling through the day count
    * (S'_k = n_days·S_k = Σ n_days·c_i − k·total — pure int64, no
    * mean division), so the argmax is integer-deterministic;
    * `cusum_norm` = max|S'| / (n_days·total) is the one rounded
    * IEEE division (0 = flat, → 1 = extreme shift).
    *
    * Scale shape: ONE (type, day)-keyed count — partial+final hash
    * aggregate, the only data pass — collapses any event volume to a
    * ≤ |types|·|days| frame; the frame is cached and every window
    * (per-type totals, the running S'_k, the argmax rank) runs on
    * that metadata, partitioned by event_type. Ties on |S'| break to
    * the earliest day on both engines. */
  val q173CusumChangepoint: QueryDef = QueryDef.withOracle(
    """WITH daily AS (
      |  SELECT event_type,
      |    (epoch_us(ts) - epoch_us(ts) % 86400000000) // 86400000000
      |      AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, day, c,
      |    count(*) OVER (PARTITION BY event_type) AS n_days,
      |    sum(c) OVER (PARTITION BY event_type) AS total
      |  FROM daily),
      |cu AS (
      |  SELECT event_type, day, n_days, total,
      |    abs(sum(n_days * c - total) OVER (PARTITION BY event_type
      |      ORDER BY day)) AS abs_s
      |  FROM st),
      |rk AS (
      |  SELECT event_type, day, n_days, total, abs_s,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs_s DESC, day) AS rn
      |  FROM cu)
      |SELECT event_type, n_days, total, day AS cp_day,
      |  abs_s AS max_abs_cusum,
      |  floor((CAST(abs_s AS DOUBLE) / (n_days * total)) * 1000000 + 0.5)
      |    / 1000000 AS cusum_norm
      |FROM rk WHERE rn = 1""".stripMargin
  ) { (s, d) =>
    val daily = Tables.events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("t"))
      .withColumn("day", expr(
        "(t - pmod(t, 86400000000)) div 86400000000"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .cache() // metadata-sized: ≤ |types| · |days| rows
    val byType = Window.partitionBy(col("event_type"))
    val cum = daily
      .withColumn("n_days", count(lit(1)).over(byType))
      .withColumn("total", sum(col("c")).over(byType))
      .withColumn("abs_s", abs(sum(col("n_days") * col("c") - col("total"))
        .over(byType.orderBy(col("day")))))
    cum
      .withColumn("rn", row_number().over(
        byType.orderBy(col("abs_s").desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n_days"), col("total"),
        col("day").as("cp_day"), col("abs_s").as("max_abs_cusum"),
        (floor((col("abs_s").cast("double") /
          (col("n_days") * col("total"))) * 1000000 + 0.5) / 1000000)
          .as("cusum_norm"))
  }

  val all: Map[String, QueryDef] = Map(
    "q172_cuped" -> q172Cuped,
    "q173_cusum_changepoint" -> q173CusumChangepoint
  )
}
