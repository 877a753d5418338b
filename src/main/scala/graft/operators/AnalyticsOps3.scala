package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third analytics batch: cohort lifetime value and seasonal-baseline
  * anomaly detection — the two warehouse staples still missing around
  * the retention/growth/attribution family (q93/q106/q107) and the
  * global outlier report (q105).
  *
  * House rules as everywhere: money sums ride exact int cents
  * (q99/q106 convention), medians are the explicit lower/upper-middle
  * average (q105 convention — no engine-specific quantile
  * interpolation), every join of a data-sized frame keys on its
  * natural high-cardinality key, and tiny rollup frames are the only
  * thing a window's global ORDER BY ever sees.
  */
object AnalyticsOps3 {

  /** Cohort lifetime value: customers grouped by first-order month,
    * each cohort's order count / active-customer count / revenue /
    * cumulative revenue tracked by cohort age in months — the LTV
    * curve a subscription or marketplace business reads daily.
    *
    * Shape: ONE customer-keyed exchange derives each customer's
    * cohort month (window min over o_custkey — no join against a
    * customer-sized first-order frame), then a partial+final hash
    * aggregate lands on the (cohort, age) domain, which is
    * months² / 2 — metadata-sized forever. The cumulative sum's
    * global-order window runs on THAT rollup only. Revenue is exact:
    * cents quantized per order before the sum (int64 addition is
    * associative — partial aggregation order can't perturb it), one
    * IEEE division per output row at the end. n_active is an exact
    * distinct over (cohort, age, custkey) — Spark plans the standard
    * two-phase distinct aggregate; at 100 TB the key domain is
    * customers, which is exactly what the shuffle already carries. */
  val q122CohortLtv: QueryDef = QueryDef.withOracle(
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate, o_totalprice,
      |    min(o_orderdate) OVER (PARTITION BY o_custkey) AS first_dt
      |  FROM orders),
      |tagged AS (
      |  SELECT date_trunc('month', first_dt) AS cohort_month,
      |    (year(o_orderdate) * 12 + month(o_orderdate))
      |      - (year(first_dt) * 12 + month(first_dt)) AS age_months,
      |    o_custkey,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM o),
      |roll AS (
      |  SELECT cohort_month, age_months,
      |    count(*) AS n_orders,
      |    count(DISTINCT o_custkey) AS n_active,
      |    sum(cents) AS rev_cents
      |  FROM tagged GROUP BY 1, 2)
      |SELECT cohort_month, age_months, n_orders, n_active,
      |  CAST(rev_cents AS DOUBLE) / 100 AS revenue,
      |  CAST(sum(rev_cents) OVER (PARTITION BY cohort_month
      |    ORDER BY age_months ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100
      |    AS cum_revenue
      |FROM roll""".stripMargin
  ) { (s, d) =>
    val byCust = Window.partitionBy(col("o_custkey"))
    val tagged = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("first_dt", min(col("o_orderdate")).over(byCust))
      .select(
        date_trunc("month", col("first_dt")).as("cohort_month"),
        ((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) -
          (year(col("first_dt")) * 12 + month(col("first_dt"))))
          .as("age_months"),
        col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val roll = tagged
      .groupBy(col("cohort_month"), col("age_months"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_active"),
        sum(col("cents")).as("rev_cents"))
    // rollup frame is months² / 2 rows — the running sum's window is
    // metadata-sized by construction
    val byCohort = Window.partitionBy(col("cohort_month"))
      .orderBy(col("age_months")).rowsBetween(Window.unboundedPreceding, 0)
    roll.select(col("cohort_month"), col("age_months"), col("n_orders"),
      col("n_active"),
      (col("rev_cents").cast("double") / 100).as("revenue"),
      (sum(col("rev_cents")).over(byCohort).cast("double") / 100)
        .as("cum_revenue"))
  }

  /** Seasonal-baseline anomaly report: each event is judged against
    * the median/MAD of ITS OWN (event_type, hour-of-day) stratum —
    * the seasonal sibling of q105's global MAD report, and the shape
    * of every "is this metric value normal for 3 am?" monitor. Rows
    * whose absolute deviation exceeds 6·MAD are emitted with their
    * stratum baseline and deviation ratio.
    *
    * Median and MAD follow the q105 convention exactly: explicit
    * lower/upper-middle rank pick + avg of the (≤2) middle rows, so
    * both engines compute (a+b)/2 on identical operands — no
    * quantile-interpolation parity risk, no order-dependent float
    * aggregate anywhere (the only divisions are per-row). Two
    * stratum-keyed exchanges total (value rank, then deviation rank
    * — dependent selection passes, q105's floor); the stratum-stat
    * frames are |types|·24 rows and broadcast back onto the scan. */
  val q123SeasonalAnomaly: QueryDef = QueryDef.withOracle(
    """WITH r AS (
      |  SELECT event_id, event_type, hour(ts) AS hr, value,
      |    row_number() OVER (PARTITION BY event_type, hour(ts)
      |      ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type, hour(ts)) AS n
      |  FROM events),
      |med AS (
      |  SELECT event_type, hr, avg(value) AS med FROM r
      |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      |  GROUP BY 1, 2),
      |dev AS (
      |  SELECT r.event_id, r.event_type, r.hr, r.value, m.med,
      |    abs(r.value - m.med) AS adev,
      |    row_number() OVER (PARTITION BY r.event_type, r.hr
      |      ORDER BY abs(r.value - m.med), r.rn) AS drn,
      |    count(*) OVER (PARTITION BY r.event_type, r.hr) AS n
      |  FROM r JOIN med m USING (event_type, hr)),
      |mad AS (
      |  SELECT event_type, hr, avg(adev) AS mad FROM dev
      |  WHERE drn = (n + 1) // 2 OR drn = (n + 2) // 2
      |  GROUP BY 1, 2)
      |SELECT d.event_id, d.event_type, CAST(d.hr AS INT) AS hr, d.value,
      |  round(d.med, 6) AS med, round(a.mad, 6) AS mad,
      |  round(d.adev / a.mad, 4) AS dev_ratio
      |FROM dev d JOIN mad a USING (event_type, hr)
      |WHERE a.mad > 0 AND d.adev > a.mad * 6""".stripMargin
  ) { (s, d) =>
    val byStratum = Window.partitionBy(col("event_type"), col("hr"))
    // cached: consumed by the median pick and the deviation pass
    // (the q105/q42-sigs convention)
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), hour(col("ts")).as("hr"),
        col("value"))
      .withColumn("rn", row_number().over(
        byStratum.orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byStratum))
      .cache()
    val med = ev
      .filter(col("rn") === expr("(n + 1) div 2") ||
              col("rn") === expr("(n + 2) div 2"))
      .groupBy(col("event_type"), col("hr")).agg(avg(col("value")).as("med"))
    val dev = ev.join(med, Seq("event_type", "hr"))
      .withColumn("adev", abs(col("value") - col("med")))
      .withColumn("drn", row_number().over(
        byStratum.orderBy(col("adev"), col("rn"))))
      .cache()
    val mad = dev
      .filter(col("drn") === expr("(n + 1) div 2") ||
              col("drn") === expr("(n + 2) div 2"))
      .groupBy(col("event_type"), col("hr")).agg(avg(col("adev")).as("mad"))
    dev.join(mad, Seq("event_type", "hr"))
      .filter(col("mad") > 0 && col("adev") > col("mad") * 6)
      .select(col("event_id"), col("event_type"), col("hr").cast("int").as("hr"),
        col("value"), round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"),
        round(col("adev") / col("mad"), 4).as("dev_ratio"))
  }

  val all: Map[String, QueryDef] = Map(
    "q122_cohort_ltv" -> q122CohortLtv,
    "q123_seasonal_anomaly" -> q123SeasonalAnomaly)
}
