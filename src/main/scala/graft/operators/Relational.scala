package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 relational operator inventory, re-expressed as Spark
  * DataFrame programs over the TPC-H-ish testdata, each with a DuckDB
  * oracle. Every query names the reference operator(s) it exercises
  * (citations into /root/reference).
  *
  * Scale notes: all aggregations here are plain `groupBy().agg` so
  * Catalyst plans partial+final HashAggregate (map-side combine);
  * small dimensions (customer/nation/region/part at any SF the dims
  * stay ~1e3–1e6 rows) are joined with explicit `broadcast()` so the
  * fact table never shuffles for the join; filters/projections sit
  * directly on the scan so parquet gets pushdown + pruning.
  */
object Relational {

  /** A1/A2 rollup shape (silver_to_gold.py:95-122): group keys →
    * {sum,mean,max,count} with round-inside-agg, TPC-H Q1 style. */
  val q1AggRollup: QueryDef = QueryDef.withOracle(
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 3) AS sum_qty,
      |  round(sum(l_extendedprice), 3) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
      |  round(avg(l_quantity), 3) AS avg_qty,
      |  round(avg(l_extendedprice), 3) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  round(max(l_extendedprice), 3) AS max_price,
      |  round(min(l_extendedprice), 3) AS min_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 3).as("sum_qty"),
        round(sum(col("l_extendedprice")), 3).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 3).as("sum_disc_price"),
        round(avg(col("l_quantity")), 3).as("avg_qty"),
        round(avg(col("l_extendedprice")), 3).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        round(max(col("l_extendedprice")), 3).as("max_price"),
        round(min(col("l_extendedprice")), 3).as("min_price"),
        count(lit(1)).as("count_order"))
  }

  /** F6/F10 range predicates + manual projection (bronze_to_silver.py:
    * 138-144,186): both reach the parquet scan as PushedFilters +
    * ReadSchema pruning. */
  val q2FilterProject: QueryDef = QueryDef.withOracle(
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 30
      |  AND l_discount >= 0.05
      |  AND l_returnflag = 'R'""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity").between(10, 30) &&
        col("l_discount") >= 0.05 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
  }

  /** J1 broadcast left equi-join + coalesce null-fill
    * (bronze_to_silver.py:178-211): fact ⟕ small dim. */
  val q3JoinBroadcastLeft: QueryDef = QueryDef.withOracle(
    """SELECT coalesce(c_mktsegment, 'UNKNOWN') AS mktsegment,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS total_price,
      |  count(*) AS n_orders
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    // 2-dp prices summed as exact integer cents (order-independent)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("mktsegment"))
      .agg((sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("double") / 100.0).as("total_price"),
        count(lit(1)).as("n_orders"))
  }

  /** Inner equi-join chain with broadcast dims: revenue per nation.
    * (SURVEY §2.3: standard inner equi-join surface.) */
  val q4JoinMulti: QueryDef = QueryDef.withOracle(
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** W1/W2/W3 rolling 60-row window per key ordered by time
    * (bronze_to_silver.py:246-268): rolling mean + rolling sum with
    * min_periods=1 ≡ rowsBetween(-59, 0). event_id breaks ts ties so
    * both engines see one deterministic order. */
  val q5WindowRolling: QueryDef = QueryDef.withOracle(
    // Exactness contract: window-sliding float sums are NOT
    // order-deterministic across engines (DuckDB aggregates frames via
    // a segment tree; Spark sums sequentially), so any float rounding
    // can flip at a boundary. Values carry 2 decimals → sum exact
    // integer cents (order-independent), then derive the mean with a
    // single double division + floor-rounding, identical in both.
    """SELECT event_id, user_id,
      |  floor((CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
      |         / (count(*) OVER w * 100.0)) * 1000 + 0.5) / 1000 AS value_60_avg,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w AS BIGINT)
      |    AS error_60_sum,
      |  count(*) OVER w AS window_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-59, 0)
    val sumCents = sum(floor(col("value") * 100 + 0.5).cast("long")).over(w)
    val n = count(lit(1)).over(w)
    Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      (floor((sumCents.cast("double") / (n * 100.0)) * 1000 + 0.5) / 1000)
        .as("value_60_avg"),
      sum(when(col("event_type") === "error", 1L).otherwise(0L)).over(w)
        .as("error_60_sum"),
      n.as("window_n"))
  }

  /** W4 latest-row pick (dashboard/app.py:334) via row_number. */
  val q6WindowLatest: QueryDef = QueryDef.withOracle(
    """SELECT user_id, event_id, event_type, round(value, 2) AS value
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) WHERE rn = 1""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"))
  }

  /** O2 top-k (dashboard/app.py:567,618): orderBy desc + limit —
    * Spark plans TakeOrderedAndProject (no global sort). */
  val q7TopK: QueryDef = QueryDef.withOracle(
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(100)
  }

  /** A5 distinct aggregates (silver_to_gold.py:217-226): per-month
    * countDistinct — exact, like the reference's nunique. */
  val q8DistinctAgg: QueryDef = QueryDef.withOracle(
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  count(DISTINCT o_custkey) AS active_customers,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS total_price,
      |  count(*) AS n_orders
      |FROM orders GROUP BY 1""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(countDistinct(col("o_custkey")).as("active_customers"),
        (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .cast("double") / 100.0).as("total_price"),
        count(lit(1)).as("n_orders"))
  }

  /** U1/U2 union all + dedup (dashboard/app.py:236-244): two
    * overlapping extracts, unioned, deduplicated on the key. */
  val q9UnionDedup: QueryDef = QueryDef.withOracle(
    """SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 45
      |UNION
      |SELECT l_orderkey, l_partkey FROM lineitem WHERE l_extendedprice > 90000""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val a = li.filter(col("l_quantity") > 45).select("l_orderkey", "l_partkey")
    val b = li.filter(col("l_extendedprice") > 90000).select("l_orderkey", "l_partkey")
    a.union(b).dropDuplicates("l_orderkey", "l_partkey")
  }

  /** F11 + np.where conditional classification (silver_to_gold.py:
    * 114-118): when/otherwise chain + rollup. */
  val q10CaseWhen: QueryDef = QueryDef.withOracle(
    """SELECT CASE WHEN l_quantity < 10 THEN 'low'
      |            WHEN l_quantity < 40 THEN 'mid'
      |            ELSE 'high' END AS qty_class,
      |  count(*) AS n,
      |  round(avg(l_extendedprice), 3) AS avg_price
      |FROM lineitem GROUP BY 1""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(when(col("l_quantity") < 10, "low")
        .when(col("l_quantity") < 40, "mid")
        .otherwise("high").as("qty_class"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("l_extendedprice")), 3).as("avg_price"))
  }

  /** J2 scalar broadcast (silver_to_gold.py:244-258): global aggregate
    * attached to every group row via crossJoin(agg) — a 1-row
    * broadcast nested-loop join, exactly Spark's plan for it. */
  val q11ScalarBroadcast: QueryDef = QueryDef.withOracle(
    """SELECT l_returnflag,
      |  round(avg(l_extendedprice) - (SELECT avg(l_extendedprice) FROM lineitem), 3)
      |    AS deviation_from_global
      |FROM lineitem GROUP BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val global = li.agg(avg(col("l_extendedprice")).as("global_avg"))
    li.groupBy(col("l_returnflag"))
      .agg(avg(col("l_extendedprice")).as("flag_avg"))
      .crossJoin(broadcast(global))
      .select(col("l_returnflag"),
        round(col("flag_avg") - col("global_avg"), 3).as("deviation_from_global"))
  }

  /** A8 KPI scalars (dashboard/app.py:277-357): one-row summary —
    * sums + exact distinct counts over a time-filtered fact. */
  val q12KpiScalars: QueryDef = QueryDef.withOracle(
    """SELECT CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS total_value,
      |  count(DISTINCT user_id) AS active_users,
      |  count(*) AS n_events
      |FROM events WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'""".stripMargin
  ) { (s, d) =>
    // 2-dp values summed as exact integer cents: order-independent,
    // identical in both engines at any SF
    Tables.events(s, d)
      .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp"))
      .agg((sum(floor(col("value") * 100 + 0.5).cast("long")).cast("double")
        / 100.0).as("total_value"),
        countDistinct(col("user_id")).as("active_users"),
        count(lit(1)).as("n_events"))
  }

  /** §2.8 date/time scalars: extract parts, group rollup
    * (ingest_bronze.py:126-136, silver_to_gold.py:92). */
  val q13DateScalars: QueryDef = QueryDef.withOracle(
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS total
      |FROM orders GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .cast("double") / 100.0).as("total"))
  }

  /** §2.8 string scalars: upper/length/substring/concat. */
  val q14StringFuncs: QueryDef = QueryDef.withOracle(
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_u,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  substr(p_type, 1, 5) AS type5,
      |  p_brand || '/' || p_type AS brand_type
      |FROM part""".stripMargin
  ) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_type"), 1, 5).as("type5"),
      concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"))
  }

  /** §2.8 JSON path extraction (ingest_bronze.py:52 json.loads ≈
    * from_json/get_json_object). */
  val q15Json: QueryDef = QueryDef.withOracle(
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
  }

  /** F4/F5 null handling + coercion (bronze_to_silver.py:128-136):
    * nulls injected via CASE, counted and coalesced like fillna. */
  val q16NullHandling: QueryDef = QueryDef.withOracle(
    """SELECT c_mktsegment,
      |  count(*) AS n,
      |  count(CASE WHEN c_acctbal >= 0 THEN c_acctbal END) AS n_nonneg,
      |  CAST(sum(CAST(floor(coalesce(CASE WHEN c_acctbal >= 0 THEN c_acctbal END,
      |    0.0) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_bal
      |FROM customer GROUP BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .withColumn("bal", when(col("c_acctbal") >= 0, col("c_acctbal")))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        count(col("bal")).as("n_nonneg"),
        (sum(floor(coalesce(col("bal"), lit(0.0)) * 100 + 0.5).cast("long"))
          .cast("double") / 100.0).as("sum_bal"))
  }

  /** A4 health-score formula shape (silver_to_gold.py:153-199):
    * weighted means, least/greatest clamps, guarded division. */
  val q17HealthFormula: QueryDef = QueryDef.withOracle(
    """SELECT user_id,
      |  count(*) AS n_events,
      |  floor(least(1.0,
      |    0.4 * (1 - avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END))
      |    + 0.3 * avg(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
      |    + 0.3 * least(count(*) / 1000.0, 1.0)) * 1000 + 0.5) / 1000
      |    AS health_score,
      |  floor(least(1.0,
      |    (1 - least(1.0,
      |      0.4 * (1 - avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END))
      |      + 0.3 * avg(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
      |      + 0.3 * least(count(*) / 1000.0, 1.0))) * 0.7
      |    + avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) * 0.3)
      |    * 1000 + 0.5) / 1000 AS failure_probability
      |FROM events GROUP BY user_id""".stripMargin
  ) { (s, d) =>
    val errRate = avg(when(col("event_type") === "error", 1.0).otherwise(0.0))
    val purRate = avg(when(col("event_type") === "purchase", 1.0).otherwise(0.0))
    val health = least(lit(1.0),
      lit(0.4) * (lit(1) - errRate) + lit(0.3) * purRate +
        lit(0.3) * least(count(lit(1)) / 1000.0, lit(1.0)))
    // floor-rounding: the formula inputs are integer ratios, so both
    // engines hold identical doubles — floor(x*k+0.5)/k can't diverge
    // at half-boundaries the way round() does
    Tables.events(s, d).groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      (floor(health * 1000 + 0.5) / 1000).as("health_score"),
      (floor(least(lit(1.0), (lit(1) - health) * 0.7 + errRate * 0.3) * 1000
        + 0.5) / 1000).as("failure_probability"))
  }

  /** Anti join (NOT EXISTS): rich customers with no 1995 orders —
    * filtered on both sides so the result is non-empty at every SF. */
  val q18AntiJoin: QueryDef = QueryDef.withOracle(
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_acctbal > 9000 AND NOT EXISTS
      |  (SELECT 1 FROM orders
      |   WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
    val o = Tables.orders(s, d).filter(year(col("o_orderdate")) === 1995)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Semi join: nations having customers with acctbal > 9000 (EXISTS),
    * counted per region via broadcast dim join. */
  val q19SemiJoin: QueryDef = QueryDef.withOracle(
    """SELECT r_name, count(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |WHERE EXISTS (SELECT 1 FROM customer
      |              WHERE c_nationkey = n_nationkey AND c_acctbal > 9000)
      |GROUP BY r_name""".stripMargin
  ) { (s, d) =>
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left_semi")
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"))
  }

  /** F3 dedup-on-key (bronze_to_silver.py:125) as DISTINCT over a
    * projection — set semantics, survivor-independent. */
  val q20Dedup: QueryDef = QueryDef.withOracle(
    "SELECT DISTINCT user_id, event_type FROM events"
  ) { (s, d) =>
    Tables.events(s, d).select("user_id", "event_type").dropDuplicates()
  }

  /** A1+A2 daily rollup + derived cost columns (silver_to_gold.py:
    * 95-122): date-keyed rollup, cost estimate at 0.12/kUnit, guarded
    * ratio — the daily_energy_consumption shape on lineitem.
    *
    * Exactness: prices carry 2 decimals → summed as integer cents
    * (order-independent, engine-identical); quantities are integral
    * doubles (exact sums). Derived ratios then floor-round identical
    * doubles in both engines — no half-boundary divergence at any SF. */
  val q21DailyRollup: QueryDef = QueryDef.withOracle(
    """SELECT CAST(l_shipdate AS DATE) AS ship_date,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 100.0 AS gross,
      |  sum(l_quantity) AS qty,
      |  count(*) AS n_lines,
      |  floor((CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 100.0) / 1000 * 0.12 * 100 + 0.5) / 100 AS cost_estimate,
      |  CASE WHEN sum(l_quantity) > 0
      |       THEN floor((CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |            / 100.0) / sum(l_quantity) * 1000 + 0.5) / 1000
      |       ELSE 0.0 END AS avg_price_per_unit
      |FROM lineitem GROUP BY 1""".stripMargin
  ) { (s, d) =>
    val cents = sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
    Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("ship_date"))
      .agg((cents.cast("double") / 100.0).as("gross"),
        sum(col("l_quantity")).as("qty"),
        count(lit(1)).as("n_lines"))
      .withColumn("cost_estimate",
        floor(col("gross") / 1000 * 0.12 * 100 + 0.5) / 100)
      .withColumn("avg_price_per_unit",
        when(col("qty") > 0,
          floor(col("gross") / col("qty") * 1000 + 0.5) / 1000).otherwise(0.0))
  }

  /** ST5 daily tumbling window ≡ group-by event date + type
    * (silver_to_gold.py:92; window($"ts","1 day") equivalence). */
  val q22DailyEvents: QueryDef = QueryDef.withOracle(
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + 0.5).cast("long")).cast("double")
          / 100.0).as("total_value"))
  }

  /** A7 chart group-by + bool-fraction mean (app.py:365-367; is_valid
    * mean semantics — mean of a boolean = fraction true). */
  val q23BoolFraction: QueryDef = QueryDef.withOracle(
    """SELECT l_returnflag,
      |  floor(avg(CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END)
      |    * 10000 + 0.5) / 10000 AS frac_discounted,
      |  floor(avg(CASE WHEN l_tax > 0.04 THEN 1.0 ELSE 0.0 END)
      |    * 10000 + 0.5) / 10000 AS frac_taxed
      |FROM lineitem GROUP BY l_returnflag""".stripMargin
  ) { (s, d) =>
    // integer-ratio means → identical doubles in both engines →
    // floor-rounding is boundary-safe (round() is not)
    Tables.lineitem(s, d).groupBy(col("l_returnflag")).agg(
      (floor(avg(when(col("l_discount") > 0.05, 1.0).otherwise(0.0)) * 10000
        + 0.5) / 10000).as("frac_discounted"),
      (floor(avg(when(col("l_tax") > 0.04, 1.0).otherwise(0.0)) * 10000
        + 0.5) / 10000).as("frac_taxed"))
  }

  val all: Map[String, QueryDef] = Map(
    "q1_agg_rollup" -> q1AggRollup,
    "q2_filter_project" -> q2FilterProject,
    "q3_join_broadcast_left" -> q3JoinBroadcastLeft,
    "q4_join_multi" -> q4JoinMulti,
    "q5_window_rolling" -> q5WindowRolling,
    "q6_window_latest" -> q6WindowLatest,
    "q7_topk" -> q7TopK,
    "q8_distinct_agg" -> q8DistinctAgg,
    "q9_union_dedup" -> q9UnionDedup,
    "q10_case_when" -> q10CaseWhen,
    "q11_scalar_broadcast" -> q11ScalarBroadcast,
    "q12_kpi_scalars" -> q12KpiScalars,
    "q13_date_scalars" -> q13DateScalars,
    "q14_string_funcs" -> q14StringFuncs,
    "q15_json" -> q15Json,
    "q16_null_handling" -> q16NullHandling,
    "q17_health_formula" -> q17HealthFormula,
    "q18_anti_join" -> q18AntiJoin,
    "q19_semi_join" -> q19SemiJoin,
    "q20_dedup" -> q20Dedup,
    "q21_daily_rollup" -> q21DailyRollup,
    "q22_daily_events" -> q22DailyEvents,
    "q23_bool_fraction" -> q23BoolFraction
  )
}
