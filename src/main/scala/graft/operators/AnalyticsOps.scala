package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product/decision-analytics operators: Pareto (skyline) extraction,
  * cohort retention, and Markov transition matrices — the
  * event-warehouse staples beyond the funnel/session family
  * (q77/q2b/q2k).
  *
  * Scale designs follow the house rules: no all-pairs joins (the
  * skyline's dominance test — inherently a quadratic predicate — is
  * decomposed into partition-local prefix minima plus a candidate
  * merge bounded by the local-skyline union), aggregates keyed to
  * reuse one shuffle where partitionings coincide, and every float
  * output either scan-exact or a single IEEE division of integers.
  */
object AnalyticsOps {

  /** 2-D skyline (Pareto frontier, minimize both dims) of parts over
    * (p_retailprice, p_size): rows no other part dominates, where a
    * dominates b iff a ≤ b on both dims and < on at least one.
    *
    * The naive test is an O(n²) NOT EXISTS self-join (the oracle —
    * fine in DuckDB at gate SF, unusable at 100 TB). The distributed
    * form exploits the sort characterization: after sorting by
    * (price, size, id), every dominator of a row precedes it, and
    * dominance collapses to two prefix minima —
    *   dominated ⇔ min(size | strictly cheaper prefix) ≤ size
    *             ∨ min(size | same-price prefix) < size
    * — both computable with partition-LOCAL windows under ANY
    * partitioning (a dominator in another partition is handled by
    * phase 2). Phase 1 runs this locally (wide, one pass, no global
    * sort) and keeps each partition's local skyline; phase 2 re-runs
    * the identical logic over the UNION of local skylines on one
    * task. The merge input is the candidate bound: for anything but
    * adversarially anti-correlated dims, local skylines are tiny
    * (here: ≤ a few dozen rows from 200k), and the worst case
    * degrades to the sort cost, never to n². Equal (price, size)
    * duplicates dominate neither way and all survive — the strict-<
    * on the same-price minimum is what encodes that. */
  val q92Skyline: QueryDef = QueryDef.withOracle(
    """SELECT p_partkey, p_retailprice, p_size FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))""".stripMargin
  ) { (s, d) =>
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val local = skylinePass(
      p.repartition(p.sparkSession.sparkContext.defaultParallelism)
        .withColumn("pid", spark_partition_id()))
    // phase 2: the candidate union fits one task by construction
    skylinePass(local.withColumn("pid", lit(0)).coalesce(1))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
  }

  /** One sorted-prefix dominance pass within each `pid` group; keeps
    * the rows not dominated inside their group. */
  private def skylinePass(df: DataFrame): DataFrame = {
    val order = Seq(col("p_retailprice"), col("p_size"), col("p_partkey"))
    val wAll = Window.partitionBy(col("pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy(col("pid"), col("p_retailprice"))
      .orderBy(col("p_size"), col("p_partkey"))
    val mAll = df.withColumn("m_all", min(col("p_size")).over(wAll))
      .withColumn("m_same",
        min(col("p_size")).over(wSame.rowsBetween(Window.unboundedPreceding, -1)))
    // the first row of a price group has no same-price predecessors,
    // so ITS m_all is exactly the strictly-cheaper prefix minimum
    mAll.withColumn("m_cheaper", first(col("m_all")).over(wSame))
      .filter(!(coalesce(col("m_cheaper") <= col("p_size"), lit(false)) ||
        coalesce(col("m_same") < col("p_size"), lit(false))))
      .drop("m_all", "m_same", "m_cheaper")
  }

  /** Cohort retention: users grouped by first-seen day, distinct
    * active users per (cohort, day-offset) — the canonical retention
    * triangle. Two aggregates and the join all key on user_id /
    * derive from the user-keyed shuffle, so the whole query is one
    * exchange of the fact table plus the (cohort × offset)-sized
    * rollup; nothing rescans events twice at the shuffle level. */
  val q93Retention: QueryDef = QueryDef.withOracle(
    """WITH c AS (
      |  SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort_day
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)
      |    AS activity_day
      |  FROM events)
      |SELECT c.cohort_day,
      |  CAST(datediff('day', c.cohort_day, a.activity_day) AS BIGINT)
      |    AS day_offset,
      |  count(*) AS n_users
      |FROM a JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("activity_day"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("activity_day")).as("cohort_day"))
    ev.distinct()
      .join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("activity_day"), col("cohort_day")).cast("long")
          .as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Markov transition matrix over per-user event sequences:
    * (src, dst) counts and row-normalized probabilities. One
    * user-keyed window pass emits consecutive pairs; the transition
    * aggregate lands on the event-type² domain (tiny at any corpus
    * size), so the normalizing join is broadcast-scale by
    * construction. p is a single IEEE division of two exact longs —
    * bit-identical across engines. */
  val q94Transitions: QueryDef = QueryDef.withOracle(
    """WITH o AS (
      |  SELECT user_id, event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS dst
      |  FROM events),
      |t AS (SELECT src, dst, count(*) AS n FROM o
      |      WHERE dst IS NOT NULL GROUP BY 1, 2),
      |s AS (SELECT src, CAST(sum(n) AS BIGINT) AS tot FROM t GROUP BY 1)
      |SELECT t.src, t.dst, t.n,
      |  CAST(t.n AS DOUBLE) / CAST(s.tot AS DOUBLE) AS p
      |FROM t JOIN s USING (src)""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val t = Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val tot = t.groupBy(col("src")).agg(sum(col("n")).as("tot"))
    t.join(broadcast(tot), Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
  }

  /** Hopping (sliding) window rollup: 10-minute windows every 5
    * minutes over the event stream — the overlapping-window sibling
    * of the tumbling q22, via Spark's NATIVE `window(ts, dur, slide)`
    * TimeWindow generator (the operator that carries unchanged to
    * Structured Streaming under a watermark). Each event lands in
    * exactly duration/slide = 2 windows, expanded MAP-SIDE before the
    * partial aggregate, so the shuffle moves pre-combined
    * (window, type) rows — never 2× the events. Value sums ride on
    * integer cents (float-parity convention); the oracle replays the
    * epoch-aligned window arithmetic: starts at multiples of the
    * slide with start ≤ ts < start + duration. */
  val q95Hopping: QueryDef = QueryDef.withOracle(
    """WITH e AS (
      |  SELECT epoch_us(ts) AS us, event_type, value FROM events),
      |w AS (
      |  SELECT event_type, value,
      |    (us // 300000000) * 300000000 - s AS wstart
      |  FROM e, LATERAL (SELECT unnest([0, 300000000]) AS s) g)
      |SELECT CAST(wstart AS BIGINT) AS window_start_us, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS value_cents
      |FROM w GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    // the SHARED streaming/batch aggregate (EventStreams.hoppingCounts):
    // one declarative plan serves both modes, the q83 pattern
    graft.streaming.EventStreams.hoppingCounts(
      Tables.events(s, d).select(col("ts"), col("event_type"), col("value")))
  }

  /** Equi-depth feature binning: per language, 4 document-count-equal
    * buckets of n_chars with per-bucket count and bounds — the
    * feature-engineering discretizer (quantile binning with EXACT
    * bucket populations, where q74's sketch gives approximate
    * boundaries). `ntile` semantics are pinned by ANSI (larger
    * buckets first, assignment by the total order) and the
    * (n_chars, doc_id) tiebreak makes the order total, so both
    * engines bin identically. Scale: one window per group — fine
    * while groups are many/balanced; for few huge groups the scale
    * path is q74's sketch boundaries + a map-side bucket lookup, and
    * this operator IS the exactness reference for that. */
  val q96EquidepthBins: QueryDef = QueryDef.withOracle(
    """WITH b AS (
      |  SELECT lang, n_chars,
      |    ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
      |      AS bucket
      |  FROM documents)
      |SELECT lang, CAST(bucket AS BIGINT) AS bucket, count(*) AS n,
      |  min(n_chars) AS lo, max(n_chars) AS hi
      |FROM b GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("lang"), col("n_chars"),
        ntile(4).over(w).cast("long").as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
  }

  /** Group-wise simple linear regression (price on size, per brand)
    * from EXACT integer moment sums: slope = (nΣxy − ΣxΣy) /
    * (nΣx² − (Σx)²) and the analogous intercept ratio, each a single
    * IEEE division of two exactly-accumulated int64s — merge-order
    * cannot perturb a bit, unlike a float-accumulated regr_slope
    * (the q2o moment-stat convention, extended to the fit itself).
    * One partial+final aggregate; nothing else. Int64 bounds: with
    * cents ≤ 2×10⁷ and x ≤ 50 per row, nΣxy stays < 2⁶³ up to ~10⁹
    * rows per group — document and shard beyond that. */
  val q97GroupRegression: QueryDef = QueryDef.withOracle(
    """WITH m AS (
      |  SELECT p_brand, count(*) AS n,
      |    CAST(sum(p_size) AS BIGINT) AS sx,
      |    CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS sy,
      |    CAST(sum(CAST(p_size AS BIGINT) * p_size) AS BIGINT) AS sxx,
      |    CAST(sum(p_size * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS sxy
      |  FROM part GROUP BY 1)
      |SELECT p_brand, n,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents,
      |  CAST(sy * sxx - sx * sxy AS DOUBLE) /
      |    CAST(n * sxx - sx * sx AS DOUBLE) AS intercept_cents
      |FROM m""".stripMargin
  ) { (s, d) =>
    val cents = floor(col("p_retailprice") * 100 + 0.5).cast("long")
    Tables.part(s, d)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("p_size").cast("long")).as("sx"),
        sum(cents).as("sy"),
        sum(col("p_size").cast("long") * col("p_size")).as("sxx"),
        sum(col("p_size") * cents).as("sxy"))
      .select(col("p_brand"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope_cents"),
        ((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("intercept_cents"))
  }

  /** Time-weighted average (TWAP) per user over irregular samples:
    * each sample's value holds until the next sample, so the mean
    * weights by holding duration, not sample count — the correct
    * average for unevenly-sampled telemetry/prices (a plain avg
    * over-weights bursts). The last sample of a series has no
    * successor and carries zero weight (the standard
    * observed-interval convention).
    *
    * Exactness: cents × µs-duration accumulates in int64 — bounded by
    * max_cents × series-span, ~2.6×10¹⁷ for 10⁵-cent values over a
    * 30-day span, safely under 2⁶³ at any sample count — and TWAP is
    * one IEEE division of the two exact sums. One user-keyed exchange
    * serves the window and the rollup. */
  val q98Twap: QueryDef = QueryDef.withOracle(
    """WITH x AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |d AS (
      |  SELECT user_id, cents,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
      |      AS dur_us
      |  FROM x),
      |g AS (
      |  SELECT user_id,
      |    CAST(sum(cents * dur_us) AS BIGINT) AS num,
      |    CAST(sum(dur_us) AS BIGINT) AS den,
      |    count(*) AS n_samples
      |  FROM d WHERE dur_us IS NOT NULL GROUP BY 1)
      |SELECT user_id,
      |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 100.0 AS twap,
      |  den AS span_us, n_samples
      |FROM g""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("dur_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dur_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("cents") * col("dur_us")).as("num"),
        sum(col("dur_us")).as("den"),
        count(lit(1)).as("n_samples"))
      .select(col("user_id"),
        (col("num").cast("double") / col("den").cast("double") / 100.0)
          .as("twap"),
        col("den").as("span_us"), col("n_samples"))
  }

  /** OHLC bars: per (event_type, hour), the opening/closing values by
    * event time plus the high/low — the resampled candle every
    * time-series store exposes. Open/close are argmin/argmax on the
    * total order (ts, event_id), computed as a STRUCT min/max inside
    * the same hash aggregate as high/low (the q2t pattern: one
    * partial+final agg, no window, no second shuffle); the oracle
    * reaches the same rows with first_value windows. Values are
    * scan-exact doubles — no arithmetic, so parity is bitwise. */
  val q99Ohlc: QueryDef = QueryDef.withOracle(
    """WITH x AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, epoch_us(ts) AS us,
      |    event_id, value
      |  FROM events),
      |w AS (
      |  SELECT *,
      |    first_value(value) OVER
      |      (PARTITION BY event_type, h ORDER BY us, event_id) AS open,
      |    first_value(value) OVER
      |      (PARTITION BY event_type, h ORDER BY us DESC, event_id DESC)
      |      AS close
      |  FROM x)
      |SELECT event_type, CAST(epoch_us(h) AS BIGINT) AS hour_us,
      |  min(open) AS open, max(value) AS high, min(value) AS low,
      |  min(close) AS close, count(*) AS n
      |FROM w GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .groupBy(col("event_type"), col("hour_us"))
      .agg(
        min(struct(col("us"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("us"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("n"))
  }

  /** Variable-length interval coalescing (coverage islands): each
    * event opens a lease of floor(value) minutes; per user, the
    * overlapping-or-touching leases merge into coverage islands, and
    * the islands' complement is the downtime report. This is the
    * TRUE interval-union operator — distinct from gap sessionization
    * (q2b/q2k), whose lag-based break test silently mis-splits when a
    * long interval swallows later short ones. The correct break
    * predicate needs the running MAX of all preceding interval ends,
    * not the previous row's end:
    *   new island ⇔ start > max(end | preceding rows)
    * Three window expressions share one (user)-keyed sort — the q87
    * convention (different frames ⇒ separate Window nodes, still ONE
    * Exchange, PlanSpec-locked). All arithmetic is integer µs
    * (floor(value) is IEEE-exact on identical doubles), so the gate
    * is exact. Touching intervals (start == prior end) merge —
    * half-open [s, e) coverage semantics, pinned by the oracle. */
  val q100IntervalMerge: QueryDef = QueryDef.withOracle(
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + CAST(floor(value) AS BIGINT) * 60000000 AS e
      |  FROM events),
      |m AS (
      |  SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv),
      |f AS (
      |  SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
      |    AS brk
      |  FROM m),
      |g AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
      |    ROWS UNBOUNDED PRECEDING) AS island
      |  FROM f)
      |SELECT user_id, CAST(island AS BIGINT) AS island_idx,
      |  min(s) AS start_us, max(e) AS end_us, count(*) AS n_events
      |FROM g GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) +
          floor(col("value")).cast("long") * 60000000L).as("e"))
      .withColumn("pmax", max(col("e")).over(prev))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("island_idx", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("island_idx"))
      .agg(min(col("s")).as("start_us"), max(col("e")).as("end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Two-proportion z-test per experiment metric (the A/B-test
    * readout): users split into control/treatment by id parity, a
    * "conversion" is an event with value > 100, and per event_type
    * the pooled-variance z statistic decides the winner. One
    * conditional-sum aggregate — a single shuffle on a tiny key
    * domain, partial combine map-side, so the scan dominates at any
    * scale (the shape a metrics platform needs: the scorecard is one
    * pass over the event log regardless of metric count).
    *
    * Cross-engine float parity: every input to the arithmetic is an
    * int64 count; each division, multiply, and sqrt is a single
    * correctly-rounded IEEE op evaluated in the same order in both
    * engines (the q102 convention), so the doubles are bit-identical.
    * Degenerate cells (pooled rate 0 or 1, i.e. se = 0) yield null z
    * rather than ±inf, pinned by the oracle. */
  val q104AbTest: QueryDef = QueryDef.withOracle(
    """WITH c AS (
      |  SELECT event_type,
      |    count(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
      |    count(*) FILTER (WHERE user_id % 2 = 0 AND value > 100) AS x_a,
      |    count(*) FILTER (WHERE user_id % 2 = 1) AS n_b,
      |    count(*) FILTER (WHERE user_id % 2 = 1 AND value > 100) AS x_b
      |  FROM events GROUP BY 1)
      |SELECT event_type, n_a, x_a, n_b, x_b,
      |  CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
      |  CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
      |  CASE WHEN x_a + x_b > 0 AND x_a + x_b < n_a + n_b THEN
      |    (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |      - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |    / sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |        * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
      |  END AS z
      |FROM c""".stripMargin
  ) { (s, d) =>
    val ctl = col("user_id") % 2 === 0
    val conv = col("value") > 100
    val agg = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(when(ctl, 1)).as("n_a"),
        count(when(ctl && conv, 1)).as("x_a"),
        count(when(!ctl, 1)).as("n_b"),
        count(when(!ctl && conv, 1)).as("x_b"))
    val dbl = (c: Column) => c.cast("double")
    val pa = dbl(col("x_a")) / dbl(col("n_a"))
    val pb = dbl(col("x_b")) / dbl(col("n_b"))
    val pool = dbl(col("x_a") + col("x_b")) / dbl(col("n_a") + col("n_b"))
    agg.select(col("event_type"), col("n_a"), col("x_a"),
      col("n_b"), col("x_b"), pa.as("p_a"), pb.as("p_b"),
      when(col("x_a") + col("x_b") > 0 &&
           col("x_a") + col("x_b") < col("n_a") + col("n_b"),
        (pa - pb) / sqrt(pool * (lit(1.0) - pool) *
          (lit(1.0) / dbl(col("n_a")) + lit(1.0) / dbl(col("n_b")))))
        .as("z"))
  }

  /** Robust outlier report per metric: exact median, exact MAD
    * (median absolute deviation), and the count of points beyond
    * 3·1.4826·MAD — the robust-statistics alternative to the z-score
    * anomaly pass (q2l), immune to the outliers it is hunting.
    *
    * Exact medians come from ORDER STATISTICS, not interpolating
    * percentile built-ins: Spark's `percentile` and DuckDB's
    * `quantile_cont` interpolate with differently-associated FP
    * expressions, so their bits can disagree. row_number against the
    * group count picks the middle element(s) — (n+1) div 2 and
    * (n+2) div 2, equal when n is odd — and avg over ≤2 values is
    * (a+b)/2, bit-identical in both engines. Both the median and the
    * MAD pass run this selection; the deviation input |v − med| and
    * the 4.4478·mad threshold are single correctly-rounded ops.
    *
    * Scale: the selection sorts WITHIN each group (per-group window,
    * groups in parallel — the q96 equi-depth convention). Group
    * cardinality bounds single-task size here (5 types × n/5 rows);
    * for huge single groups the exact path degrades to a per-group
    * sort and q74's approx sketch is the right tool — exactness is
    * this operator's contract. */
  val q105MadOutliers: QueryDef = QueryDef.withOracle(
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |med AS (
      |  SELECT event_type, avg(value) AS med FROM r
      |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      |  GROUP BY 1),
      |dev AS (
      |  SELECT r.event_type, abs(r.value - m.med) AS adev, m.med,
      |    row_number() OVER (PARTITION BY r.event_type
      |      ORDER BY abs(r.value - m.med), r.rn) AS drn,
      |    count(*) OVER (PARTITION BY r.event_type) AS n
      |  FROM r JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, avg(adev) AS mad FROM dev
      |  WHERE drn = (n + 1) // 2 OR drn = (n + 2) // 2
      |  GROUP BY 1)
      |SELECT d.event_type, max(d.n) AS n, max(d.med) AS med,
      |  max(a.mad) AS mad,
      |  count(*) FILTER (WHERE d.adev > a.mad * 4.4478) AS n_out
      |FROM dev d JOIN mad a USING (event_type)
      |GROUP BY 1""".stripMargin
  ) { (s, d) =>
    val byType = Window.partitionBy(col("event_type"))
    // cached: consumed by both the median pick and the deviation
    // pass — without it Spark re-scans and re-sorts events per
    // consumer (the q42-sigs convention)
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(
        byType.orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byType))
      .cache()
    val med = ev
      .filter(col("rn") === expr("(n + 1) div 2") ||
              col("rn") === expr("(n + 2) div 2"))
      .groupBy(col("event_type")).agg(avg(col("value")).as("med"))
    // cached for the mad pick + the final count. Under AQE a cached
    // plan reports unknown partitioning, so the deviation sort does
    // re-exchange — two type-keyed shuffles total, the inherent cost
    // of two dependent selection passes (vs 4 scans + 4 shuffles
    // uncached)
    val dev = ev.join(med, "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
      .withColumn("drn", row_number().over(
        byType.orderBy(col("adev"), col("rn"))))
      .cache()
    val mad = dev
      .filter(col("drn") === expr("(n + 1) div 2") ||
              col("drn") === expr("(n + 2) div 2"))
      .groupBy(col("event_type")).agg(avg(col("adev")).as("mad"))
    dev.join(mad, "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        count(when(col("adev") > col("mad") * 4.4478, 1)).as("n_out"))
  }

  /** Growth accounting (the DAU decomposition): every active
    * (user, day) is classified new / retained / resurrected, and a
    * churn event is emitted the day after an activity gap opens —
    * n_new − n_churned telescopes to the DAU delta, the identity
    * product analytics runs on.
    *
    * ONE user-keyed exchange carries all three window stages (the
    * q87 fusion): day-first flags over the raw event order, then —
    * filters preserve partitioning — prev/next-day lags over the
    * per-day rows only. Day-level rows then union with the shifted
    * churn emissions into a single (day)-keyed count, so the whole
    * report is two shuffles regardless of corpus size. A user's
    * trailing churn (after their last active day) lands at
    * last_day + 1 — one day past the observation window for users
    * active through the end, kept deliberately: dropping it would
    * need a global max-date and would undercount churn on the final
    * day. */
  val q106GrowthAccounting: QueryDef = QueryDef.withOracle(
    """WITH ad AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events),
      |c AS (
      |  SELECT user_id, day,
      |    lag(day)  OVER w AS prev_day,
      |    lead(day) OVER w AS next_day
      |  FROM ad WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |act AS (
      |  SELECT day,
      |    CASE WHEN prev_day IS NULL THEN 'new'
      |         WHEN day - prev_day = 1 THEN 'retained'
      |         ELSE 'resurrected' END AS cls
      |  FROM c),
      |chn AS (
      |  SELECT day + 1 AS day, 'churned' AS cls FROM c
      |  WHERE next_day IS NULL OR next_day - day > 1),
      |u AS (SELECT * FROM act UNION ALL SELECT * FROM chn)
      |SELECT day,
      |  count(*) FILTER (WHERE cls = 'new') AS n_new,
      |  count(*) FILTER (WHERE cls = 'retained') AS n_retained,
      |  count(*) FILTER (WHERE cls = 'resurrected') AS n_resurrected,
      |  count(*) FILTER (WHERE cls = 'churned') AS n_churned
      |FROM u GROUP BY 1""".stripMargin
  ) { (s, d) =>
    val wEv = Window.partitionBy(col("user_id"))
      .orderBy(col("day"), col("event_id"))
    val wDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_id"))
      // day-first flag: distinct (user, day) WITHOUT a second
      // exchange — the lag runs on the same user partitioning the
      // day-level windows need
      .withColumn("df", !(lag(col("day"), 1).over(wEv) <=> col("day")))
      .filter(col("df"))
      .withColumn("prev_day", lag(col("day"), 1).over(wDay))
      .withColumn("next_day", lead(col("day"), 1).over(wDay))
    // both emissions ride ONE pass: a two-branch union would compute
    // the windowed frame twice, so each day-row explodes into its
    // activity class plus (when a gap opens) the shifted churn event
    val actCls = when(col("prev_day").isNull, "new")
      .when(datediff(col("day"), col("prev_day")) === 1, "retained")
      .otherwise("resurrected")
    val churns = when(
      col("next_day").isNull || datediff(col("next_day"), col("day")) > 1,
      array(struct(date_add(col("day"), 1).as("day"),
        lit("churned").as("cls"))))
      .otherwise(array().cast("array<struct<day:date,cls:string>>"))
    days
      .select(explode(concat(
        array(struct(col("day").as("day"), actCls.as("cls"))),
        churns)).as("e"))
      .select(col("e.day").as("day"), col("e.cls").as("cls"))
      .groupBy(col("day"))
      .agg(count(when(col("cls") === "new", 1)).as("n_new"),
        count(when(col("cls") === "retained", 1)).as("n_retained"),
        count(when(col("cls") === "resurrected", 1)).as("n_resurrected"),
        count(when(col("cls") === "churned", 1)).as("n_churned"))
  }

  /** Last-touch marketing attribution with a bounded lookback: each
    * purchase credits the user's most recent click/view touch within
    * 7 days; purchases with no touch in the window credit 'direct'.
    * Revenue rides integer cents (float-parity convention).
    *
    * The engine shape is the as-of composition (one union shuffle +
    * carry window — never purchases × touches), then a POST-FILTER
    * nulls out stale matches: the lookback bound cannot ride in the
    * as-of itself, but because the carry is a single struct per
    * matched row, aging out a match reverts type and timestamp
    * TOGETHER — no half-attributed rows. The channel rollup lands on
    * the touch-type domain (tiny) with map-side combine. */
  val q107Attribution: QueryDef = QueryDef.withOracle(
    """WITH t0 AS (
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us,
      |    event_type AS touch, event_id
      |  FROM events WHERE event_type IN ('click', 'view')),
      |t AS (
      |  SELECT user_id, t_us, max_by(touch, event_id) AS touch
      |  FROM t0 GROUP BY user_id, t_us),
      |p AS (
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |m AS (
      |  SELECT p.user_id, p.ts_us, p.cents, t.touch, t.t_us
      |  FROM p ASOF LEFT JOIN t
      |    ON p.user_id = t.user_id AND p.ts_us >= t.t_us),
      |a AS (
      |  SELECT cents,
      |    CASE WHEN touch IS NOT NULL
      |           AND ts_us - t_us <= 604800000000 THEN touch
      |         ELSE 'direct' END AS channel
      |  FROM m)
      |SELECT channel, count(*) AS n_purchases,
      |  CAST(sum(cents) AS BIGINT) AS revenue_cents
      |FROM a GROUP BY 1""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_type").as("touch"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    // the event_id tiebreak makes the same-µs touch pick deterministic
    // (max event_id wins) WITHIN the existing carry sort — no extra
    // shuffle; the oracle states the same rule as a max_by collapse
    graft.functions.AsOfJoin.asof(
      purchases, touches, Seq("user_id"), "ts_us", "t_us",
      Seq("touch" -> "touch", "t_us" -> "touch_us"),
      rightTiebreak = Some("event_id"))
      .select(col("cents"),
        when(col("touch").isNotNull &&
          col("ts_us") - col("touch_us") <= 604800000000L, col("touch"))
          .otherwise("direct").as("channel"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_cents"))
  }

  /** Linear multi-touch attribution — q107's last-touch sibling and
    * the other half of the standard attribution pair: every touch
    * (click/view) inside the 7-day lookback of a purchase shares the
    * conversion credit equally (1/n of the conversion, 1/n of the
    * cents); purchases with no qualifying touch credit 'direct' in
    * full.
    *
    * Parity: per-touch credit is EXACT INTEGER division in
    * micro-units (cents·10⁶ div n, 10⁶ div n) and the channel rollup
    * sums exact ints, so no order-dependent float ever forms; the
    * display doubles are one division each. (Integer division
    * under-credits a conversion by < n micro-units — the documented
    * quantization, not drift.) DuckDB `//` FLOORS while Spark `div`
    * truncates toward zero — identical only on non-negative
    * dividends, so purchases are explicitly restricted to value ≥ 0
    * on BOTH sides: a negative purchase is a refund, not a
    * conversion, and attribution models credit conversions.
    *
    * Scale shape (rewritten round 9 after the planted-skew sweep):
    * JOINLESS. The r8 shape was a user-keyed purchase×touch
    * equi-join — per-user activity² fan-out, and the adversarial
    * replica (one user owning 1% of all events) measured the cliff
    * at 15.9× (2.9 → 45.9 s at sf10). The credit formula only needs
    * per-(purchase, channel) COUNTS, and a windowed count is a
    * difference of two cumulative counts, so the pairing is now the
    * q107/q119 as-of idiom: touch markers ∪ two probe rows per
    * purchase, ONE (user, channel)-keyed running-count window,
    * per-purchase prefix differences, purchase-keyed rollups.
    * Linear in events regardless of per-user density — a bot-grade
    * hot user costs one big (but n·log n, single-pass) window
    * partition instead of an n² pair stream. */
  val q131MultiTouch: QueryDef = QueryDef.withOracle(
    """WITH t AS (
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us,
      |    event_type AS channel
      |  FROM events WHERE event_type IN ('click', 'view')),
      |p AS (
      |  SELECT event_id AS p_id, user_id,
      |    CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' AND value >= 0),
      |pairs AS (
      |  SELECT p.p_id, p.cents, t.channel
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.t_us <= p.ts_us AND t.t_us >= p.ts_us - 604800000000),
      |n AS (SELECT p_id, count(*) AS n_touch FROM pairs GROUP BY 1),
      |credited AS (
      |  SELECT pairs.channel,
      |    1000000 // n.n_touch AS conv_fp,
      |    (pairs.cents * 1000000) // n.n_touch AS rev_fp
      |  FROM pairs JOIN n USING (p_id)
      |  UNION ALL
      |  SELECT 'direct' AS channel, 1000000 AS conv_fp,
      |    p.cents * 1000000 AS rev_fp
      |  FROM p LEFT JOIN n ON n.p_id = p.p_id
      |  WHERE n.p_id IS NULL)
      |SELECT channel,
      |  CAST(sum(conv_fp) AS BIGINT) AS conversions_fp,
      |  CAST(sum(rev_fp) AS BIGINT) AS revenue_fp,
      |  CAST(sum(conv_fp) AS DOUBLE) / 1000000 AS conversions,
      |  CAST(sum(rev_fp) AS DOUBLE) / 100000000 AS revenue
      |FROM credited GROUP BY 1""".stripMargin
  ) { (s, d) =>
    // JOINLESS (round-9 skew fix): the user-keyed purchase×touch
    // equi-join materializes every (purchase, touch-in-window) pair —
    // quadratic in any one user's event density, and the planted-skew
    // sweep measured the cliff (one user with 1% of all events:
    // 2.9 s → 45.9 s at sf10). The credit formula only needs COUNTS
    // per (purchase, channel), and counts over a time window are a
    // difference of two cumulative counts — so this runs the q107/
    // q119 as-of idiom instead: union per-channel touch markers with
    // two probe rows per purchase (window start/end), one
    // (user, channel)-keyed running count, then per-purchase
    // differences. Cost is ONE window sort over events + purchase-
    // keyed rollups: linear in events regardless of per-user density
    // (hot-key ratio back to ~1, same hash). Tie discipline: probes
    // at the window END sort AFTER coincident touches (inclusive
    // upper bound), probes at the START sort BEFORE them (inclusive
    // lower bound: cum_lo counts strictly-earlier touches).
    val ev = Tables.events(s, d)
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("channel"),
        unix_micros(col("ts")).as("t"), lit(1).as("rk"),
        lit(1L).as("is_touch"), lit(null).cast("long").as("p_id"),
        lit(null).cast("long").as("cents"))
    val purchases = ev
      .filter(col("event_type") === "purchase" && col("value") >= 0)
      .select(col("event_id").as("p_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val probes = purchases.select(col("user_id"), col("p_id"), col("cents"),
        col("ts_us"),
        explode(expr(
          "array(named_struct('channel', 'click', 'rk', 0), " +
            "named_struct('channel', 'click', 'rk', 2), " +
            "named_struct('channel', 'view', 'rk', 0), " +
            "named_struct('channel', 'view', 'rk', 2))")).as("pr"))
      .select(col("user_id"), col("pr.channel").as("channel"),
        when(col("pr.rk") === 0, col("ts_us") - 604800000000L)
          .otherwise(col("ts_us")).as("t"),
        col("pr.rk").as("rk"), lit(0L).as("is_touch"),
        col("p_id"), col("cents"))
    val cum = touches.unionByName(probes)
      .withColumn("cum", sum(col("is_touch")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("channel"))
          .orderBy(col("t"), col("rk"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
    val perChannel = cum.filter(col("rk") =!= 1)
      .groupBy(col("p_id"), col("cents"), col("channel"))
      .agg((max(when(col("rk") === 2, col("cum"))) -
        max(when(col("rk") === 0, col("cum")))).as("c"))
    val nt = perChannel.groupBy(col("p_id"), col("cents"))
      .agg(sum(col("c")).as("n_touch"))
    val credited = perChannel.filter(col("c") > 0)
      .join(nt.select(col("p_id"), col("n_touch")), Seq("p_id"))
      .select(col("channel"),
        (col("c") * expr("1000000 div n_touch")).as("conv_fp"),
        (col("c") * expr("(cents * 1000000) div n_touch")).as("rev_fp"))
      .unionByName(nt.filter(col("n_touch") === 0)
        .select(lit("direct").as("channel"),
          lit(1000000L).as("conv_fp"),
          (col("cents") * 1000000L).as("rev_fp")))
    credited.groupBy(col("channel"))
      .agg(sum(col("conv_fp")).as("conversions_fp"),
        sum(col("rev_fp")).as("revenue_fp"))
      .select(col("channel"), col("conversions_fp"), col("revenue_fp"),
        (col("conversions_fp").cast("double") / 1000000).as("conversions"),
        (col("revenue_fp").cast("double") / 100000000).as("revenue"))
  }

  val all: Map[String, QueryDef] = Map(
    "q131_multi_touch" -> q131MultiTouch,
    "q92_skyline" -> q92Skyline,
    "q93_retention" -> q93Retention,
    "q94_transitions" -> q94Transitions,
    "q95_hopping" -> q95Hopping,
    "q96_equidepth_bins" -> q96EquidepthBins,
    "q97_group_regression" -> q97GroupRegression,
    "q98_twap" -> q98Twap,
    "q99_ohlc" -> q99Ohlc,
    "q100_interval_merge" -> q100IntervalMerge,
    "q104_ab_test" -> q104AbTest,
    "q105_mad_outliers" -> q105MadOutliers,
    "q106_growth_accounting" -> q106GrowthAccounting,
    "q107_attribution" -> q107Attribution
  )
}
