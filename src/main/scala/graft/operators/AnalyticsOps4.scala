package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Fourth analytics tranche (SURVEY §2.11): inequality / distribution
  * statistics and engagement scorecards a production analytics engine
  * owes beyond the moment/rank suites — Gini concentration, weighted
  * medians, DAU/MAU stickiness, proportion confidence intervals.
  *
  * All follow the repo float-parity conventions (README / SURVEY §6):
  * exact int64 arithmetic up to ONE final IEEE expression written in
  * the identical op order in both engines, rank/threshold-based picks
  * instead of engine-specific interpolation, and the two-phase
  * range-partitioned prefix pattern wherever a global order over a
  * data-sized frame is needed (never a single-reducer window).
  */
object AnalyticsOps4 {

  /** Gini coefficient of customer spend per market segment — the
    * revenue-concentration scorecard (who owns the tail matters for
    * sampling weights and fairness audits alike). Rank-sum identity
    * on ascending spend:
    *
    *   G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx),  x ascending, i = 1..n
    *
    * Σ i·xᵢ is invariant to how ties are ordered (a tie block's ranks
    * sum to a constant), so the custkey tiebreak only pins
    * determinism, not the value. Numerator and denominator stay exact
    * int64 (bound: Σ i·x ≤ n²·x̄ — int64-safe through n ≈ 3·10⁶ at
    * ~$1k average spend; beyond, pre-divide cents by a common 10ᵏ,
    * the q2o convention); the final G is ONE IEEE division.
    *
    * Scale shape: spend rollup is one custkey partial+final
    * aggregate; the segment attach is a key equi-join; the per-
    * segment rank is the GROUPED two-phase prefix (segment leads the
    * range key — `Window.partitionBy(segment)` over 5 segment values
    * would be 5 single-reducer sorts); the finish is a 5-row rollup. */
  val q134Gini: QueryDef = QueryDef.withOracle(
    """WITH s AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |x AS (
      |  SELECT c.c_mktsegment AS segment, s.cents, s.o_custkey
      |  FROM s JOIN customer c ON c.c_custkey = s.o_custkey),
      |r AS (
      |  SELECT segment, cents,
      |    row_number() OVER (PARTITION BY segment
      |      ORDER BY cents, o_custkey) AS i
      |  FROM x),
      |g AS (
      |  SELECT segment, count(*) AS n_customers,
      |    CAST(sum(cents) AS BIGINT) AS total_cents,
      |    CAST(sum(i * cents) AS BIGINT) AS swi
      |  FROM r GROUP BY 1)
      |SELECT segment, n_customers, total_cents,
      |  CAST(2 * swi - (n_customers + 1) * total_cents AS DOUBLE)
      |    / CAST(n_customers * total_cents AS DOUBLE) AS gini
      |FROM g""".stripMargin
  ) { (s, d) =>
    val spend = Tables.orders(s, d)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("c0"))
      .groupBy(col("o_custkey")).agg(sum(col("c0")).as("cents"))
    val x = spend.join(
      Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment")),
      Seq("o_custkey"))
    val r = AnalyticsOps2.groupedPrefixSum(x, Seq("segment"),
      Seq(col("cents"), col("o_custkey")), lit(1L), "i", "__n")
    r.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("total_cents"),
        sum(col("i") * col("cents")).as("swi"))
      .select(col("segment"), col("n_customers"), col("total_cents"),
        ((lit(2L) * col("swi") -
          (col("n_customers") + 1) * col("total_cents")).cast("double") /
          (col("n_customers") * col("total_cents")).cast("double"))
          .as("gini"))
  }

  /** Quantity-weighted median extended price per return flag — the
    * volume-weighted price statistic (the plain median over-weights
    * one-unit lines). LOWER weighted median by integer threshold:
    * the smallest price whose inclusive cumulative weight reaches
    * T = (W+1) div 2 — an actual price from the data, no
    * interpolation, and the threshold is exact int math in both
    * engines.
    *
    * Scale shape: the (flag, price) compression aggregate collapses
    * lineitem to its distinct-price frame FIRST (one partial+final
    * exchange); the cumulative weight is the grouped two-phase prefix
    * over that frame (flag has 3 values — a flag-partitioned window
    * would be 3 single tasks); the crossing pick and final rollup are
    * metadata-sized. */
  val q135WeightedMedian: QueryDef = QueryDef.withOracle(
    """WITH b AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
      |  FROM lineitem),
      |g AS (
      |  SELECT flag, cents, CAST(sum(w) AS BIGINT) AS w
      |  FROM b GROUP BY 1, 2),
      |c AS (
      |  SELECT flag, cents, w,
      |    CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS total_w
      |  FROM g)
      |SELECT flag, total_w,
      |  CAST(min(cents) AS BIGINT) AS wmedian_cents,
      |  CAST(min(cents) AS DOUBLE) / 100.0 AS wmedian
      |FROM c
      |WHERE cum >= (total_w + 1) // 2 AND cum - w < (total_w + 1) // 2
      |GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    val g = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
        floor(col("l_quantity") + 0.5).cast("long").as("w0"))
      .groupBy(col("flag"), col("cents")).agg(sum(col("w0")).as("w"))
    val c = AnalyticsOps2.groupedPrefixSum(g, Seq("flag"),
      Seq(col("cents")), col("w"), "cum", "total_w")
    val t = expr("(total_w + 1) div 2")
    c.filter(col("cum") >= t && col("cum") - col("w") < t)
      .groupBy(col("flag"), col("total_w"))
      .agg(min(col("cents")).as("wmedian_cents"))
      .select(col("flag"), col("total_w"), col("wmedian_cents"),
        (col("wmedian_cents").cast("double") / 100.0).as("wmedian"))
  }

  /** DAU/MAU stickiness — the engagement ratio every growth dashboard
    * leads with: for each calendar day, distinct active users that
    * day over distinct active users in that day's CALENDAR month
    * (calendar, not trailing-28 — the month variant needs only two
    * dedup aggregates and one metadata join; a trailing window would
    * be a distinct-over-sliding-range, which is q2d's territory).
    *
    * Cross-engine: day = CAST(ts AS DATE) under the UTC session;
    * month = first day of that month via exact epoch-day int math is
    * avoided — both engines truncate DATE→month identically
    * (date_trunc / trunc). Stickiness is ONE IEEE division of exact
    * counts.
    *
    * Scale shape: one (day, user) dedup aggregate (partial+final —
    * the map side dedups within partition first), from which the
    * (month, user) dedup and both counts derive; the month attach is
    * a broadcast of the ≤ |months|-row MAU frame. */
  val q136DauMau: QueryDef = QueryDef.withOracle(
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (
      |  SELECT day, date_trunc('month', day) AS month,
      |    count(*) AS dau
      |  FROM du GROUP BY 1, 2),
      |mau AS (
      |  SELECT date_trunc('month', day) AS month,
      |    count(DISTINCT user_id) AS mau
      |  FROM du GROUP BY 1)
      |SELECT CAST(dau.day AS DATE) AS day, dau.dau, mau.mau,
      |  CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
      |FROM dau JOIN mau USING (month)""".stripMargin
  ) { (s, d) =>
    val du = Tables.events(s, d)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct()
    val dau = du.groupBy(col("day"), trunc(col("day"), "month").as("month"))
      .agg(count(lit(1)).as("dau"))
    val mau = du.groupBy(trunc(col("day"), "month").as("month"))
      .agg(countDistinct(col("user_id")).as("mau"))
    dau.join(broadcast(mau), Seq("month"))
      .select(col("day"), col("dau"), col("mau"),
        (col("dau").cast("double") / col("mau")).as("stickiness"))
  }

  /** Wilson score intervals for the per-type event-share proportions
    * — the uncertainty-aware companion to the raw mix (q117 flags
    * drift; this says how sure the mix estimate is, which is what a
    * sampling-ratio decision actually needs). z = 1.96 (95%):
    *
    *   center = (p̂ + z²/2n) / (1 + z²/n)
    *   half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)
    *
    * p̂ = k/n is ONE IEEE division of exact counts; the formula is
    * written in the IDENTICAL op order in both engines (division,
    * multiply, sqrt are all correctly-rounded IEEE, so same inputs +
    * same order = same bits).
    *
    * Scale shape: one partial+final count aggregate over the scan;
    * the total attaches as a broadcast 1-row frame; everything after
    * is a ≤|types|-row projection. */
  val q137WilsonCi: QueryDef = QueryDef.withOracle(
    """WITH c AS (
      |  SELECT event_type, count(*) AS k FROM events GROUP BY 1),
      |t AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM c)
      |SELECT event_type, k, n,
      |  CAST(k AS DOUBLE) / n AS p_hat,
      |  (CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2 * n))
      |    / (1 + 1.96 * 1.96 / n)
      |    - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
      |        * (1 - CAST(k AS DOUBLE) / n) / n
      |        + 1.96 * 1.96 / (4.0 * n * n))
      |      / (1 + 1.96 * 1.96 / n) AS wilson_lo,
      |  (CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2 * n))
      |    / (1 + 1.96 * 1.96 / n)
      |    + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
      |        * (1 - CAST(k AS DOUBLE) / n) / n
      |        + 1.96 * 1.96 / (4.0 * n * n))
      |      / (1 + 1.96 * 1.96 / n) AS wilson_hi
      |FROM c CROSS JOIN t""".stripMargin
  ) { (s, d) =>
    val c = Tables.events(s, d)
      .groupBy(col("event_type")).agg(count(lit(1)).as("k"))
    val t = c.agg(sum(col("k")).as("n"))
    val p = col("k").cast("double") / col("n")
    val z2n = lit(1.96) * lit(1.96) / col("n")
    val denom = lit(1) + z2n
    val center = (p + lit(1.96) * lit(1.96) / (lit(2) * col("n"))) / denom
    val half = lit(1.96) * sqrt(p * (lit(1) - p) / col("n") +
      lit(1.96) * lit(1.96) / (lit(4.0) * col("n") * col("n"))) / denom
    c.crossJoin(broadcast(t))
      .select(col("event_type"), col("k"), col("n"),
        p.as("p_hat"),
        (center - half).as("wilson_lo"),
        (center + half).as("wilson_hi"))
  }

  /** Calibration curve for the purchase-propensity score — q115's AUC
    * says the score RANKS well; this says whether its LEVELS mean
    * anything: rank-deciles of the score vs the observed purchase
    * rate inside each decile (the reliability diagram's table form).
    * Decile = ((rank−1)·10) div n over the GLOBAL score order —
    * exact integer math on the q112/q115 two-phase global rank, no
    * quantile interpolation; per-decile mean score sums exact cents;
    * the two rates are one IEEE division each.
    *
    * Scale shape: globalRowNumber's range-partitioned two-phase rank
    * (never a single-task window), one decile rollup, broadcast
    * 1-row total. */
  val q151ScoreCalibration: QueryDef = QueryDef.withOracle(
    """WITH t AS (
      |  SELECT event_id, value AS score,
      |    CAST(event_type = 'purchase' AS BIGINT) AS y,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY score, event_id) AS rn,
      |    count(*) OVER () AS n FROM t)
      |SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS decile,
      |  count(*) AS n_events,
      |  CAST(sum(y) AS BIGINT) AS n_pos,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  CAST(sum(cents) AS DOUBLE) / 100 / count(*) AS mean_score,
      |  CAST(sum(y) AS DOUBLE) / count(*) AS purchase_rate
      |FROM r GROUP BY 1""".stripMargin
  ) { (s, d) =>
    val t = Tables.events(s, d).select(col("event_id"),
      col("value").as("score"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val ranked = AnalyticsOps2.globalRowNumber(t,
      Seq(col("score"), col("event_id")), "rn")
    val tot = t.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(tot))
      .groupBy(expr("(rn - 1) * 10 div n").as("decile"))
      .agg(count(lit(1)).as("n_events"), sum(col("y")).as("n_pos"),
        sum(col("cents")).as("sum_cents"))
      .select(col("decile"), col("n_events"), col("n_pos"),
        col("sum_cents"),
        (col("sum_cents").cast("double") / 100 / col("n_events"))
          .as("mean_score"),
        (col("n_pos").cast("double") / col("n_events")).as("purchase_rate"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between the
    * even-id and odd-id halves of the event value distribution — the
    * nonparametric drift test beside q117's χ² (χ² needs bins; KS
    * compares whole CDFs):
    *
    *   KS = max over distinct scores x of |F₁(x) − F₂(x)|
    *
    * computed EXACTLY: per-score counts collapse the stream to its
    * distinct-score frame; both cumulative counts come from ONE
    * range-partitioned two-phase prefix pass (the q115 shape, carrying
    * two running sums over the same partition stamp); the CDF gap is
    * the cross-multiplied integer |c₁·N₂ − c₂·N₁| — no per-row
    * division, so max() compares exact int64 (bound: N₁·N₂ < 2⁶³
    * holds through ~3·10⁹ rows per side; beyond, pre-divide the
    * counts by a common 2ᵏ — the q2o convention). The final KS is ONE
    * IEEE division.
    *
    * A deterministic id-parity split, not a random one: the gate
    * needs identical halves in both engines, and parity is as
    * arbitrary as any hash for synthetic drift detection (a real
    * deployment splits by time window — swap the predicate). */
  val q153KsDrift: QueryDef = QueryDef.withOracle(
    """WITH t AS (
      |  SELECT value AS score, CAST(event_id % 2 AS BIGINT) AS grp
      |  FROM events),
      |g AS (
      |  SELECT score,
      |    CAST(sum(1 - grp) AS BIGINT) AS n1,
      |    CAST(sum(grp) AS BIGINT) AS n2
      |  FROM t GROUP BY 1),
      |c AS (
      |  SELECT score,
      |    CAST(sum(n1) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS c1,
      |    CAST(sum(n2) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS c2
      |  FROM g),
      |tot AS (
      |  SELECT CAST(sum(n1) AS BIGINT) AS na, CAST(sum(n2) AS BIGINT) AS nb
      |  FROM g)
      |SELECT na, nb,
      |  CAST(max(abs(c1 * nb - c2 * na)) AS BIGINT) AS ks_num,
      |  CAST(max(abs(c1 * nb - c2 * na)) AS DOUBLE) / na / nb AS ks
      |FROM c CROSS JOIN tot GROUP BY na, nb""".stripMargin
  ) { (s, d) =>
    val g = Tables.events(s, d)
      .select(col("value").as("score"),
        (col("event_id") % 2).cast("long").as("grp"))
      .groupBy(col("score"))
      .agg(sum(lit(1L) - col("grp")).as("n1"), sum(col("grp")).as("n2"))
    // both CDFs + both totals from ONE call of the TESTED N-measure
    // two-phase prefix helper (TwoPhasePrefixSpec pins it): one range
    // shuffle, one pinned partition stamp, one physical Window node
    // carrying both running sums — a second groupedPrefixSum call
    // would pay a second range shuffle + cache for the same order
    val c = AnalyticsOps2.groupedPrefixSums(g, Seq.empty,
      Seq(col("score")),
      Seq((col("n1"), "c1", Some("na")), (col("n2"), "c2", Some("nb"))))
    c.groupBy(col("na"), col("nb"))
      .agg(max(abs(col("c1") * col("nb") - col("c2") * col("na")))
        .as("ks_num"))
      .select(col("na"), col("nb"), col("ks_num"),
        (col("ks_num").cast("double") / col("na") / col("nb")).as("ks"))
  }

  val all: Map[String, QueryDef] = Map(
    "q153_ks_drift" -> q153KsDrift,
    "q151_score_calibration" -> q151ScoreCalibration,
    "q134_gini" -> q134Gini,
    "q135_weighted_median" -> q135WeightedMedian,
    "q136_dau_mau" -> q136DauMau,
    "q137_wilson_ci" -> q137WilsonCi
  )
}
