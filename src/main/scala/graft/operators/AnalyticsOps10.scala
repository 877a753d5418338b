package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 tranche four: the resampling-inference and corpus-law
  * operators — Poisson bootstrap (THE single-pass bootstrap for
  * cluster-scale data: per-row independent Poisson(1) weights replace
  * the multinomial draw, so B replicates ride one scan instead of B
  * shuffled resamples), delete-one-bucket jackknife (the standard
  * variance estimator for RATIO metrics, where per-row CLT does not
  * apply because numerator and denominator are correlated), Heaps'
  * vocabulary-growth law (the corpus diagnostic that says how vocab
  * scales with tokens — the planning input for q194's budgets and
  * q210's OOV projections, beside q129's Zipf rank law), and one-way
  * ANOVA (the k-group mean-difference F test that closes the
  * hypothesis-test family: q104 two-sample t, q205 rank-sum, q117/q153
  * distribution drift — this is the parametric k-sample member).
  *
  * Cross-engine conventions as everywhere: deterministic randomness is
  * the shared 60-bit md5 recipe (q91/q193 — both engines hash the same
  * string and scale by 2^60, an exact power-of-two division, so u is
  * bit-identical); exact int64/decimal(38,0)/HUGEINT count and moment
  * sums (q172); order-dependent float terms quantize to 1e-9 fixed
  * point per CELL before any sum (q158 — int64 sums are
  * merge-order-free); one final division; identical IEEE op order in
  * both engines.
  */
object AnalyticsOps10 {

  private val dec = (c: Column) => c.cast("decimal(38,0)")

  /** The 60-bit md5 hash shared with q91/q193/q198 (DuckDB:
    * ('0x' || substring(md5(x), 1, 15))::BIGINT) — non-negative, so
    * % == pmod and both engines draw the SAME pseudo-randomness. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Poisson(1) inverse CDF over a uniform u — the per-(row, replicate)
    * bootstrap weight. Thresholds are the exact cumulative e^{-1}/k!
    * partial sums as 17-digit literals: both engines parse the same
    * text to the same double and compare the same bit-identical u, so
    * the drawn weight is deterministic. Truncated at 7 (P(w>7) ≈ 1e-5;
    * the truncation is part of the spec'd mechanism, identically
    * applied in both engines). */
  private def poissonW(u: Column): Column =
    when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238463, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .when(u < 0.999916758850712, 6L)
      .otherwise(7L)

  private val poissonCaseSql: String =
    """CASE WHEN u < 0.36787944117144233 THEN 0
      |         WHEN u < 0.7357588823428847 THEN 1
      |         WHEN u < 0.9196986029286058 THEN 2
      |         WHEN u < 0.9810118431238463 THEN 3
      |         WHEN u < 0.9963401531726563 THEN 4
      |         WHEN u < 0.9994058151824183 THEN 5
      |         WHEN u < 0.999916758850712 THEN 6
      |         ELSE 7 END""".stripMargin

  /** Poisson-bootstrap confidence interval for the mean event value —
    * the bootstrap that actually runs at 100 TB: a classical bootstrap
    * draws B multinomial resamples (B full shuffles of the corpus); the
    * Poisson approximation (Chamandy et al., "Estimating Uncertainty
    * for Massive Data Streams", Google 2012) gives each row an
    * INDEPENDENT Poisson(1) weight per replicate, so all B=32
    * replicates ride ONE scan with a map-side-combined 32-cell
    * aggregate. Weights are deterministic: u = md5(event_id:r)/2^60
    * (bit-identical in both engines), inverse-CDF'd through exact
    * threshold literals.
    *
    * Readout: the exact point mean, the bootstrap mean-of-means and SE
    * (1e-9 fixed-point over the 32-cell frame — order-free), and the
    * rank-based percentile interval (2nd smallest / 2nd largest
    * replicate mean ≈ 3.1/96.9 percentiles at B=32; ranks over
    * bit-identical doubles with a replicate-id tiebreak are
    * deterministic).
    *
    * Scale shape: one events pass exploded ×32 into a hash aggregate
    * keyed on the replicate id — partial aggregation collapses each
    * task to ≤32 cells before the shuffle, so the exchange carries
    * 32·P rows regardless of data size; a second plain pass for the
    * exact point estimate; everything downstream is on the 32-row
    * frame. The only window is a row_number over those 32 rows. */
  val q217PoissonBootstrap: QueryDef = QueryDef.withOracle(
    s"""WITH ev AS (
      |  SELECT event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |w AS (
      |  SELECT r, cents,
      |    $poissonCaseSql AS wt
      |  FROM (
      |    SELECT g.r, ev.cents,
      |      ('0x' || substring(md5(CAST(ev.event_id AS VARCHAR) || ':'
      |          || CAST(g.r AS VARCHAR)), 1, 15))::BIGINT
      |        / 1152921504606846976.0 AS u
      |    FROM ev CROSS JOIN
      |      (SELECT unnest(generate_series(0, 31)) AS r) g)),
      |rep AS (
      |  SELECT r, CAST(sum(wt) AS BIGINT) AS sw,
      |    sum(CAST(wt * cents AS HUGEINT)) AS swc
      |  FROM w GROUP BY 1),
      |ms AS (
      |  SELECT r, CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE) AS m FROM rep),
      |pt AS (
      |  SELECT count(*) AS n_events,
      |    sum(CAST(cents AS HUGEINT)) AS sc FROM ev),
      |mb AS (
      |  SELECT CAST(sum(CAST(floor(m * 1000000000 + 0.5) AS BIGINT))
      |    AS BIGINT) AS mfp FROM ms),
      |sd AS (
      |  SELECT CAST(sum(CAST(floor((m - (CAST(mfp AS DOUBLE) / 32)
      |      / 1000000000) * (m - (CAST(mfp AS DOUBLE) / 32) / 1000000000)
      |      * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS vfp
      |  FROM ms CROSS JOIN mb),
      |rk AS (
      |  SELECT m, row_number() OVER (ORDER BY m, r) AS rn FROM ms)
      |SELECT n_events,
      |  CAST(sc AS DOUBLE) / CAST(n_events AS DOUBLE) AS point_mean,
      |  (CAST(mfp AS DOUBLE) / 32) / 1000000000 AS boot_mean,
      |  sqrt((CAST(vfp AS DOUBLE) / 31) / 1000000000) AS boot_se,
      |  (SELECT m FROM rk WHERE rn = 2) AS ci_lo,
      |  (SELECT m FROM rk WHERE rn = 31) AS ci_hi
      |FROM pt CROSS JOIN mb CROSS JOIN sd""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val u = h60(concat(col("event_id").cast("string"), lit(":"),
      col("r").cast("string"))).cast("double") /
      lit(1.152921504606846976e18)
    val rep = ev
      .select(col("event_id"), col("cents"),
        explode(sequence(lit(0), lit(31))).as("r"))
      .select(col("r"), col("cents"), poissonW(u).as("wt"))
      .groupBy(col("r"))
      .agg(sum(col("wt")).as("sw"),
        sum(dec(col("wt") * col("cents"))).as("swc"))
    val ms = rep
      .select(col("r"),
        (col("swc").cast("double") / col("sw").cast("double")).as("m"))
      .cache() // 32 rows feed mean, SE, and both rank picks
    val pt = ev.agg(count(lit(1)).as("n_events"),
      sum(dec(col("cents"))).as("sc"))
    val mb = ms
      .agg(sum(floor(col("m") * 1000000000L + 0.5).cast("long")).as("mfp"))
    val mbar = (col("mfp").cast("double") / 32) / 1000000000L
    val sd = ms.crossJoin(broadcast(mb))
      .select(floor((col("m") - mbar) * (col("m") - mbar)
        * 1000000000L + 0.5).cast("long").as("t"))
      .agg(sum(col("t")).as("vfp"))
    val rk = ms.withColumn("rn",
      row_number().over(Window.orderBy(col("m"), col("r"))))
    val lo = rk.filter(col("rn") === 2).select(col("m").as("ci_lo"))
    val hi = rk.filter(col("rn") === 31).select(col("m").as("ci_hi"))
    pt.crossJoin(broadcast(mb)).crossJoin(broadcast(sd))
      .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .select(col("n_events"),
        (col("sc").cast("double") / col("n_events").cast("double"))
          .as("point_mean"),
        mbar.as("boot_mean"),
        sqrt((col("vfp").cast("double") / 31) / 1000000000L).as("boot_se"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Delete-one-bucket jackknife for the average order value — the
    * variance answer for RATIO metrics (sum of cents over count of
    * orders), where the naive per-row CLT is wrong because numerator
    * and denominator move together. The population hashes into B=64
    * md5 buckets; each leave-one-out replicate recomputes the ratio
    * from the complement's sums, and the jackknife SE is
    * sqrt(((B-1)/B) · Σ (r_b − r̄)²) — the estimator A/B platforms run
    * at fleet scale precisely because it needs only per-bucket sums.
    *
    * Exactness: bucket sums are exact int64/decimal(38,0)/HUGEINT;
    * each leave-one-out ratio is one division of exact integers
    * (bit-identical in both engines); r̄ and the squared deviations
    * quantize on the 64-cell frame (order-free) at 1e-6 and 1e-3
    * respectively — the ratios are MEANS in cents (~1e7, so the
    * squared deviations reach ~1e12 and a 1e-9 grid would overflow
    * int64; a value-ranged grid keeps ≥10 significant digits at any
    * data size because means don't grow with row count), summed in
    * decimal(38,0)/HUGEINT; the CI is point ± 1.96·SE in identical op
    * order.
    *
    * Scale shape: ONE orders pass into a 64-cell hash aggregate
    * (map-side combined — the exchange carries ≤64·P rows at any data
    * size); totals, leave-one-out ratios, and the variance all ride
    * the 64-row frame with broadcast scalars. */
  val q218BucketJackknife: QueryDef = QueryDef.withOracle(
    """WITH o AS (
      |  SELECT ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
      |      ::BIGINT % 64 AS b,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |cell AS (
      |  SELECT b, count(*) AS nb, sum(CAST(cents AS HUGEINT)) AS sb
      |  FROM o GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(nb) AS BIGINT) AS n, sum(sb) AS s,
      |    count(*) AS nbuck FROM cell),
      |loo AS (
      |  SELECT b, CAST(s - sb AS DOUBLE) / (n - nb) AS r
      |  FROM cell CROSS JOIN tot),
      |m AS (
      |  SELECT sum(CAST(floor(r * 1000000 + 0.5) AS HUGEINT)) AS rfp
      |  FROM loo),
      |v AS (
      |  SELECT sum(CAST(floor((r - (CAST(rfp AS DOUBLE) / nbuck)
      |      / 1000000) * (r - (CAST(rfp AS DOUBLE) / nbuck)
      |      / 1000000) * 1000 + 0.5) AS HUGEINT)) AS vfp
      |  FROM loo CROSS JOIN m CROSS JOIN tot)
      |SELECT n AS n_orders, nbuck AS n_buckets,
      |  CAST(s AS DOUBLE) / n AS avg_cents,
      |  (CAST(rfp AS DOUBLE) / nbuck) / 1000000 AS jk_mean,
      |  sqrt(((CAST(vfp AS DOUBLE) / 1000) * (nbuck - 1)) / nbuck)
      |    AS jk_se,
      |  CAST(s AS DOUBLE) / n - 1.96
      |    * sqrt(((CAST(vfp AS DOUBLE) / 1000) * (nbuck - 1)) / nbuck)
      |    AS ci_lo,
      |  CAST(s AS DOUBLE) / n + 1.96
      |    * sqrt(((CAST(vfp AS DOUBLE) / 1000) * (nbuck - 1)) / nbuck)
      |    AS ci_hi
      |FROM tot CROSS JOIN m CROSS JOIN v""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
      .select((h60(col("o_orderkey").cast("string")) % 64).as("b"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val cell = o.groupBy(col("b"))
      .agg(count(lit(1)).as("nb"), sum(dec(col("cents"))).as("sb"))
      .cache() // ONE orders pass; totals + both replicate passes reuse it
    val tot = cell.agg(sum(col("nb")).cast("long").as("n"),
      sum(col("sb")).as("s"), count(lit(1)).as("nbuck"))
    val loo = cell.crossJoin(broadcast(tot))
      .select(col("b"), col("nbuck"), col("n"), col("s"),
        ((col("s") - col("sb")).cast("double") / (col("n") - col("nb")))
          .as("r"))
    val m = loo
      .agg(sum(dec(floor(col("r") * 1000000L + 0.5))).as("rfp"))
    val rbar = (col("rfp").cast("double") / col("nbuck")) / 1000000L
    val v = loo.crossJoin(broadcast(m))
      .select(floor((col("r") - rbar) * (col("r") - rbar)
        * 1000L + 0.5).cast("long").as("t"))
      .agg(sum(dec(col("t"))).as("vfp"))
    val se = sqrt(((col("vfp").cast("double") / 1000L)
      * (col("nbuck") - 1)) / col("nbuck"))
    tot.crossJoin(broadcast(m)).crossJoin(broadcast(v))
      .select(col("n").as("n_orders"), col("nbuck").as("n_buckets"),
        (col("s").cast("double") / col("n")).as("avg_cents"),
        rbar.as("jk_mean"),
        se.as("jk_se"),
        (col("s").cast("double") / col("n") - lit(1.96) * se).as("ci_lo"),
        (col("s").cast("double") / col("n") + lit(1.96) * se).as("ci_hi"))
  }

  /** Heaps'-law fit — vocabulary growth V(t) ≈ K·t^β over the corpus
    * read in doc_id order: the corpus diagnostic that projects how the
    * vocabulary (and therefore tokenizer OOV mass, embedding table
    * size, q194 token budgets) scales with another decade of data.
    * Checkpoints are powers of two 2^6..2^j ≤ T; V(2^j) counts terms
    * whose FIRST occurrence position is ≤ 2^j; β and log K come from
    * the least-squares fit of ln V on ln t.
    *
    * The whole fit is exact-integer once positions exist: a term's
    * first position fp maps to its power-of-two bucket via
    * length(bin(fp−1)) — pure integer string length, no float log, no
    * boundary rounding (fp ≤ 2^j ⟺ fp−1 < 2^j ⟺ bin-length(fp−1) ≤ j);
    * V(2^j) is a ≤64-cell prefix sum; the regression quantizes each
    * (ln t, ln V) point to 1e-9 fixed point and cross-multiplies in
    * decimal(38,0)/HUGEINT — the q172 convention — so the slope is one
    * division of exact integers.
    *
    * Scale shape: doc start offsets via the two-phase range-partitioned
    * prefix sum (never a single-task window over docs); ONE posexplode
    * pass into the min-per-term aggregate (the term-keyed shuffle is
    * the one unavoidable exchange — partial min combines map-side);
    * everything after the ≤64-cell bucket rollup is metadata-sized. */
  val q219HeapsLaw: QueryDef = QueryDef.withOracle(
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, toks,
      |    COALESCE(sum(ntok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offs
      |  FROM d),
      |tk AS (
      |  SELECT o.toks[g.i] AS term, o.offs + g.i AS gpos
      |  FROM o, LATERAL (SELECT unnest(generate_series(1, len(o.toks)))
      |    AS i) g),
      |fp AS (
      |  SELECT term, CAST(min(gpos) AS BIGINT) AS fp FROM tk GROUP BY 1),
      |cells AS (
      |  SELECT CAST(length(bin(fp - 1)) AS BIGINT) AS b, count(*) AS cnt
      |  FROM fp GROUP BY 1),
      |tot AS (SELECT CAST(sum(ntok) AS BIGINT) AS n_tokens FROM d),
      |voc AS (SELECT count(*) AS vocab FROM fp),
      |chk AS (
      |  SELECT g.j FROM (SELECT unnest(generate_series(6, 50)) AS j) g
      |  CROSS JOIN tot WHERE power(2, g.j) <= CAST(n_tokens AS DOUBLE)),
      |v AS (
      |  SELECT j, CAST(sum(cnt) AS BIGINT) AS vj
      |  FROM chk JOIN cells ON cells.b <= chk.j GROUP BY 1),
      |pts AS (
      |  SELECT
      |    CAST(floor(ln(power(2, j)) * 1000000000 + 0.5) AS BIGINT) AS xfp,
      |    CAST(floor(ln(CAST(vj AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)
      |      AS yfp
      |  FROM v),
      |reg AS (
      |  SELECT count(*) AS np, CAST(sum(xfp) AS BIGINT) AS sx,
      |    CAST(sum(yfp) AS BIGINT) AS sy,
      |    sum(CAST(xfp AS HUGEINT) * yfp) AS sxy,
      |    sum(CAST(xfp AS HUGEINT) * xfp) AS sxx FROM pts)
      |SELECT n_tokens, vocab, np AS n_points,
      |  floor((CAST(np * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |    / CAST(np * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
      |    * 1000000 + 0.5) / 1000000 AS beta,
      |  floor(((CAST(sy AS DOUBLE) / 1000000000
      |    - (CAST(np * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |      / CAST(np * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
      |      * (CAST(sx AS DOUBLE) / 1000000000)) / np)
      |    * 1000000 + 0.5) / 1000000 AS log_k
      |FROM tot CROSS JOIN voc CROSS JOIN reg""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ", -1).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("ntok"))
    val off = AnalyticsOps2.groupedPrefixSum(docs, Seq.empty,
      Seq(col("doc_id")), col("ntok"), "cum", "ttot")
    val tok = off
      .select((col("cum") - col("ntok")).as("offs"),
        posexplode(col("toks")).as(Seq("i", "term")))
      .select(col("term"), (col("offs") + col("i") + 1).as("gpos"))
    val fp = tok.groupBy(col("term")).agg(min(col("gpos")).as("fp"))
      .cache() // vocab frame feeds the bucket cells and the vocab count
    val cells = fp
      .select(length(bin(col("fp") - 1)).cast("long").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    val tot = docs.agg(sum(col("ntok")).cast("long").as("n_tokens"))
    val voc = fp.agg(count(lit(1)).as("vocab"))
    val chk = s.range(6, 51).toDF("j")
      .crossJoin(broadcast(tot))
      .filter(pow(lit(2.0), col("j").cast("double"))
        <= col("n_tokens").cast("double"))
      .select(col("j"))
    val v = chk.join(broadcast(cells), col("b") <= col("j"))
      .groupBy(col("j")).agg(sum(col("cnt")).cast("long").as("vj"))
    val pts = v.select(
      floor(log(pow(lit(2.0), col("j").cast("double")))
        * 1000000000L + 0.5).cast("long").as("xfp"),
      floor(log(col("vj").cast("double")) * 1000000000L + 0.5)
        .cast("long").as("yfp"))
    val reg = pts.agg(count(lit(1)).as("np"),
      sum(col("xfp")).cast("long").as("sx"),
      sum(col("yfp")).cast("long").as("sy"),
      sum(dec(col("xfp")) * col("yfp")).as("sxy"),
      sum(dec(col("xfp")) * col("xfp")).as("sxx"))
    val num = (dec(col("np")) * col("sxy")
      - dec(col("sx")) * dec(col("sy"))).cast("double")
    val den = (dec(col("np")) * col("sxx")
      - dec(col("sx")) * dec(col("sx"))).cast("double")
    val beta = num / den
    tot.crossJoin(broadcast(voc)).crossJoin(broadcast(reg))
      .select(col("n_tokens"), col("vocab"), col("np").as("n_points"),
        (floor(beta * 1000000 + 0.5) / 1000000).as("beta"),
        (floor(((col("sy").cast("double") / 1000000000L
          - beta * (col("sx").cast("double") / 1000000000L)) / col("np"))
          * 1000000 + 0.5) / 1000000).as("log_k"))
  }

  /** One-way ANOVA F test of document length across sources — the
    * k-sample parametric member of the hypothesis-test family (q104
    * two-sample t, q205 Mann–Whitney rank-sum, q117 χ² drift): does
    * mean n_chars differ across sources more than within-source
    * variance explains? F = (SSB/(k−1)) / (SSW/(N−k)), with η² =
    * SSB/SST as the effect size a drift monitor can threshold.
    *
    * Exactness: per-source count/sum/sum-of-squares accumulate in
    * int64 and decimal(38,0)/HUGEINT (the q172 moment convention — the
    * squared sums cross 2^63 at fleet scale); group and grand means
    * are single divisions of exact integers (bit-identical); the
    * between-group terms quantize SCALE-FREE as (n_g/N)·(x̄_g − x̄)² at
    * 1e-9 fixed point — bounded by the squared value range regardless
    * of row count, so the int64 fixed-point frame never overflows —
    * and SSB = N · their sum; SST comes from the exact moments, SSW by
    * subtraction, all in identical op order.
    *
    * Scale shape: ONE documents pass into a ≤|sources| hash aggregate
    * (map-side combined); every statistic ride the k-cell frame with a
    * broadcast 1-row total. The q178/q186 posture. */
  val q220Anova: QueryDef = QueryDef.withOracle(
    """WITH cell AS (
      |  SELECT source, count(*) AS ng,
      |    sum(CAST(n_chars AS HUGEINT)) AS sg,
      |    sum(CAST(n_chars AS HUGEINT) * n_chars) AS qg
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS s, sum(qg) AS q,
      |    count(*) AS k FROM cell),
      |b AS (
      |  SELECT CAST(sum(CAST(floor((CAST(ng AS DOUBLE) / n)
      |      * ((CAST(sg AS DOUBLE) / ng - CAST(s AS DOUBLE) / n)
      |        * (CAST(sg AS DOUBLE) / ng - CAST(s AS DOUBLE) / n))
      |      * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS bfp
      |  FROM cell CROSS JOIN tot)
      |SELECT k AS n_groups, n AS n_docs,
      |  CAST(s AS DOUBLE) / n AS grand_mean,
      |  (CAST(bfp AS DOUBLE) / 1000000000) * n AS ssb,
      |  CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n)
      |    * (CAST(s AS DOUBLE) / n) * n
      |    - (CAST(bfp AS DOUBLE) / 1000000000) * n AS ssw,
      |  ((CAST(bfp AS DOUBLE) / 1000000000) * n / (k - 1))
      |    / ((CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n)
      |        * (CAST(s AS DOUBLE) / n) * n
      |        - (CAST(bfp AS DOUBLE) / 1000000000) * n) / (n - k))
      |    AS f_stat,
      |  ((CAST(bfp AS DOUBLE) / 1000000000) * n)
      |    / (CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n)
      |       * (CAST(s AS DOUBLE) / n) * n) AS eta_sq
      |FROM tot CROSS JOIN b""".stripMargin
  ) { (s, d) =>
    val cell = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("ng"),
        sum(dec(col("n_chars"))).as("sg"),
        sum(dec(col("n_chars")) * col("n_chars")).as("qg"))
      .cache() // ONE documents pass; totals + SSB terms reuse the k cells
    val tot = cell.agg(sum(col("ng")).cast("long").as("n"),
      sum(col("sg")).as("s"), sum(col("qg")).as("q"),
      count(lit(1)).as("k"))
    val gm = col("s").cast("double") / col("n")
    val b = cell.crossJoin(broadcast(tot))
      .select(floor((col("ng").cast("double") / col("n"))
        * ((col("sg").cast("double") / col("ng") - gm)
          * (col("sg").cast("double") / col("ng") - gm))
        * 1000000000L + 0.5).cast("long").as("t"))
      .agg(sum(col("t")).as("bfp"))
    val ssb = (col("bfp").cast("double") / 1000000000L) * col("n")
    val sst = col("q").cast("double") - gm * gm * col("n")
    val ssw = sst - ssb
    tot.crossJoin(broadcast(b))
      .select(col("k").as("n_groups"), col("n").as("n_docs"),
        gm.as("grand_mean"),
        ssb.as("ssb"),
        ssw.as("ssw"),
        ((ssb / (col("k") - 1)) / (ssw / (col("n") - col("k"))))
          .as("f_stat"),
        (ssb / sst).as("eta_sq"))
  }

  val all: Map[String, QueryDef] = Map(
    "q217_poisson_bootstrap" -> q217PoissonBootstrap,
    "q218_bucket_jackknife" -> q218BucketJackknife,
    "q219_heaps_law" -> q219HeapsLaw,
    "q220_anova" -> q220Anova)
}
