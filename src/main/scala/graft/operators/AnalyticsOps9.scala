package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 tranche three: the evaluation / calibration / sampling
  * operators that close out the statistics surface — Theil's
  * uncertainty coefficient (normalized asymmetric association beside
  * q184's mutual information), pool-adjacent-violators isotonic
  * calibration (the recalibration MAP where q151's reliability table
  * only diagnoses), nDCG@10 ranking quality (beside q115's AUC and
  * q125's recall), bigram conditional entropy rate (the sequence-
  * predictability probe beside q209's unigram perplexity), and
  * Efraimidis–Spirakis weighted sampling without replacement (the
  * per-stratum top-k draw q91's systematic sampler can't express).
  *
  * Cross-engine conventions as everywhere: exact int64/decimal counts
  * into per-cell 1e-9 fixed-point terms BEFORE any sum (q158 — int64
  * sums are merge-order-free), min/max over identically-computed
  * doubles (order-free by definition), one final division, 1e-6 floor
  * rounding, identical IEEE op order in both engines.
  */
object AnalyticsOps9 {

  /** Theil's uncertainty coefficient between `lang` and `source` —
    * the NORMALIZED, asymmetric association beside q184's raw mutual
    * information: U(lang|source) = (H(lang) − H(lang|source)) /
    * H(lang) reads as "what fraction of language uncertainty does
    * knowing the source remove" (and the transposed direction answers
    * the converse), on a calibrated [0,1] scale a curation report can
    * threshold. Both directions share one MI numerator by the chain
    * rule; entropies are plug-in (no smoothing — this measures, it
    * doesn't model).
    *
    * Exactness: every probability is a ratio of exact int64 counts;
    * each entropy term quantizes to 1e-9 fixed point per cell before
    * its int64 sum (order-free); U is one division of two int64 sums,
    * floored 1e-6.
    *
    * Scale shape: ONE (lang, source) partial+final count collapses
    * the corpus (≤|langs|·|sources| cells); margins, totals, and all
    * four entropy sums ride that frame with broadcast joins. The
    * q178/q186 posture. */
  val q212TheilU: QueryDef = QueryDef.withOracle(
    """WITH cell AS (
      |  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
      |nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nl FROM cell GROUP BY 1),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cell GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
      |hl AS (
      |  SELECT CAST(sum(CAST(floor((CAST(nl AS DOUBLE) / n)
      |    * ln(CAST(n AS DOUBLE) / nl) * 1000000000 + 0.5) AS BIGINT))
      |    AS BIGINT) AS hl_fp
      |  FROM nl CROSS JOIN tot),
      |hs AS (
      |  SELECT CAST(sum(CAST(floor((CAST(ns AS DOUBLE) / n)
      |    * ln(CAST(n AS DOUBLE) / ns) * 1000000000 + 0.5) AS BIGINT))
      |    AS BIGINT) AS hs_fp
      |  FROM ns CROSS JOIN tot),
      |hc AS (
      |  SELECT
      |    CAST(sum(CAST(floor((CAST(c AS DOUBLE) / n)
      |      * ln(CAST(ns AS DOUBLE) / c) * 1000000000 + 0.5) AS BIGINT))
      |      AS BIGINT) AS hls_fp,
      |    CAST(sum(CAST(floor((CAST(c AS DOUBLE) / n)
      |      * ln(CAST(nl AS DOUBLE) / c) * 1000000000 + 0.5) AS BIGINT))
      |      AS BIGINT) AS hsl_fp
      |  FROM cell JOIN nl USING (lang) JOIN ns USING (source)
      |  CROSS JOIN tot)
      |SELECT tot.n AS n_docs,
      |  CAST(hl_fp AS DOUBLE) / 1000000000 AS h_lang,
      |  CAST(hs_fp AS DOUBLE) / 1000000000 AS h_source,
      |  CASE WHEN hl_fp = 0 THEN CAST(0 AS DOUBLE)
      |    ELSE floor((CAST(hl_fp - hls_fp AS DOUBLE) / hl_fp) * 1000000
      |      + 0.5) / 1000000 END AS u_lang_given_source,
      |  CASE WHEN hs_fp = 0 THEN CAST(0 AS DOUBLE)
      |    ELSE floor((CAST(hs_fp - hsl_fp AS DOUBLE) / hs_fp) * 1000000
      |      + 0.5) / 1000000 END AS u_source_given_lang
      |FROM tot CROSS JOIN hl CROSS JOIN hs CROSS JOIN hc""".stripMargin
  ) { (s, d) =>
    val cell = Tables.documents(s, d)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      .cache() // one corpus pass feeds margins, totals, both entropies
    val nl = cell.groupBy(col("lang")).agg(sum(col("c")).as("nl"))
    val ns = cell.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val tot = cell.agg(sum(col("c")).as("n"))
    def hFp(margin: DataFrame, m: String): DataFrame =
      margin.crossJoin(broadcast(tot))
        .select(floor((col(m).cast("double") / col("n")) *
          log(col("n").cast("double") / col(m)) * 1000000000L + 0.5)
          .cast("long").as("t"))
        .agg(sum(col("t")).as(s"h${m}_fp"))
    val hl = hFp(nl, "nl")
    val hs = hFp(ns, "ns")
    val hc = cell.join(broadcast(nl), Seq("lang"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(
        floor((col("c").cast("double") / col("n")) *
          log(col("ns").cast("double") / col("c")) * 1000000000L + 0.5)
          .cast("long").as("tls"),
        floor((col("c").cast("double") / col("n")) *
          log(col("nl").cast("double") / col("c")) * 1000000000L + 0.5)
          .cast("long").as("tsl"))
      .agg(sum(col("tls")).as("hls_fp"), sum(col("tsl")).as("hsl_fp"))
    tot.crossJoin(broadcast(hl)).crossJoin(broadcast(hs))
      .crossJoin(broadcast(hc))
      .select(col("n").as("n_docs"),
        (col("hnl_fp").cast("double") / 1000000000L).as("h_lang"),
        (col("hns_fp").cast("double") / 1000000000L).as("h_source"),
        when(col("hnl_fp") === 0, lit(0.0))
          .otherwise(floor(((col("hnl_fp") - col("hls_fp")).cast("double")
            / col("hnl_fp")) * 1000000 + 0.5) / 1000000)
          .as("u_lang_given_source"),
        when(col("hns_fp") === 0, lit(0.0))
          .otherwise(floor(((col("hns_fp") - col("hsl_fp")).cast("double")
            / col("hns_fp")) * 1000000 + 0.5) / 1000000)
          .as("u_source_given_lang"))
  }

  /** Isotonic (pool-adjacent-violators) calibration of the purchase-
    * propensity score — the recalibration MAP where q151's decile
    * table only diagnoses: the best monotone fit of purchase rate as
    * a function of score, which is what production actually applies
    * to raw model scores. Scores band to whole currency units (the
    * operator contract — reliability cells, the q204 banding move),
    * and the fit uses the closed-form min-max characterization
    * fitted(i) = max_{j≤i} min_{k≥j} mean(y over bands j..k), which
    * is EXACTLY the PAV solution (Barlow & Brunk 1972) with no
    * sequential pooling loop — every interval mean is a ratio of two
    * prefix-sum differences.
    *
    * Exactness: prefix sums are exact int64; each interval mean is
    * ONE double division of int64s computed identically in both
    * engines; min/max over identically-computed doubles is order-free
    * BY DEFINITION (no accumulation anywhere); the reported rate
    * floors 1e-6.
    *
    * Scale shape: ONE (band) partial+final count collapses events to
    * ≤|bands| reliability cells (value-range-bounded, never
    * row-count); the interval frame is |bands|² METADATA rows; the
    * prefix/cummax windows run unpartitioned over those cell frames —
    * metadata sorts (the q194/q202 argument). */
  val q213IsotonicCalibration: QueryDef = QueryDef.withOracle(
    """WITH c AS (
      |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) // 100 AS band,
      |    count(*) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS k
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT band, n, k,
      |    CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS sn,
      |    CAST(sum(k) OVER (ORDER BY band) AS BIGINT) AS sk
      |  FROM c),
      |iv AS (
      |  SELECT a.band AS j,
      |    min(CAST(b.sk - (a.sk - a.k) AS DOUBLE)
      |      / (b.sn - (a.sn - a.n))) AS m
      |  FROM w a JOIN w b ON b.band >= a.band
      |  GROUP BY 1),
      |f AS (
      |  SELECT j AS band, max(m) OVER (ORDER BY j) AS fit FROM iv)
      |SELECT w.band, w.n, w.k,
      |  floor(f.fit * 1000000 + 0.5) / 1000000 AS fitted_rate
      |FROM w JOIN f USING (band)""".stripMargin
  ) { (s, d) =>
    isotonicOn(Tables.events(s, d)
      .groupBy(expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 100")
        .as("band"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("k")))
  }

  /** q213's min-max PAV over a (band, n, k) reliability-cell frame —
    * extracted so AnalyticsOps9Spec can check it against a sequential
    * pool-adjacent-violators reference (monotone output, violator
    * pooling, mass preservation on hand cases). */
  private[operators] def isotonicOn(cellsIn: DataFrame): DataFrame = {
    val c = cellsIn.cache() // ≤|bands| reliability cells — one pass
    val wOrd = Window.orderBy(col("band")) // metadata sort (≤|bands|)
    val w = c
      .withColumn("sn", sum(col("n")).over(wOrd))
      .withColumn("sk", sum(col("k")).over(wOrd))
    val a = w.toDF("j", "nj", "kj", "snj", "skj")
    val b = w.toDF("band", "nb", "kb", "snb", "skb")
    val iv = a.join(broadcast(b), col("band") >= col("j"))
      .groupBy(col("j"))
      .agg(min((col("skb") - (col("skj") - col("kj"))).cast("double") /
        (col("snb") - (col("snj") - col("nj")))).as("m"))
    val f = iv.select(col("j").as("band"),
      max(col("m")).over(Window.orderBy(col("j"))).as("fit"))
    w.select(col("band"), col("n"), col("k"))
      .join(f, Seq("band"))
      .select(col("band"), col("n"), col("k"),
        (floor(col("fit") * 1000000 + 0.5) / 1000000).as("fitted_rate"))
  }

  /** nDCG@10 of the popularity recommender — the GRADED ranking
    * metric beside q115's AUC (pairwise, binary) and q125's recall
    * (set overlap): rank event types by corpus-wide frequency (the
    * popularity baseline every recommender is measured against),
    * score each user's ranking quality with log₂-discounted gains
    * (relevance = the user's own interaction count), and normalize by
    * that user's ideal ordering. Reports the user count, mean nDCG,
    * and how many users the popularity order ranks perfectly.
    *
    * Exactness: every DCG term c/log₂(pos+1) quantizes to 1e-9 fixed
    * point per (user, position) before its int64 per-user sum
    * (order-free); each user's nDCG floors at 1e-6 into an int;
    * the mean is one division of the int64 sum, floored 1e-6.
    * n_perfect compares the two int64 sums exactly — no float
    * equality anywhere.
    *
    * Scale shape: ONE (user, type) partial+final count collapses
    * events; the global top-10 is a rank over the ≤|types| margin
    * (metadata sort) broadcast back; the ideal ordering is a per-USER
    * window over that user's ≤|types| cells with the rank limit
    * pushed (WindowGroupLimit); the final rollup is user-keyed then
    * scalar. */
  val q214Ndcg: QueryDef = QueryDef.withOracle(
    """WITH uc AS (
      |  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2),
      |gt AS (
      |  SELECT event_type,
      |    row_number() OVER (ORDER BY c DESC, event_type) AS pos
      |  FROM (SELECT event_type, CAST(sum(c) AS BIGINT) AS c
      |        FROM uc GROUP BY 1)
      |  QUALIFY pos <= 10),
      |dcg AS (
      |  SELECT uc.user_id,
      |    CAST(sum(CAST(floor(CAST(uc.c AS DOUBLE) / log2(gt.pos + 1)
      |      * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS dcg_fp
      |  FROM uc JOIN gt USING (event_type) GROUP BY 1),
      |irk AS (
      |  SELECT user_id, c,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY c DESC, event_type) AS pos
      |  FROM uc QUALIFY pos <= 10),
      |idcg AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) / log2(pos + 1)
      |      * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS idcg_fp
      |  FROM irk GROUP BY 1),
      |u AS (
      |  SELECT idcg.user_id,
      |    CAST(floor(CAST(coalesce(dcg.dcg_fp, 0) AS DOUBLE) / idcg.idcg_fp
      |      * 1000000 + 0.5) AS BIGINT) AS ndcg6,
      |    CASE WHEN coalesce(dcg.dcg_fp, 0) = idcg.idcg_fp
      |      THEN 1 ELSE 0 END AS perfect
      |  FROM idcg LEFT JOIN dcg USING (user_id))
      |SELECT count(*) AS n_users,
      |  floor(CAST(sum(ndcg6) AS DOUBLE) / count(*) + 0.5) / 1000000
      |    AS mean_ndcg,
      |  CAST(sum(perfect) AS BIGINT) AS n_perfect
      |FROM u""".stripMargin
  ) { (s, d) =>
    val uc = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .cache() // one events pass feeds the margin, DCG, and IDCG
    // ≤|types| rows: the unpartitioned rank is a metadata sort
    val gt = uc.groupBy(col("event_type")).agg(sum(col("c")).as("gc"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("gc").desc, col("event_type"))))
      .filter(col("pos") <= 10)
      .select(col("event_type"), col("pos"))
    def termFp(c: Column, pos: Column): Column =
      floor(c.cast("double") / log2(pos + 1) * 1000000000L + 0.5)
        .cast("long")
    val dcg = uc.join(broadcast(gt), Seq("event_type"))
      .groupBy(col("user_id"))
      .agg(sum(termFp(col("c"), col("pos"))).as("dcg_fp"))
    val idcg = uc
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("c").desc, col("event_type"))))
      .filter(col("pos") <= 10)
      .groupBy(col("user_id"))
      .agg(sum(termFp(col("c"), col("pos"))).as("idcg_fp"))
    idcg.join(dcg, Seq("user_id"), "left")
      .na.fill(0L, Seq("dcg_fp"))
      .select(
        floor(col("dcg_fp").cast("double") / col("idcg_fp")
          * 1000000 + 0.5).cast("long").as("ndcg6"),
        when(col("dcg_fp") === col("idcg_fp"), 1L).otherwise(0L)
          .as("perfect"))
      .agg(count(lit(1)).as("n_users"),
        (floor(sum(col("ndcg6")).cast("double") / count(lit(1)) + 0.5)
          / 1000000).as("mean_ndcg"),
        sum(col("perfect")).as("n_perfect"))
  }

  /** Bigram conditional entropy rate per source — the SEQUENCE
    * predictability probe beside q209's unigram perplexity and q67's
    * bigram novelty: H(w₂|w₁) says how many nats the NEXT token costs
    * once the current one is known; exp(H) is the effective branching
    * factor. Boilerplate-heavy sources collapse toward 0 (every token
    * determines the next), token-salad noise approaches the unigram
    * entropy ceiling — and the GAP between q209's H(w) and this is
    * exactly the mutual information adjacent tokens share. Plug-in
    * estimate on observed bigrams (this measures, it doesn't model —
    * so no smoothing and no dense |V|² frame).
    *
    * Exactness: context margins c₁ = Σ_w₂ c derive FROM the bigram
    * cells (exact int64); each term (c/N)·ln(c₁/c) quantizes to 1e-9
    * fixed point per cell before the per-source int64 sum; the
    * branching factor exponentiates the already-floored H (both
    * engines exponentiate the same quantized double — the q209
    * convention).
    *
    * Scale shape: ONE corpus pass explodes adjacent token pairs
    * map-side into a (source, w₁, w₂) partial+final count
    * (vocab²-bounded in the worst case, Heaps-bounded in practice);
    * margins roll up from THAT frame; the term sum is one
    * source-keyed rollup. No joins beyond the cell-sized margin
    * attach. */
  val q215BigramEntropy: QueryDef = QueryDef.withOracle(
    """WITH d AS (
      |  SELECT source, string_split(text, ' ') AS toks FROM documents),
      |b AS (
      |  SELECT source, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM (SELECT source, toks, unnest(range(1, len(toks))) AS i
      |        FROM d WHERE len(toks) >= 2)),
      |bg AS (
      |  SELECT source, w1, w2, count(*) AS c FROM b GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT source, w1, CAST(sum(c) AS BIGINT) AS c1
      |  FROM bg GROUP BY 1, 2),
      |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM bg GROUP BY 1),
      |t AS (
      |  SELECT bg.source,
      |    CAST(floor((CAST(bg.c AS DOUBLE) / n.n)
      |      * ln(CAST(m.c1 AS DOUBLE) / bg.c) * 1000000000 + 0.5)
      |      AS BIGINT) AS term_fp
      |  FROM bg JOIN m USING (source, w1) JOIN n USING (source)),
      |h AS (
      |  SELECT source, max(n.n) AS n_bigrams,
      |    floor((CAST(sum(term_fp) AS DOUBLE) / 1000000000) * 1000000
      |      + 0.5) / 1000000 AS h_cond
      |  FROM t JOIN n USING (source) GROUP BY 1)
      |SELECT source, n_bigrams, h_cond,
      |  floor(exp(h_cond) * 1000000 + 0.5) / 1000000 AS branching_factor
      |FROM h""".stripMargin
  ) { (s, d) =>
    val bg = Tables.documents(s, d)
      .select(col("source"), split(col("text"), " ", -1).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")).as("p"))
      .select(col("source"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("source"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .cache() // one corpus pass feeds margins, totals, and terms
    val m = bg.groupBy(col("source"), col("w1")).agg(sum(col("c")).as("c1"))
    val n = bg.groupBy(col("source")).agg(sum(col("c")).as("n"))
    bg.join(m, Seq("source", "w1"))
      .join(broadcast(n), Seq("source"))
      .select(col("source"), col("n"),
        floor((col("c").cast("double") / col("n")) *
          log(col("c1").cast("double") / col("c")) * 1000000000L + 0.5)
          .cast("long").as("term_fp"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_bigrams"),
        (floor((sum(col("term_fp")).cast("double") / 1000000000L)
          * 1000000 + 0.5) / 1000000).as("h_cond"))
      .select(col("source"), col("n_bigrams"), col("h_cond"),
        (floor(exp(col("h_cond")) * 1000000 + 0.5) / 1000000)
          .as("branching_factor"))
  }

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement: the
    * top-5 documents per source drawn with probability proportional
    * to length (n_chars) — the per-stratum quality-weighted draw a
    * curation pipeline uses for human-review panels and few-shot
    * pools. q91's systematic sampler draws a GLOBAL rate-k sample;
    * this is the other sampling primitive: exactly k per stratum,
    * heavier rows more likely, no replacement, one pass, no global
    * state. Each row gets the exponential-race key ln(u)/w (u
    * deterministic from md5(doc_id) — the q48/q91 replayable-RNG
    * convention); the k largest keys per stratum ARE the E–S sample
    * (Efraimidis & Spirakis 2006).
    *
    * Exactness: u = (md5₆₀(doc_id)+1)/2⁶⁰ and ln(u)/w are one
    * identical IEEE chain in both engines; ranking ties break on
    * doc_id; the output is all-integer (rank, id, weight) — nothing
    * floats through the gate.
    *
    * Scale shape: key assignment is map-side scalar math on the scan;
    * the per-source top-5 pushes a partial WindowGroupLimit below the
    * exchange (the q7/q38 top-k shape), so the shuffle carries ≤5
    * rows per (partition, source) — never the corpus. */
  val q216WeightedTopk: QueryDef = QueryDef.withOracle(
    """WITH k AS (
      |  SELECT source, doc_id, n_chars,
      |    ln(((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |      ::BIGINT) + 1) / 1152921504606846976.0) / n_chars AS key
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY key DESC, doc_id) AS rk
      |  FROM k)
      |SELECT source, rk, doc_id, n_chars AS weight_chars
      |FROM r WHERE rk <= 5""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        expr("ln((CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), " +
          "16, 10) AS BIGINT) + 1) / 1152921504606846976.0) / n_chars")
          .as("key"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("key").desc, col("doc_id"))))
      .filter(col("rk") <= 5)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_chars").as("weight_chars"))
  }

  val all: Map[String, QueryDef] = Map(
    "q212_theil_u" -> q212TheilU,
    "q213_isotonic_calibration" -> q213IsotonicCalibration,
    "q214_ndcg" -> q214Ndcg,
    "q215_bigram_entropy" -> q215BigramEntropy,
    "q216_weighted_topk" -> q216WeightedTopk
  )
}
