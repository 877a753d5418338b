package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space clustering for the training-data pipeline:
  * spherical k-means (cosine assignment) with two Lloyd iterations —
  * the corpus-organization step behind topic balancing, dedup-aware
  * sampling, and IVF index builds.
  *
  * Scale shape per iteration: one broadcast nested-loop pass scores
  * every vector against the (small, broadcast) centroid table with
  * the codegen'd cosine expression, the argmax collapses map-side via
  * max_by partial aggregation (the shuffle carries one narrow row per
  * vector, never the n·k cross product), and the centroid update is a
  * posexplode → per-(cluster, dim) integer sum — partial-aggregated,
  * so the exchange moves k·dim partials per partition, not n·dim rows.
  *
  * Cross-engine / cross-partitioning determinism: centroid means are
  * QUANTIZED-EXACT — members contribute floor(x·2²⁰ + 0.5) as
  * integers (x·2²⁰ is exact for any float32 in double), the per-dim
  * integer sums are order-free, and the centroid value is the same
  * two IEEE divisions in both engines. Assignment compares unrounded
  * cosines, which the native expression computes bit-identically to
  * DuckDB's list_cosine_similarity (validated by q44/q50/q53).
  */
object ClusteringOps {

  /** Fixed-point scale for centroid means: 2²⁰, a power of two, so
    * member quantization and the final division are exact. */
  private val Quant = 1048576.0

  /** Adaptive seed-sample divisor: k stays ≈ 64 clusters regardless of
    * corpus size via p = max(101, ⌈n / 64⌉). Topic count is a property
    * of the DOMAIN, not the corpus size — and a fixed divisor made
    * k = n/101 seeds, turning the n·k broadcast assignment quadratic
    * (measured 27× time at the 10×-replica step before the change).
    * The 101 floor keeps every gate SF's seed set — and so every
    * oracle output — unchanged; the oracle computes the identical p
    * with a scalar subquery (⌈⌉ and /64 are exact IEEE both engines).
    */
  private def kmeansDivisor(n: Long): Long =
    math.max(101L, math.ceil(n / 64.0).toLong)

  /** SQL mirror of [[kmeansDivisor]] over a CTE named `c`. */
  private val KmeansDivisorSql =
    "(SELECT GREATEST(101, CAST(ceil(count(*) / 64.0) AS BIGINT)) FROM c)"

  /** Shared two-round centroid CTE chain (c -> cents0 -> a1 -> d1 ->
    * s1 -> cents1 -> a2 -> d2 -> s2) - the SQL mirror of
    * `twoRoundCentroids`, interpolated into both the q56 and q81
    * oracles so the recurrence can never silently diverge between
    * them. */
  private val centroidChainSql: String =
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |cents0 AS (SELECT vec_id AS cent_id, emb AS cent_emb FROM c WHERE vec_id % $KmeansDivisorSql = 1),
      |a1 AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT c.vec_id, c.emb, cent_id, row_number() OVER
      |      (PARTITION BY c.vec_id
      |       ORDER BY list_cosine_similarity(c.emb, cent_emb) DESC, cent_id) AS rn
      |    FROM c CROSS JOIN cents0) WHERE rn = 1),
      |d1 AS (
      |  SELECT cent_id, i AS dim, emb[i] AS v
      |  FROM a1, LATERAL (SELECT unnest(generate_series(1, len(emb))) AS i) g),
      |s1 AS (
      |  SELECT cent_id, dim,
      |    CAST(sum(CAST(floor(v * 1048576.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))
      |      AS BIGINT) AS sq,
      |    count(*) AS n
      |  FROM d1 GROUP BY 1, 2),
      |cents1 AS (
      |  SELECT cent_id,
      |    list(CAST(sq AS DOUBLE) / 1048576.0::DOUBLE / CAST(n AS DOUBLE)
      |         ORDER BY dim) AS cent_emb
      |  FROM s1 GROUP BY 1),
      |a2 AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT c.vec_id, c.emb, cent_id, row_number() OVER
      |      (PARTITION BY c.vec_id
      |       ORDER BY list_cosine_similarity(c.emb, cent_emb) DESC, cent_id) AS rn
      |    FROM c CROSS JOIN cents1) WHERE rn = 1),
      |d2 AS (
      |  SELECT cent_id, i AS dim, emb[i] AS v
      |  FROM a2, LATERAL (SELECT unnest(generate_series(1, len(emb))) AS i) g),
      |s2 AS (
      |  SELECT cent_id, dim,
      |    CAST(sum(CAST(floor(v * 1048576.0::DOUBLE + 0.5::DOUBLE) AS BIGINT))
      |      AS BIGINT) AS sq,
      |    count(*) AS n
      |  FROM d2 GROUP BY 1, 2)""".stripMargin


  /** Spherical k-means over `embeddings`: seeds = vectors with
    * vec_id % 101 = 1, two assign→update rounds, then a final
    * assignment; output is per-cluster membership count and the
    * 4-dp-rounded centroid L2 norm. Clusters that lose every member
    * drop out (both engines aggregate only over assigned rows). */
  val q56Kmeans: QueryDef = QueryDef.withOracle(centroidChainSql + ",\n" +
    """      |cents2 AS (
      |  SELECT cent_id,
      |    list(CAST(sq AS DOUBLE) / 1048576.0::DOUBLE / CAST(n AS DOUBLE)
      |         ORDER BY dim) AS cent_emb,
      |    max(n) AS n_members
      |  FROM s2 GROUP BY 1)
      |SELECT cent_id AS cluster_id, CAST(n_members AS BIGINT) AS n_members,
      |  floor(sqrt(list_sum(list_transform(cent_emb, x -> x * x))) * 10000
      |    + 0.5) / 10000 AS cent_norm
      |FROM cents2""".stripMargin
  ) { (s, d) =>
    // cache: the feature frame feeds the seed filter and both
    // assignment rounds (guide §5 reuse — one scan, not three)
    val c = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .cache()
    val cents2 = twoRoundCentroids(c,
      kmeansDivisor(SimilarityOps.corpusCount(s, d)))
    cents2.select(
      col("cent_id").as("cluster_id"),
      col("n_members").cast("long").as("n_members"),
      (floor(sqrt(VectorExpressions.sqnorm(col("cent_emb"))) * 10000 + 0.5)
        / 10000).as("cent_norm"))
  }

  /** Centroid table collapsed to ONE row carrying the whole table as
    * an array — the broadcast side of the map-side assignment. */
  private def centsAsRow(cents: DataFrame): DataFrame =
    cents.agg(collect_list(struct(col("cent_id"), col("cent_emb")))
      .as("cents"))

  /** argmax-cosine assignment (tiebreak: min cent_id), computed
    * MAP-SIDE: vec_id is unique, so the old
    * crossJoin → groupBy(vec_id).max_by only ever collapsed the k
    * centroid rows of one vector — k rows that BestCentroid now folds
    * in one kernel call per row, with bit-identical cosine doubles
    * and the same (sim, −cent_id) argmax order. The per-round
    * exchange of every (vec_id, embedding) row is gone; the only
    * exchange left in a round is the k-row centroid update. The
    * isNotNull filter mirrors the empty-cross-join case (no centroids
    * → no assigned rows). */
  private def assign(c: DataFrame, cents: DataFrame): DataFrame =
    c.crossJoin(broadcast(centsAsRow(cents)))
      // size(cents) > 0 ⟺ best is non-null (the empty-cross-join
      // case), but as a filter it costs an array-length read — an
      // isNotNull(best) filter was pushed into the join condition and
      // re-evaluated the whole k·dim kernel per row (§4.4 duplication)
      .filter(size(col("cents")) > 0)
      .select(col("vec_id"), col("embedding"),
        VectorExpressions.bestCentroid(col("embedding"), col("cents"))
          .as("best"))
      .select(col("vec_id"), col("embedding"),
        col("best.cent_id").as("cent_id"))

  /** quantized-exact centroid mean; also returns member counts. */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cent_id"), posexplode(col("embedding")).as(Seq("pm", "v")))
      .select(col("cent_id"), (col("pm") + 1).as("dim"), col("v"))
      .groupBy(col("cent_id"), col("dim"))
      .agg(sum(floor(col("v") * Quant + 0.5).cast("long")).as("sq"),
        count(lit(1)).as("n"))
      .groupBy(col("cent_id"))
      .agg(expr("transform(array_sort(collect_list(named_struct(" +
        s"'dim', dim, 'cv', cast(sq as double) / ${Quant}D / cast(n as double)" +
        "))), x -> x.cv)").as("cent_emb"),
        max(col("n")).as("n_members"))

  /** The q56 centroid chain: seed on vec_id % kmeansDivisor(n) = 1,
    * two assign→update rounds. Shared by q56 (centroid stats) and q81
    * (semantic keep). */
  private def twoRoundCentroids(c: DataFrame, p: Long): DataFrame = {
    val cents0 = c.filter(col("vec_id") % p === 1)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    val cents1 = update(assign(c, cents0)).select(col("cent_id"), col("cent_emb"))
    update(assign(c, cents1))
  }

  /** Semantic dedup by cluster representative: after the q56 k-means
    * rounds, each vector joins its argmax-cosine cluster and the
    * cluster keeps ONLY the member most similar to its centroid
    * (tiebreak: min vec_id) — the "one doc per semantic bucket"
    * reduction behind diversity-preserving corpus thinning. Two
    * max_by aggregations: per-vector best centroid, then per-cluster
    * best member — both collapse map-side, so the shuffles carry one
    * narrow row per vector / per cluster. Determinism: identical
    * cosine doubles cross-engine (q56's contract) and total-order
    * tiebreaks at both argmax steps. */
  val q81SemanticKeep: QueryDef = QueryDef.withOracle(centroidChainSql + ",\n" +
    """      |cents2 AS (
      |  SELECT cent_id,
      |    list(CAST(sq AS DOUBLE) / 1048576.0::DOUBLE / CAST(n AS DOUBLE)
      |         ORDER BY dim) AS cent_emb
      |  FROM s2 GROUP BY 1),
      |a3 AS (
      |  SELECT vec_id, cent_id, sim FROM (
      |    SELECT c.vec_id, cent_id,
      |      list_cosine_similarity(c.emb, cent_emb) AS sim,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(c.emb, cent_emb) DESC, cent_id) AS rn
      |    FROM c CROSS JOIN cents2) WHERE rn = 1)
      |SELECT cent_id AS cluster_id, vec_id AS kept_vec,
      |  CAST(n_members AS BIGINT) AS n_members,
      |  floor(sim * 1000000 + 0.5) / 1000000 AS sim
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY cent_id ORDER BY sim DESC, vec_id) AS rk,
      |        count(*) OVER (PARTITION BY cent_id) AS n_members
      |      FROM a3)
      |WHERE rk = 1""".stripMargin
  ) { (s, d) =>
    // cache: seed filter + two centroid rounds + the final assignment
    // all read this one frame (guide §5 reuse)
    val c = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .cache()
    val cents2 = twoRoundCentroids(c,
      kmeansDivisor(SimilarityOps.corpusCount(s, d)))
      .select(col("cent_id"), col("cent_emb"))
    c.crossJoin(broadcast(centsAsRow(cents2)))
      .filter(size(col("cents")) > 0) // see assign: cheap null guard
      .select(col("vec_id"),
        VectorExpressions.bestCentroid(col("embedding"), col("cents"))
          .as("best"))
      .select(col("vec_id"), col("best.cent_id").as("cluster_id"),
        col("best.sim").as("sim"))
      .groupBy(col("cluster_id"))
      .agg(
        max_by(struct(col("vec_id"), col("sim")),
          struct(col("sim"), (-col("vec_id")).as("nv"))).as("keep"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("keep.vec_id").as("kept_vec"),
        col("n_members"),
        (floor(col("keep.sim") * 1000000 + 0.5) / 1000000).as("sim"))
  }

  val all: Map[String, QueryDef] = Map(
    "q56_kmeans" -> q56Kmeans,
    "q81_semantic_keep" -> q81SemanticKeep
  )
}
