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

  /** Spherical k-means over `embeddings`: seeds = vectors with
    * vec_id % 101 = 1, two assign→update rounds, then a final
    * assignment; output is per-cluster membership count and the
    * 4-dp-rounded centroid L2 norm. Clusters that lose every member
    * drop out (both engines aggregate only over assigned rows). */
  val q56Kmeans: QueryDef = QueryDef.withOracle(
    """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |cents0 AS (SELECT vec_id AS cent_id, emb AS cent_emb FROM c WHERE vec_id % 101 = 1),
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
      |  FROM d2 GROUP BY 1, 2),
      |cents2 AS (
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
    val c = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cents0 = c.filter(col("vec_id") % 101 === 1)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

    // argmax-cosine assignment (tiebreak: min cent_id), embedding
    // carried inside the max_by value so it never re-joins
    def assign(cents: DataFrame): DataFrame =
      c.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cent_id"),
          VectorExpressions.cosine(col("embedding"), col("cent_emb")).as("sim"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cent_id"), col("embedding")),
          struct(col("sim"), (-col("cent_id")).as("ng"))).as("best"))
        .select(col("vec_id"), col("best.embedding").as("embedding"),
          col("best.cent_id").as("cent_id"))

    // quantized-exact centroid mean; also returns member counts
    def update(assigned: DataFrame): DataFrame =
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

    val cents1 = update(assign(cents0)).select(col("cent_id"), col("cent_emb"))
    val cents2 = update(assign(cents1))
    cents2.select(
      col("cent_id").as("cluster_id"),
      col("n_members").cast("long").as("n_members"),
      (floor(sqrt(VectorExpressions.sqnorm(col("cent_emb"))) * 10000 + 0.5)
        / 10000).as("cent_norm"))
  }

  val all: Map[String, QueryDef] = Map(
    "q56_kmeans" -> q56Kmeans
  )
}
