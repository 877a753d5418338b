package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Turns near-duplicate PAIRS (from MinHash/SimHash/Jaccard candidate
  * generation) into duplicate CLUSTERS with a canonical survivor —
  * the step an actual dedup pipeline needs before dropping rows.
  *
  * Connected components via iterative min-label propagation, with
  * pointer jumping engaged adaptively: shallow components (the normal
  * near-dup case) converge in a few plain hop rounds with no extra
  * work; anything still moving after `JumpAfter` rounds is deep, and
  * later rounds also follow each label to its own label, collapsing a
  * diameter-d chain in O(log d) total rounds. The loop exits early at
  * fixpoint; a non-converged run is reported loudly rather than
  * returned silently. All driver-side logic is the loop counter; the
  * data path is pure shuffled joins/aggregations (scales with edges,
  * not with cluster count).
  */
object DedupCluster {

  /** Rounds of plain hop-propagation before pointer jumping kicks in
    * (see the loop comment). */
  private val JumpAfter = 3

  /** @param pairs edges as (doc_a, doc_b) columns
    * @param docs  all doc ids as column `doc_id` (singletons keep
    *              themselves as canonical)
    * @param checkpointEvery truncate plan lineage with an eager
    *              localCheckpoint every N rounds — without it each
    *              round's plan nests the previous round's joins, and a
    *              deep component (diameter ≫ 5) grows the optimizer's
    *              input linearly until planning dominates runtime
    * @return (doc_id, canonical_id) — canonical = min id in the
    *         connected component */
  def canonicalize(docs: DataFrame, pairs: DataFrame,
      maxIter: Int = 50, checkpointEvery: Int = 5): DataFrame = {
    // undirected edge list, both directions. EAGER localCheckpoint,
    // not cache(): a cache truncates execution but NOT the logical
    // plan, so when the candidate generator behind `pairs` is itself
    // a large subtree (q44's LSH bucket self-join), every
    // label-propagation round — and especially the pointer-jump
    // rounds, which reference the round's frame TWICE — re-nests that
    // subtree, and AQE's per-stage plan stringification alone went
    // quadratic (observed: q133 burned 10+ min of pure driver CPU in
    // Statistics.toString with 17 GB of plan strings). The checkpoint
    // makes the edge list the plan's leaf.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = docs.select(col("doc_id"),
      col("doc_id").as("canonical_id"))
    var changed = true
    var i = 0
    while (changed && i < maxIter) {
      // neighbor's current label, min over (own, neighbors')
      val viaEdges = edges
        .join(labels.withColumnRenamed("doc_id", "dst")
          .withColumnRenamed("canonical_id", "n_label"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("n_label")).as("min_n_label"))
      val hopped = labels.join(viaEdges, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("canonical_id"),
            coalesce(col("min_n_label"), col("canonical_id")))
            .as("canonical_id"))
        .cache()
      // Pointer jump — but only once plain hopping has had JumpAfter
      // rounds: near-dup components are almost always diameter ≤ 2-3,
      // and for them the jump's extra self-join per round is pure
      // overhead. A component still unconverged after JumpAfter rounds
      // is deep, and from then on each round also follows every label
      // to ITS label (labels are always doc ids, so the self-join
      // matches every row), halving the remaining pointer depth —
      // O(log d) rounds for a diameter-d chain instead of O(d).
      val next =
        if (i < JumpAfter) hopped
        else hopped
          .join(hopped.select(col("doc_id").as("canonical_id"),
            col("canonical_id").as("jumped")), Seq("canonical_id"), "left")
          .select(col("doc_id"),
            least(col("canonical_id"),
              coalesce(col("jumped"), col("canonical_id")))
              .as("canonical_id"))
          .cache()
      val diff = next.alias("n").join(labels.alias("l"), "doc_id")
        .filter(col("n.canonical_id") =!= col("l.canonical_id")).count()
      if (next ne hopped) hopped.unpersist()
      labels.unpersist()
      labels =
        if ((i + 1) % checkpointEvery == 0) {
          val cp = next.localCheckpoint(true) // eager: cuts lineage here
          next.unpersist()
          cp
        } else next
      changed = diff > 0
      i += 1
    }
    edges.unpersist()
    if (changed)
      throw new IllegalStateException(
        s"DedupCluster.canonicalize did not converge in $maxIter rounds — " +
          "a component has diameter > maxIter; raise maxIter")
    labels
  }

  /** Full near-dup removal: keep one row per cluster (the canonical
    * doc), given a pair-producing candidate stage. */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val canon = canonicalize(
      docs.select(col(idCol).as("doc_id")), pairs)
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id").as(idCol))
    docs.join(canon, Seq(idCol), "left_semi")
  }
}
