package graft

import org.apache.spark.sql.execution.ExplainMode

/** Lock-coverage meta-spec: a gate query can never ship planless
  * again (the q132/q133 round-7 regression — two queries landed in a
  * snapshot commit with no PlanSpec lock and one of them carried a
  * 2-partition global-rank window).
  *
  * Every key in `SparkEntry.queries` must fall in exactly one bucket:
  *   1. LOCKED — named in a PlanSpec test (extracted from the
  *      PlanSpec source, so adding a lock is self-registering);
  *   2. EXEMPT — listed below with a reason (queries whose fn() runs
  *      a driver-side iterative loop, so a blanket explain would
  *      execute the whole training/propagation);
  *   3. BLANKET — everything else gets a floor assertion here: the
  *      sf0.001 physical plan contains no CartesianProduct (the one
  *      anti-pattern that is NEVER right in this engine — every
  *      intended cross join is a broadcast of a scalar/centroid
  *      frame, which plans as BroadcastNestedLoopJoin instead).
  */
class PlanCoverageSpec extends SparkSpec {

  private val planSpecSource = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/test/scala/graft/PlanSpec.scala")),
    java.nio.charset.StandardCharsets.UTF_8)

  /** Query names a PlanSpec test explains (via plan("…") or a direct
    * SparkEntry.queries("…") build). */
  private val locked: Set[String] =
    """(?:plan|queries|leaves)\("(q[0-9a-z_]+)"\)""".r
      .findAllMatchIn(planSpecSource).map(_.group(1)).toSet

  /** fn() runs a driver-side loop (Lloyd / PageRank / label
    * propagation) whose rounds materialize during plan construction —
    * a blanket explain would execute the full iteration. Their scale
    * shapes are asserted elsewhere, as noted. */
  private val exempt: Map[String, String] = Map(
    "q49_dedup_clusters" -> ("iterative label propagation; result is " +
      "a checkpoint leaf by design (leaf + memo locked by the q133 " +
      "sibling test; per-round algebra in DedupClusterSpec)"),
    "q56_kmeans" -> ("Lloyd rounds materialize inside fn(); centroid " +
      "attach is crossJoin(broadcast(centroids)) by construction"),
    "q81_semantic_keep" -> ("shares q56's training loop; the keep " +
      "filter is a broadcast semi-join on the tiny representative set"),
    "q75_pagerank" -> ("iterative rank rounds materialize inside " +
      "fn(); checkpoint-path equivalence spec'd in Relational3Spec"),
    "q145_top_eigenvector" -> ("fn() runs q144's gram job then the " +
      "driver-side integer power iteration (metadata-sized matrix — " +
      "the bloom-sketch convention); the data-sized plan is q144's, " +
      "which is locked"))

  test("every gate query is locked, exempted with a reason, or blanket-scanned") {
    val all = SparkEntry.queries.keySet
    val stale = (locked ++ exempt.keySet) -- all
    assert(stale.isEmpty, s"locks/exemptions for unknown queries: $stale")
    val doubly = locked.intersect(exempt.keySet)
    assert(doubly.isEmpty, s"both locked and exempt (drop the exemption): $doubly")

    val blanket = (all -- locked -- exempt.keySet).toSeq.sorted
    val offenders = blanket.flatMap { name =>
      val p = SparkEntry.queries(name)(spark, sf("sf0.001"))
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in gate-query plans: $offenders")
    // coverage is total by construction; report the partition sizes so
    // a failing diff is easy to read
    info(s"locked=${locked.size} exempt=${exempt.size} blanket=${blanket.size}")
  }
}
