package graft

/** The Verify/Bench runners sweep cached relations after each query
  * materializes (CacheHygiene.sweep). Locks the contract: a
  * cache-heavy query leaves cached state behind, and one sweep
  * returns the session to a clean cache manager.
  */
class CacheHygieneSpec extends SparkSpec {

  test("sweep releases a cache-heavy query's relations") {
    val d = sf("sf0.001")
    CacheHygiene.sweep(spark) // other suites share the session
    assert(CacheHygiene.isClean(spark))
    // triangle census caches the edge list, degrees, and oriented
    // adjacency — the heaviest per-query cache user
    assert(operators.GraphOps.q85Triangles.fn(spark, d).count() > 0)
    assert(!CacheHygiene.isClean(spark),
      "q85 is expected to cache; if it stopped, pick another query here")
    CacheHygiene.sweep(spark)
    assert(CacheHygiene.isClean(spark))
  }
}
