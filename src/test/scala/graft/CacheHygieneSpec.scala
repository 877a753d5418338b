package graft

/** The Verify/Bench runners sweep cached relations after each query
  * materializes (CacheHygiene.sweep). Locks the contract: a
  * cache-heavy query leaves cached state behind, and one sweep
  * returns the session to a clean cache manager.
  *
  * ASSUMES SERIAL SUITE EXECUTION in the forked test JVM (sbt default:
  * Test/fork := true, testForkedParallel = false). The isClean /
  * !isClean assertions read session-global cache-manager state, and
  * sweep() would clobber a concurrently-running suite's caches —
  * guard this suite with its own SparkSession before ever enabling
  * parallel test execution.
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

  test("SmartHomeOps pins re-register their caches after a sweep") {
    val d = sf("sf0.001")
    CacheHygiene.sweep(spark)
    // first access builds + caches silver and the three pinned frames
    assert(operators.SmartHomeOps.q64Dashboard.fn(spark, d).count() > 0)
    assert(!CacheHygiene.isClean(spark))
    CacheHygiene.sweep(spark)
    assert(CacheHygiene.isClean(spark))
    // post-sweep access must RE-REGISTER the memoized frames' caches at
    // plan-construction time (recache), so q63-q65 read the pins
    // instead of rebuilding silver from the fixture generator on every
    // action — the round-6 bench-noise defect (q62: 0.38 s → 3.12 s)
    val df = operators.SmartHomeOps.q64Dashboard.fn(spark, d)
    assert(!CacheHygiene.isClean(spark),
      "pinned()/silver() did not re-register swept caches")
    assert(df.count() > 0)
    CacheHygiene.sweep(spark)
  }
}
