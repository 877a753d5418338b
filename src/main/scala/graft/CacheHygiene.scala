package graft

import org.apache.spark.sql.SparkSession

/** Runner-level cache hygiene. Several operators cache frames their
  * own plan reads more than once (triangle adjacency, minhash
  * signatures, …). Those caches are correct and wanted WHILE the
  * query materializes — but a long Verify/Bench session runs ~130
  * queries in one JVM, and without an explicit release the cached
  * relations accumulate until LRU eviction (harmless at sf0.1,
  * sloppy at the 100 TB posture where executor memory is the scarce
  * resource). The runners sweep after each query's action completes:
  * within-query reuse keeps its benefit, cross-query state is zero.
  */
object CacheHygiene {
  /** Drop every cached relation. Safe after materialization: any
    * re-run simply re-caches. */
  def sweep(spark: SparkSession): Unit =
    spark.sharedState.cacheManager.clearCache()

  /** True iff no relation is currently cached (spec hook). */
  def isClean(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
