package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timing harness: Bench's exact session config and timing
  * protocol (3 runs, median, count() action, cache sweep between
  * queries) over a NAMED subset, so an optimization round can measure
  * one query without paying the full 328-query sweep. Not part of the
  * driver contract — Bench remains the reported number.
  *
  * Usage: runMain graft.TimeRun <sfDir> <query>[,<query>...]
  */
object TimeRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(5).collect()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val _ = fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      CacheHygiene.sweep(spark)
      println(f"TIMERUN $name%-28s median=${times.sorted.apply(1)}%6.2f  " +
        f"runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
