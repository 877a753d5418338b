package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall
  * seconds (driver contract).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // test SFs ship one ~1-60 MB file per table; the 128 MB default
      // would make every scan a single partition. 8 MB splits keep all
      // cores busy locally without perturbing the 100 TB story (where
      // files are many and the default is right).
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup (untimed): parquet footers + session/codegen init via a
    // tiny query per table, so the first timed query doesn't carry
    // one-time JVM cost.
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(5).collect()
      catch { case _: Throwable => () }
    }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // Two timed runs per query, report the min: run 1 includes that
    // query's whole-stage-codegen compilation (~0.1-0.3 s each, pure
    // one-time JVM cost); the min reflects steady-state throughput,
    // which is what scales to a long-lived cluster session.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            // a failed query must be visible as -1, never reported as
            // a (fast) success with its failure duration
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            Double.NaN
        }
      }
      name -> (if (times.exists(_.isNaN)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"agg":"min"}""")
    spark.stop()
  }
}
