package graft.etl

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake layout: partitioned parquet sinks and pruned scans
  * (SURVEY §2.1 S4-S10).
  *
  * The reference hand-rolls partition pruning by constructing
  * YYYY/MM/DD paths and filtering files by mtime
  * (bronze_to_silver.py:38-80); here every table is written
  * `partitionBy("date")` and read with a date predicate, which
  * Catalyst turns into partition pruning — the 100 TB path: a
  * lookback query touches only its date directories regardless of
  * lake size.
  *
  * Idempotence (ST8): the reference appends overlapping windows and
  * dedups at read; we dedup before write and use dynamic partition
  * overwrite (`replaceWhere` semantics) so reprocessing a window
  * rewrites its partitions instead of duplicating them — documented
  * intentional deviation, oracle comparisons are on deduped sets.
  */
object Lake {

  /** S7: Silver sink — date-partitioned, dedup-on-write, dynamic
    * partition overwrite for idempotent reprocessing. */
  def writeSilver(silver: DataFrame, root: String): Unit =
    silver
      .withColumn("date", to_date(col("timestamp")))
      .dropDuplicates("device_id", "timestamp")
      .repartition(col("date")) // one writer set per partition → no small files
      .write
      .partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(s"$root/silver/energy_usage")

  /** S8: Silver scan with lookback pruning (days_back, anchored at
    * cfg.now — wall-clock-free under a pinned referenceInstant). */
  def readSilver(spark: SparkSession, root: String, daysBack: Int = 7,
      cfg: EtlConfig = EtlConfig()): DataFrame = {
    val cutoff = java.sql.Date.valueOf(
      cfg.now.atZone(java.time.ZoneOffset.UTC).toLocalDate.minusDays(daysBack))
    spark.read
      // S6 semantics: skip corrupt files with a warning instead of
      // failing the job (bronze_to_silver.py:96-101)
      .option("ignoreCorruptFiles", "true")
      .parquet(s"$root/silver/energy_usage")
      .filter(col("date") >= lit(cutoff)) // partition pruning
  }

  /** S9: Gold sinks — daily_energy + device_health flat snapshots,
    * business summary date-partitioned. */
  def writeGold(dailyEnergy: DataFrame, deviceHealth: DataFrame,
      businessSummary: DataFrame, root: String): Unit = {
    dailyEnergy.write.mode("overwrite")
      .parquet(s"$root/gold/daily_energy_consumption")
    deviceHealth.write.mode("overwrite")
      .parquet(s"$root/gold/device_health_metrics")
    businessSummary.write
      .partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(s"$root/gold/daily_business_summary")
  }

  /** S5-analog Bronze scan: event-date partition pruning via
    * predicate (replaces the reference's hand-built YYYY/MM/DD paths
    * + mtime windows; incremental tailing belongs to the streaming
    * ingest, graft.streaming). */
  def readBronze(spark: SparkSession, root: String, hoursBack: Int = 24,
      cfg: EtlConfig = EtlConfig()): DataFrame = {
    val cutoff: Instant = cfg.now.minusSeconds(hoursBack * 3600L)
    spark.read.schema(Schemas.bronzeTelemetry.add("date", "date"))
      .option("ignoreCorruptFiles", "true") // S6 corrupt-file skip
      .parquet(s"$root/bronze/telemetry")
      .filter(col("date") >= lit(java.sql.Date.valueOf(
        cutoff.atZone(java.time.ZoneOffset.UTC).toLocalDate)))
      .filter(try_to_timestamp(col("timestamp")) >=
        lit(java.sql.Timestamp.from(cutoff)))
  }

  /** S3: device-catalog CSV scan with the declared schema
    * (bronze_to_silver.py:29-36; header CSV, 10 rows). DATE-typed
    * installation_date is what makes the age computation work where
    * the reference's string-vs-tz subtraction silently failed. */
  def readDeviceCatalog(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.deviceCatalog)
      .csv(path)

  /** Billing CSV (config/billing_data.csv shape, SURVEY J3). */
  def readBillingData(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.billingData)
      .csv(path)

  /** S4-as-batch: Bronze sink partitioned by event date. */
  def writeBronze(bronze: DataFrame, root: String): Unit =
    bronze
      // try_: raw bronze may carry unparseable timestamps; they land in
      // the null date partition, which readBronze's date >= cutoff
      // predicate excludes — such rows are retained for audit but never
      // reach Silver (they would fail timestamp validation regardless)
      .withColumn("date", to_date(try_to_timestamp(col("timestamp"))))
      .repartition(col("date"))
      .write
      .partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(s"$root/bronze/telemetry")
}
