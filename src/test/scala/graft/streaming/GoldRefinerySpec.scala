package graft.streaming

import graft.SparkSpec
import graft.etl.{BronzeToSilver, EtlConfig, Fixtures, Lake, SilverToGold}
import org.apache.spark.sql.functions._

class GoldRefinerySpec extends SparkSpec {

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  test("streaming gold equals batch gold across a micro-batch split") {
    val lake = java.nio.file.Files.createTempDirectory("graft-goldref").toString
    // span two date partitions so the daily-energy dynamic overwrite
    // exercises per-date recompute, and batch 2 revisits batch 1's
    // devices so the health merge rewrites existing rows
    val start = java.time.Instant.parse("2025-07-15T23:59:00Z")
    val cfg = EtlConfig(referenceInstant = Some(start.plusSeconds(2 * 3600)))
    val catalog = Fixtures.deviceCatalog(spark, 3)
    val full = Fixtures.bronzeTelemetry(spark, nDevices = 3,
      rowsPerDevice = 120, start = start).cache()
    val splitTs = start.plusSeconds(90).toString // batch 2 = rows 90..119

    // silver arrives in two deliveries (the refinery's input cadence)
    def silverOf(bronze: org.apache.spark.sql.DataFrame) =
      BronzeToSilver.run(bronze, Fixtures.deviceCatalog(spark, 3), cfg)
    Lake.writeSilver(silverOf(full.filter(col("timestamp") < lit(splitTs))), lake)
    GoldRefinery.runOnce(spark, lake, cfg)
    // second delivery APPENDS files like the streaming refinery sink
    silverOf(full.filter(col("timestamp") >= lit(splitTs)))
      .withColumn("date", to_date(col("timestamp")))
      .write.partitionBy("date").mode("append")
      .parquet(s"$lake/silver/energy_usage")
    GoldRefinery.runOnce(spark, lake, cfg)

    // batch comparison path: one-shot SilverToGold over the SAME
    // silver lake bytes (fresh frames — see SilverRefinerySpec note)
    val silver = spark.read.parquet(s"$lake/silver/energy_usage")
      .drop("date").cache()
    val de = SilverToGold.dailyEnergyConsumption(silver, cfg)
    val dh = SilverToGold.deviceHealthMetrics(silver, cfg)
    val bs = SilverToGold.dailyBusinessSummary(de, dh, cfg)

    val gotDe = spark.read.parquet(s"$lake/gold/daily_energy_consumption")
    val gotDh = spark.read.parquet(s"$lake/gold/device_health_metrics")
    val gotBs = spark.read.parquet(s"$lake/gold/daily_business_summary")
    assert(gotDe.count() > 0 && gotDh.count() == 3 && gotBs.count() == 2)
    // column-order-insensitive, multiset-exact parity per table
    assert(multiset(gotDe.select(de.columns.map(col): _*)) == multiset(de))
    assert(multiset(gotDh.select(dh.columns.map(col): _*)) == multiset(dh))
    assert(multiset(gotBs.select(bs.columns.map(col): _*)) == multiset(bs))

    // idempotent: draining again with no new silver changes nothing
    GoldRefinery.runOnce(spark, lake, cfg)
    assert(multiset(spark.read.parquet(s"$lake/gold/daily_business_summary")
      .select(bs.columns.map(col): _*)) == multiset(bs))
  }

  test("untouched devices keep their health rows when a batch misses them") {
    val lake = java.nio.file.Files.createTempDirectory("graft-goldref2").toString
    val start = java.time.Instant.parse("2025-07-20T10:00:00Z")
    val cfg = EtlConfig(referenceInstant = Some(start.plusSeconds(2 * 3600)))
    val full = Fixtures.bronzeTelemetry(spark, nDevices = 4,
      rowsPerDevice = 60, start = start).cache()
    def silverOf(bronze: org.apache.spark.sql.DataFrame) =
      BronzeToSilver.run(bronze, Fixtures.deviceCatalog(spark, 4), cfg)

    // delivery 1: all devices; delivery 2: a single device only
    Lake.writeSilver(silverOf(full), lake)
    GoldRefinery.runOnce(spark, lake, cfg)
    val one = full.filter(col("device_id") === "device_001")
    silverOf(one)
      .withColumn("date", to_date(col("timestamp")))
      .write.partitionBy("date").mode("append")
      .parquet(s"$lake/silver/energy_usage")
    GoldRefinery.runOnce(spark, lake, cfg)

    val dh = spark.read.parquet(s"$lake/gold/device_health_metrics")
    assert(dh.count() == 4, "one row per device, no dup from the merge")
    // the raw append duplicated device_001's history; BOTH the
    // refinery's recompute and the batch comparison read the same
    // silver bytes, so parity must hold including the duplication —
    // and devices 002-004, untouched by batch 2, must still match
    val silver = spark.read.parquet(s"$lake/silver/energy_usage")
      .drop("date")
    val expect = SilverToGold.deviceHealthMetrics(silver, cfg)
    assert(multiset(dh.select(expect.columns.map(col): _*)) == multiset(expect))
  }
}
