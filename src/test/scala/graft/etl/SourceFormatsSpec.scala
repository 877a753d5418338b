package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: the CSV dimension scans
  * the reference uses (S3), plus JSON/ORC roundtrips of the silver
  * schema — a complete engine reads whatever lands in the lake.
  */
class SourceFormatsSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-formats").toString

  test("device catalog CSV roundtrip with declared schema") {
    val catalog = Fixtures.deviceCatalog(spark, 10)
    catalog.write.option("header", "true").mode("overwrite")
      .csv(s"$tmp/catalog")
    val back = Lake.readDeviceCatalog(spark, s"$tmp/catalog")
    assert(back.count() == 10)
    assert(back.schema == Schemas.deviceCatalog)
    // DATE-typed installation_date → age computation works
    val joined = BronzeToSilver.enrichWithCatalog(
      BronzeToSilver.validateAndClean(
        Fixtures.bronzeTelemetry(spark, nDevices = 10, rowsPerDevice = 10)),
      back)
    assert(joined.filter(col("device_age_days").isNull).count() == 0)
  }

  test("billing CSV reads with declared schema") {
    BillingJoin.billingFixture(spark)
      .write.option("header", "true").mode("overwrite").csv(s"$tmp/billing")
    val back = Lake.readBillingData(spark, s"$tmp/billing")
    assert(back.count() == 4)
    assert(back.schema("energy_rate_kwh").dataType.typeName == "double")
  }

  test("silver roundtrips through ORC and JSON") {
    val silver = BronzeToSilver.run(
      Fixtures.bronzeTelemetry(spark, nDevices = 3, rowsPerDevice = 50),
      Fixtures.deviceCatalog(spark, 3))
    for (fmt <- Seq("orc", "json")) {
      silver.write.format(fmt).mode("overwrite").save(s"$tmp/silver_$fmt")
      val back = spark.read.format(fmt)
        .schema(silver.schema) // JSON needs the schema (no self-description)
        .load(s"$tmp/silver_$fmt")
      assert(back.count() == silver.count(), fmt)
      val sumBack = back.agg(sum("energy_consumption_wh")).head().getDouble(0)
      val sumOrig = silver.agg(sum("energy_consumption_wh")).head().getDouble(0)
      assert(math.abs(sumBack - sumOrig) < 1e-6, fmt)
    }
  }

  test("schema evolution: mergeSchema unions batches, old rows null-fill") {
    import spark.implicits._
    val dir = s"$tmp/evolving"
    // batch 1: v1 schema; batch 2 adds a column (the additive-evolution
    // path a long-lived lake table takes; renames/drops need a rewrite)
    Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
      .write.mode("overwrite").parquet(dir)
    Seq((3L, "c", 0.9)).toDF("id", "payload", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "payload", "score"))
    assert(merged.count() == 3)
    assert(merged.filter(col("score").isNull).count() == 2,
      "pre-evolution rows surface as NULL in the new column")
    assert(merged.filter(col("score").isNotNull).select("id").head().getLong(0) == 3L)
    // WITHOUT mergeSchema the footer picked is undefined across files —
    // the option is the contract, not a default behavior
  }
}
