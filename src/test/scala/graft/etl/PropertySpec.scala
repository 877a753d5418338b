package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based invariants over the ETL formulas (SURVEY §5.4):
  * generated telemetry rows flow through the REAL transforms and the
  * outputs must satisfy the reference's numeric contracts.
  *
  * ScalaCheck generators are sampled with fixed seeds (the
  * scalatestplus bridge isn't available offline) — deterministic
  * across runs, multiple draws per property.
  */
class PropertySpec extends SparkSpec {

  import java.time.Instant

  private val rowGen: Gen[Row] = for {
    dev <- Gen.choose(1, 5)
    offset <- Gen.choose(0, 100000)
    temp <- Gen.choose(-49.0, 99.0)
    power <- Gen.choose(0.0, 9999.0)
    energy <- Gen.choose(0.0, 1000.0)
    alert <- Gen.oneOf("none", "high_power", "low_battery")
    missingLoc <- Gen.prob(0.3)
    missingMan <- Gen.prob(0.3)
    missingMod <- Gen.prob(0.3)
    lateHrs <- Gen.oneOf(0, 0, 0, 60)
  } yield {
    val ts = Instant.parse("2025-07-15T00:00:00Z").plusSeconds(offset.toLong)
    Row(f"device_$dev%03d", "thermostat", "user_001", ts.toString,
      temp, power, energy, "online", alert,
      if (missingLoc) null else "living_room",
      if (missingMan) null else "Nest",
      if (missingMod) null else "LT",
      ts.plusSeconds(lateHrs * 3600L + 2).toString)
  }

  private def draw(n: Int, seed: Long): List[Row] =
    Gen.listOfN(n, rowGen)(Gen.Parameters.default, rng.Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  private def toDf(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), Schemas.bronzeTelemetry)

  test("quality_score ∈ [0.3, 1.0] and is_valid ⇔ score ≥ 0.5 for schema-valid rows") {
    for (seed <- 1L to 5L) {
      val out = BronzeToSilver.validateAndClean(toDf(draw(80, seed)))
      val viol = out.filter(
        col("quality_score") < lit(0.3 - 1e-9) ||
          col("quality_score") > lit(1.0 + 1e-9) ||
          (col("is_valid") =!= (col("quality_score") >= 0.5)))
      assert(viol.count() == 0, s"seed $seed")
    }
  }

  test("rolling mean is bounded by the device's min/max") {
    for (seed <- 10L to 12L) {
      val silver = BronzeToSilver.derivedMetrics(
        BronzeToSilver.validateAndClean(toDf(draw(120, seed).distinct)))
      val bounds = silver.groupBy("device_id")
        .agg(min("temperature").as("lo"), max("temperature").as("hi"))
      val viol = silver.join(bounds, "device_id")
        .filter(col("temp_1h_avg") < col("lo") - lit(1e-9) ||
          col("temp_1h_avg") > col("hi") + lit(1e-9))
      assert(viol.count() == 0, s"seed $seed")
    }
  }

  test("health metrics stay in [0,1] and uptime ≤ 100 for arbitrary silver") {
    for (seed <- 20L to 22L) {
      val silver = BronzeToSilver.run(toDf(draw(100, seed).distinct),
        Fixtures.deviceCatalog(spark, 5))
      if (silver.count() > 0) {
        val health = SilverToGold.deviceHealthMetrics(silver)
        val viol = health.filter(
          col("health_score") < 0 || col("health_score") > 1 ||
            col("failure_probability") < 0 || col("failure_probability") > 1 ||
            col("data_reliability") < 0 || col("data_reliability") > 1 ||
            col("uptime_percentage") > lit(100.0 + 1e-9))
        assert(viol.count() == 0, s"seed $seed")
      }
    }
  }

  test("medallion pipeline invariants hold across randomized fixture seeds") {
    // the q60-shape pipeline over several RANDOM fixture seeds, not
    // just the canonical 42 — fuzzes the formula edges the fixed
    // fixture happens to miss
    val cfg = EtlConfig(referenceInstant =
      Some(Fixtures.DefaultStart.plusSeconds(2 * 3600)))
    for (seed <- Seq(42L, 7L, 99L, 12345L, 987654321L)) {
      val silver = BronzeToSilver.run(
        Fixtures.bronzeTelemetry(spark, nDevices = 6, rowsPerDevice = 40,
          seed = seed, dirty = true),
        Fixtures.deviceCatalog(spark, 6), cfg)
      // delay may be slightly NEGATIVE (the dirty fixture stamps some
      // ingestion times before the event — clock skew the reference
      // passes through unclamped), but never null, and the late flag
      // must agree with the threshold
      assert(silver.filter(col("quality_score") < lit(0.3 - 1e-9) ||
        col("quality_score") > lit(1.0 + 1e-9) ||
        col("processing_delay_hours").isNull ||
        (col("is_late_event") =!=
          (col("processing_delay_hours") > cfg.watermarkHours)))
        .count() == 0, s"seed $seed")
      val de = SilverToGold.dailyEnergyConsumption(silver, cfg)
      val dh = SilverToGold.deviceHealthMetrics(silver, cfg)
      val bs = SilverToGold.dailyBusinessSummary(de, dh, cfg)
      assert(dh.filter(
        col("health_score") < 0 || col("health_score") > 1 ||
          col("failure_probability") < 0 || col("failure_probability") > 1 ||
          col("data_reliability") < 0 || col("data_reliability") > 1 ||
          col("uptime_percentage") > lit(100.0 + 1e-9)).count() == 0,
        s"seed $seed")
      val b = bs.collect()
      assert(b.nonEmpty && b.forall { r =>
        r.getAs[Long]("active_devices") <= 6 &&
          r.getAs[Double]("total_energy_wh") >= 0 &&
          r.getAs[Double]("cost_per_kwh") >= 0
      }, s"seed $seed")
    }
  }

  test("zero-span and all-late fixtures keep the health formulas in range") {
    val cfg = EtlConfig(referenceInstant =
      Some(Fixtures.DefaultStart.plusSeconds(2 * 3600)))
    // zero-span uptime: a single reading per device makes
    // max(ts)−min(ts) = 0 — the explicit `when` guard must yield
    // exactly 100, not a division by zero
    val one = BronzeToSilver.run(
      Fixtures.bronzeTelemetry(spark, nDevices = 3, rowsPerDevice = 1,
        seed = 5L),
      Fixtures.deviceCatalog(spark, 3), cfg)
    val dh1 = SilverToGold.deviceHealthMetrics(one, cfg)
    assert(dh1.count() == 3 &&
      dh1.filter(col("uptime_percentage") =!= 100.0).count() == 0)

    // all-late batch: EVERY row ingested 49 h after event time — the
    // late flag saturates (is_late_event_mean = 1) and health /
    // failure stay clamped to [0, 1]
    val allLate = Fixtures.bronzeTelemetry(spark, nDevices = 3,
        rowsPerDevice = 30, seed = 9L)
      .withColumn("ingestion_time", date_format(
        try_to_timestamp(col("timestamp")) + expr("INTERVAL 49 HOURS"),
        "yyyy-MM-dd'T'HH:mm:ssXXX"))
    val silverLate = BronzeToSilver.run(allLate,
      Fixtures.deviceCatalog(spark, 3), cfg)
    assert(silverLate.filter(!col("is_late_event")).count() == 0)
    val dhLate = SilverToGold.deviceHealthMetrics(silverLate, cfg)
    assert(dhLate.filter(
      col("health_score") < 0 || col("health_score") > 1 ||
        col("failure_probability") < 0 || col("failure_probability") > 1)
      .count() == 0)
  }

  test("validateAndClean is idempotent (dedup + filters are stable)") {
    for (seed <- 30L to 32L) {
      val rows = draw(60, seed)
      val withDups = rows ++ rows.take(10)
      val once = BronzeToSilver.validateAndClean(toDf(withDups))
      val twice = BronzeToSilver.validateAndClean(
        once.withColumn("timestamp",
          date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ssXXX")))
      assert(once.count() == twice.count(), s"seed $seed")
    }
  }
}
