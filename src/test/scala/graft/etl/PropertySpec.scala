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
