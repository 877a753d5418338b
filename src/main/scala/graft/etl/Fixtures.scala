package graft.etl

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import scala.util.Random

/** Deterministic, wall-clock-free telemetry fixtures per FIXTURES.md —
  * the seeded Scala re-expression of the reference producer's value
  * model (telemetry_sim.py:86-153, config/config.py:50-84). Used by
  * the ScalaTest suites and the end-to-end pipeline demo queries.
  */
object Fixtures {

  val DefaultStart: Instant = Instant.parse("2025-07-15T00:00:00Z")

  private val deviceTypes =
    Seq("thermostat", "smart_bulb", "smart_plug", "security_camera", "motion_sensor")
  private val locations = Seq("living_room", "bedroom", "kitchen", "front_door",
    "hallway", "garage", "backyard", "basement")
  private val makers = Seq(
    ("Nest", "Learning Thermostat"), ("Philips", "Hue White"),
    ("TP-Link", "Kasa Smart Plug"), ("Ring", "Indoor Cam"),
    ("Aqara", "Motion Sensor P1"))

  /** temp range per type (config.py:50-84). */
  private def tempRange(t: String): (Double, Double) = t match {
    case "thermostat" => (18, 26)
    case "smart_bulb" | "smart_plug" => (20, 25)
    case "security_camera" => (15, 30)
    case _ => (18, 25)
  }

  private def powerRange(t: String): (Double, Double) = t match {
    case "thermostat" => (500, 4000)
    case "smart_bulb" => (8, 15)
    case "smart_plug" => (0, 1500)
    case "security_camera" => (5, 12)
    case _ => (0.1, 0.5)
  }

  /** Single source of the per-device dimension attributes — catalog
    * and telemetry generators MUST agree for the enrichment join to
    * behave (one derivation, not two copies). */
  private final case class Device(id: String, typ: String, user: String,
      loc: String, maker: String, model: String, installed: java.time.LocalDate)

  private def device(i: Int, nDevices: Int): Device = {
    val (mk, md) = makers((i - 1) % makers.size)
    Device(
      f"device_$i%03d",
      deviceTypes((i - 1) % deviceTypes.size),
      if (i <= (nDevices + 1) / 2) "user_001" else "user_002",
      locations((i - 1) % locations.size),
      mk, md,
      java.time.LocalDate.of(2024, 1, 15).plusDays(i - 1))
  }

  /** 10-row device catalog (config/device_catalog.csv semantics). */
  def deviceCatalog(spark: SparkSession, nDevices: Int = 10): DataFrame = {
    val rows = (1 to nDevices).map { i =>
      val dv = device(i, nDevices)
      Row(dv.id, dv.typ, dv.user, dv.loc,
        java.sql.Date.valueOf(dv.installed), dv.maker, dv.model)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.deviceCatalog)
  }

  /** Deterministic bronze telemetry: `rowsPerDevice` messages per
    * device at 1 msg/s from `start`, seeded random walk per device.
    * `dirtyRows` appends the FIXTURES.md dirty-data variants
    * (nulls, out-of-range values, duplicates, late events). */
  def bronzeTelemetry(spark: SparkSession, nDevices: Int = 10,
      rowsPerDevice: Int = 120, start: Instant = DefaultStart,
      seed: Long = 42L, dirty: Boolean = false): DataFrame = {
    val catalog = (1 to nDevices).map(device(_, nDevices))

    def round2(x: Double) = math.rint(x * 100) / 100
    def round3(x: Double) = math.rint(x * 1000) / 1000

    val rows = catalog.zipWithIndex.flatMap {
      case (Device(id, typ, user, loc, mk, md, _), di) =>
        val rnd = new Random(seed + di)
        val (tLo, tHi) = tempRange(typ)
        val (pLo, pHi) = powerRange(typ)
        var temp = tLo + rnd.nextDouble() * (tHi - tLo)
        var power = pLo + rnd.nextDouble() * (pHi - pLo)
        val status = if (rnd.nextDouble() < 0.1) "maintenance" else "online"
        (0 until rowsPerDevice).map { k =>
          temp = math.max(tLo, math.min(tHi, temp + rnd.nextDouble() * 2 - 1))
          power =
            if (typ == "thermostat")
              math.max(0, 2000 * (1 + math.abs(temp - 22) / 10) +
                (rnd.nextDouble() * 400 - 200))
            else
              math.max(pLo, math.min(pHi, power * (0.9 + rnd.nextDouble() * 0.2)))
          val energyWh = round3(power * (1.0 / 3600)) // 1 s elapsed
          val ts = start.plusSeconds(k)
          val alert =
            if (temp > 35) "high_temperature"
            else if (temp < 5) "low_temperature"
            else if (power > 3500) "high_power"
            else if (rnd.nextDouble() < 0.05)
              Seq("maintenance_required", "low_battery", "connectivity_issue")(
                rnd.nextInt(3))
            else "none"
          Row(id, typ, user, ts.toString, round2(temp), round2(power),
            energyWh, status, alert, loc, mk, md,
            ts.plusSeconds(2 + rnd.nextInt(10)).toString)
        }
    }

    val dirtyRows =
      if (!dirty) Seq.empty
      else {
        val ts = start.plus(1, ChronoUnit.HOURS)
        Seq(
          // missing required field (null user)
          Row("device_001", "thermostat", null, ts.toString, 21.0, 1000.0,
            0.278, "online", "none", "living_room", "Nest", "LT", ts.toString),
          // unparseable timestamp → to_timestamp null → dropped
          Row("device_001", "thermostat", "user_001", "not-a-time", 21.0,
            1000.0, 0.278, "online", "none", "living_room", "Nest", "LT",
            ts.toString),
          // out-of-range temperature / power / negative energy
          Row("device_002", "smart_bulb", "user_001", ts.plusSeconds(1).toString,
            150.0, 10.0, 0.003, "online", "none", "bedroom", "Philips", "Hue",
            ts.toString),
          Row("device_002", "smart_bulb", "user_001", ts.plusSeconds(2).toString,
            21.0, 20000.0, 0.003, "online", "none", "bedroom", "Philips", "Hue",
            ts.toString),
          Row("device_002", "smart_bulb", "user_001", ts.plusSeconds(3).toString,
            21.0, 10.0, -1.0, "online", "none", "bedroom", "Philips", "Hue",
            ts.toString),
          // null optionals → quality −0.1 each; extreme-but-in-range
          // temp/power → −0.2 each (quality floor 0.3, still stored)
          Row("device_003", "smart_plug", "user_001", ts.plusSeconds(4).toString,
            60.0, 6000.0, 1.667, "online", "high_power", null, null, null,
            ts.toString),
          // exact duplicate pair (F3 dedup)
          Row("device_004", "security_camera", "user_001",
            ts.plusSeconds(5).toString, 22.0, 8.0, 0.002, "online", "none",
            "front_door", "Ring", "IC", ts.toString),
          Row("device_004", "security_camera", "user_001",
            ts.plusSeconds(5).toString, 22.0, 8.0, 0.002, "online", "none",
            "front_door", "Ring", "IC", ts.toString),
          // late event: ingestion 49 h after event time (ST4 flag)
          Row("device_005", "motion_sensor", "user_001",
            ts.plusSeconds(6).toString, 21.0, 0.3, 0.0001, "online", "none",
            "hallway", "Aqara", "MS", ts.plus(49, ChronoUnit.HOURS).toString)
        )
      }

    spark.createDataFrame(
      spark.sparkContext.parallelize(rows ++ dirtyRows,
        math.max(1, nDevices / 2)),
      Schemas.bronzeTelemetry)
  }
}
