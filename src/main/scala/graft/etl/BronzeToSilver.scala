package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bronze → Silver refinement: validate, clean, enrich, derive.
  *
  * Re-expresses /root/reference/consumer/bronze_to_silver.py:112-275
  * as pure DataFrame transforms. Each stage is a standalone function
  * (unit-testable without files); `run` composes them in reference
  * order. Catalyst fuses the filter/projection stages into one
  * whole-stage-codegen region; the only exchange is the shuffle by
  * device_id for the rolling windows — at 100 TB that one shuffle is
  * keyed on device_id (high cardinality in a real fleet, so it
  * parallelizes; per-device data streams through the 60-row frame
  * without materializing the partition).
  *
  * Rounding note: pandas `.round()` is numpy half-even on the binary
  * double; Spark's `bround` matches that mode, so derived formulas
  * here use `bround` wherever the reference rounds.
  */
object BronzeToSilver {

  /** bronze_to_silver.py:112-176 — timestamp parse (F2), dedup on
    * (device_id, timestamp) (F3), critical-null drop (F4), numeric
    * coercion (F5), range predicates (F6 — a null measure fails its
    * range check and is dropped, matching pandas NaN comparison),
    * all-null drop (F7, dead after F6), quality score + is_valid. */
  def validateAndClean(df: DataFrame, cfg: EtlConfig = EtlConfig()): DataFrame = {
    // try_to_timestamp / try_cast ≡ pandas errors='coerce' (null on
    // malformed), regardless of spark.sql.ansi.enabled.
    val parsed = df.withColumn("timestamp", try_to_timestamp(col("timestamp")))
    val deduped = parsed
      .dropDuplicates("device_id", "timestamp")
      .na.drop(Seq("device_id", "device_type", "user_id", "timestamp"))
    val coerced = Seq("temperature", "power_usage", "energy_consumption_wh")
      .foldLeft(deduped)((d, f) =>
        d.withColumn(f, expr(s"try_cast($f AS DOUBLE)")))
    val ranged = coerced
      .filter(col("temperature").between(cfg.tempRangeMin, cfg.tempRangeMax))
      .filter(col("power_usage").between(0, cfg.powerRangeMax))
      .filter(col("energy_consumption_wh") >= 0)
      // F7 all-null drop — dead code after F6 (null fails between),
      // kept for semantic fidelity with bronze_to_silver.py:147:
      .filter(coalesce(col("temperature"), col("power_usage"),
        col("energy_consumption_wh")).isNotNull)
    val qualityScore = lit(1.0) -
      when(col("location").isNull, 0.1).otherwise(0.0) -
      when(col("manufacturer").isNull, 0.1).otherwise(0.0) -
      when(col("model").isNull, 0.1).otherwise(0.0) -
      when(col("temperature") < cfg.extremeTempLow ||
        col("temperature") > cfg.extremeTempHigh, 0.2).otherwise(0.0) -
      when(col("power_usage") > cfg.extremePower, 0.2).otherwise(0.0)
    ranged
      .withColumn("quality_score", qualityScore)
      .withColumn("is_valid", col("quality_score") >= cfg.validQualityThreshold)
  }

  /** bronze_to_silver.py:178-211 (J1) — broadcast left join against
    * the 10-row catalog, fillna from catalog side, device age.
    *
    * Implements the INTENDED semantics: the reference's version
    * silently no-ops at runtime (tz-aware minus tz-naive raises, the
    * broad except returns the un-enriched frame — SURVEY §1.3), so
    * observed Silver files lack installation_date/device_age_days.
    * Here both sides are proper date/timestamp types and `datediff`
    * is well-defined. */
  def enrichWithCatalog(df: DataFrame, catalog: DataFrame): DataFrame = {
    val cat = catalog.select(
      col("device_id"),
      col("location").as("location_catalog"),
      col("installation_date"),
      col("manufacturer").as("manufacturer_catalog"),
      col("model").as("model_catalog"))
    df.join(broadcast(cat), Seq("device_id"), "left")
      .withColumn("location", coalesce(col("location"), col("location_catalog")))
      .withColumn("manufacturer",
        coalesce(col("manufacturer"), col("manufacturer_catalog")))
      .withColumn("model", coalesce(col("model"), col("model_catalog")))
      .drop("location_catalog", "manufacturer_catalog", "model_catalog")
      .withColumn("device_age_days",
        datediff(col("timestamp"), col("installation_date")))
  }

  /** bronze_to_silver.py:213-237 (ST4) — flag-not-drop late events:
    * processing delay in hours, late if beyond the watermark. */
  def detectLateEvents(df: DataFrame, cfg: EtlConfig = EtlConfig()): DataFrame =
    df.withColumn("processing_delay_hours",
      (unix_timestamp(try_to_timestamp(col("ingestion_time"))) -
        unix_timestamp(col("timestamp"))) / 3600.0)
      .withColumn("is_late_event",
        col("processing_delay_hours") > cfg.watermarkHours)

  /** bronze_to_silver.py:239-275 (W1-W3) — per-device 60-row rolling
    * mean/sum (min_periods=1 ≡ rowsBetween(-59, 0)), energy
    * efficiency, alert flags.
    *
    * `cfg.timeBasedWindows` switches the frame to a true trailing
    * hour by event time (rangeBetween over epoch seconds) — the
    * semantics the reference's "_1h_" names promise; its 60-ROW frame
    * only matches at exactly 1 msg/min (SURVEY §7.5.3). */
  def derivedMetrics(df: DataFrame, cfg: EtlConfig = EtlConfig()): DataFrame = {
    val w =
      if (cfg.timeBasedWindows)
        // microsecond resolution: unix_timestamp would truncate to
        // whole seconds and misplace sub-second events at the frame edge
        Window.partitionBy(col("device_id"))
          .orderBy(unix_micros(col("timestamp")))
          .rangeBetween(-(cfg.rollingWindowSeconds * 1000000L - 1), 0)
      else
        Window.partitionBy(col("device_id")).orderBy(col("timestamp"))
          .rowsBetween(-(cfg.rollingWindowRows - 1), 0)
    df.withColumn("temp_1h_avg", avg(col("temperature")).over(w))
      .withColumn("power_1h_avg", avg(col("power_usage")).over(w))
      .withColumn("energy_efficiency",
        when(col("power_usage") > 0,
          col("energy_consumption_wh") / col("power_usage")).otherwise(0.0))
      .withColumn("has_alert", col("alert") =!= "none")
      .withColumn("alert_frequency_1h",
        sum(col("has_alert").cast("double")).over(w))
  }

  /** Full Bronze→Silver refinement (process_bronze_to_silver stages
    * 3-6, bronze_to_silver.py:311-348). */
  def run(bronze: DataFrame, catalog: DataFrame,
      cfg: EtlConfig = EtlConfig()): DataFrame =
    derivedMetrics(
      detectLateEvents(
        enrichWithCatalog(validateAndClean(bronze, cfg), catalog), cfg), cfg)
}
