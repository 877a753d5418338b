package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver → Gold aggregate tables, re-expressing
  * /root/reference/consumer/silver_to_gold.py:83-275.
  *
  * Three independent rollups share one Silver input (the caller
  * should `.cache()` it, mirroring the reference's one-load /
  * three-groupby shape — silver_to_gold.py:326-339). Every group-by
  * plans as partial+final HashAggregate; business summary consumes
  * the other two gold FRAMES (plan/cache reuse), not their files.
  *
  * `bround` = numpy/pandas half-even rounding (see BronzeToSilver).
  */
object SilverToGold {

  /** silver_to_gold.py:83-128 — daily_energy_consumption: per
    * (device, type, user, date) rollup with round-inside-agg, then
    * derived cost/efficiency/completeness columns. */
  def dailyEnergyConsumption(silver: DataFrame,
      cfg: EtlConfig = EtlConfig()): DataFrame =
    silver
      .withColumn("date", to_date(col("timestamp")))
      .groupBy(col("device_id"), col("device_type"), col("user_id"), col("date"))
      .agg(
        bround(sum(col("energy_consumption_wh")), 3).as("energy_consumption_wh_sum"),
        bround(avg(col("energy_consumption_wh")), 3).as("energy_consumption_wh_mean"),
        bround(max(col("energy_consumption_wh")), 3).as("energy_consumption_wh_max"),
        count(col("energy_consumption_wh")).as("energy_consumption_wh_count"),
        bround(avg(col("power_usage")), 3).as("power_usage_mean"),
        bround(max(col("power_usage")), 3).as("power_usage_max"),
        bround(avg(col("temperature")), 3).as("temperature_mean"),
        bround(min(col("temperature")), 3).as("temperature_min"),
        bround(max(col("temperature")), 3).as("temperature_max"),
        bround(avg(col("quality_score")), 3).as("quality_score_mean"),
        bround(avg(col("is_valid").cast("double")), 3).as("is_valid_mean"),
        bround(max(col("alert_frequency_1h")), 3).as("alert_frequency_1h_max"))
      .withColumn("energy_cost_estimate",
        bround(col("energy_consumption_wh_sum") / 1000 * cfg.energyRatePerKwh, 2))
      .withColumn("avg_efficiency",
        bround(when(col("power_usage_mean") > 0,
          col("energy_consumption_wh_mean") / col("power_usage_mean"))
          .otherwise(0.0), 3))
      .withColumn("data_completeness", bround(col("is_valid_mean") * 100, 1))
      .withColumn("total_readings", col("energy_consumption_wh_count"))

  /** silver_to_gold.py:131-206 — device_health_metrics: per-device
    * weighted health/failure/reliability scores.
    *
    * uptime guard: the reference divides by (max−min) minutes and
    * relies on np.minimum(inf, 100) → 100 for single-reading devices;
    * we make that explicit with a `when`. */
  def deviceHealthMetrics(silver: DataFrame,
      cfg: EtlConfig = EtlConfig()): DataFrame = {
    val rolled = silver
      .groupBy(col("device_id"), col("device_type"))
      .agg(
        bround(avg(col("quality_score")), 3).as("quality_score_mean"),
        bround(avg(col("is_valid").cast("double")), 3).as("is_valid_mean"),
        bround(avg(col("alert_frequency_1h")), 3).as("alert_frequency_1h_mean"),
        bround(avg(col("processing_delay_hours")), 3).as("processing_delay_hours_mean"),
        bround(avg(col("is_late_event").cast("double")), 3).as("is_late_event_mean"),
        count(col("timestamp")).as("timestamp_count"),
        min(col("timestamp")).as("timestamp_min"),
        max(col("timestamp")).as("timestamp_max"))
    val health = bround(
      col("quality_score_mean") * 0.4 +
        col("is_valid_mean") * 0.3 +
        (lit(1) - col("is_late_event_mean")) * 0.2 +
        (lit(1) - least(col("alert_frequency_1h_mean") / 10, lit(1.0))) * 0.1, 3)
    val expectedReadings =
      (unix_timestamp(col("timestamp_max")) -
        unix_timestamp(col("timestamp_min"))) / 60.0
    rolled
      .withColumn("health_score", health)
      .withColumn("failure_probability", bround(least(
        (lit(1) - col("health_score")) * 0.7 +
          col("alert_frequency_1h_mean") / 20 +
          col("is_late_event_mean") * 0.3, lit(1.0)), 3))
      .withColumn("data_reliability", bround(
        col("is_valid_mean") * 0.6 +
          (lit(1) - col("is_late_event_mean")) * 0.4, 3))
      .withColumn("total_alerts", bround(
        col("alert_frequency_1h_mean") * col("timestamp_count") / 60, 0).cast("int"))
      .withColumn("uptime_percentage",
        when(expectedReadings > 0,
          bround(least(col("timestamp_count") / expectedReadings * 100, lit(100.0)), 1))
          .otherwise(100.0))
      .withColumn("created_at", lit(Timestamp.from(cfg.now)))
      .select("device_id", "device_type", "health_score", "failure_probability",
        "data_reliability", "total_alerts", "uptime_percentage", "created_at")
  }

  /** silver_to_gold.py:208-275 — daily_business_summary: per-date
    * rollup of daily energy plus the device-health global means
    * attached as constants to every row (J2: crossJoin of a 1-row
    * aggregate ≡ broadcast nested-loop join). */
  def dailyBusinessSummary(dailyEnergy: DataFrame, deviceHealth: DataFrame,
      cfg: EtlConfig = EtlConfig()): DataFrame = {
    val summary = dailyEnergy
      .groupBy(col("date"))
      .agg(
        bround(sum(col("energy_consumption_wh_sum")), 2).as("total_energy_wh"),
        bround(sum(col("energy_cost_estimate")), 2).as("total_cost_estimate"),
        countDistinct(col("device_id")).as("active_devices"),
        countDistinct(col("user_id")).as("active_users"),
        bround(avg(col("data_completeness")), 2).as("avg_data_quality"),
        sum(col("total_readings")).as("total_data_points"))
      .withColumn("total_energy_kwh", bround(col("total_energy_wh") / 1000, 3))
    val healthGlobals = deviceHealth.agg(
      bround(avg(col("health_score")), 3).as("avg_device_health"),
      bround(avg(col("failure_probability")), 3).as("avg_failure_risk"),
      // pandas sums int32 alerts into a double column here
      sum(col("total_alerts")).cast("double").as("total_alerts"))
    summary
      .crossJoin(broadcast(healthGlobals))
      .withColumn("cost_per_kwh",
        bround(when(col("total_energy_kwh") > 0,
          col("total_cost_estimate") / col("total_energy_kwh")).otherwise(0.0), 3))
      .withColumn("created_at", lit(Timestamp.from(cfg.now)))
  }
}
