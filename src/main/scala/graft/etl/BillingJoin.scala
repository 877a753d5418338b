package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The billing reconciliation join the reference declares but never
  * implements (SURVEY §2.3 J3: billing_data.csv + topic/dirs exist,
  * no code reads them — config/config.py:13,38). The natural query:
  * actual metered energy per (user, month) from gold daily_energy vs
  * the billed totals, with deltas.
  */
object BillingJoin {

  /** Billing fixture mirroring config/billing_data.csv:1-7. */
  def billingFixture(spark: SparkSession): DataFrame = {
    val rows = Seq(
      ("user_001", "2025-07", 0.12, 15.00, 250.5, 45.06),
      ("user_002", "2025-07", 0.12, 15.00, 180.2, 36.62),
      ("user_001", "2025-06", 0.12, 15.00, 260.1, 46.21),
      ("user_002", "2025-06", 0.12, 15.00, 175.9, 36.11)
    ).map(Row.fromTuple)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.billingData)
  }

  /** gold daily_energy ⟕ billing on (user_id, month): metered kWh and
    * estimated cost vs billed usage/cost. Billing is a small dim →
    * broadcast; the fact side aggregates BEFORE the join so only
    * (user, month) rows cross the exchange. */
  def reconcile(dailyEnergy: DataFrame, billing: DataFrame): DataFrame = {
    val metered = dailyEnergy
      .groupBy(col("user_id"),
        date_format(col("date"), "yyyy-MM").as("billing_period"))
      .agg(
        bround(sum(col("energy_consumption_wh_sum")) / 1000, 3)
          .as("metered_kwh"),
        bround(sum(col("energy_cost_estimate")), 2).as("metered_cost"))
    metered
      .join(broadcast(billing), Seq("user_id", "billing_period"), "left")
      .withColumn("billed_kwh", col("total_usage_kwh"))
      .withColumn("billed_cost", col("total_cost"))
      .withColumn("kwh_delta",
        when(col("billed_kwh").isNotNull,
          bround(col("metered_kwh") - col("billed_kwh"), 3)))
      .withColumn("cost_delta",
        when(col("billed_cost").isNotNull,
          bround(col("metered_cost") + coalesce(col("base_charge"), lit(0.0))
            - col("billed_cost"), 2)))
      .select("user_id", "billing_period", "metered_kwh", "metered_cost",
        "billed_kwh", "billed_cost", "kwh_delta", "cost_delta")
  }
}
