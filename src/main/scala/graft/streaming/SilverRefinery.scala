package graft.streaming

import graft.etl.{BronzeToSilver, EtlConfig, Lake}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous Bronze→Silver refinement: the streaming replacement for
  * the reference's 2-minute batch rerun loop (run_etl.py:77, SURVEY
  * ST7).
  *
  * Shape: a file-source stream tails the Bronze lake (exactly-once
  * file tracking — replaces the reference's mtime window), and each
  * micro-batch runs the SAME batch transform (`BronzeToSilver.run`)
  * inside `foreachBatch`, writing through the idempotent Silver sink.
  * One code path for batch and streaming semantics; the rolling
  * windows stay correct because the fixture/production Bronze batches
  * arrive partitioned by device and ordered within a micro-batch —
  * for strict cross-batch window continuity run the batch refinery on
  * a closing partition (the lambda-free pattern: stream for
  * freshness, nightly batch for exactness).
  */
object SilverRefinery {

  def start(spark: SparkSession, lakeRoot: String, catalog: DataFrame,
      cfg: EtlConfig = EtlConfig(),
      triggerInterval: String = "2 minutes"): StreamingQuery =
    spark.readStream
      .schema(graft.etl.Schemas.bronzeTelemetry.add("date", "date"))
      .option("ignoreCorruptFiles", "true")
      .parquet(s"$lakeRoot/bronze/telemetry")
      .drop("date")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Lake.writeSilver(BronzeToSilver.run(batch, catalog, cfg), lakeRoot)
        ()
      }
      .option("checkpointLocation", s"$lakeRoot/_checkpoints/silver_refinery")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()

  /** One-shot drain (Trigger.AvailableNow) for tests/backfill. */
  def runOnce(spark: SparkSession, lakeRoot: String, catalog: DataFrame,
      cfg: EtlConfig = EtlConfig()): Unit = {
    val q = spark.readStream
      .schema(graft.etl.Schemas.bronzeTelemetry.add("date", "date"))
      .option("ignoreCorruptFiles", "true")
      .parquet(s"$lakeRoot/bronze/telemetry")
      .drop("date")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Lake.writeSilver(BronzeToSilver.run(batch, catalog, cfg), lakeRoot)
        ()
      }
      .option("checkpointLocation", s"$lakeRoot/_checkpoints/silver_refinery")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
  }
}
