package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import graft.etl.Fixtures
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class TelemetryStreamsSpec extends SparkSpec {

  test("watermarked tumbling windows aggregate per device, drop very-late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val jsonRows = Fixtures
      .bronzeTelemetry(spark, nDevices = 2, rowsPerDevice = 1500)
      .select(to_json(struct(col("*"))).as("v")).as[String].collect()

    val agg = TelemetryStreams.windowedDeviceAggregates(
      BronzeIngest.parseAndValidate(source.toDF()),
      window = "5 minutes", watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    // two micro-batches: the watermark advances BETWEEN batches, so
    // append-mode windows only close once later data has arrived in a
    // subsequent batch (1500 s of data ⇒ watermark 1500−600=900 s ⇒
    // the first 5-min window is closed)
    val (first, rest) = jsonRows.splitAt(600)
    source.addData(first.toIndexedSeq: _*)
    q.processAllAvailable()
    source.addData(rest.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    // append mode emits only watermark-closed windows; 600 s of data
    // per device → the first 5-min window is closed for both devices
    val out = spark.table("win_agg")
    assert(out.count() >= 2)
    val r = out.filter(col("device_id") === "device_001").orderBy("window_start").head()
    assert(r.getAs[Long]("n_readings") == 300) // 5 min × 1 msg/s
    assert(r.getAs[Double]("power_avg") > 0)
  }

  test("alert streak detector fires exactly at minStreak consecutive alerts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val base = Instant.parse("2025-07-15T00:00:00Z")
    def ev(dev: String, s: Int, alert: String) =
      TelemetryStreams.DeviceEvent(dev,
        Timestamp.from(base.plusSeconds(s.toLong)), alert)
    val source = MemoryStream[TelemetryStreams.DeviceEvent]
    source.addData(
      ev("d1", 0, "none"), ev("d1", 1, "high_power"), ev("d1", 2, "high_power"),
      ev("d1", 3, "high_power"), ev("d1", 4, "high_power"), ev("d1", 5, "none"),
      ev("d2", 0, "high_temperature"), ev("d2", 1, "none"),
      ev("d2", 2, "high_temperature"))

    val streaks = TelemetryStreams.alertStreaks(source.toDS(), minStreak = 3)
    val q = streaks.writeStream.format("memory").queryName("streaks")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("streaks").as[TelemetryStreams.AlertStreak].collect()
    // d1: one streak reaches 3 (fires once, at the 3rd consecutive);
    // d2 never reaches 3
    assert(out.length == 1)
    assert(out.head.device_id == "d1")
    assert(out.head.streak == 3)
    assert(out.head.since == Timestamp.from(base.plusSeconds(1)))
    assert(out.head.until == Timestamp.from(base.plusSeconds(3)))
  }
}
