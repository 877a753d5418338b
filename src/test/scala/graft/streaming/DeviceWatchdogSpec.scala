package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState watchdog: event-time timers fire exactly when
  * the watermark passes a device's silence deadline, superseded
  * deadlines never fire, and state clears after the alert. */
class DeviceWatchdogSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("offline alerts fire per watermark instant; re-pinged devices don't") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2026-01-01T00:00:00Z")
    def ping(dev: String, s: Int) = DeviceWatchdog.Ping(
      dev, Timestamp.from(base.plusSeconds(s.toLong)))

    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val source = MemoryStream[DeviceWatchdog.Ping]
    // gap 30 s of event-time silence, watermark delay 10 s
    val alerts = DeviceWatchdog.offlineAlerts(source.toDS(),
      gapMs = 30000L, watermarkDelay = "10 seconds")
    val q = alerts.writeStream.format("memory").queryName("watchdog")
      .outputMode("append").start()
    try {
      // batch 1: A@10s, B@12s → deadlines A:40s, B:42s. The engine's
      // follow-up no-data batch advances the watermark to 12−10=2s →
      // nothing fires
      source.addData(ping("A", 10), ping("B", 12))
      q.processAllAvailable()
      assert(spark.table("watchdog").count() == 0)
      // batch 2: A@100s supersedes A's deadline (40s → 130s — the
      // DELETED 40s timer must never fire); the follow-up batch's
      // watermark is 100−10=90s → exactly B's 42s deadline fires
      source.addData(ping("A", 100))
      q.processAllAvailable()
      val after2 = spark.table("watchdog")
        .select("device_id", "last_seen", "deadline_ms").collect()
      assert(after2.map(_.getString(0)).toSeq == Seq("B"), after2.toSeq)
      assert(after2.head.getTimestamp(1) ==
        Timestamp.from(base.plusSeconds(12)))
      assert(after2.head.getLong(2) ==
        base.plusSeconds(12).toEpochMilli + 30000)
      // batch 3: C@200s → watermark 190s → A's 130s deadline fires;
      // C's own (230s) does not
      source.addData(ping("C", 200))
      q.processAllAvailable()
      val devs = spark.table("watchdog").select("device_id")
        .as[String].collect().sorted.toSeq
      assert(devs == Seq("A", "B"), devs)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
