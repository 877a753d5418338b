package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Parity contract for the streaming CUSUM: the per-event trajectory
  * must equal a driver-side reference fold of the same recursion, in
  * (ts, event_id) order, INCLUDING state carried across a micro-batch
  * boundary and the post-alarm restart.
  */
class CusumStreamSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("stream trajectory equals the reference fold across batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2026-01-01T00:00:00Z")
    def ev(id: Long, cents: Long, s: Int) = CusumStream.Ev(
      "X", id, cents, Timestamp.from(base.plusSeconds(s.toLong)))

    // target 100, slack 10, h 150: in-control values ~100 keep S near
    // 0; the shift to 180 from event 4 accumulates +70/event -> S hits
    // exactly h=150 on event 5 (no alarm: strict >), alarms on event 6
    // (S = 220), restarts, builds again on event 7
    val batch1 = Seq(ev(1, 100, 0), ev(2, 90, 1), ev(3, 120, 2),
      ev(4, 180, 3))
    val batch2 = Seq(ev(5, 180, 4), ev(6, 180, 5), ev(7, 180, 6))

    // reference fold (same recursion, driver-side)
    var s = 0L
    val want = (batch1 ++ batch2).sortBy(e => (e.event_ts.getTime, e.event_id))
      .map { e =>
        s = math.max(0L, s + (e.value_cents - 100L - 10L))
        val alarm = s > 150L
        val row = e.event_id -> ((s, alarm))
        if (alarm) s = 0L
        row
      }.toMap

    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val source = MemoryStream[CusumStream.Ev]
      val q = CusumStream.points(source.toDS(), 100L, 10L, 150L)
        .writeStream.format("memory").queryName("cusum")
        .outputMode("append").start()
      try {
        source.addData(batch1: _*)
        q.processAllAvailable()
        source.addData(batch2: _*)
        q.processAllAvailable()
        val got = spark.table("cusum").as[CusumStream.Point]
          .collect().map(p => p.event_id -> ((p.s_after, p.alarm))).toMap
        assert(got == want, s"$got vs $want")
        // sanity on the planted shift: exactly one alarm, at event 6
        assert(want.count(_._2._2) == 1 && want(6L)._2, want)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
