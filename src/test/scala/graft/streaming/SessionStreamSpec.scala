package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Parity contract for streaming sessionization: the closed-session
  * rollups must equal a driver-side q2b fold of the same events —
  * including a session extended across a micro-batch boundary, the
  * exactly-30-minute gap that q2b's strict `>` KEEPS in-session, the
  * inline close on an over-gap arrival, and the watermark-timer flush
  * of each user's final open session (the part a batch replay gets
  * for free and a stream must earn with a timer). */
class SessionStreamSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("stream sessions equal the q2b fold, timer flush included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2026-01-01T00:00:00Z")
    def ev(u: Long, id: Long, s: Int) = SessionStream.Ev(
      u, id, 100L * id + 7L, Timestamp.from(base.plusSeconds(s.toLong)))

    // user 1: 0s, 100s, then EXACTLY +1800s (stays — q2b's strict >),
    // then +1801s (closes session 1 inline, opens session 2)
    // user 2: 50s then 600s — one session SPANNING the batch boundary
    val batch1 = Seq(ev(1, 1, 0), ev(1, 2, 100), ev(2, 3, 50))
    val batch2 = Seq(ev(1, 4, 1900), ev(1, 5, 3701), ev(2, 6, 600))
    // watermark advancer: 10000−10s delay = 9990s passes every live
    // deadline (u1: 3701+1800, u2: 600+1800) → final sessions flush;
    // 999's own session stays open and is excluded from the check
    val batch3 = Seq(ev(999, 7, 10000))

    // driver-side q2b fold (per user, (ts, event_id) order, strict >
    // on the gap), final open session flushed — the batch semantics
    val want = (batch1 ++ batch2).groupBy(_.user_id).flatMap {
      case (u, evs) =>
        val sorted = evs.sortBy(e => (e.event_ts.getTime, e.event_id))
        val out = Seq.newBuilder[SessionStream.SessionOut]
        var idx = 0L; var start = 0L; var last = Long.MinValue
        var n = 0L; var cents = 0L
        for (e <- sorted) {
          val t = EventTime.micros(e.event_ts)
          if (last == Long.MinValue || t - last > 1800000000L) {
            if (n > 0)
              out += SessionStream.SessionOut(u, idx, n, last - start, cents)
            idx += 1; start = t; n = 0; cents = 0
          }
          last = t; n += 1; cents += e.value_cents
        }
        out += SessionStream.SessionOut(u, idx, n, last - start, cents)
        out.result()
    }.toSet

    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val source = MemoryStream[SessionStream.Ev]
    val q = SessionStream.sessions(source.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      source.addData(batch1: _*)
      q.processAllAvailable()
      source.addData(batch2: _*)
      q.processAllAvailable()
      // u1's session 1 closed INLINE by the 3701s arrival; batch 2's
      // follow-up watermark (3701−10 s) also passes u2's 600+1800 s
      // deadline, so u2's boundary-spanning session timer-flushes here
      // — u1's OPEN session 2 (deadline 5501 s) must NOT be out yet
      val inline = spark.table("sessions").as[SessionStream.SessionOut]
        .collect().toSet
      assert(inline == Set(
        SessionStream.SessionOut(1L, 1L, 3L, 1900000000L, 721L),
        SessionStream.SessionOut(2L, 1L, 2L, 550000000L, 914L)), inline)
      source.addData(batch3: _*)
      q.processAllAvailable()
      val got = spark.table("sessions").as[SessionStream.SessionOut]
        .collect().filter(_.user_id != 999L).toSet
      assert(got == want, s"$got vs $want")
      // shape sanity on the planted fixture: the exactly-30-min gap
      // did NOT split (u1 session 1 has 3 events), the boundary
      // session merged (u2 session 1 spans both batches)
      assert(want.exists(s => s.user_id == 1 && s.session_idx == 1 &&
        s.n_events == 3))
      assert(want.exists(s => s.user_id == 2 && s.session_idx == 1 &&
        s.n_events == 2 && s.duration_us == 550000000L))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
