package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming twin of the q156 debounce report — the stateful filter a
  * pipeline turns ON after reading that report: drop an event when
  * the PREVIOUS event of the same (user, type) is less than `gapUs`
  * older. Runs on `transformWithState` (the DeviceWatchdog API) with
  * per-key state = ONE long (last event-time µs) regardless of
  * traffic — fleet-sized state, the 100 TB posture.
  *
  * Lag semantics, deliberately identical to the batch q156: the
  * comparison is against the previous EVENT, kept or suppressed (a
  * kept-anchored debounce is a different operator; this one is the
  * report's exact filter, so batch and stream agree row-for-row —
  * DebounceStreamSpec locks that parity on a shared fixture).
  *
  * Ordering: rows WITHIN a micro-batch are sorted per key before the
  * lag compare, so intra-batch disorder (shuffle nondeterminism,
  * multi-partition sources) cannot flip a decision. ACROSS batches
  * the state only ever advances (a row older than the stored last-
  * seen is compared against it as-is and does not move it backward):
  * under in-order-per-key delivery — what a keyed Kafka topic
  * provides — this is exactly the batch semantics; genuinely late
  * stragglers get at-arrival decisions, the documented trade of any
  * single-pass streaming filter.
  *
  * State GC (semantics-preserving): an event-time timer clears a
  * key's state once the watermark passes last + gap — any later
  * in-order event necessarily has ts > last + gap and would be KEPT
  * with or without the state, so the clear changes no decision while
  * bounding state to currently-ACTIVE (user, type) keys instead of
  * every key ever seen. One live timer per key (the DeviceWatchdog
  * supersede discipline). */
object DebounceStream {

  case class Ev(user_id: Long, event_type: String, event_id: Long,
      event_ts: Timestamp)
  case class Decision(user_id: Long, event_type: String, event_id: Long,
      ts_us: Long, suppressed: Boolean)

  class DebounceProcessor(gapUs: Long)
      extends StatefulProcessor[(Long, String), Ev, Decision] {

    @transient private var lastUs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastUs = getHandle.getValueState[Long]("lastUs",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Long, String), rows: Iterator[Ev],
        timers: TimerValues): Iterator[Decision] = {
      // per-key micro-batch rows sorted by (ts, event_id) — the batch
      // query's window order — so the lag chain is deterministic
      val sorted = rows.toArray.sortBy(e =>
        (EventTime.micros(e.event_ts), e.event_id))
      val had = lastUs.exists()
      val before = if (had) lastUs.get() else Long.MinValue
      var prev = before
      val out = sorted.iterator.map { e =>
        // full µs, not getTime*1000 (ms truncation would flip
        // decisions on sub-millisecond gap components vs batch q156)
        val tUs = EventTime.micros(e.event_ts)
        val suppressed = prev != Long.MinValue && tUs - prev < gapUs
        // lag semantics: every event becomes the next one's reference,
        // but state never moves backward on a late straggler
        if (tUs > prev) prev = tUs
        Decision(key._1, key._2, e.event_id, tUs, suppressed)
      }.toArray
      if (prev != Long.MinValue && prev != before) {
        // state GC: once the watermark passes last + gap, no future
        // in-order event can be within the window of this one — the
        // timer clears the key, bounding state to ACTIVE (user, type)
        // keys instead of every key ever seen (the DeviceWatchdog
        // supersede discipline: one live timer per key)
        if (had) getHandle.deleteTimer(
          (before + gapUs) / 1000L + 1L)
        getHandle.registerTimer((prev + gapUs) / 1000L + 1L)
        lastUs.update(prev)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: (Long, String),
        timers: TimerValues, timer: ExpiredTimerInfo): Iterator[Decision] = {
      // guard against a timer that expired in the same batch its
      // replacement was registered
      val last = if (lastUs.exists()) lastUs.get() else Long.MinValue
      if (last != Long.MinValue &&
          timer.getExpiryTimeInMs() == (last + gapUs) / 1000L + 1L)
        lastUs.clear()
      Iterator.empty
    }
  }

  /** Per-event keep/suppress decisions for an event stream, 5 s
    * default gap (q156's constant). */
  def decisions(events: Dataset[Ev], gapUs: Long = 5000000L,
      watermarkDelay: String = "10 seconds"): Dataset[Decision] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new DebounceProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
