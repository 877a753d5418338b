package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Device-offline watchdog on Spark 4's `transformWithState` — the
  * arbitrary-stateful-processing API that supersedes
  * flatMapGroupsWithState (SPARK-40434): typed per-key state through
  * a `StatefulProcessorHandle` plus FIRST-CLASS EVENT-TIME TIMERS,
  * which is exactly what an absence detector needs — the old API can
  * only react to rows or to a coarse per-key timeout, while a timer
  * fires at a precise watermark instant with no row present.
  *
  * Semantics: a device that has sent NOTHING for `gapMs` of event
  * time emits one `Offline` record (at watermark `last_seen + gap`),
  * then its state clears — a device that later resumes is tracked
  * afresh. Each new ping supersedes the previous deadline (the old
  * timer is deleted, one re-registered at `new_last_seen + gap`), so
  * per-key state is ONE long + ONE timer regardless of traffic — the
  * bounded-state property the 100 TB posture needs (state ∝ fleet
  * size, not event volume).
  *
  * Requires the RocksDB state-store provider (transformWithState's
  * backing store — set `spark.sql.streaming.stateStore.providerClass`
  * to `...state.RocksDBStateStoreProvider`; rocksdbjni ships with
  * Spark). Covered by DeviceWatchdogSpec (MemoryStream, deterministic
  * watermark advancement across four micro-batches).
  */
object DeviceWatchdog {

  case class Ping(device_id: String, event_ts: Timestamp)
  case class Offline(device_id: String, last_seen: Timestamp,
      deadline_ms: Long)

  /** Per-device processor: ValueState[last-seen epoch ms] + one
    * event-time timer at last_seen + gapMs. */
  class WatchdogProcessor(gapMs: Long)
      extends StatefulProcessor[String, Ping, Offline] {

    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("lastSeen",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Ping],
        timers: TimerValues): Iterator[Offline] = {
      val maxTs = rows.map(_.event_ts.getTime).max
      val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      if (maxTs > prev) {
        // supersede the old deadline: exactly one live timer per key
        if (prev != Long.MinValue) getHandle.deleteTimer(prev + gapMs)
        lastSeen.update(maxTs)
        getHandle.registerTimer(maxTs + gapMs)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[Offline] = {
      // only the CURRENT deadline alerts (superseded timers are
      // deleted on arrival; this guard is defense in depth against a
      // timer that expired in the same batch its replacement arrived)
      val last = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      if (last != Long.MinValue && timer.getExpiryTimeInMs() == last + gapMs) {
        lastSeen.clear()
        Iterator.single(
          Offline(key, new Timestamp(last), timer.getExpiryTimeInMs()))
      } else Iterator.empty
    }
  }

  /** Offline alerts for a ping stream: one record per device whose
    * event-time silence exceeds `gapMs`, emitted when the watermark
    * (event-time minus `watermarkDelay`) passes the deadline. */
  def offlineAlerts(pings: Dataset[Ping], gapMs: Long = 30000L,
      watermarkDelay: String = "10 seconds"): Dataset[Offline] = {
    import pings.sparkSession.implicits._
    pings
      .withWatermark("event_ts", watermarkDelay)
      .groupByKey(_.device_id)
      .transformWithState(new WatchdogProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
