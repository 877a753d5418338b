package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over validated telemetry (the streaming
  * counterpart of the batch Silver/Gold queries): watermarked
  * event-time windows and custom per-device state.
  *
  * The reference computes none of this incrementally — its "windows"
  * are batch recomputations every 2-5 min (SURVEY §2.9 ST5/ST7).
  * These operators produce the same rollups continuously: at 100 TB/
  * day the incremental path touches each event once instead of
  * re-scanning the lookback window per tick.
  */
object TelemetryStreams {

  /** Event-time tumbling-window device aggregates with a late-data
    * watermark (streaming analog of A1's per-day rollup, at
    * configurable granularity). Late events beyond the watermark are
    * dropped by the engine here; the batch path keeps the reference's
    * flag-not-drop semantics (ST4) — both are exposed, callers pick. */
  def windowedDeviceAggregates(validated: DataFrame,
      window: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    validated
      .withColumn("event_ts", try_to_timestamp(col("timestamp")))
      .withWatermark("event_ts", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("event_ts"), window),
        col("device_id"), col("device_type"))
      .agg(
        sum(col("energy_consumption_wh")).as("energy_wh"),
        avg(col("power_usage")).as("power_avg"),
        avg(col("temperature")).as("temp_avg"),
        count(lit(1)).as("n_readings"),
        sum(when(col("alert") =!= "none", 1L).otherwise(0L)).as("n_alerts"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("device_id"), col("device_type"), col("energy_wh"),
        col("power_avg"), col("temp_avg"), col("n_readings"), col("n_alerts"))

  /** Session-window device activity (native `session_window`): events
    * of one device closer than `gap` merge into an activity session
    * [first.ts, last.ts + gap). Works identically over a bounded
    * frame and a watermarked stream (append mode emits a session once
    * the watermark passes its end) — SessionWindowSpec asserts that
    * parity on a two-batch split; the batch gate analog over the
    * events table is q2k_session_window. */
  def deviceSessions(validated: DataFrame, gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    val ts = validated.withColumn("event_ts", try_to_timestamp(col("timestamp")))
    val marked = watermark.fold(ts)(w => ts.withWatermark("event_ts", w))
    marked
      .groupBy(col("device_id"), session_window(col("event_ts"), gap))
      .agg(count(lit(1)).as("n_readings"),
        sum(col("energy_consumption_wh")).as("energy_wh"))
      .select(col("device_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_readings"), col("energy_wh"))
  }

  case class DeviceEvent(device_id: String, event_ts: Timestamp, alert: String)
  case class AlertStreakState(streak: Int, since: Option[Timestamp])
  case class AlertStreak(device_id: String, streak: Int,
      since: Timestamp, until: Timestamp)

  /** Stateful per-device alert-streak detector
    * (flatMapGroupsWithState): emits a record whenever a device
    * reaches `minStreak` CONSECUTIVE alerting readings — the stateful
    * pattern the reference's producer-side alert machine
    * (telemetry_sim.py:122-130) hints at but never analyzes. State is
    * one small case class per device (bounded by fleet size) with a
    * processing-time timeout to reap dead devices. */
  def alertStreaks(events: Dataset[DeviceEvent], minStreak: Int = 3)(
      implicit spark: SparkSession): Dataset[AlertStreak] = {
    import spark.implicits._
    events
      .groupByKey(_.device_id)
      .flatMapGroupsWithState[AlertStreakState, AlertStreak](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (deviceId, rows, state: GroupState[AlertStreakState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(AlertStreakState(0, None))
            val out = scala.collection.mutable.ArrayBuffer[AlertStreak]()
            rows.toSeq.sortBy(_.event_ts.getTime).foreach { e =>
              if (e.alert != "none") {
                val since = st.since.getOrElse(e.event_ts)
                st = AlertStreakState(st.streak + 1, Some(since))
                if (st.streak == minStreak)
                  out += AlertStreak(deviceId, st.streak, since, e.event_ts)
              } else {
                st = AlertStreakState(0, None)
              }
            }
            state.update(st)
            state.setTimeoutDuration("1 hour")
            out.iterator
          }
      }
  }
}
