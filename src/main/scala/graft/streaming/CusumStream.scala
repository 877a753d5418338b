package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming one-sided CUSUM control chart per event_type — the
  * online twin of the batch q173 changepoint locator: q173 answers
  * "when did the level shift, in hindsight"; this raises the alarm
  * AS the shift happens, with the classic Page recursion
  * S ← max(0, S + (x − target − slack)) and an alarm when S crosses
  * the decision threshold h. All arithmetic is integer cents, so the
  * trajectory is exactly reproducible; per-key state is ONE long
  * regardless of traffic (the DebounceStream posture).
  *
  * Ordering: rows within a micro-batch are sorted by (ts, event_id)
  * before the fold (the DebounceStream discipline), so intra-batch
  * shuffle disorder cannot flip a decision; across batches the
  * recursion continues from stored state — under in-order-per-key
  * delivery this is exactly the batch fold (CusumStreamSpec pins
  * parity against a driver-side reference fold, across a batch
  * boundary). After an alarm the statistic resets to 0 (the standard
  * restart convention), so repeated shifts re-alarm. */
object CusumStream {

  case class Ev(event_type: String, event_id: Long, value_cents: Long,
      event_ts: Timestamp)
  case class Point(event_type: String, event_id: Long, s_after: Long,
      alarm: Boolean)

  class CusumProcessor(targetCents: Long, slackCents: Long, hCents: Long)
      extends StatefulProcessor[String, Ev, Point] {

    @transient private var stat: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stat = getHandle.getValueState[Long]("cusum",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Point] = {
      val sorted = rows.toArray.sortBy(e =>
        (EventTime.micros(e.event_ts), e.event_id))
      var s = if (stat.exists()) stat.get() else 0L
      val out = sorted.map { e =>
        s = math.max(0L, s + (e.value_cents - targetCents - slackCents))
        val alarm = s > hCents
        val p = Point(key, e.event_id, s, alarm)
        if (alarm) s = 0L // restart after signal
        p
      }
      stat.update(s)
      out.iterator
    }
  }

  /** Per-event CUSUM points for a cents-valued stream. */
  def points(events: Dataset[Ev], targetCents: Long, slackCents: Long,
      hCents: Long): Dataset[Point] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_ts", "10 seconds")
      .groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(targetCents, slackCents, hCents),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
