package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming twin of the q162 heavy-hitters report: a Misra-Gries
  * sketch per event_type maintained in `transformWithState` map
  * state, emitting the counter snapshot after every micro-batch.
  * This is the monitoring shape of the batch sketch — "who are the
  * top users RIGHT NOW" over an unbounded stream — with per-key
  * state bounded at `capacity` counters REGARDLESS of traffic (the
  * MG guarantee: any user with true count > n/capacity is present,
  * and every estimate undercounts by at most n/capacity — both
  * asserted in StreamingTopKSpec against an exact recount).
  *
  * The decrement step is the textbook one: a new user arriving at a
  * full table decrements every counter by 1 and evicts zeros —
  * implemented over the MapState iterator, which is at most
  * `capacity` entries by invariant, so each input row touches O(k)
  * state, never O(users).
  *
  * Snapshots are emitted per (type) per batch tagged with a
  * MONOTONIC per-key sequence number (`seq`, one more per batch that
  * touched the key); readers keep each key's max-seq rows. Event
  * time would NOT work as the tag: a late-but-within-watermark batch
  * has an older max event time than its predecessor, and a max-ts
  * reader would discard the NEWEST state. Estimates depend on
  * arrival order (any MG does) — the spec pins the order-free
  * guarantees plus exact equality on a no-eviction fixture, where MG
  * degenerates to exact counting. */
object TopKStream {

  case class Ev(event_type: String, user_id: Long, event_id: Long,
      event_ts: Timestamp)
  case class Hitter(event_type: String, user_id: Long, est: Long,
      seq: Long)

  class MgProcessor(capacity: Int)
      extends StatefulProcessor[String, Ev, Hitter] {

    @transient private var counters: MapState[Long, Long] = _
    @transient private var snapSeq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[Long, Long]("counters",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      snapSeq = getHandle.getValueState[Long]("snapSeq",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Hitter] = {
      // deterministic fold order within the micro-batch (same
      // discipline as DebounceStream): (ts, event_id)
      val sorted = rows.toArray.sortBy(e =>
        (EventTime.micros(e.event_ts), e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      // work on a local copy: ≤ capacity entries by invariant
      val m = scala.collection.mutable.Map[Long, Long]()
      counters.iterator().foreach { case (u, c) => m(u) = c }
      sorted.foreach { e =>
        m.get(e.user_id) match {
          case Some(c) => m(e.user_id) = c + 1
          case None if m.size < capacity => m(e.user_id) = 1L
          case None =>
            // decrement-all; evict zeros (the new element is absorbed)
            m.keys.toArray.foreach { u =>
              val c = m(u) - 1
              if (c == 0) m.remove(u) else m(u) = c
            }
        }
      }
      // write back the delta (clear removed keys, update the rest)
      counters.iterator().map(_._1).toArray.foreach { u =>
        if (!m.contains(u)) counters.removeKey(u)
      }
      m.foreach { case (u, c) => counters.updateValue(u, c) }
      val seq = (if (snapSeq.exists()) snapSeq.get() else 0L) + 1L
      snapSeq.update(seq)
      m.iterator.map { case (u, c) => Hitter(key, u, c, seq) }
    }
  }

  /** Per-type MG counter snapshots after each micro-batch,
    * capacity 8 by default (q162's constant). */
  def hitters(events: Dataset[Ev], capacity: Int = 8): Dataset[Hitter] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_ts", "10 seconds")
      .groupByKey(_.event_type)
      .transformWithState(new MgProcessor(capacity),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
