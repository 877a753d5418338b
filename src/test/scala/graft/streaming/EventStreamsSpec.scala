package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {

  private val base = Instant.parse("2025-07-15T00:00:00Z")
  private def ts(s: Int) = Timestamp.from(base.plusSeconds(s.toLong))

  // (user, event_id, ts_offset_s): pairs within 30 min convert,
  // pair u2 SPANS the batch boundary (click in batch 1, purchase in
  // batch 2) — the case that distinguishes a stream-stream join with
  // state from a per-batch join
  private val clicks = Seq(
    ("u1", 100L, 0), ("u2", 101L, 60), ("u3", 102L, 120),
    ("u1", 103L, 5000)) // second click, converts to purchase 202
  private val purchases = Seq(
    ("u1", 200L, 600), // 10 min after click 100 → joins
    ("u3", 201L, 4000), // 64.6 min after click 102 → outside window
    ("u1", 202L, 6000), // joins click 103 (16.6 min), not 100 (>30 min)
    ("u2", 203L, 1500)) // 24 min after click 101, crosses the batch split

  test("streaming hopping windows equal the batch rollup, across a split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // rows straddle two 5-min slides; the split lands mid-window so a
    // window open in batch 1 must keep aggregating into batch 2
    val rows = Seq(
      ("view", 30, 1.25), ("click", 290, 2.00), ("view", 310, 0.50),
      ("view", 650, 3.75), ("click", 700, 1.10), ("view", 1210, 9.99))
    def frame(rs: Seq[(String, Int, Double)]) =
      rs.map { case (t, s, v) => (t, ts(s), v) }
        .toDF("event_type", "ts", "value")

    val expected = EventStreams.hoppingCounts(frame(rows))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // sanity on the closed form: every event in exactly 2 windows
    assert(expected.toSeq.map(_._3).sum == 2 * rows.size)

    val src = MemoryStream[(String, Timestamp, Double)]
    val agg = EventStreams.hoppingCounts(
      src.toDF().toDF("event_type", "ts", "value"))
    val q = agg.writeStream.format("memory").queryName("hop")
      .outputMode("append").start()
    try {
      src.addData(rows.take(3).map { case (t, s, v) => (t, ts(s), v) }: _*)
      q.processAllAvailable()
      src.addData(rows.drop(3).map { case (t, s, v) => (t, ts(s), v) }: _*)
      // sentinel far past every window + watermark so all groups emit
      src.addData(("wm", ts(100000), 0.0))
      q.processAllAvailable()
      val got = spark.table("hop")
        .filter(col("event_type") =!= "wm")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == expected, s"streaming $got != batch $expected")
    } finally q.stop()
  }

  test("streaming conversion join equals the batch join, across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def frame(rows: Seq[(String, Long, Int)]) =
      rows.map { case (u, id, s) => (u, id, ts(s)) }
        .toDF("user_id", "event_id", "ts")

    // batch reference: plain join with the same interval predicate
    val expected = EventStreams
      .conversionJoin(frame(clicks), frame(purchases))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected == Set((100L, 200L, 600000000L), (103L, 202L, 1000000000L),
      (101L, 203L, 1440000000L)))

    val cSrc = MemoryStream[(String, Long, Timestamp)]
    val pSrc = MemoryStream[(String, Long, Timestamp)]
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("user_id", "event_id", "ts")
    val joined = EventStreams.conversionJoin(
      named(cSrc.toDF()), named(pSrc.toDF()))
    val q = joined.writeStream.format("memory").queryName("conv")
      .outputMode("append").start()
    try {
      // batch 1: all clicks but u1's second, first purchase only —
      // u2's click waits in state for its purchase in batch 2
      cSrc.addData(clicks.take(3).map { case (u, id, s) => (u, id, ts(s)) }: _*)
      pSrc.addData(purchases.take(1).map { case (u, id, s) => (u, id, ts(s)) }: _*)
      q.processAllAvailable()
      // batch 2: the rest, plus far-future sentinels pushing both
      // watermarks past every row so all joins emit
      cSrc.addData(("wm", 900L, ts(100000)))
      cSrc.addData(clicks.drop(3).map { case (u, id, s) => (u, id, ts(s)) }: _*)
      pSrc.addData(purchases.drop(1).map { case (u, id, s) => (u, id, ts(s)) }: _*)
      pSrc.addData(("wm", 901L, ts(100000)))
      q.processAllAvailable()
      val got = spark.table("conv")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"streaming $got != batch $expected")
    } finally q.stop()
  }
}
