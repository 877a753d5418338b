package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The HLL register aggregate under Structured Streaming: a windowed
  * streaming aggregation persists the AGGREGATION BUFFER in the state
  * store between micro-batches, so this exercises the
  * TypedImperativeAggregate's serialize/deserialize/merge path end to
  * end — the property that lets one sketch roll forward forever on a
  * stream (distinct users per window at 100 TB/day without keeping
  * ids). Parity check: the final streamed registers must equal the
  * batch aggregate over the union of all batches. */
class StreamingHllSpec extends SparkSpec {

  test("windowed streaming hll registers equal the batch sketch (merge across batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2026-01-01T00:00:00Z")
    def row(user: Long, s: Int): (Timestamp, String) =
      (Timestamp.from(base.plusSeconds(s.toLong)), s"user-$user")

    // one 60 s window; users split across two micro-batches with
    // overlap (users 5-9 appear in both — idempotent merge)
    val batch1 = (0L to 9L).map(u => row(u, 1 + (u % 30).toInt))
    val batch2 = (5L to 19L).map(u => row(u, 2 + (u % 30).toInt))

    val source = MemoryStream[(Timestamp, String)]
    val agg = source.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "60 seconds").as("w"))
      .agg(graft.functions.SketchAggregates.hllRegisters(col("user"), 8)
        .as("regs"))
    val q = agg.writeStream.format("memory").queryName("hllwin")
      .outputMode("update").start()
    try {
      source.addData(batch1: _*)
      q.processAllAvailable()
      source.addData(batch2: _*)
      q.processAllAvailable()
      // update mode re-emits the window each batch; the LAST emission
      // carries the fully-merged registers
      val streamed = spark.table("hllwin")
        .select("regs").collect().last.getSeq[Int](0)
      val batch = (batch1 ++ batch2).toDF("ts", "user")
        .agg(graft.functions.SketchAggregates.hllRegisters(col("user"), 8))
        .head().getSeq[Int](0)
      assert(streamed == batch,
        s"streamed registers diverge from batch: $streamed vs $batch")
    } finally q.stop()
  }
}
