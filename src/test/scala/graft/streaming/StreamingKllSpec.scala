package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The KLL quantile aggregate under Structured Streaming: a windowed
  * streaming aggregation persists the KllState buffer in the state
  * store between micro-batches — the serialize/deserialize/merge path
  * that lets ONE bounded sketch track value quantiles forever on a
  * stream (p99 per window at 100 TB/day without keeping values).
  *
  * Two contracts, matching the batch spec's honesty about merge-tree
  * nondeterminism:
  *   - while everything fits in level 0 (n ≤ k) no compaction ever
  *     fires, so the streamed sketch is EXACTLY the batch sketch —
  *     (v, 1) per input, sorted — regardless of batch boundaries;
  *   - past compaction, estimates move within the bound: the
  *     streamed p50/p90/p99 rank error stays ≤ 2% of n against the
  *     known true ranks of a permutation stream.
  */
class StreamingKllSpec extends SparkSpec {

  private val base = Instant.parse("2026-01-01T00:00:00Z")
  private def ts(s: Int): Timestamp = Timestamp.from(base.plusSeconds(s.toLong))

  private def runStream(batches: Seq[Seq[(Timestamp, Double)]], k: Int,
      name: String): Seq[(Double, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Double)]
    val agg = source.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "60 seconds").as("w"))
      .agg(graft.functions.SketchAggregates.kllDoubles(col("v"), k)
        .as("sk"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b =>
        source.addData(b: _*)
        q.processAllAvailable()
      }
      // update mode re-emits the window per batch; the LAST emission
      // carries the fully merged sketch
      spark.table(name).select("sk").collect().last.getSeq[Row](0)
        .map(r => (r.getDouble(0), r.getLong(1)))
    } finally q.stop()
  }

  test("below compaction the streamed sketch equals the batch sketch exactly") {
    import spark.implicits._
    // 30 values, k = 64: level 0 never overflows, so the sketch IS
    // the sorted input at weight 1 on any merge tree
    val vals = (1 to 30).map(i => ((i * 7) % 30 + 1).toDouble).distinct
    val batches = vals.grouped(7).toSeq
      .map(_.zipWithIndex.map { case (v, i) => (ts(1 + i), v) })
    val streamed = runStream(batches, 64, "kllexact")
    val batch = vals.toDF("v")
      .agg(graft.functions.SketchAggregates.kllDoubles(col("v"), 64))
      .head().getSeq[Row](0).map(r => (r.getDouble(0), r.getLong(1)))
    assert(streamed == batch && streamed == vals.sorted.map((_, 1L)),
      s"streamed=$streamed")
  }

  test("past compaction the streamed rank error stays under 2% of n") {
    // a deterministically shuffled permutation of 1..20000 across 5
    // micro-batches — true rank of value v is v
    val n = 20000
    val perm = (1 to n).sortBy(i => (i * 2654435761L) % n)
    val batches = perm.grouped(n / 5).toSeq
      .map(_.zipWithIndex.map { case (v, i) =>
        (ts(1 + (i % 50)), v.toDouble)
      })
    val pairs = runStream(batches, 1024, "kllbound").sortBy(_._1)
    // compaction conserves weighted mass exactly (see
    // SketchAggregatesSpec) — streaming state merges must preserve it
    val mass = pairs.map(_._2).sum
    assert(mass == n, s"mass=$mass != n=$n")
    for (pct <- Seq(50, 90, 99)) {
      val target = (pct.toLong * mass + 99) / 100
      var cum = 0L
      val est = pairs.find { case (_, c) => cum += c; cum >= target }.get._1
      val err = math.abs(est - pct.toDouble / 100 * n) / n
      assert(err <= 0.02, s"p$pct est=$est err=$err (bound 2%)")
    }
  }
}
