package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Contracts for the streaming Misra-Gries top-k: exact equality on a
  * no-eviction fixture (MG with fewer distinct keys than capacity IS
  * exact counting, across batch boundaries), the order-free MG
  * guarantees under eviction, and the state bound (a snapshot never
  * exceeds `capacity` rows per key).
  */
class StreamingTopKSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val base = Instant.parse("2026-01-01T00:00:00Z")
  private def ev(tpe: String, user: Long, id: Long, s: Int) = TopKStream.Ev(
    tpe, user, id, Timestamp.from(base.plusSeconds(s.toLong)))

  private def run(capacity: Int, name: String,
      batches: Seq[Seq[TopKStream.Ev]]): Map[(String, Long), Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val source = MemoryStream[TopKStream.Ev]
      val q = TopKStream.hitters(source.toDS(), capacity)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b =>
          source.addData(b: _*)
          q.processAllAvailable()
        }
        // keep each type's LAST snapshot (max monotonic seq)
        val rows = spark.table(name)
          .as[TopKStream.Hitter].collect()
        val lastSeq = rows.groupBy(_.event_type)
          .view.mapValues(_.map(_.seq).max).toMap
        val last = rows.filter(r => r.seq == lastSeq(r.event_type))
        // state bound: never more than `capacity` counters per key
        last.groupBy(_.event_type).foreach { case (t, rs) =>
          assert(rs.length <= capacity, s"$t: ${rs.toSeq}")
        }
        last.map(r => (r.event_type, r.user_id) -> r.est).toMap
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("no eviction: MG snapshot is an exact recount across batches") {
    // 3 distinct users < capacity 8 -> pure counting; counts must
    // carry across the batch boundary
    val b1 = Seq(ev("X", 1, 1, 0), ev("X", 1, 2, 1), ev("X", 2, 3, 2),
      ev("Y", 9, 4, 3))
    val b2 = Seq(ev("X", 1, 5, 4), ev("X", 3, 6, 5), ev("Y", 9, 7, 6))
    val got = run(8, "mg_exact", Seq(b1, b2))
    assert(got == Map(("X", 1L) -> 3L, ("X", 2L) -> 1L, ("X", 3L) -> 1L,
      ("Y", 9L) -> 2L), got)
  }

  test("eviction: MG guarantees hold against an exact recount") {
    // capacity 2, 4 distinct users, n = 12 events -> error bound
    // n/capacity = 6; user 1 (true 6 > bound... with strict > n/k
    // presence) must survive; every estimate in [true - n/k, true]
    val evs = Seq.tabulate(6)(i => ev("X", 1, i.toLong, i)) ++
      Seq.tabulate(3)(i => ev("X", 2, 10L + i, 6 + i)) ++
      Seq.tabulate(2)(i => ev("X", 3, 20L + i, 9 + i)) ++
      Seq(ev("X", 4, 30, 11))
    val truth = Map(1L -> 6L, 2L -> 3L, 3L -> 2L, 4L -> 1L)
    val got = run(2, "mg_evict", Seq(evs.take(7), evs.drop(7)))
    val bound = 12L / 2
    got.foreach { case ((_, u), est) =>
      assert(est <= truth(u) && est >= truth(u) - bound, s"$u -> $est")
    }
    // MG never holds more than capacity survivors
    assert(got.size <= 2, got)
  }

  test("late within-watermark batch still supersedes via the monotonic seq") {
    // batch 1 at t=100s; batch 2 arrives LATER but carries OLDER
    // event times (95-96s, inside the 10s watermark). The kept
    // max-seq snapshot must include batch 2's counts — an event-time
    // tag would rank it behind batch 1 and discard the newest state.
    val b1 = Seq(ev("X", 1, 1, 100))
    val b2 = Seq(ev("X", 1, 2, 95), ev("X", 2, 3, 96))
    val got = run(8, "mg_late", Seq(b1, b2))
    assert(got == Map(("X", 1L) -> 2L, ("X", 2L) -> 1L), got)
  }
}
