package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Property: EventTime.micros inverts Timestamp.from(Instant) exactly
  * for every microsecond value — including the sub-millisecond
  * component getTime alone truncates, negative (pre-1970) epochs, and
  * ms boundaries. Deterministic seeded sweep (the scalatestplus
  * bridge isn't available offline — the repo's PropertySpec
  * convention). */
class EventTimeSpec extends AnyFunSuite {

  test("micros round-trips arbitrary epoch-µs values through Timestamp") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(0L, 1L, 700L, 999L, 1000L, -1L, -700L, -1500L,
      999999L, 1000000L, 1705363200000000L) ++
      Seq.fill(5000)(rnd.nextLong() % (1L << 53))
    cases.foreach { us =>
      val ts = Timestamp.from(Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      assert(EventTime.micros(ts) == us, s"us=$us")
    }
    // the exact regression class: +700µs is invisible to getTime
    val t = Timestamp.from(Instant.ofEpochSecond(0, 700000L))
    assert(t.getTime == 0L && EventTime.micros(t) == 700L)
  }
}
