package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form invariants for the layout audit (q169) that the DuckDB
  * gate can't see in isolation: the Morton bit-spread arithmetic
  * against hand-computed codes, and the end-to-end pruning win on a
  * full 256×256 grid where both layouts' zone maps have exact
  * closed-form answers.
  */
class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("morton spread: corner codes and quadrant ordering are exact") {
    // spread8 interleaves zeros: 0b11 -> 0b101; 255 -> 0x5555;
    // morton(x, y) = spread(x) | spread(y) << 1, so the two MSBs are
    // (y7, x7) — quadrants order (y<128,x<128) < (y<128,x>=128) <
    // (y>=128,x<128) < (y>=128,x>=128)
    val rows = Seq((3L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (0L, 0L), (127L, 127L), (128L, 0L), (0L, 128L), (128L, 128L))
      .toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.spread8(col("x"))
        .bitwiseOR(shiftleft(LayoutOps.spread8(col("y")), 1)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(rows((3L, 0L)) == 5L, rows)      // 0b11 -> 0b101
    assert(rows((255L, 0L)) == 0x5555L, rows)
    assert(rows((0L, 255L)) == 0xAAAAL, rows)
    assert(rows((255L, 255L)) == 0xFFFFL, rows)
    assert(rows((0L, 0L)) == 0L, rows)
    // quadrant ordering: every point of the low quadrant sorts before
    // every point of any higher quadrant
    assert(rows((127L, 127L)) < rows((128L, 0L)), rows)
    assert(rows((128L, 0L)) < rows((0L, 128L)), rows)
    assert(rows((0L, 128L)) < rows((128L, 128L)), rows)
  }

  test("q169: on a full 256x256 grid zorder scans 1 file/probe, linear 2") {
    val dir = tmp("graft-zorder")
    // one event per (x, y) cell: user_id = x, day index = y (256 days
    // from the 2024-01-01 anchor), ts y-major so the linear layout is
    // day-ordered. n = 65536 rows / 64 files = 1024 rows per file:
    //   - linear files are 4 consecutive day rows: box x=[0,255],
    //     y width 4 -> each probe's 8-day window overlaps exactly 2;
    //   - zorder files are 1024 consecutive Morton codes = aligned
    //     32x32 squares (1024 = 4^5) -> each 16x8 probe window sits
    //     inside exactly 1 square.
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = for (y <- 0 until 256; x <- 0 until 256) yield
      (256L * y + x, java.sql.Timestamp.from(
        base.plusSeconds(86400L * y + x)), x.toLong, "view", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = LayoutOps.q169ZorderLayout.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.size == 32, out)
    (0 until 16).foreach { p =>
      assert(out(("linear", p.toLong)) == 2L, s"probe $p: $out")
      assert(out(("zorder", p.toLong)) == 1L, s"probe $p: $out")
    }
  }
}
