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
      .select(col("x"), col("y"),
        graft.functions.LayoutExpressions.morton(col("x"), col("y")).as("m"))
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

  test("q174: bloom never misses; zone and truth are exact on a split corpus") {
    val dir = tmp("graft-bloom")
    // 4096 events / 64 files of 64 rows; first 32 files hold only
    // users 0..7 (round-robin), last 32 only users 8..15 -> for every
    // user: files_true = 32, and the zone maps (mn=0,mx=7 | mn=8,
    // mx=15) prune exactly the other half -> files_zone_pass = 32.
    // The bloom may add false positives in the non-containing half
    // but can never miss: 32 <= bloom_pass <= 64, fp = pass - 32.
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 4096).map { i =>
      val u = if (i < 2048) i % 8 else 8 + i % 8
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds(i.toLong)),
        u.toLong, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = LayoutOps.q174BloomIndex.fn(spark, dir).collect()
    assert(out.length == 16, out.toSeq) // all 16 users probed
    out.foreach { r =>
      val (t, z, b, fp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(t == 32L, r)
      assert(z == 32L, r)
      assert(b >= 32L && b <= 64L, r) // no false negatives, ever
      assert(fp == b - t, r)
    }
  }

  test("q179: encoding picks are closed-form on a constructed column mix") {
    val dir = tmp("graft-enc")
    // 16 events, one per user:
    //   event_type: constant "view"      -> d=1, dict 4 B vs plain 64 B
    //   user_id: 16 distinct             -> d=16, 4-bit indices: dict
    //                                       136 B vs plain 128 B -> plain
    //   value: constant 1.0 -> "100"     -> d=1, dict 8 B vs 128 B
    //   day: constant                    -> d=1, dict 8 B vs 128 B
    //   props: "{}" x8, "{\"a\":1}" x8   -> d=2, 1-bit indices: dict
    //                                       9 + 2 = 11 B vs plain 72 B
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 16).map { i =>
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds(i.toLong)),
        i.toLong, "view", 1.0, if (i < 8) "{}" else "{\"a\":1}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = LayoutOps.q179EncodingProfile.fn(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    assert(out("event_type") == ((16L, 1L, 64L, 4L, "dict")), out)
    assert(out("user_id") == ((16L, 16L, 128L, 136L, "plain")), out)
    assert(out("value_cents") == ((16L, 1L, 128L, 8L, "dict")), out)
    assert(out("day") == ((16L, 1L, 128L, 8L, "dict")), out)
    assert(out("props") == ((16L, 2L, 72L, 11L, "dict")), out)
  }
}
