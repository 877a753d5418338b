package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical data-layout operators: the audits that decide HOW a
  * 100 TB table should be clustered on disk, not what a query over
  * it returns. At cluster scale the dominant cost of most reads is
  * the scan, and the scan cost is set by min/max-zone pruning — which
  * the WRITE-time row order controls. These operators measure that
  * effect with the engine's own primitives (the write itself is just
  * `df.sort(...).write`, so the decision-support audit is the part
  * worth building).
  *
  * Reference scope: the reference partitions its lake by date only
  * (`consumer/ingest_bronze.py` writes date-partitioned parquet) and
  * never revisits layout; multi-dimensional clustering is part of the
  * extension tranche (SURVEY §2.11).
  */
object LayoutOps {

  /** Sign-safe epoch-µs → epoch-day floordiv (the q143 convention:
    * oracle `//` floors, Spark `div` truncates; subtracting the pmod
    * first makes the dividend an exact multiple). */
  private def epochDay(tsMicros: Column): Column =
    expr(s"(${tsMicros.toString} - " +
      s"pmod(${tsMicros.toString}, 86400000000)) div 86400000000")

  /** 8-bit Morton spread: interleave zeros between the bits of an
    * 8-bit value (classic shift-or-mask ladder, 3 steps). Pure int64
    * bit math — identical in any engine with `&`/`|`/shifts. */
  private[operators] def spread8(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(3855L)) // 0x0F0F
    val b = a.bitwiseOR(shiftleft(a, 2)).bitwiseAND(lit(13107L)) // 0x3333
    b.bitwiseOR(shiftleft(b, 1)).bitwiseAND(lit(21845L)) // 0x5555
  }

  /** Z-order vs time-linear layout audit: lay the events table out in
    * 64 equal row-count files two ways — `linear` (the default
    * append order, `(ts, event_id)`) and `zorder` (Morton interleave
    * of an 8-bit user bucket and an 8-bit day index) — record each
    * file's per-dimension min/max zone map, and replay a 4×4 grid of
    * 2-D probe predicates (user-bucket range × day range) against the
    * zone maps. `files_scanned` is the number of files whose box
    * intersects the probe — exactly what a parquet reader's row-group
    * pruning would scan. The time-linear layout prunes the day
    * dimension and nothing else; Z-order bounds BOTH dimensions per
    * file, which is the entire argument for clustered rewrites of
    * multi-dimensionally-filtered 100 TB tables.
    *
    * Scale shape: each layout's file assignment is a GLOBAL rank —
    * which rides the two-phase range-partitioned prefix
    * ([[AnalyticsOps2.globalRowNumber]]), never a single-task window
    * — followed by one integer floordiv into 64 equal-row files
    * (rank·64 div n; the row-count scalar is a broadcast, the q168
    * pattern). Everything after the two per-(layout, file) min/max
    * aggregates is metadata-sized (128 zone rows × 16 probes). The
    * Morton code itself is 6 shift-or-mask ops of codegen'd int64
    * math — free at scan speed.
    *
    * Determinism: ranks tiebreak on event_id; day index is the
    * sign-safe epoch-µs floordiv anchored at 2024-01-01 (epoch day
    * 19723), taken mod 256 as the documented 256-day tile. */
  val q169ZorderLayout: QueryDef = QueryDef.withOracle(
    """WITH base AS (
      |  SELECT event_id, epoch_us(ts) AS t,
      |    user_id % 256 AS x,
      |    ((epoch_us(ts) - epoch_us(ts) % 86400000000) // 86400000000
      |      - 19723) % 256 AS y
      |  FROM events),
      |sp AS (
      |  SELECT event_id, t, x, y,
      |    ((x | (x << 4)) & 3855) AS xa, ((y | (y << 4)) & 3855) AS ya
      |  FROM base),
      |sp2 AS (
      |  SELECT event_id, t, x, y,
      |    ((xa | (xa << 2)) & 13107) AS xb,
      |    ((ya | (ya << 2)) & 13107) AS yb
      |  FROM sp),
      |m AS (
      |  SELECT event_id, t, x, y,
      |    (((xb | (xb << 1)) & 21845)
      |      | ((((yb | (yb << 1)) & 21845)) << 1)) AS morton
      |  FROM sp2),
      |r AS (
      |  SELECT x, y,
      |    row_number() OVER (ORDER BY t, event_id) AS rn_lin,
      |    row_number() OVER (ORDER BY morton, event_id) AS rn_z,
      |    count(*) OVER () AS n
      |  FROM m),
      |fl AS (
      |  SELECT 'linear' AS layout, ((rn_lin - 1) * 64) // n AS f, x, y FROM r
      |  UNION ALL
      |  SELECT 'zorder' AS layout, ((rn_z - 1) * 64) // n AS f, x, y FROM r),
      |zones AS (
      |  SELECT layout, f, min(x) AS mnx, max(x) AS mxx,
      |    min(y) AS mny, max(y) AS mxy
      |  FROM fl GROUP BY 1, 2),
      |probes AS (
      |  SELECT p AS probe, (p % 4) * 64 AS px0, (p % 4) * 64 + 15 AS px1,
      |    (p // 4) * 8 AS py0, (p // 4) * 8 + 7 AS py1
      |  FROM (SELECT unnest(range(0, 16)) AS p))
      |SELECT layout, probe,
      |  sum(CASE WHEN mxx < px0 OR mnx > px1 OR mxy < py0 OR mny > py1
      |    THEN 0 ELSE 1 END) AS files_scanned,
      |  floor((CAST(sum(CASE WHEN mxx < px0 OR mnx > px1 OR mxy < py0
      |      OR mny > py1 THEN 0 ELSE 1 END) AS DOUBLE) / 64) * 1000000
      |    + 0.5) / 1000000 AS scan_share
      |FROM zones CROSS JOIN probes
      |GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    val base = Tables.events(s, d).select(
      col("event_id"),
      unix_micros(col("ts")).as("t"),
      pmod(col("user_id"), lit(256L)).as("x"))
      .withColumn("y", pmod(epochDay(col("t")) - 19723, lit(256L)))
      .withColumn("morton", spread8(col("x"))
        .bitwiseOR(shiftleft(spread8(col("y")), 1)))
    val n = base.agg(count(lit(1)).as("n"))
    def layoutFiles(name: String, sortCols: Seq[Column]) =
      AnalyticsOps2.globalRowNumber(base, sortCols, "rn")
        .crossJoin(broadcast(n))
        .select(lit(name).as("layout"),
          expr("((rn - 1) * 64) div n").as("f"), col("x"), col("y"))
    val zones = layoutFiles("linear", Seq(col("t"), col("event_id")))
      .unionByName(layoutFiles("zorder",
        Seq(col("morton"), col("event_id"))))
      .groupBy(col("layout"), col("f"))
      .agg(min(col("x")).as("mnx"), max(col("x")).as("mxx"),
        min(col("y")).as("mny"), max(col("y")).as("mxy"))
    val probes = s.range(1).select(
      explode(sequence(lit(0L), lit(15L))).as("probe"))
      .select(col("probe"),
        (col("probe") % 4 * 64).as("px0"),
        (col("probe") % 4 * 64 + 15).as("px1"),
        expr("(probe div 4) * 8").as("py0"),
        expr("(probe div 4) * 8 + 7").as("py1"))
    zones.crossJoin(broadcast(probes))
      .groupBy(col("layout"), col("probe"))
      .agg(sum(when(col("mxx") < col("px0") || col("mnx") > col("px1") ||
        col("mxy") < col("py0") || col("mny") > col("py1"), 0L)
        .otherwise(1L)).as("files_scanned"))
      .select(col("layout"), col("probe"), col("files_scanned"),
        (floor((col("files_scanned").cast("double") / 64) * 1000000
          + 0.5) / 1000000).as("scan_share"))
  }

  val all: Map[String, QueryDef] = Map(
    "q169_zorder_layout" -> q169ZorderLayout
  )
}
