package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based check of q194's closed-form weighted water-fill
  * (CurationOps.waterFillOn): on ANY (cap, weight) profile the
  * prefix-saturation algebra must equal the textbook ITERATIVE
  * fixed-point (repeatedly saturate every source whose weighted share
  * exceeds its capacity, then floor-allocate the rest at the final
  * water level) — including the shapes the corpus never produces:
  * exact cap/weight-ratio ties, zero capacities, one source owning
  * almost everything, extreme weights. Also asserts feasibility
  * (Σalloc ≤ budget, alloc ≤ cap) independently of the reference.
  * Fixed seeds, the ChangePropertySpec offline-scalacheck convention. */
class WaterFillSpec extends SparkSpec {

  private case class S(cap: Long, wt: Long)

  private val srcGen: Gen[S] = for {
    // zero caps, tiny caps, and heavy tails; weights 1..16 with
    // occasional extremes
    cap <- Gen.frequency(
      1 -> Gen.const(0L),
      4 -> Gen.choose(1L, 40L),
      2 -> Gen.choose(1000L, 5000L))
    wt <- Gen.frequency(
      5 -> Gen.choose(1L, 4L),
      2 -> Gen.choose(8L, 16L))
  } yield S(cap, wt)

  private def draw(seed: Long): Seq[(String, Long, Long)] = {
    val n = 2 + (seed * 31 % 14).toInt
    Gen.listOfN(n, srcGen)(Gen.Parameters.default, rng.Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))
      .zipWithIndex.map { case (s, i) => (f"s$i%02d", s.cap, s.wt) }
  }

  /** Textbook iterative reference: saturate violators until a fixed
    * point, floor-allocate the survivors at the final water level. */
  private def iterative(rows: Seq[(String, Long, Long)])
      : Map[String, Long] = {
    val budget0 = rows.map(_._2).sum / 2
    var active = rows.map(_._1).toSet
    val cap = rows.map(r => r._1 -> r._2).toMap
    val wt = rows.map(r => r._1 -> r._3).toMap
    var budget = budget0
    val alloc = scala.collection.mutable.Map.empty[String, Long]
    var changed = true
    while (changed) {
      val tw = active.toSeq.map(wt).sum
      val sat = active.filter(s => cap(s) * tw <= budget * wt(s))
      changed = sat.nonEmpty
      sat.foreach { s =>
        alloc(s) = cap(s); budget -= cap(s); active -= s
      }
    }
    val tw = active.toSeq.map(wt).sum
    active.foreach { s => alloc(s) = budget * wt(s) / tw }
    alloc.toMap
  }

  test("closed-form prefix allocation equals the iterative fixed-point (24 seeds)") {
    import spark.implicits._
    for (seed <- 1L to 24L) {
      val rows = draw(seed)
      val got = CurationOps.waterFillOn(
          rows.toDF("source", "cap", "wt").repartition(5))
        .select("source", "alloc_tokens").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = iterative(rows)
      assert(got == want, s"seed $seed: rows=$rows got=$got want=$want")
      // feasibility, independent of the reference
      val budget = rows.map(_._2).sum / 2
      assert(got.values.sum <= budget, s"seed $seed overspends")
      rows.foreach { case (s, cap, _) =>
        assert(got(s) <= cap, s"seed $seed: $s alloc ${got(s)} > cap $cap")
      }
    }
  }

  test("exact ratio ties at the water boundary allocate identically either way") {
    import spark.implicits._
    // two sources with IDENTICAL cap/wt sitting exactly at the level:
    // caps (10, 10, 60), weights (1, 1, 1) → budget 40, level 15 →
    // both 10-cap sources saturate, the 60-cap source gets 20
    val rows = Seq(("a", 10L, 1L), ("b", 10L, 1L), ("c", 60L, 1L))
    val got = CurationOps.waterFillOn(rows.toDF("source", "cap", "wt"))
      .select("source", "alloc_tokens", "status").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got("a") == ((10L, "saturated")) &&
      got("b") == ((10L, "saturated")) &&
      got("c") == ((20L, "water_level")), got)
  }
}
