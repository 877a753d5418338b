package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null-semantics contracts for the change-data helpers — the cases
  * the q78/q79 oracles can't reach because their value columns are
  * never null. */
class ChangeOpsSpec extends SparkSpec {

  test("tableDiff: NULL→value and value→NULL both classify as changed") {
    import spark.implicits._
    val a = Seq((1L, Option.empty[Long]), (2L, Some(5L)), (3L, Some(7L)),
      (4L, Option.empty[Long])).toDF("k", "v")
    val b = Seq((1L, Some(5L)), (2L, Option.empty[Long]), (3L, Some(7L)),
      (4L, Option.empty[Long])).toDF("k", "v")
    val status = ChangeOps.tableDiff(a, b, Seq("k"), Seq("v"))
      .select("k", "status").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(status(1L) == "changed") // NULL → 5
    assert(status(2L) == "changed") // 5 → NULL
    assert(status(3L) == "unchanged")
    assert(status(4L) == "unchanged") // NULL → NULL
  }

  test("q87 scd2: intervals chain gaplessly and partition the event count") {
    val d = sf("sf0.001")
    val out = ChangeOps.q87Scd2.fn(spark, d).cache()
    // versions are dense from 1 per user
    val dense = out.groupBy("user_id")
      .agg(min("version").as("lo"), max("version").as("hi"),
        count(lit(1)).as("k"))
    assert(dense.filter(col("lo") =!= 1 || col("hi") =!= col("k")).count() == 0)
    // valid_to == next version's valid_from (gapless chain, last open)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("version")
    val chained = out.withColumn("next_from", lead("valid_from_us", 1).over(w))
    assert(chained.filter(!(col("valid_to_us") <=> col("next_from")))
      .count() == 0)
    // intervals cover every event exactly once
    val total = graft.Tables.events(spark, d).count()
    assert(out.agg(sum("n_events")).head().getLong(0) == total)
    // a version's type always differs from its predecessor's
    val flip = out.withColumn("prev_type", lag("event_type", 1).over(w))
    assert(flip.filter(col("prev_type").isNotNull &&
      col("prev_type") === col("event_type")).count() == 0)
    out.unpersist()
  }

  test("mergeInto: a source NULL overwrites the target value") {
    import spark.implicits._
    val target = Seq((1L, Some(10L)), (2L, Some(20L))).toDF("k", "v")
    val source = Seq((1L, Option.empty[Long]), (3L, Some(30L))).toDF("k", "v")
    val out = ChangeOps.mergeInto(target, source, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2)))
      .toMap
    assert(out(1L) == ((None, true)), "NULL update must propagate")
    assert(out(2L) == ((Some(20L), false)), "unmatched target passes through")
    assert(out(3L) == ((Some(30L), true)), "new key inserts")
  }
}
