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
