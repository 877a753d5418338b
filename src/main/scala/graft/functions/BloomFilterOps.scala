package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Spark's own bloom-filter expressions (the machinery behind runtime
  * row-level filtering, `BloomFilterAggregate` /
  * `BloomFilterMightContain`) exposed as Columns, so a query can build
  * a bloom filter over the SMALL side of a containment check and
  * pre-filter the BIG side map-side before any shuffle.
  *
  * The 100 TB shape: an exact semi-join on n-grams shuffles every
  * corpus n-gram; with the bloom pre-filter the corpus side drops all
  * non-candidate rows inside its scan stage (codegen'd `might_contain`
  * on an xxhash64 key, no exchange), and only the tiny candidate
  * remainder pays the exact-verification join. False positives are
  * removed by that exact join, so results stay exact; false negatives
  * cannot happen (bloom property).
  */
object BloomFilterOps {

  /** Aggregate Column: build a bloom filter (as binary) over a LONG
    * item column, sized for `expectedItems` distinct values. */
  def bloomAgg(item: Column, expectedItems: Long): Column =
    column(new BloomFilterAggregate(expression(item), expectedItems)
      .toAggregateExpression())

  /** Predicate Column: bloom membership test of a LONG item against
    * serialized filter bytes. `BloomFilterMightContain` requires the
    * filter side to be FOLDABLE (it is built for literal/subquery
    * runtime filters), hence bytes, not a Column. */
  def mightContain(bloomBytes: Array[Byte], item: Column): Column =
    column(BloomFilterMightContain(Literal(bloomBytes, BinaryType),
      expression(item)))

  /** Build the filter on the driver from a one-row aggregate. This is
    * the scalar-subquery pattern Spark's own runtime filtering uses —
    * the single collected row is the serialized sketch (KBs to low MBs
    * for realistic `expectedItems`), not data. */
  def build(smallSide: DataFrame, item: Column,
      expectedItems: Long): Array[Byte] =
    smallSide.agg(bloomAgg(item, expectedItems).as("bf"))
      .head().getAs[Array[Byte]]("bf")
}
