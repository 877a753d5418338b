package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom aggregate sketches — the `TypedImperativeAggregate` surface
  * (SURVEY §6's named extension point): a k-permutation MinHash
  * sketch built as a FIRST-CLASS Spark aggregate, so it composes with
  * groupBy/rollup/window like any built-in, pre-combines map-side
  * (update), and merges associatively across partitions (merge) — the
  * property that makes a sketch usable at 100 TB, where per-group
  * element streams never co-locate.
  *
  * Hash family: hᵢ(s) = first 15 hex chars of md5("i:" ++ s) parsed
  * base-16 (60 bits, always positive) — the repo's established
  * cross-engine recipe (q33/q37/q70), so a DuckDB oracle recomputes
  * the EXACT sketch with `('0x' || substring(md5(i || ':' || s), 1,
  * 15))::BIGINT`. md5 here is a parity choice, not a speed one: an
  * engine-only sketch would use xxhash64 like q42's signatures.
  */
object SketchAggregates {

  private val hexDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** hᵢ(s): 60-bit md5-derived hash, bit-identical to the oracle's
    * SQL recipe. */
  private def hash(i: Int, s: UTF8String): Long = {
    val md = hexDigest.get()
    md.reset()
    val digest = md.digest(s"$i:${s.toString}".getBytes("UTF-8"))
    // first 15 hex chars = 7 bytes + the high nibble of byte 8
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
    (v << 4) | ((digest(7) & 0xf0L) >> 4)
  }

  /** k-minimum MinHash sketch over a string column: array<long> of
    * the per-permutation minima. Empty groups yield Long.MaxValue
    * slots (no input ever hashes there — 60-bit hashes are always
    * smaller). */
  case class MinHashSketch(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // analysis-time contract (same pattern as SimHash64 /
    // RollingFingerprint): a non-string child or k < 1 would otherwise
    // surface only at execution as a ClassCastException / empty buffer
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType != StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft minhash_sketch needs a string child, got ${child.dataType.sql}")
      else if (k < 1)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft minhash_sketch needs k >= 1 permutations, got $k")
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): Array[Long] =
      Array.fill(k)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String]
        var i = 0
        while (i < k) {
          val h = hash(i, s)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 * k)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(k)(bb.getLong())
    }

    override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): MinHashSketch =
      copy(child = newChildren.head)
  }

  /** Column wrapper: `groupBy(...).agg(minhashSketch($"shingle", 16))`. */
  def minhashSketch(col: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashSketch(
        org.apache.spark.sql.GraftColumnBridge.expression(col), k)
        .toAggregateExpression())
}
