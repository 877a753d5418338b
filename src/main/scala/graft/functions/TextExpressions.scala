package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document sketching.
  *
  * SimHash is computed per document in ONE pass over its token array —
  * the dataflow alternative (explode tokens → 64 conditional sums →
  * re-assemble bits) costs a shuffle plus a 64-buffer aggregate per
  * token row. At 100 TB that is the difference between a map-only
  * stage and an extra exchange of |tokens| rows.
  */
object TextExpressions {

  /** 64-bit SimHash over an array<string> token column. Token hash =
    * XXH64 (Spark's own, seed 42 like the xxhash64 SQL function);
    * bit b of the signature is set iff more tokens have bit b set
    * than unset (majority vote, weight 1 per token). */
  case class SimHash64(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_simhash needs array<string>, got ${t.sql}")
      }

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val votes = new Array[Int](64)
      var i = 0
      var nonNull = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          nonNull += 1
          val s = arr.getUTF8String(i)
          val h = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
          var b = 0
          while (b < 64) {
            votes(b) += ((h >>> b) & 1L).toInt
            b += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) * 2 > nonNull) sig |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(sig)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Order-sensitive 64-bit rolling (polynomial) fingerprint over an
    * array<string> token column: h = Σ xxh64(tokᵢ)·B^(n−1−i) with
    * wrap-around multiplication — two docs match iff their token
    * SEQUENCES match (unlike the set-based md5 fingerprint). One
    * pass, map-only. */
  case class RollingFingerprint(child: Expression) extends UnaryExpression
      with CodegenFallback {
    private val Base = 1099511628211L // FNV prime

    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_fingerprint needs array<string>, got ${t.sql}")
      }

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      var h = 0L
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val tokHash = if (arr.isNullAt(i)) 0L else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes(), 42L)
        }
        h = h * Base + tokHash
        i += 1
      }
      java.lang.Long.valueOf(h)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simhash(tokens: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimHash64(org.apache.spark.sql.GraftColumnBridge.expression(tokens)))

  def rollingFingerprint(tokens: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      RollingFingerprint(org.apache.spark.sql.GraftColumnBridge.expression(tokens)))
}
