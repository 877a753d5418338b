package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (SURVEY §7.5.6).
  *
  * The built-in route — `aggregate(zip_with(...))` higher-order
  * functions — is evaluated by the lambda interpreter per element:
  * ~30M interpreted closures for a 100-query × 5k-corpus brute-force
  * scan. These expressions run a tight primitive loop inside
  * whole-stage codegen instead (preference order (b) of the build
  * brief: custom Expression before custom operator). Both float and
  * double array children are supported so raw `Array[Float]`
  * embedding columns need no per-element cast projection.
  *
  * Accumulation is sequential in DOUBLE regardless of input width —
  * the same contract as the DuckDB oracle's
  * `list_cosine_similarity(CAST(x AS DOUBLE[]) ...)`, so results are
  * bit-identical across engines.
  */
object VectorExpressions {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Σ aᵢ·bᵢ over two numeric arrays (double accumulation). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs array<float|double> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      val lf = elemIsFloat(left)
      val rf = elemIsFloat(right)
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lg = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val rg = if (elemIsFloat(right)) "getFloat" else "getDouble"
      // freshName, not fixed names: several of these expressions land
      // in ONE codegen scope (cosine = dot + two norms), and a fixed
      // `int i` redefinition makes janino reject the whole stage —
      // silently degrading it to interpreted mode
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ((double) $x.$lg($i)) * ((double) $y.$rg($i));
           |}
           |${ev.value} = $s;
         """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Σ aᵢ² (squared L2 norm, double accumulation). */
  case class SquaredNorm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_sqnorm needs array<float|double>, got ${t.sql}")
      }

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val f = elemIsFloat(child)
      var s = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        s += v * v
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val g = if (elemIsFloat(child)) "getFloat" else "getDouble"
      // freshName for the same reason as DotProduct: two SquaredNorms
      // plus a DotProduct share one scope in every cosine projection
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      nullSafeCodeGen(ctx, ev, x =>
        s"""
           |int $n = $x.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = (double) $x.$g($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = $s;
         """.stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Σ (aᵢ−bᵢ)² over two BIGINT arrays — the fixed-point squared L2
    * distance of the PQ encode/ADC paths (q69/q72). Exact int64
    * arithmetic end-to-end (the quantized inputs are ≤ 2²¹, so the
    * sum of 16 squared deltas stays far below 2⁶³) — bit-identical to
    * the oracle's list_sum(list_transform(...)) without the ~dim
    * interpreted closures per pair the built-in higher-order route
    * costs. */
  case class LongSqDist(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_lsqdist needs array<bigint> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val dv = ctx.freshName("d")
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $dv = $x.getLong($i) - $y.getLong($i);
           |  $s += $dv * $dv;
           |}
           |${ev.value} = $s;
         """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Random-hyperplane LSH signature: `tables` longs, each of `bits`
    * sign bits. Plane (t,p) weight for dimension i is ±1 from a
    * splitmix64-style hash of (t·bits+p)·dim+i — deterministic on
    * every executor, no plane matrix to broadcast. One fused loop in
    * codegen replaces ~L·k·dim interpreted lambda calls per row. */
  case class HyperplaneSignature(child: Expression, tables: Int, bits: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_lsh_sig needs array<float|double>, got ${t.sql}")
      }

    override def nullSafeEval(a: Any): Any =
      VectorExpressions.hyperplaneSig(a.asInstanceOf[ArrayData],
        tables, bits, elemIsFloat(child))

    override def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      // static kernel with the table/bit counts and element type
      // baked in as literals — one call per row, stage stays in
      // whole-stage codegen (the JaroWinkler pattern)
      nullSafeCodeGen(ctx, ev, x =>
        s"${ev.value} = graft.functions.VectorExpressions.hyperplaneSig(" +
          s"$x, $tables, $bits, ${elemIsFloat(child)});")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Static kernel behind [[HyperplaneSignature]] (also called from
    * generated code — keep the signature stable). */
  def hyperplaneSig(x: ArrayData, tables: Int, bits: Int,
      isFloat: Boolean): ArrayData = {
    val n = x.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < bits) {
        val plane = t * bits + p
        var dot = 0.0
        var i = 0
        while (i < n) {
          val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
          dot += v * VectorExpressions.planeWeight(plane, i)
          i += 1
        }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Map-side argmax-cosine centroid assignment (q56/q81): given a
    * vector and the FULL centroid table as one array column (a 1-row
    * broadcast), returns struct(cent_id, sim) of the most-similar
    * centroid, ties to the MIN cent_id — exactly the
    * max_by(struct(cent_id, …), struct(sim, −cent_id)) the old shape
    * computed over an exploded cross join + groupBy(vec_id), except
    * vec_id is unique so that group-by only ever collapsed the k rows
    * this kernel now folds in place: the per-round n-row exchange is
    * gone. Cosine is the exact DotProduct/SquaredNorm chain (double
    * accumulation, dot / (√‖a‖²·√‖b‖²) in that IEEE op order) and the
    * sim comparison mirrors Spark's nanSafeCompareDoubles, so the
    * argmax — including NaN and exact ties — is bit-identical to the
    * struct-ordering max. Null (→ no output row, like the empty cross
    * join) only when the centroid array is empty. */
  case class BestCentroid(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("cent_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false)))
    override def nullable: Boolean = true
    private def centElemFloat: Boolean = right.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 =>
        fs(1).dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        }
      case _ => false
    }
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val lOk = left.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      val rOk = right.dataType match {
        case ArrayType(StructType(fs), _) if fs.length == 2 =>
          fs(0).dataType == LongType && (fs(1).dataType match {
            case ArrayType(FloatType | DoubleType, _) => true
            case _ => false
          })
        case _ => false
      }
      if (lOk && rOk)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_best_centroid needs (array<float|double>, " +
          s"array<struct<bigint, array<float|double>>>), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      VectorExpressions.bestCentroid(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], elemIsFloat(left), centElemFloat)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      // static kernel, one call per row (the HyperplaneSignature
      // pattern): the k·dim loop runs as plain JVM code and the stage
      // stays in whole-stage codegen
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"""
           |${ev.value} = graft.functions.VectorExpressions.bestCentroid(
           |  $x, $y, ${elemIsFloat(left)}, $centElemFloat);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Spark's nanSafeCompareDoubles semantics (NaN greatest,
    * NaN == NaN, ±0.0 equal) — the ordering struct-max comparison
    * uses for DoubleType, mirrored so [[bestCentroid]]'s argmax can
    * never diverge from the old max_by. */
  @inline private def nanSafeCompare(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1 else -1
  }

  /** Static kernel behind [[BestCentroid]] (also called from generated
    * code — keep the signature stable). Returns null iff `cents` is
    * empty. */
  def bestCentroid(emb: ArrayData, cents: ArrayData,
      embFloat: Boolean, centFloat: Boolean)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val k = cents.numElements()
    if (k == 0) return null
    val n = emb.numElements()
    var sa = 0.0
    var i = 0
    while (i < n) {
      val v = if (embFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      sa += v * v
      i += 1
    }
    val na = java.lang.Math.sqrt(sa)
    var bestId = 0L
    var bestSim = 0.0
    var any = false
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      val id = row.getLong(0)
      val ce = row.getArray(1)
      val nb = ce.numElements()
      val m = java.lang.Math.min(n, nb)
      var dot = 0.0
      var j = 0
      while (j < m) {
        val x = if (embFloat) emb.getFloat(j).toDouble else emb.getDouble(j)
        val y = if (centFloat) ce.getFloat(j).toDouble else ce.getDouble(j)
        dot += x * y
        j += 1
      }
      var sb = 0.0
      j = 0
      while (j < nb) {
        val y = if (centFloat) ce.getFloat(j).toDouble else ce.getDouble(j)
        sb += y * y
        j += 1
      }
      val sim = dot / (na * java.lang.Math.sqrt(sb))
      val cmp = if (any) nanSafeCompare(sim, bestSim) else 1
      if (cmp > 0 || (cmp == 0 && id < bestId)) {
        bestId = id; bestSim = sim; any = true
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestId, bestSim))
  }

  /** splitmix64 finalizer → ±1 weight for (plane, dim). */
  @inline def planeWeight(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 1L) 1.0 else -1.0
  }

  // Column builders (wrap via the classic Column-from-Expression path)
  private def asCol(e: Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def exprOf(c: Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  def dot(a: Column, b: Column): Column = asCol(DotProduct(exprOf(a), exprOf(b)))
  def sqnorm(a: Column): Column = asCol(SquaredNorm(exprOf(a)))
  def longSqDist(a: Column, b: Column): Column =
    asCol(LongSqDist(exprOf(a), exprOf(b)))
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot(a, b) / (sqrt(sqnorm(a)) * sqrt(sqnorm(b)))
  }
  def lshSignature(a: Column, tables: Int, bits: Int): Column =
    asCol(HyperplaneSignature(exprOf(a), tables, bits))
  def bestCentroid(emb: Column, cents: Column): Column =
    asCol(BestCentroid(exprOf(emb), exprOf(cents)))
}
