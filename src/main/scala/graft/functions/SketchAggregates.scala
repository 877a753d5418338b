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

  /** HyperLogLog register sketch over a string column — the OTHER
    * mergeable sketch a 100 TB engine cannot live without (distinct
    * counts where the per-group element streams never co-locate):
    * array<int> of 2^p max-rank registers, map-side update,
    * elementwise-max merge (associative + idempotent, so re-merging
    * across rollup levels is safe). The ESTIMATE is deliberately NOT
    * computed here: registers stay a pure mergeable state, and the
    * estimator runs as auditable column math on the array (see
    * q154).
    *
    * Hash recipe (cross-engine): h = first 15 hex chars of md5(s)
    * parsed base-16 (60 bits, the q33/q37/q149 family) — bucket is
    * the TOP p bits (h >> (60−p)), the rank word w is the LOW 40
    * bits, rank = 40 − floor(log2(w)) (w = 0 → 41). The 40-bit
    * window is a parity choice: the oracle recomputes floor(log2(w))
    * in double math, where log2(2^k − 1) sits ~1/(2^k ln2) below k —
    * at k = 50 that's ~1 ulp (a double could round UP to k and
    * misbin), at k = 40 it's ~180 ulps of slack. Dropping the middle
    * 10 bits keeps both engines' floor(log2) exact over the whole
    * domain. */
  case class HllRegisters(
      child: Expression, p: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] {

    private def m: Int = 1 << p

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType != StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft hll_registers needs a string child, got ${child.dataType.sql}")
      else if (p < 4 || p > 16)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft hll_registers needs 4 <= p <= 16, got $p")
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val md = hexDigest.get()
        md.reset()
        val digest = md.digest(
          v.asInstanceOf[UTF8String].toString.getBytes("UTF-8"))
        // first 15 hex chars = 60 bits (the MinHashSketch recipe)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
        val bucket = (h >>> (60 - p)).toInt
        val w = h & ((1L << 40) - 1)
        val rank =
          (if (w == 0) 41 else 41 - (64 - java.lang.Long.numberOfLeadingZeros(w)))
            .toByte
        if (rank > buf(bucket)) buf(bucket) = rank
      }
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Byte]): Any =
      new GenericArrayData(buf.map(_.toInt))

    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(o: Int): HllRegisters =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllRegisters =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): HllRegisters =
      copy(child = newChildren.head)
  }

  /** Column wrapper: `groupBy(...).agg(hllRegisters($"text", 10))`. */
  def hllRegisters(col: Column, p: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HllRegisters(
        org.apache.spark.sql.GraftColumnBridge.expression(col), p)
        .toAggregateExpression())

  /** Misra–Gries heavy-hitter sketch over a string column: at most
    * `k` (item, count) counters with the classic decrement step on
    * overflow; merge adds counts then re-truncates by subtracting the
    * (k+1)-largest (the Agarwal et al. mergeable-summaries rule), so
    * the deterministic guarantee survives ANY partitioning: every
    * item with true count ≥ N/(k+1) is PRESENT in the final sketch
    * (counts may be under-estimated by ≤ N/(k+1), and the retained
    * SET may vary with merge order — which is why q162 never exposes
    * the sketch directly: it is a CANDIDATE GENERATOR whose output
    * feeds an exact verification count, the standard two-pass
    * heavy-hitters production shape).
    *
    * State is ≤ k counters regardless of input size — the mergeable
    * bound that replaces a full-cardinality shuffle with a
    * constant-size one at 100 TB. */
  case class MisraGries(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[
        scala.collection.mutable.HashMap[String, Long]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType != StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft misra_gries needs a string child, got ${child.dataType.sql}")
      else if (k < 1)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft misra_gries needs k >= 1 counters, got $k")
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer()
        : scala.collection.mutable.HashMap[String, Long] =
      scala.collection.mutable.HashMap.empty

    override def update(
        buf: scala.collection.mutable.HashMap[String, Long],
        input: InternalRow)
        : scala.collection.mutable.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String].toString
        buf.update(s, buf.getOrElse(s, 0L) + 1L)
        if (buf.size > k) {
          // classic MG decrement, in place: O(k) per overflow round
          // but each round destroys k+1 units of the n units of total
          // mass — amortized O(1) per row
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
        }
      }
      buf
    }

    override def merge(
        a: scala.collection.mutable.HashMap[String, Long],
        b: scala.collection.mutable.HashMap[String, Long])
        : scala.collection.mutable.HashMap[String, Long] = {
      b.foreach { case (i, c) => a.update(i, a.getOrElse(i, 0L) + c) }
      if (a.size > k) {
        // mergeable-summaries truncation (Agarwal et al.): subtract
        // the (k+1)-largest count from everyone, drop ≤ 0 — one
        // O(k log k) pass per MERGE (merges are per-partition-rare,
        // unlike per-row updates)
        val counts = a.values.toArray
        java.util.Arrays.sort(counts)
        val cut = counts(a.size - k - 1)
        a.mapValuesInPlace((_, c) => c - cut)
        a.filterInPlace((_, c) => c > 0L)
      }
      a
    }

    /** Surviving candidate items, sorted for deterministic layout
      * (estimates stay internal — see the class doc). */
    override def eval(
        buf: scala.collection.mutable.HashMap[String, Long]): Any =
      new GenericArrayData(
        buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

    override def serialize(
        buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (i, c) =>
        val bytes = i.getBytes("UTF-8")
        out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte])
        : scala.collection.mutable.HashMap[String, Long] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = scala.collection.mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val arr = new Array[Byte](len)
        in.readFully(arr)
        buf.update(new String(arr, "UTF-8"), in.readLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGries =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGries =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): MisraGries =
      copy(child = newChildren.head)
  }

  /** Column wrapper: `agg(misraGries($"tok", 2000))`. */
  def misraGries(col: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MisraGries(
        org.apache.spark.sql.GraftColumnBridge.expression(col), k)
        .toAggregateExpression())

  /** Mutable state of [[KllDoubles]]: `levels(ℓ)` holds values each
    * representing 2^ℓ original rows; level 0 is the raw intake. */
  final class KllState(
      val levels: scala.collection.mutable.ArrayBuffer[
        scala.collection.mutable.ArrayBuffer[Double]])

  /** KLL mergeable QUANTILE sketch over a double column — the fourth
    * canonical sketch beside distinct-count (HllRegisters), heavy
    * hitters (MisraGries), and frequency (the q163 count-min cells):
    * ~3k doubles of state per group whose rank estimates stay within
    * a small fraction of n regardless of volume. This is the tool for
    * quantiles of UNBOUNDED-cardinality values at 100 TB — exact rank
    * picks ride the (group, value) cell collapse only while value
    * cardinality is bounded (cents); for latencies/sizes/scores with
    * no finite domain the cell frame IS the data, and a mergeable
    * sketch is the only one-pass answer.
    *
    * Structure = Karnin–Lang–Liberty levels with geometric capacities
    * (cap(ℓ) = max(8, k·(2/3)^(top−ℓ)), top level gets k): raw values
    * enter level 0; an overfull level sorts and COMPACTS — keep the
    * odd-indexed half of an even count (an odd count leaves its
    * minimum behind), push the half up a level at doubled weight.
    * merge() concatenates level-wise and re-compacts bottom-up. The
    * one deviation from the paper: compaction keeps odd indices
    * ALWAYS instead of flipping a random coin — every step is a pure
    * function of its inputs, no RNG anywhere. The price is that
    * merge is not associative, so the final state depends on Spark's
    * partial-merge tree: the gate query (q196) therefore dumps the
    * sketch estimates as a Verify fixture both engines read (the
    * winnow/LSH pattern), making its full output hash-checkable, and
    * SketchAggregatesSpec asserts what a consumer actually relies
    * on — the rank-error bound (≤ 2% of n at k = 1024 on 1-partition
    * AND 32-partition builds, so the merge path is inside the bound
    * too), exact mass conservation (Σ weights == n), and the
    * serialize roundtrip.
    *
    * eval() returns array<struct<v: double, c: bigint>> sorted by
    * value — a consumer estimates rank-t by the prefix-weight
    * straddle (the q166 pattern on sketch rows instead of exact
    * cells). */
  case class KllDoubles(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KllState] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("v", DoubleType, nullable = false),
        StructField("c", LongType, nullable = false))),
      containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType != DoubleType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft kll_doubles needs a double child, got ${child.dataType.sql}")
      else if (k < 8)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft kll_doubles needs k >= 8, got $k")
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): KllState =
      new KllState(scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[Double]))

    private def capOf(numLevels: Int, level: Int): Int = {
      var c = k.toDouble
      var i = numLevels - 1
      while (i > level) { c = c * 2.0 / 3.0; i -= 1 }
      math.max(8, math.ceil(c).toInt)
    }

    /** Compact every overfull level bottom-up. Pure function of the
      * state: sort, odd count leaves its MIN behind, odd INDICES of
      * the even remainder move up at doubled weight. */
    private def compact(buf: KllState): Unit = {
      var l = 0
      while (l < buf.levels.length) {
        if (buf.levels(l).length > capOf(buf.levels.length, l)) {
          val arr = buf.levels(l).toArray
          java.util.Arrays.sort(arr)
          val odd = (arr.length & 1) == 1
          val start = if (odd) 1 else 0 // odd count: min stays behind
          buf.levels(l).clear()
          if (odd) buf.levels(l) += arr(0)
          if (l + 1 == buf.levels.length)
            buf.levels += scala.collection.mutable.ArrayBuffer
              .empty[Double]
          val up = buf.levels(l + 1)
          var i = start + 1 // odd indices of the even remainder
          while (i < arr.length) { up += arr(i); i += 2 }
        }
        l += 1
      }
    }

    override def update(buf: KllState, input: InternalRow): KllState = {
      val v = child.eval(input)
      if (v != null) {
        buf.levels(0) += v.asInstanceOf[Double]
        if (buf.levels(0).length > capOf(buf.levels.length, 0))
          compact(buf)
      }
      buf
    }

    override def merge(a: KllState, b: KllState): KllState = {
      while (a.levels.length < b.levels.length)
        a.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      var l = 0
      while (l < b.levels.length) {
        a.levels(l) ++= b.levels(l)
        l += 1
      }
      compact(a)
      a
    }

    override def eval(buf: KllState): Any = {
      val pairs = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var l = 0
      while (l < buf.levels.length) {
        val w = 1L << l
        buf.levels(l).foreach(v => pairs += ((v, w)))
        l += 1
      }
      val sorted = pairs.sortBy(_._1)
      new GenericArrayData(sorted.map { case (v, c) =>
        InternalRow(v, c)
      }.toArray[Any])
    }

    override def serialize(buf: KllState): Array[Byte] = {
      val total = buf.levels.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(
        4 + buf.levels.length * 4 + total * 8)
      bb.putInt(buf.levels.length)
      buf.levels.foreach { lv =>
        bb.putInt(lv.length)
        lv.foreach(bb.putDouble)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): KllState = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val nl = bb.getInt()
      val levels = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[Double]]
      var l = 0
      while (l < nl) {
        val n = bb.getInt()
        val lv = scala.collection.mutable.ArrayBuffer.empty[Double]
        var i = 0
        while (i < n) { lv += bb.getDouble(); i += 1 }
        levels += lv
        l += 1
      }
      new KllState(levels)
    }

    override def withNewMutableAggBufferOffset(o: Int): KllDoubles =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllDoubles =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): KllDoubles =
      copy(child = newChildren.head)
  }

  /** Column wrapper: `agg(kllDoubles($"value", 1024))`. */
  def kllDoubles(col: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      KllDoubles(
        org.apache.spark.sql.GraftColumnBridge.expression(col), k)
        .toAggregateExpression())
}
