package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GramCells must be a drop-in for the explode-based gram shape it
  * replaced (r13 optimization): identical (i, j, n, sum) cells on
  * fixed-dim, variable-length, null-bearing, and multi-partition
  * inputs, and exact decimal sums past int64 (the 128-bit
  * accumulation path). */
class GramAggregateSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r13 explode shape, verbatim, as the reference. */
  private def explodeShape(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(expr(
        """flatten(transform(sequence(0, size(emb) - 1), i ->
          |  transform(sequence(i, size(emb) - 1), j ->
          |    struct(i AS i, j AS j,
          |      CAST(floor(emb[i] * emb[j] * 1000000000D + 0.5D) AS BIGINT)
          |        AS fp))))""".stripMargin)).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.fp").as("fp"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("fp").cast("decimal(38,0)")).as("fp"))

  private def aggShape(df: org.apache.spark.sql.DataFrame) =
    df.agg(GramAggregate.gramCells(col("emb")).as("cells"))
      .select(explode(col("cells")).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.n").as("n"),
        col("t.fp").as("fp"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getInt(1)) ->
      (r.getLong(2), r.getDecimal(3).toBigInteger)).toMap

  test("matches the explode shape on fixed-dim vectors, 8 partitions") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(500)(Array.fill(16)(rng.nextDouble() * 2 - 1))
    val df = spark.createDataset(rows).toDF("emb")
      .repartition(8).select(col("emb").cast("array<double>").as("emb"))
    val a = asMap(aggShape(df))
    val e = asMap(explodeShape(df))
    assert(a.size == 16 * 17 / 2)
    assert(a == e)
  }

  test("variable lengths + null rows keep per-cell counts exact") {
    val rng = new scala.util.Random(11)
    val rows: Seq[Array[Double]] =
      Seq.fill(200)(Array.fill(1 + rng.nextInt(9))(rng.nextDouble())) ++
        Seq(null, null)
    val df = spark.createDataset(rows).toDF("emb")
      .repartition(5).select(col("emb").cast("array<double>").as("emb"))
    val a = asMap(aggShape(df))
    val e = asMap(explodeShape(df))
    assert(a == e)
    // a cell (0, 8) only reachable by length-9 rows: n must equal the
    // count of those rows, not the total
    val n9 = rows.count(r => r != null && r.length == 9).toLong
    assert(a((0, 8))._1 == n9)
  }

  test("128-bit accumulation is exact past int64 (decimal headroom)") {
    // each row's self-product quantizes to ~4e18 — five of them
    // overflow a long accumulator twice over; the decimal sum must be
    // the exact integer total
    val v = 2.0e9 // fp = floor(4e18 * 1e9 ...) — clamp via quantum 1.0
    val df = spark.createDataset(Seq.fill(5)(Array(v))).toDF("emb")
      .select(col("emb").cast("array<double>").as("emb"))
    val out = df.agg(GramAggregate.gramCells(col("emb"), 1e0).as("cells"))
      .select(explode(col("cells")).as("t"))
      .select(col("t.fp")).collect()
    val expect = java.math.BigInteger.valueOf(
      Math.floor(v * v * 1e0 + 0.5).toLong)
      .multiply(java.math.BigInteger.valueOf(5))
    assert(out.head.getDecimal(0).toBigInteger == expect)
  }

  test("empty input yields zero cells") {
    val df = spark.createDataset(Seq.empty[Array[Double]]).toDF("emb")
      .select(col("emb").cast("array<double>").as("emb"))
    assert(aggShape(df).count() == 0)
  }
}
