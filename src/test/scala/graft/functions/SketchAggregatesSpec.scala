package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the MinHashSketch TypedImperativeAggregate. */
class SketchAggregatesSpec extends SparkSpec {

  private def refHash(i: Int, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$i:$s".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("sketch equals the per-permutation md5 minima, and md5 recipe matches") {
    import spark.implicits._
    val vals = Seq("alpha", "beta", "gamma", "delta")
    val got = vals.toDF("s")
      .agg(SketchAggregates.minhashSketch(col("s"), 16).as("sk"))
      .head().getSeq[Long](0)
    val want = (0 until 16).map(i => vals.map(refHash(i, _)).min)
    assert(got == want, got)
    // the in-JVM hash must equal Spark's md5() + conv() recipe (and
    // therefore DuckDB's '0x' || substring cast — q33's established
    // cross-engine bridge)
    val sqlHash = Seq("alpha").toDF("s")
      .select(expr("CAST(conv(substring(md5(concat('3:', s)), 1, 15), 16, 10) AS BIGINT)"))
      .head().getLong(0)
    assert(sqlHash == refHash(3, "alpha"))
  }

  test("merge is associative: partitioned == single-partition sketch") {
    import spark.implicits._
    val vals = (1 to 200).map(i => s"shingle token $i")
    val many = vals.toDF("s").repartition(7)
      .agg(SketchAggregates.minhashSketch(col("s"), 16))
      .head().getSeq[Long](0)
    val one = vals.toDF("s").coalesce(1)
      .agg(SketchAggregates.minhashSketch(col("s"), 16))
      .head().getSeq[Long](0)
    assert(many == one)
  }

  test("q149: identical shingle sets est 1.0, disjoint est 0.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sksim").toString
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val other = (1 to 20).map(i => s"zz$i").mkString(" ")
    Seq(
      (1L, base, "web"), (2L, base, "pdf"), // same shingles → est 1.0
      (3L, other, "txt")) // disjoint → minima differ in every slot
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.DedupOps.q149SourceSketchSim.fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("pdf", "web")) == ((16L, 1.0)), out)
    assert(out(("pdf", "txt")) == ((0L, 0.0)), out)
    assert(out(("txt", "web")) == ((0L, 0.0)), out)
  }
}
