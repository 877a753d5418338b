package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Locks the Jaro–Winkler contract the q118 gate depends on: the
  * scorer must equal DuckDB's `jaro_winkler_similarity` bit-for-bit
  * (the oracle recomputes every score independently). The fixture
  * values below were produced by DuckDB itself — if this spec fails
  * after an edit, the gate will too.
  */
class TextExpressionsSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    TextExpressions.jaroWinklerScore(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler matches DuckDB on the classic reference pairs") {
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("aaa", "aaa") == 1.0)
  }

  test("boost threshold: jaro <= 0.7 gets NO prefix bonus") {
    // jaro = 0.5 with a 2-char common prefix — DuckDB returns 0.5
    assert(jw("ABCDEFGH", "ABXXXXXX") == 0.5)
    // jaro = 0.7333 > 0.7 but zero common prefix — unchanged
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
  }

  test("transpositions TRUNCATE: odd mismatch counts round down") {
    // 'red widget'/'new widget': 8 matches, 3 mismatched positions →
    // 1 transposition (not 1.5) → jaro (.8+.8+7/8)/3 = .825; the
    // round-trip divergence that cost the first q118 gate run
    assert(jw("red widget", "new widget") == 0.8250000000000001)
  }

  test("edge cases: empty strings and window-0 short strings") {
    assert(jw("", "") == 0.0) // DuckDB convention (not 1.0)
    assert(jw("A", "") == 0.0)
    // len-2: match window max(2,2)/2-1 = 0 → only same-position
    // matches → AB/BA has none
    assert(jw("AB", "BA") == 0.0)
  }

  test("the Column wrapper evaluates under codegen") {
    import spark.implicits._
    val out = Seq(("MARTHA", "MARHTA"), ("", ""))
      .toDF("a", "b")
      .select(TextExpressions.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(0.9611111111111111, 0.0))
  }

  test("simhash/fingerprint/lsh-sig stay inside whole-stage codegen") {
    import spark.implicits._
    import graft.functions.{VectorExpressions => VE}
    // all three were CodegenFallback until round 8; the static-kernel
    // doGenCode must (a) keep the projection in a WholeStageCodegen
    // span and (b) produce the same values as interpreted eval
    // parquet round-trip: a local Seq would constant-fold the whole
    // projection into a LocalTableScan and never exercise codegen
    val dir = java.nio.file.Files.createTempDirectory("graft-cg").toString
    Seq((Seq("a", "b", "c"), Seq(0.5f, -1.0f, 2.0f)))
      .toDF("toks", "emb").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(TextExpressions.simhash(col("toks")).as("sh"),
        TextExpressions.rollingFingerprint(col("toks")).as("fp"),
        VE.lshSignature(col("emb"), 3, 4).as("sig"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("[codegen id :"), plan)
    val r = df.head()
    // values must equal a direct kernel call (codegen ≡ interpreted)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(UTF8String.fromString("a"), UTF8String.fromString("b"),
        UTF8String.fromString("c")))
    assert(r.getLong(0) == TextExpressions.simhash64(arr))
    assert(r.getLong(1) == TextExpressions.rollingFingerprint64(arr))
    val emb = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(0.5f, -1.0f, 2.0f))
    assert(r.getSeq[Long](2) ==
      VE.hyperplaneSig(emb, 3, 4, isFloat = true).toLongArray().toSeq)
  }
}
