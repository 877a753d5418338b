package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the training-corpus operators (q37/q45/q46/q47) —
  * the properties a pipeline relies on beyond per-value oracle
  * equality: splits partition the corpus, packing conserves documents
  * and tokens, decontamination only ever flags test-split docs.
  */
class CorpusOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private lazy val docs = Tables.documents(spark, dir).cache()

  test("train split partitions the corpus at ~80/10/10") {
    val rows = TextOps.q37TrainSplit.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.count()
    assert(rows.values.sum == total)
    assert(rows.keySet.subsetOf(Set("train", "val", "test")))
    val frac = rows.view.mapValues(_.toDouble / total).toMap
    // binomial noise at n=50: generous 3-sigma bands
    assert(frac("train") > 0.6 && frac("train") < 0.95, frac)
    assert(frac.getOrElse("val", 0.0) < 0.25 && frac.getOrElse("test", 0.0) < 0.25, frac)
  }

  test("doc packing conserves documents and tokens; bins are contiguous") {
    val packed = TextOps.q46DocPack.fn(spark, dir).cache()
    val nDocs = packed.agg(sum("n_docs")).head().getLong(0)
    assert(nDocs == docs.count())
    val tokTotal = packed.agg(sum("bin_tokens")).head().getLong(0)
    val expected = docs
      .agg(sum(size(split(col("text"), " ", -1)).cast("long"))).head().getLong(0)
    assert(tokTotal == expected)
    // bin ids per (split, shard) run 0..max with no gaps: a gap would
    // mean the cumulative-offset cut skipped a budget window
    val gaps = packed.groupBy("split", "shard")
      .agg(countDistinct("bin").as("n"), max("bin").as("mx"))
      .filter(col("n") =!= col("mx") + 1)
    assert(gaps.count() == 0)
  }

  test("decontamination flags only test-split docs whose print is in train") {
    val flagged = TextOps.q45Decontaminate.fn(spark, dir)
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2),
      16, 10).cast("int")
    val withBucket = flagged.join(
      docs.select(col("doc_id"), bucket.as("bucket")), Seq("doc_id"))
    assert(withBucket.filter(col("bucket") < 230).count() == 0)
    // every flagged fingerprint exists on some train doc
    val fp = md5(concat_ws(" ", array_sort(array_distinct(
      split(col("text"), " ", -1)))))
    val trainFps = docs.select(fp.as("fingerprint"), bucket.as("bucket"))
      .filter(col("bucket") < 205).select("fingerprint")
    assert(flagged.join(trainFps, Seq("fingerprint"), "left_anti").count() == 0)
  }

  test("repetition ratio bounded; degenerate text flagged, varied text kept") {
    import spark.implicits._
    val q = TextOps.q47Repetition.fn(spark, dir)
    assert(q.filter(col("rep_ratio") < 0 || col("rep_ratio") > 1).count() == 0)
    // synthetic extremes through the same operator body
    val extreme = Seq(
      (1L, Seq.fill(50)("spam").mkString(" ")), // one repeated token
      (2L, (1 to 50).map(i => s"w$i").mkString(" "))) // all-distinct
      .toDF("doc_id", "text")
    val byId = TextOps.q47Repetition.fn(spark, dir) // shape only
    val r = {
      // run the operator over the synthetic frame via a temp view swap:
      // simplest is to inline the same expressions the operator uses
      val toks = split(col("text"), " ", -1)
      val tris = expr("transform(sequence(0, size(tk) - 3), " +
        "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")
      extreme.select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"), (size(col("tk")) - 2).as("n_tri"),
          size(array_distinct(tris)).as("n_uniq"))
        .select(col("doc_id"),
          ((col("n_tri") - col("n_uniq")).cast("double") / col("n_tri"))
            .as("ratio"))
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    }
    assert(r(1L) > 0.9) // "spam spam spam ..." is ~all duplicate trigrams
    assert(r(2L) == 0.0) // fully varied text has none
    assert(byId.columns.contains("keep"))
  }
}
