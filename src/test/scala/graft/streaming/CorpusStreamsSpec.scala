package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CorpusStreamsSpec extends SparkSpec {

  test("streaming first-seen dedup drops cross-batch duplicates, keeps firsts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Instant.parse("2025-07-15T00:00:00Z")
    def doc(id: Long, text: String, s: Int) =
      (id, text, Timestamp.from(base.plusSeconds(s.toLong)))

    val source = MemoryStream[(Long, String, Timestamp)]
    val deduped = CorpusStreams.firstSeenDocuments(
      source.toDF().toDF("doc_id", "text", "ingest_ts"))
    val q = deduped.writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    // batch 1: two distinct docs + an IN-batch duplicate of doc 1
    source.addData(doc(1L, "alpha beta gamma", 0),
      doc(2L, "delta epsilon", 10), doc(3L, "alpha beta gamma", 20))
    q.processAllAvailable()
    // batch 2: a CROSS-batch duplicate of doc 1 and one new doc —
    // the duplicate must be dropped by carried state
    source.addData(doc(4L, "alpha beta gamma", 60), doc(5L, "zeta eta", 70))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("first_seen").select("doc_id").as[Long]
      .collect().toSet
    assert(out == Set(1L, 2L, 5L),
      s"expected first instances only (1, 2, 5), got $out")
    // the emitted key matches the batch q40 identity exactly
    val hashes = spark.table("first_seen")
      .filter(col("doc_id") === 1L).select("content_hash").head().getString(0)
    assert(hashes == java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }
}
