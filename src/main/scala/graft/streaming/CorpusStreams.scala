package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming members of the corpus-curation family: the dedup /
  * curation operators a CONTINUOUS ingestion pipeline needs, built on
  * the engine's native stateful operators rather than batch re-scans.
  *
  * The batch counterparts live in operators.DedupOps / CurationOps;
  * these run the same semantics incrementally — at 100 TB/day the
  * difference between "touch each arriving document once, keep a
  * bounded state store" and "re-scan the accumulated corpus per tick".
  */
object CorpusStreams {

  /** Streaming exact dedup, first-seen-wins at MICRO-BATCH
    * granularity: documents whose content hash was seen in an earlier
    * micro-batch within the watermark horizon are dropped; among
    * duplicates arriving in the SAME micro-batch one arbitrary row
    * survives (dropDuplicatesWithinWatermark makes no ordering
    * promise across source partitions) — content identity is exact
    * either way, and the emitted content_hash is the same md5 key q40
    * uses, so batch and streaming dedup agree on WHAT is a duplicate;
    * the batch pass remains the authority on WHICH doc is canonical.
    *
    * State: one (hash, first-seen-ts) entry per distinct document in
    * the horizon, evicted by the watermark — bounded by distinct-docs
    * per horizon, not by stream length. A duplicate arriving LATER
    * than the horizon re-admits the content; pick the watermark as
    * the window within which exactness is required (the batch q40
    * pass remains the global guarantee). */
  def firstSeenDocuments(docs: DataFrame, tsCol: String = "ingest_ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
