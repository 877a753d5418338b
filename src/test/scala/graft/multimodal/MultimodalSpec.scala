package graft.multimodal

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sf("sf0.001"))).cache()

  test("media table carries binary payloads with typed metadata") {
    val r = media.head()
    assert(r.getAs[Array[Byte]]("content").nonEmpty)
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Long]("n_bytes") ==
      r.getAs[Array[Byte]]("content").length.toLong)
    assert(media.select("kind").distinct().count() == 3)
  }

  test("decode stub: batched, deterministic, schema-stable") {
    val d1 = Multimodal.decode(media, batchSize = 7)
    val d2 = Multimodal.decode(media, batchSize = 64)
    assert(d1.schema == Multimodal.decodedSchema)
    // batch size must not change results (pure per-row semantics,
    // batching is an execution detail)
    assert(d1.exceptAll(d2).count() == 0 && d2.exceptAll(d1).count() == 0)
    assert(d1.count() == media.count())
    // images have no duration; features are fixed-width
    assert(d1.filter(col("kind") === "image" && col("duration_ms") =!= 0)
      .count() == 0)
    assert(d1.filter(size(col("feature")) =!= 8).count() == 0)
  }

  test("resize clamps the long side, preserves aspect ratio direction") {
    val resized = Multimodal.resize(Multimodal.decode(media), maxSide = 256)
    assert(resized.filter(greatest(col("width"), col("height")) > 256)
      .count() == 0)
    assert(resized.filter(col("width") < 1 || col("height") < 1).count() == 0)
  }

  test("frame sampling explodes one row per 5s frame for videos only") {
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, everyMs = 5000)
    val videos = decoded.filter(col("kind") === "video")
    assert(frames.select("media_id").distinct().count() == videos.count())
    // per-video frame count = floor(duration/5000) + 1
    val bad = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .join(videos.select(col("media_id"),
        ((col("duration_ms") / 5000).cast("int") + 1).as("expect")), "media_id")
      .filter(col("n") =!= col("expect"))
    assert(bad.count() == 0)
  }
}
