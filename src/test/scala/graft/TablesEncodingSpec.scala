package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver has shipped `events.ts` in three parquet encodings across
  * rounds: TIMESTAMP(NANOS) (read as a raw long under nanosAsLong),
  * timestamp[us] without timezone (TIMESTAMP_NTZ under Spark 4), and
  * timestamp[us] with timezone (TimestampType). `Tables.events` must
  * normalize ALL of them to a µs TimestampType with the same epoch
  * value — round 5 lost 15 queries to an unhandled NTZ regeneration.
  */
class TablesEncodingSpec extends SparkSpec {

  // 2024-03-01 12:34:56.789012 UTC
  private val epochUs = 1709296496789012L

  private def loadedTs(dir: String): (DataType, Long) = {
    val ev = Tables.events(spark, dir)
    val tpe = ev.schema("ts").dataType
    val us = ev.select(unix_micros(col("ts"))).head().getLong(0)
    (tpe, us)
  }

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-enc-$tag").toString

  test("ns-as-long encoding loads as TimestampType, epoch preserved") {
    val dir = tmpDir("ns")
    import spark.implicits._
    // nanosAsLong surfaces TIMESTAMP(NANOS) as LongType; writing a
    // long column exercises the identical loader branch
    Seq((1L, epochUs * 1000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedTs(dir) == (TimestampType, epochUs))
  }

  test("TIMESTAMP_NTZ (µs, no tz) loads as TimestampType, epoch preserved") {
    val dir = tmpDir("ntz")
    import spark.implicits._
    Seq((1L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        timestamp_micros(lit(epochUs)).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType) // fixture is real NTZ
    assert(loadedTs(dir) == (TimestampType, epochUs))
  }

  test("TimestampType (µs, ltz) passes through unchanged") {
    val dir = tmpDir("ltz")
    import spark.implicits._
    Seq((1L, new Timestamp(epochUs / 1000), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(epochUs)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedTs(dir) == (TimestampType, epochUs))
  }
}
