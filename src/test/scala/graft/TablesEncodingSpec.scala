package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver has shipped timestamp columns in three parquet encodings
  * across rounds: TIMESTAMP(NANOS) (read as a raw long under
  * nanosAsLong), timestamp[us] without timezone (TIMESTAMP_NTZ under
  * Spark 4), and timestamp[us] with timezone (TimestampType).
  * `Tables.load` must normalize ALL of them to a µs TimestampType with
  * the same epoch value, on ANY table and ANY column name — round 5
  * lost 15 queries to an unhandled NTZ regeneration of `events.ts`,
  * and a fix special-cased to that one column would lose them again on
  * the next regeneration. Genuine long columns (ids) must pass through
  * untouched: the loader reads the parquet footer's logical-type
  * annotations to tell a ns timestamp from a real long.
  */
class TablesEncodingSpec extends SparkSpec {

  // 2024-03-01 12:34:56.789012 UTC
  private val epochUs = 1709296496789012L

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-enc-$tag").toString

  /** Write one row through parquet-mr with a REAL TIMESTAMP(NANOS)
    * annotation on `tsName` (Spark itself cannot write ns timestamps,
    * so the fixture goes through ExampleParquetWriter). `idName` stays
    * a plain INT64 — the annotation, not the physical type, is what
    * the loader must key on.
    */
  private def writeNanosFixture(
      dir: String, table: String, idName: String, tsName: String,
      ns: Long): Unit = {
    val schema: MessageType = Types.buildMessage()
      .required(INT64).named(idName)
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(
        true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named(tsName)
      .required(BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("label")
      .named(table)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/$table.parquet"))
      .withType(schema)
      .build()
    try writer.write(new SimpleGroupFactory(schema).newGroup()
      .append(idName, 41L).append(tsName, ns).append("label", "x"))
    finally writer.close()
  }

  test("ns-annotated TIMESTAMP(NANOS) loads as TimestampType, " +
      "plain longs untouched (events.ts)") {
    val dir = tmpDir("ns")
    // 567 sub-µs ns: truncation ns→µs must floor, not round
    writeNanosFixture(dir, "events", "event_id", "ts", epochUs * 1000L + 567)
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("event_id").dataType == LongType) // not a timestamp
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) == epochUs)
    assert(ev.select(col("event_id")).head().getLong(0) == 41L)
  }

  test("ns normalization is table- and column-name-agnostic " +
      "(lineitem.shipped_at)") {
    val dir = tmpDir("ns2")
    writeNanosFixture(dir, "lineitem", "l_orderkey", "shipped_at",
      epochUs * 1000L + 999)
    val li = Tables.lineitem(spark, dir)
    assert(li.schema("shipped_at").dataType == TimestampType)
    assert(li.schema("l_orderkey").dataType == LongType)
    assert(li.select(unix_micros(col("shipped_at"))).head().getLong(0)
      == epochUs)
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
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) == epochUs)
  }

  test("NTZ normalization is table- and column-name-agnostic " +
      "(orders.o_placed_at)") {
    val dir = tmpDir("ntz2")
    import spark.implicits._
    Seq((10L, 3L)).toDF("o_orderkey", "o_custkey")
      .withColumn("o_placed_at",
        timestamp_micros(lit(epochUs)).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val ord = Tables.orders(spark, dir)
    assert(ord.schema("o_placed_at").dataType == TimestampType)
    assert(ord.schema("o_orderkey").dataType == LongType)
    assert(ord.select(unix_micros(col("o_placed_at"))).head().getLong(0)
      == epochUs)
  }

  test("TimestampType (µs, ltz) passes through unchanged") {
    val dir = tmpDir("ltz")
    import spark.implicits._
    Seq((1L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(epochUs)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) == epochUs)
  }
}
