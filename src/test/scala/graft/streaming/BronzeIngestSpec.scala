package graft.streaming

import graft.SparkSpec
import graft.etl.Fixtures
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class BronzeIngestSpec extends SparkSpec {

  private def toJsonRows: Seq[String] = {
    import spark.implicits._
    Fixtures.bronzeTelemetry(spark, nDevices = 3, rowsPerDevice = 50,
      dirty = true)
      .select(to_json(struct(col("*"))).as("v")).as[String].collect().toSeq
  }

  test("streaming ingest: validated bronze lands date-partitioned, exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val validated = BronzeIngest.parseAndValidate(
      source.toDF().withColumnRenamed("value", "value"))
    val out = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val rows = toJsonRows
    source.addData(rows: _*) // before start: AvailableNow snapshots offsets
    val q = validated.writeStream
      .format("parquet")
      .option("path", s"$out/bronze/telemetry")
      .option("checkpointLocation", s"$out/ckpt")
      .partitionBy("date")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val bronze = spark.read.parquet(s"$out/bronze/telemetry")
    // 150 clean + 9 dirty in fixture; F1 drops only the 2 rows failing
    // schema/timestamp validation (null required field, bad timestamp) —
    // range checks and dedup are Silver's job, matching ingest_bronze.py
    assert(bronze.count() == 150 + 7)
    assert(bronze.columns.contains("date"))
    assert(bronze.filter(col("ingestion_time").isNull).count() == 0)
    // partition pruning works on the layout
    val oneDay = spark.read.parquet(s"$out/bronze/telemetry")
      .filter(col("date") === lit(java.sql.Date.valueOf("2025-07-15")))
    assert(oneDay.count() > 0)

    // exactly-once across restart: re-run with same checkpoint, no new data
    val q2 = BronzeIngest.parseAndValidate(source.toDF())
      .writeStream.format("parquet")
      .option("path", s"$out/bronze/telemetry")
      .option("checkpointLocation", s"$out/ckpt")
      .partitionBy("date")
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$out/bronze/telemetry").count() == 157)
  }

  test("batch reuse: parseAndValidate works on a static frame too") {
    import spark.implicits._
    val df = toJsonRows.toDF("value")
    val validated = BronzeIngest.parseAndValidate(df)
    assert(validated.count() == 157)
    assert(validated.schema.fieldNames.toSet
      .contains("energy_consumption_wh"))
  }

  test("kafka-wire file stream: restart with NEW data resumes exactly once") {
    // the closest offline stand-in for a broker e2e: a file source
    // emitting the kafka source's exact output schema, drained, then
    // restarted on the same checkpoint AFTER more wire data arrives —
    // the checkpoint must replay nothing and miss nothing (stronger
    // than the no-new-data restart above)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wire").toString
    val src = s"$dir/wire"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val idx = toJsonRows.zipWithIndex
    def wireDf(batch: Seq[(String, Int)]) = batch.map { case (json, i) =>
      (s"k$i".getBytes("UTF-8"), json.getBytes("UTF-8"),
        "smart_home.telemetry", 0, i.toLong,
        new java.sql.Timestamp(1735689600000L + i), 0)
    }.toDF("key", "value", "topic", "partition", "offset",
      "timestamp", "timestampType")
    wireDf(idx.take(60)).coalesce(1).write.mode("append").parquet(src)
    val wireSchema = spark.read.parquet(src).schema
    def drain(): Unit = {
      val q = BronzeIngest.parseAndValidate(
          spark.readStream.schema(wireSchema).parquet(src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .partitionBy("date")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    drain()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0 && afterFirst < 157, s"partial drain: $afterFirst")
    wireDf(idx.drop(60)).coalesce(1).write.mode("append").parquet(src)
    drain()
    // every valid fixture row exactly once: 157 of 159 (2 fail F1)
    assert(spark.read.parquet(out).count() == 157)
  }

  test("parseAndValidate consumes the exact Kafka wire schema") {
    // a real kafka source emits BINARY key/value plus topic/partition/
    // offset/timestamp/timestampType — the transform must cast and
    // parse that shape, not just a convenience string column
    import spark.implicits._
    val wire = toJsonRows.zipWithIndex.map { case (json, i) =>
      ("device_001".getBytes("UTF-8"), json.getBytes("UTF-8"),
        "smart_home.telemetry", 0, i.toLong,
        new java.sql.Timestamp(1735689600000L + i), 0)
    }.toDF("key", "value", "topic", "partition", "offset",
      "timestamp", "timestampType")
    // kafka's `timestamp` column must not collide with the payload's
    // parsed `timestamp` field: from_json projects only the message
    val validated = BronzeIngest.parseAndValidate(wire)
    assert(validated.count() == 157)
    assert(validated.filter(col("date").isNull).count() == 0)
  }
}
