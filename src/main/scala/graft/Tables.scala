package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish testdata (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. All query entry
  * points receive `sfDir` so the same query runs at any scale factor.
  * Reads go through `spark.read.parquet` so Catalyst gets full
  * predicate pushdown / column pruning on every scan.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize `events.ts` to a µs `TimestampType` under every encoding
    * the driver has shipped:
    *   - TIMESTAMP(NANOS): Spark 4 reads it only as a raw long
    *     (spark.sql.legacy.parquet.nanosAsLong=true in Verify/Bench/test
    *     sessions) → integral div to µs. Truncation ns→µs is
    *     order-preserving for whole-µs predicates, and all query
    *     orderings tiebreak on event_id, so semantics match a ns engine.
    *   - timestamp[us] without tz → TIMESTAMP_NTZ: cast to TimestampType.
    *     Sessions run with UTC timezone, so the naive wall-clock µs value
    *     is reinterpreted 1:1 as the epoch-µs instant — the same reading
    *     DuckDB's `epoch_us` gives the oracle over the same parquet.
    *   - timestamp[us] with tz (LTZ): already TimestampType, pass through.
    */
  private def withTimestamps(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral `div`, not `/`: double division of ~1.7e18 ns epochs
        // loses up to ~200 ns (53-bit mantissa) before truncation
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame =
    withTimestamps(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
