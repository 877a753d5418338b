package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided TPC-H-ish testdata (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. All query entry
  * points receive `sfDir` so the same query runs at any scale factor.
  * Reads go through `spark.read.parquet` so Catalyst gets full
  * predicate pushdown / column pruning on every scan.
  *
  * Timestamp normalization is SCHEMA-DRIVEN and applies to EVERY table
  * and EVERY column: the driver has regenerated the testdata with three
  * different parquet timestamp encodings across rounds (round 5 lost 15
  * queries to an unhandled switch on one column), so `load` normalizes
  * whatever it finds rather than special-casing `events.ts`:
  *   - TIMESTAMP(NANOS): Spark 4 reads it only as a raw long
  *     (spark.sql.legacy.parquet.nanosAsLong=true in Verify/Bench/test
  *     sessions), indistinguishable from a genuine long in the Spark
  *     schema — so `load` reads ONE parquet footer per distinct path
  *     (memoized) and uses the parquet logical-type annotation to find
  *     the ns-timestamp columns, then integral-divs each to µs.
  *     Truncation ns→µs is order-preserving for whole-µs predicates,
  *     and all query orderings tiebreak on an id column, so semantics
  *     match a ns engine. Integral `div`, not `/`: double division of
  *     ~1.7e18 ns epochs loses up to ~200 ns (53-bit mantissa).
  *   - timestamp[us] without tz → TIMESTAMP_NTZ: cast to TimestampType.
  *     Sessions run with UTC timezone, so the naive wall-clock µs value
  *     is reinterpreted 1:1 as the epoch-µs instant — the same reading
  *     DuckDB's `epoch_us` gives the oracle over the same parquet.
  *   - timestamp[us] with tz (LTZ): already TimestampType, pass through.
  */
object Tables {

  /** Top-level column names annotated TIMESTAMP(unit=NANOS) in the
    * parquet footer at `path` (a single file or a directory of part
    * files). Memoized per path: the footer tells us which LongType
    * columns in the Spark schema are really nanosecond timestamps —
    * information the nanosAsLong read path erases. One small footer
    * read per distinct path per JVM; scans are unaffected.
    */
  private val nanosCols =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  private def nanosTimestampColumns(
      spark: SparkSession, path: String): Set[String] =
    nanosCols.computeIfAbsent(path, { p =>
      import scala.jdk.CollectionConverters._
      import org.apache.parquet.schema.LogicalTypeAnnotation
      import LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
      try {
        val conf = spark.sessionState.newHadoopConf()
        val root = new org.apache.hadoop.fs.Path(p)
        val fs = root.getFileSystem(conf)
        val file =
          if (fs.getFileStatus(root).isDirectory)
            fs.listStatus(root).map(_.getPath)
              .find(f => !f.getName.startsWith("_") &&
                !f.getName.startsWith("."))
              .getOrElse(root)
          else root
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
        try {
          reader.getFooter.getFileMetaData.getSchema.getFields.asScala
            .collect {
              case t => (t.getName, t.getLogicalTypeAnnotation)
            }
            .collect {
              case (name, ts: TimestampLogicalTypeAnnotation)
                  if ts.getUnit == TimeUnit.NANOS => name
            }.toSet
        } finally reader.close()
      } catch {
        // unreadable footer (e.g. a non-parquet test fixture): fall back
        // to no ns columns — the NTZ/LTZ branches still normalize
        case scala.util.control.NonFatal(_) => Set.empty[String]
      }
    })

  /** Normalize every timestamp column of `df` to µs TimestampType,
    * whatever parquet encoding the file shipped (see object doc).
    */
  private def normalizeTimestamps(
      spark: SparkSession, path: String, df: DataFrame): DataFrame = {
    lazy val nsCols = nanosTimestampColumns(spark, path)
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if nsCols.contains(f.name) =>
          acc.withColumn(f.name,
            timestamp_micros(org.apache.spark.sql.functions
              .expr(s"`${f.name}` div 1000")))
        case _ => acc
      }
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    normalizeTimestamps(spark, path, spark.read.parquet(path))
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
