package graft.etl

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake layout: partitioned parquet sinks and pruned scans
  * (SURVEY §2.1 S4-S10).
  *
  * The reference hand-rolls partition pruning by constructing
  * YYYY/MM/DD paths and filtering files by mtime
  * (bronze_to_silver.py:38-80); here every table is written
  * `partitionBy("date")` and read with a date predicate, which
  * Catalyst turns into partition pruning — the 100 TB path: a
  * lookback query touches only its date directories regardless of
  * lake size.
  *
  * Idempotence (ST8): the reference appends overlapping windows and
  * dedups at read; we dedup before write and use dynamic partition
  * overwrite (`replaceWhere` semantics) so reprocessing a window
  * rewrites its partitions instead of duplicating them — documented
  * intentional deviation, oracle comparisons are on deduped sets.
  */
object Lake {

  /** S7: Silver sink — date-partitioned, dedup-on-write, dynamic
    * partition overwrite for idempotent reprocessing. */
  def writeSilver(silver: DataFrame, root: String): Unit =
    silver
      .withColumn("date", to_date(col("timestamp")))
      .dropDuplicates("device_id", "timestamp")
      .repartition(col("date")) // one writer set per partition → no small files
      .write
      .partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(s"$root/silver/energy_usage")

  /** S8: Silver scan with lookback pruning (days_back, anchored at
    * cfg.now — wall-clock-free under a pinned referenceInstant). */
  def readSilver(spark: SparkSession, root: String, daysBack: Int = 7,
      cfg: EtlConfig = EtlConfig()): DataFrame = {
    val cutoff = java.sql.Date.valueOf(
      cfg.now.atZone(java.time.ZoneOffset.UTC).toLocalDate.minusDays(daysBack))
    spark.read
      // S6 semantics: skip corrupt files with a warning instead of
      // failing the job (bronze_to_silver.py:96-101)
      .option("ignoreCorruptFiles", "true")
      .parquet(s"$root/silver/energy_usage")
      .filter(col("date") >= lit(cutoff)) // partition pruning
  }

  /** S9: Gold sinks — daily_energy + device_health flat snapshots,
    * business summary date-partitioned. */
  def writeGold(dailyEnergy: DataFrame, deviceHealth: DataFrame,
      businessSummary: DataFrame, root: String): Unit = {
    dailyEnergy.write.mode("overwrite")
      .parquet(s"$root/gold/daily_energy_consumption")
    deviceHealth.write.mode("overwrite")
      .parquet(s"$root/gold/device_health_metrics")
    businessSummary.write
      .partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(s"$root/gold/daily_business_summary")
  }

  /** S5-analog Bronze scan: event-date partition pruning via
    * predicate (replaces the reference's hand-built YYYY/MM/DD paths
    * + mtime windows; incremental tailing belongs to the streaming
    * ingest, graft.streaming). */
  def readBronze(spark: SparkSession, root: String, hoursBack: Int = 24,
      cfg: EtlConfig = EtlConfig()): DataFrame = {
    val cutoff: Instant = cfg.now.minusSeconds(hoursBack * 3600L)
    spark.read.schema(Schemas.bronzeTelemetry.add("date", "date"))
      .option("ignoreCorruptFiles", "true") // S6 corrupt-file skip
      .parquet(s"$root/bronze/telemetry")
      .filter(col("date") >= lit(java.sql.Date.valueOf(
        cutoff.atZone(java.time.ZoneOffset.UTC).toLocalDate)))
      .filter(try_to_timestamp(col("timestamp")) >=
        lit(java.sql.Timestamp.from(cutoff)))
  }

  /** S3: device-catalog CSV scan with the declared schema
    * (bronze_to_silver.py:29-36; header CSV, 10 rows). DATE-typed
    * installation_date is what makes the age computation work where
    * the reference's string-vs-tz subtraction silently failed. */
  def readDeviceCatalog(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.deviceCatalog)
      .csv(path)

  /** Billing CSV (config/billing_data.csv shape, SURVEY J3). */
  def readBillingData(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.billingData)
      .csv(path)

  /** Small-file compaction for a date-partitioned table: rewrite each
    * partition's many small files (the natural residue of frequent
    * micro-batch ingest) into ~`targetBytes`-sized ones. Sizing comes
    * from the actual on-disk bytes per partition, not a row-count
    * guess, so compaction stays correct as row width drifts. The
    * rewrite reuses dynamic partition overwrite — same idempotence
    * contract as the sinks: interrupting and rerunning converges.
    *
    * 100 TB shape: each date partition is compacted independently
    * (repartition keyed by the partition column + a PER-PARTITION
    * salt sized to that partition's own target file count), so the
    * shuffle moves each partition's bytes once and partitions compact
    * in parallel; untouched partitions are never rewritten. The null
    * partition (`__HIVE_DEFAULT_PARTITION__` — audit-only rows, see
    * writeBronze) is deliberately left alone: it is excluded from
    * both the rewrite and the row-size estimate.
    *
    * CONCURRENCY CONTRACT: a partition being rewritten must have no
    * concurrent writer — files appended between the listing/read and
    * the dynamic-overwrite commit would be silently dropped. Under
    * micro-batch ingest only the newest (hot) date partition is
    * actively written, so `skipHotPartitions = 1` (what EtlRunner
    * passes) excludes the lexicographically greatest partition value
    * — for zero-padded dates that IS the newest — and yesterday's
    * partitions, which the ingest never touches again, compact
    * safely. Cold tables can keep the 0 default. */
  def compact(spark: SparkSession, dir: String, partitionCol: String = "date",
      targetBytes: Long = 128L * 1024 * 1024,
      skipHotPartitions: Int = 0): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return
    // per-partition (bytes, fileCount) from the directory listing.
    // Everything downstream keys on the RAW directory segment (via
    // input_file_name), never on a cast-to-string of the partition
    // column — the two can disagree (Hive %xx escaping, zero-padded
    // numerics rendered back as "7" for dir "07"), and matching the
    // path bytes against themselves is exact by construction.
    val parts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { s =>
        val files = fs.listStatus(s.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        val value = s.getPath.getName.split("=", 2)(1)
        (value, files.map(_.getLen).sum, files.length)
      }
      // the null partition holds audit-only rows (see writeBronze);
      // never rewritten
      .filter(_._1 != "__HIVE_DEFAULT_PARTITION__")
      // hot-partition exclusion (see concurrency contract above):
      // drop the N greatest partition values from consideration
      .sortBy(_._1)
      .dropRight(skipHotPartitions)
    val toCompact = parts.collect {
      // worth rewriting only when it shrinks the file count
      case (value, bytes, nFiles)
          if nFiles > math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt) =>
        value -> math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
    }.toMap
    if (toCompact.isEmpty) return
    // Read each selected partition DIRECTORY by path: pruning is by
    // construction (untouched partitions are never opened — no
    // predicate has to survive pushdown), no string-matching of
    // partition values anywhere (cast-to-string renderings, Hive %xx
    // escaping, and input_file_name's URL-encoding all disagree with
    // the raw listing in corner cases), and the per-partition salt
    // modulus rides along as a literal column.
    //
    // The reads use an EXPLICIT schema: the table's merged data
    // schema (one root schema resolution, so an additively-evolved
    // table keeps its newer columns — older rows null-fill via
    // unionByName) plus the partition column AS STRING. String is
    // deliberate: per-directory type INFERENCE can render a value
    // differently than its directory name (date=01 inferred as int 1
    // would be rewritten into a NEW date=1 directory, duplicating the
    // rows), while string parsing round-trips the directory name
    // byte-for-byte through the dynamic-overwrite write.
    val dataSchema = org.apache.spark.sql.types.StructType(
      spark.read.option("mergeSchema", "true").parquet(dir)
        .schema.filterNot(_.name == partitionCol))
    val readSchema = dataSchema.add(partitionCol,
      org.apache.spark.sql.types.StringType)
    val frames = toCompact.toSeq.map { case (value, nf) =>
      spark.read
        .schema(readSchema)
        .option("basePath", dir)
        .parquet(s"$dir/$partitionCol=$value")
        .withColumn("__nf", lit(nf))
    }
    val unioned = frames.reduce((a, b) =>
      a.unionByName(b, allowMissingColumns = true))
    // Sizing is row-count-based PER PARTITION: each partition's salt
    // spreads its rows over its own target file count (a global salt
    // would shred small partitions and break rerun convergence).
    // maxRecordsPerFile is a coarse backstop only — the max of the
    // per-partition rows-per-file bounds (+5% so a group sized exactly
    // at the bound yields ONE file, not a file plus a 1-row residue).
    val bounds = unioned.groupBy(col(partitionCol), col("__nf"))
      .agg(count(lit(1)).as("n"))
      .select(col("__nf"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (bounds.isEmpty) return
    val maxRecords = math.max(1L, bounds.map { case (nf, n) =>
      (n + nf - 1) / nf
    }.max * 21 / 20)
    // EXPLICIT shuffle partition count (2× the total target files):
    // a user-specified repartition count is exempt from AQE partition
    // coalescing, so distinct (partition, salt) groups stay in
    // distinct tasks except for hash collisions — a collision merges
    // two salt groups into one file of ~2× the target, bounded and
    // rare, where AQE coalescing could merge ALL of them.
    val shuffleN = math.max(1, (toCompact.values.sum * 2).toInt)
    // DETERMINISTIC salt: hash of the data columns, not
    // monotonically_increasing_id() — the id is assigned per task
    // attempt, so a speculative/retried map task would redistribute
    // rows across salt groups mid-write (file sizes skew on retry and
    // reruns don't converge byte-identically). A content hash gives
    // the same spread, survives retries, and makes compaction a pure
    // function of the input rows. Duplicate rows co-locate, but
    // maxRecordsPerFile still bounds any one file.
    val saltCols = dataSchema.map(f => col(f.name))
    unioned
      .repartition(shuffleN, col(partitionCol),
        pmod(xxhash64(saltCols: _*), col("__nf")))
      .drop("__nf")
      .write
      .partitionBy(partitionCol)
      .option("maxRecordsPerFile", maxRecords)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dir)
  }

  /** Range-clustered write: repartitionByRange + sortWithinPartitions
    * on the cluster key gives every output file a DISJOINT key range,
    * so parquet row-group/file min-max statistics prune reads for any
    * range or point predicate on that key — the poor-man's
    * Z-ordering for the single-key case, at zero read-path cost.
    * Range boundaries come from Spark's reservoir sample of the key
    * distribution, so files are near-equal-sized even under skew. */
  def clusteredWrite(df: DataFrame, dir: String, clusterCol: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(dir)

  /** Z-order clustered write: range-cluster on the MORTON interleave
    * of two keys instead of one key, so every file bounds BOTH
    * dimensions — 2-D range/point predicates prune files where a
    * lexicographic sort only prunes the leading key (the trailing key
    * spans its full range in every file).
    *
    * Both keys are min-max normalized to 16 bits BEFORE interleaving
    * (one tiny stats pass): raw interleaving only helps when the two
    * domains have comparable bit widths — with an 11-bit key against
    * an 8-bit key, every high interleaved bit belongs to the wide key
    * and the split degenerates to a 1-D sort. Normalization gives
    * both dims equal weight at every split granularity (the same move
    * production Z-order implementations make by interleaving
    * range-bucket ids). The interleave itself is the native codegen'd
    * `LayoutExpressions.morton`. */
  def zorderWrite(df: DataFrame, dir: String, colA: String, colB: String,
      nFiles: Int): Unit = {
    // numeric or timestamp keys only — anything else has no defined
    // min-max normalization here (cast a date to timestamp first)
    Seq(colA, colB).foreach { c =>
      val t = df.schema(c).dataType
      require(t.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        t == org.apache.spark.sql.types.TimestampType,
        s"zorderWrite key '$c' must be numeric or timestamp, got ${t.sql}")
    }
    val r = df.agg(min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    // a key with no non-null values has no min-max domain: degrade
    // gracefully instead of NPE-ing on getDouble — both keys absent
    // (or empty input) → plain write; one absent → 1-D clustering on
    // the surviving key, which is the best layout available
    (r.isNullAt(0), r.isNullAt(2)) match {
      case (true, true) =>
        df.write.mode("overwrite").parquet(dir)
        return
      case (true, false) =>
        clusteredWrite(df, dir, colB, nFiles)
        return
      case (false, true) =>
        clusteredWrite(df, dir, colA, nFiles)
        return
      case _ => ()
    }
    def lv(i: Int): Double = r.getDouble(i)
    def norm(c: String, lo: Double, hi: Double) =
      if (hi > lo)
        ((col(c).cast("double") - lo) / (hi - lo) * 65535.0).cast("long")
      else lit(0L)
    df.withColumn("__z", graft.functions.LayoutExpressions.morton(
        norm(colA, lv(0), lv(1)), norm(colB, lv(2), lv(3))))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Bucketed fact layout — the exchange-elimination lever for
    * REPEATED fact-to-fact joins (q191's header/detail
    * reconciliation, any lineitem⋈orders): both tables are written
    * bucketBy+sortBy on the join key into the session catalog, so
    * every equi-join AND key-grouped aggregate on orderkey plans with
    * zero shuffle exchanges (BucketingSpec locks the physics; its
    * q191-twin test locks this API end to end). Bucket counts MUST
    * match across the pair or Spark re-shuffles one side. At 100 TB
    * the write pays its shuffle ONCE and every downstream join reads
    * the layout back for free; `buckets` sizes per-bucket files to
    * executor memory (32 suits the local SFs — a cluster deployment
    * scales it with data volume, not executor count). */
  def writeBucketedFacts(spark: SparkSession, sfDir: String,
      buckets: Int = 32,
      liTable: String = "lineitem_bucketed",
      oTable: String = "orders_bucketed"): Unit = {
    graft.Tables.lineitem(spark, sfDir).write
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(liTable)
    graft.Tables.orders(spark, sfDir).write
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(oTable)
  }

  /** The bucketed pair written by [[writeBucketedFacts]], as
    * (lineitem, orders). */
  def readBucketedFacts(spark: SparkSession,
      liTable: String = "lineitem_bucketed",
      oTable: String = "orders_bucketed"): (DataFrame, DataFrame) =
    (spark.table(liTable), spark.table(oTable))

  /** S4-as-batch: Bronze sink partitioned by event date. */
  def writeBronze(bronze: DataFrame, root: String): Unit =
    bronze
      // try_: raw bronze may carry unparseable timestamps; they land in
      // the null date partition, which readBronze's date >= cutoff
      // predicate excludes — such rows are retained for audit but never
      // reach Silver (they would fail timestamp validation regardless)
      .withColumn("date", to_date(try_to_timestamp(col("timestamp"))))
      .repartition(col("date"))
      .write
      .partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(s"$root/bronze/telemetry")
}
