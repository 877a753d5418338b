package graft.streaming

import graft.SparkSpec
import graft.etl.{EtlConfig, Fixtures, Lake}
import org.apache.spark.sql.functions._

class SilverRefinerySpec extends SparkSpec {

  test("file-source stream refines new bronze into silver exactly once") {
    val lake = java.nio.file.Files.createTempDirectory("graft-refinery").toString
    val cfg = EtlConfig(
      referenceInstant = Some(Fixtures.DefaultStart.plusSeconds(2 * 3600)))
    val catalog = Fixtures.deviceCatalog(spark, 4)

    Lake.writeBronze(
      Fixtures.bronzeTelemetry(spark, nDevices = 4, rowsPerDevice = 80), lake)
    SilverRefinery.runOnce(spark, lake, catalog, cfg)

    val silver = Lake.readSilver(spark, lake, daysBack = 7, cfg)
    assert(silver.count() == 4 * 80)
    assert(silver.columns.contains("temp_1h_avg"))
    assert(silver.filter(col("quality_score").isNull).count() == 0)

    // drain again with the same checkpoint: no new input ⇒ no dup rows
    SilverRefinery.runOnce(spark, lake, catalog, cfg)
    assert(Lake.readSilver(spark, lake, daysBack = 7, cfg).count() == 4 * 80)
  }
}
