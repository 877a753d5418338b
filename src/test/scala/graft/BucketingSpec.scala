package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-shuffling both fact tables into the
  * same bucket layout on the join key removes the per-query exchange
  * entirely — the 100 TB lever for repeated fact-fact joins
  * (lineitem ⋈ orders on every analytical query).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // warehouse.dir is a static conf — tables land in the session's
    // default warehouse and are dropped (and the dir removed) below
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")

    Tables.lineitem(spark, sf("sf0.001"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf("sf0.001"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    // disable broadcast so the join must pick a shuffle-free
    // sort-merge over the co-bucketed layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // join itself needs no Exchange: buckets align
      val joinSection = plan.substring(0, plan.indexOf("HashAggregate"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        plan)
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        plan)
      // and the result matches the unbucketed join
      val expect = Tables.lineitem(spark, sf("sf0.001"))
        .join(Tables.orders(spark, sf("sf0.001")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expect).count() == 0 &&
        expect.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      val wh = new java.io.File("spark-warehouse")
      if (wh.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(wh)
      }
    }
  }
}
