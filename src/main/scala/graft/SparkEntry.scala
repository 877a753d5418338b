package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's public query inventory: one entry per
  * operator from SURVEY.md §2 (relational parity surface) plus the
  * LLM-data-pipeline extensions (dedup / similarity / text analysis /
  * multimodal). `oracleSql` carries the DuckDB-equivalent SQL for
  * every SQL-expressible query; the rest get rows-only checks.
  */
object SparkEntry {

  /** All query groups. Name collisions are a bug — each group owns a
    * distinct q-number range / prefix. Exposed so the collision spec
    * sums the SAME list the merge uses (a new group can't silently
    * desync the expected count). */
  private[graft] lazy val groups: Seq[Map[String, QueryDef]] = Seq(
    operators.Relational.all,
    operators.Relational2.all,
    operators.Relational3.all,
    operators.Relational4.all,
    operators.TextOps.all,
    operators.DedupOps.all,
    operators.SimilarityOps.all,
    operators.RankingOps.all,
    operators.CurationOps.all,
    operators.ClusteringOps.all,
    operators.GraphOps.all,
    operators.ChangeOps.all,
    operators.AnalyticsOps.all,
    operators.AnalyticsOps2.all,
    operators.AnalyticsOps3.all,
    operators.AnalyticsOps4.all,
    operators.AnalyticsOps5.all,
    operators.LayoutOps.all,
    operators.AnalyticsOps6.all,
    operators.AnalyticsOps7.all,
    operators.AnalyticsOps8.all,
    operators.AnalyticsOps9.all,
    operators.AnalyticsOps10.all,
    operators.AnalyticsOps11.all,
    operators.AnalyticsOps12.all,
    operators.AnalyticsOps13.all,
    operators.AnalyticsOps14.all,
    operators.AnalyticsOps15.all,
    operators.AnalyticsOps16.all,
    operators.AnalyticsOps17.all,
    operators.AnalyticsOps18.all,
    operators.AnalyticsOps19.all,
    operators.AnalyticsOps20.all,
    operators.AnalyticsOps21.all,
    operators.AnalyticsOps22.all,
    operators.AnalyticsOps23.all,
    operators.AnalyticsOps24.all,
    operators.EvalOps.all,
    operators.SmartHomeOps.all)

  private lazy val defs: Map[String, QueryDef] =
    groups.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1AggRollup.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (name, qd) => name -> qd.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }
}
