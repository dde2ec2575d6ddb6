package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The queries are organized by capability area under [[graft.ops]]; each
  * area contributes a map of named [[QueryDef]]s (Spark builder + optional
  * DuckDB oracle SQL). This object just concatenates them.
  */
object SparkEntry {

  private def groups: Seq[Map[String, QueryDef]] = Seq(
    ops.Relational.defs,
    ops.Functions.defs,
    ops.Temporal.defs,
    ops.PorterQueries.defs,
    ops.TextOps.defs,
    ops.Sharding.defs,
    ops.Skew.defs,
    ops.Dedup.defs,
    ops.Similarity.defs,
    ops.Multimodal.defs,
    ops.Clustering.defs,
    ops.CorpusStats.defs,
    ops.Scrub.defs,
    ops.WebPrep.defs,
    ops.Snapshot.defs,
  )

  private lazy val all: Map[String, QueryDef] = {
    val merged = groups.flatten.toMap
    val dup = groups.map(_.size).sum - merged.size
    require(dup == 0, s"$dup duplicate query names across groups")
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_pricing_summary").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) => name -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }
}
