package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The curation pipeline as a library call and CLI: the operators the
  * query surface verifies one-by-one (exact dedup q31, language ID q37,
  * quality score q38, token counting q39/q55, token-budget sharding q66),
  * composed into the run a 100 TB corpus actually goes through —
  * filter → dedup → shard → write. Each stage reuses the exact formula of
  * its oracle-checked query, so the pipeline's semantics are pinned by the
  * same DuckDB gate that pins the queries.
  *
  * Output layout: parquet partitioned by `shard_id` — each shard holds
  * ~`budget` tokens of deduplicated survivors in deterministic md5 order,
  * ready to feed a tokenizer fleet shard-by-shard.
  */
object Curate {

  final case class Summary(docsIn: Long, docsKept: Long,
      shards: Long, tokens: Long)

  /** lang filter → quality threshold → exact-dedup keeper →
    * token-budget shard assignment. Returns the sharded survivors
    * (doc_id, text, lang, source, n_tokens, shard_id). */
  def curate(docs: DataFrame, lang: String = "en",
      minQuality: Double = 0.3, budget: Long = Sharding.ShardBudget)
      : DataFrame = {
    // every text-derived flag is computed map-side, then the text is
    // DROPPED before the keeper window: the dedup exchange partitions on
    // the 32-byte md5(text) key and ships scalar flags only (q31's
    // shuffle discipline — document bodies move exactly once, in the
    // final survivors join below, which the shard write needs anyway)
    val flags = docs
      .withColumn("n_words", size(split(col("text"), " +")))
      // q38's quality formula (length + stopword-ratio halves)
      .withColumn("n_stop", size(regexp_extract_all(lower(col("text")),
        lit("\\b(the|and|of|to|in|is|a)\\b"), lit(0))))
      .withColumn("quality_score",
        least(col("n_words") * lit(1.0), lit(100.0)) / 100.0 * 0.5 +
          col("n_stop") * lit(1.0) / col("n_words") * 0.5)
      .withColumn("n_tokens", size(split(lower(col("text")), " +")))
      .select(col("doc_id"), col("lang"), col("quality_score"),
        col("n_tokens"), md5(col("text")).as("tkey"))
    // q31's keeper rule: min doc_id per identical text, keyed by md5
    val kept = flags
      .withColumn("keeper",
        col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("tkey"))))
      .filter(col("lang") === lang && col("quality_score") >= minQuality &&
        col("keeper"))
      .withColumn("k",
        md5(concat(lit("shard:"), col("doc_id").cast("string"))))
    Sharding.assignShards(kept, budget, 32)
      .join(docs.select(col("doc_id"), col("text"), col("lang"),
        col("source")), "doc_id")
  }

  /** Runs the pipeline and writes `outDir` partitioned by shard. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      budget: Long): Summary = {
    val docs = Tables.load(spark, sfDir, "documents")
    val sharded = curate(docs, budget = budget)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sharded.write.mode(SaveMode.Overwrite)
      .partitionBy("shard_id").parquet(outDir)
    val row = sharded.agg(count(lit(1)), countDistinct(col("shard_id")),
      sum(col("n_tokens"))).head()
    val out = Summary(docs.count(), row.getLong(0), row.getLong(1),
      row.getLong(2))
    sharded.unpersist()
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_curated")
    val budget = args.lift(2).map(_.toLong).getOrElse(Sharding.ShardBudget)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, sfDir, outDir, budget)
    println(s"""{"docs_in":${s.docsIn},"docs_kept":${s.docsKept},""" +
      s""""shards":${s.shards},"tokens":${s.tokens},"out":"$outDir"}""")
    spark.stop()
  }
}
