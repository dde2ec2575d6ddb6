package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{QueryDef, Tables}

/** Token-budget contiguous sharding: order the corpus by a deterministic
  * shuffle key and cut it into shards of ~`budget` tokens each — the step
  * that turns a curated corpus into equal-sized training shards, with the
  * md5 key doubling as the global deterministic shuffle every training run
  * needs (no rand(), so the layout is reproducible).
  *
  * The natural spelling — `sum(tokens) OVER (ORDER BY k)` — is a global
  * window: Spark plans it as ONE partition holding the whole corpus, the
  * same single-reducer trap as the built-in exact percentile (DESIGN.md).
  * Instead the running total is two passes over a range-partitioned sort
  * (Spark's ordinary parallel sort):
  *
  *   pass 1 — per-partition token sums; the driver folds them into
  *            per-partition starting offsets (bounded state: one long per
  *            partition, the `_num` / Percentiles pattern);
  *   pass 2 — each partition streams its sorted rows once, adding its
  *            broadcast offset; `shard = cum_before / budget`.
  *
  * Shard boundaries depend only on the total order of `k`, not on where
  * the range partitioner happened to cut, so the result is deterministic
  * across partitionings and cluster layouts.
  */
object Sharding {

  /** Tokens per shard. Sized so even sf0.001 fills at least one shard;
    * a production corpus would use ~100M-token shards. */
  val ShardBudget = 4096L

  /** (doc_id, n_tokens, shard_id) for a frame with columns
    * `k` (unique sort key), `doc_id`, `n_tokens`. */
  def assignShards(docs: DataFrame, budget: Long, parts: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs
      .select(col("k").cast("string"), col("doc_id").cast("long"),
        col("n_tokens").cast("long"))
      .as[(String, Long, Long)]
      .repartitionByRange(parts, col("k"))
      .sortWithinPartitions(col("k"))
      // Both passes MUST see identical partitions: repartitionByRange
      // samples its boundaries at execution time, so a partition lost
      // between pass 1 and pass 2 could recompute under different cuts
      // and shift rows against the collected offsets. MEMORY_AND_DISK
      // spills instead of evicting, which closes that window locally; on
      // a real cluster use replicated persist or a checkpoint so an
      // executor loss cannot force a recompute (same caveat as q54's
      // localCheckpoint, DESIGN.md).
      .persist(StorageLevel.MEMORY_AND_DISK)
    val perPartition = sorted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L; it.foreach(s += _._3); Iterator((pid, s))
      }
      .collect().sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      perPartition.map { case (pid, s) =>
        val o = acc; acc += s; (pid, o)
      }.toMap
    }
    val bOff = spark.sparkContext.broadcast(offsets)
    sorted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var cum = bOff.value(pid)
        it.map { case (_, id, t) =>
          val before = cum; cum += t; (id, t, before / budget)
        }
      }
      .toDF("doc_id", "n_tokens", "shard_id")
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- per-shard manifest: contiguous md5-ordered shards of
    //      ~ShardBudget tokens. Every shard except the last lands within
    //      one document of the budget by construction. ----
    "q66_token_sharding" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("k",
            md5(concat(lit("shard:"), col("doc_id").cast("string"))))
          .withColumn("n_tokens", size(split(lower(col("text")), " +")))
        assignShards(docs, ShardBudget, 32)
          .groupBy(col("shard_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
          .orderBy(col("shard_id"))
      },
      Some(s"""WITH t AS (
               SELECT md5('shard:' || CAST(doc_id AS VARCHAR)) AS k,
                 len(string_split_regex(lower(text), ' +')) AS n_tokens
               FROM documents),
             c AS (
               SELECT k, n_tokens,
                 COALESCE(CAST(sum(n_tokens) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS cum_before
               FROM t)
             SELECT CAST(cum_before // $ShardBudget AS BIGINT) AS shard_id,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
             FROM c
             GROUP BY shard_id
             ORDER BY shard_id""")),
  )
}
