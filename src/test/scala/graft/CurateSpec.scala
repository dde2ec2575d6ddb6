package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curate

/** End-to-end curation pipeline: filters compose exactly like their
  * standalone queries, shards land on disk partitioned and within
  * budget, and the whole run is deterministic. */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("curate composes dedup+filters and writes budget-bounded shards") {
    val out = TestDirs.scratch("graft_curate")
    val s = Curate.run(spark, sf, out, budget = 512L)
    assert(s.docsIn > 0 && s.docsKept > 0 && s.docsKept <= s.docsIn)
    assert(s.shards >= 1)

    val back = spark.read.parquet(out)
    assert(back.count() == s.docsKept)
    // no duplicate texts survive
    assert(back.groupBy("text").count().filter(col("count") > 1).isEmpty)
    // every doc is English (the pipeline's lang filter)
    assert(back.filter(col("lang") =!= "en").isEmpty)
    // each shard is within one document of the budget: tokens before the
    // last doc stay under it (contiguity is ShardingSpec's job)
    val over = back.groupBy("shard_id")
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
      .filter(col("t") - col("m") >= lit(512L))
    assert(over.isEmpty, "a shard exceeded its budget before its last doc")

    // determinism: a second run yields the identical assignment
    val out2 = TestDirs.scratch("graft_curate2")
    Curate.run(spark, sf, out2, budget = 512L)
    // shard_id comes back as a partition directory column (type inferred
    // as int) — normalize to long before comparing
    val a = back.select(col("doc_id"), col("shard_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = spark.read.parquet(out2)
      .select(col("doc_id"), col("shard_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
