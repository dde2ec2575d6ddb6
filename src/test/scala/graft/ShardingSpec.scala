package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sharding

/** Token-budget sharding: the two-pass running total must produce the
  * same shard for every document regardless of how many range partitions
  * the corpus is cut into, and every shard except the last must cross its
  * budget with its final document (contiguity + fullness). */
class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    // 200 docs, token counts 1..200, deterministic md5 order key
    spark.range(1, 201).toDF("doc_id")
      .withColumn("k", md5(concat(lit("t:"), col("doc_id").cast("string"))))
      .withColumn("n_tokens", (col("doc_id") % 37 + 3).cast("long"))
  }

  test("shard assignment is identical across partition counts") {
    def assignment(parts: Int): Map[Long, Long] =
      Sharding.assignShards(corpus, 100L, parts)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val one = assignment(1)
    assert(assignment(3) == one)
    assert(assignment(32) == one)
    assert(one.size == 200)
  }

  test("shards are contiguous in key order and full to the budget") {
    val budget = 100L
    val rows = Sharding.assignShards(corpus, budget, 8)
      .join(corpus.select(col("doc_id"), col("k")), "doc_id")
      .orderBy(col("k"))
      .collect()
      .map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("shard_id")))
    // shard ids never decrease along the key order
    val ids = rows.map(_._2)
    assert(ids.zip(ids.tail).forall { case (a, b) => a <= b })
    // each shard's tokens-before-last < budget, and the shard only ends
    // once the running total crosses its boundary
    var cum = 0L
    rows.foreach { case (t, shard) =>
      assert(cum / budget == shard, s"doc at cum=$cum expected shard ${cum / budget}, got $shard")
      cum += t
    }
  }
}
