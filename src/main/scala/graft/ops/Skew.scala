package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Skew mitigation for joins whose key distribution is too hot for AQE's
  * automatic skew-split (or where AQE is unavailable, e.g. inside
  * streaming batches): classic salting.
  *
  * The big (skewed) side gets a uniform salt in `[0, salt)`; the small
  * side is replicated once per salt value; the join key becomes
  * `(keys…, _salt)` so the hot key's rows spread over `salt` reducers.
  * Semantics are exactly the plain inner equi-join — every big-side row
  * meets every matching small-side row exactly once because the small
  * side carries all salt values.
  *
  * At 100 TB this is the fallback lever when one key holds a double-digit
  * percentage of the data; prefer AQE's skew join for moderate skew (it
  * needs no replication) and broadcast when the small side fits.
  */
object Skew {

  /** Deterministic per-row salt: a hash of the row's ENTIRE content, not
    * of `monotonically_increasing_id()` — the monotonic id depends on
    * which partition a row lands in, so a task retry (or a different
    * input split) could re-salt rows and move them between reducers
    * mid-job. A content hash gives every row the same salt on every run
    * and every retry, making partition placement reproducible. Fully
    * identical duplicate rows share a salt and so don't spread — a
    * non-issue for fact rows carrying a unique id, and join SEMANTICS
    * are unaffected either way (the small side carries all salts). */
  def rowSalt(big: DataFrame, salt: Int) =
    pmod(hash(big.columns.map(col): _*), lit(salt))

  /** Skew-spreading inner equi-join: the big side is salted by content
    * hash, the small side replicated across all salt values.
    *
    * LIMITATION (by design of the content hash): fully IDENTICAL
    * duplicate rows all hash to ONE salt and still land on a single
    * reducer — and exact-duplicate records are a common real-world cause
    * of the very skew this lever exists to spread. Fact tables carrying
    * a unique id are immune (the id differentiates the hash). For inputs
    * WITHOUT a unique key, pass `uniquifier` — any deterministic,
    * retry-stable expression that separates physical duplicates (an
    * ingest offset, a file path + row position — NOT
    * `monotonically_increasing_id()`, which moves on retry and would
    * re-introduce the placement instability `rowSalt` exists to avoid).
    * It joins the hash input only; semantics are unchanged. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int = 16,
      uniquifier: Option[Column] = None): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltCol = uniquifier match {
      case Some(u) => pmod(hash(big.columns.map(col) :+ u: _*), lit(salt))
      case None    => rowSalt(big, salt)
    }
    val bigS = big.withColumn("_salt", saltCol)
    val smallS = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, keys :+ "_salt").drop("_salt")
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- the salting path under the oracle gate: per-nation event
    //      rollup through saltedJoin, whose result is defined to equal
    //      the plain inner equi-join — so the oracle IS the plain join.
    //      The fact side spreads each user's rows over 16 reducers; the
    //      150-row dim replicates 16×. (At this key distribution plain
    //      broadcast wins — the query exists to keep the skew lever
    //      correctness-checked, not to claim salting is optimal here.) ----
    "q67_salted_join" -> QueryDef(
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        val users = Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_nationkey"))
        saltedJoin(events, users, Seq("user_id"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("value_sum"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey, count(*) AS n_events,
               round(sum(value), 2) AS value_sum
             FROM events e JOIN customer c ON e.user_id = c.c_custkey
             GROUP BY c_nationkey
             ORDER BY c_nationkey""")),

    // ---- JOIN-KEY SKEW AUDIT: the pre-flight a 100 TB join runs
    //      BEFORE choosing between plain shuffle, AQE skew-split,
    //      broadcast, and the q67 salting lever. For each join key the
    //      suite actually shuffles on (lineitem.l_orderkey,
    //      orders.o_custkey, events.user_id): per-key row counts →
    //      power-of-two group-size histogram with each bucket's share
    //      of keys and of rows in int64 basis points. Heavy skew reads
    //      directly off the tail: a top bucket holding few keys_bp but
    //      large rows_bp is the hot-key signature that sinks a shuffle
    //      join. Scale: per audit TWO map-side-combinable aggregations
    //      (key counts, then the ≤22-bucket rollup) — no sort, no
    //      driver state, no order statistics; the normalizing window
    //      runs on the ≤22-rows-per-audit histogram frame. Exact by
    //      construction (no sampling), the same observability
    //      discipline as q82/q102: measure before committing a plan. ----
    "q200_key_skew_audit" -> QueryDef(
      (s, dir) => {
        def audit(name: String, table: String, key: String): DataFrame =
          Tables.load(s, dir, table)
            .groupBy(col(key)).agg(count(lit(1)).as("c"))
            .withColumn("bucket_lo", expr(GroupBucketCase))
            .groupBy(col("bucket_lo"))
            .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"))
            .withColumn("audit", lit(name))
        audit("events.user_id", "events", "user_id")
          .unionByName(audit("lineitem.l_orderkey", "lineitem",
            "l_orderkey"))
          .unionByName(audit("orders.o_custkey", "orders", "o_custkey"))
          .select(col("audit"), col("bucket_lo"), col("n_keys"),
            col("n_rows"),
            expr("n_keys * 10000L div sum(n_keys) OVER (PARTITION BY audit)")
              .as("keys_bp"),
            expr("n_rows * 10000L div sum(n_rows) OVER (PARTITION BY audit)")
              .as("rows_bp"))
          .orderBy(col("audit"), col("bucket_lo"))
      },
      Some(s"""WITH ks AS (
               SELECT 'events.user_id' AS audit, ${duckBucket("user_id",
                 "events")}
               UNION ALL
               SELECT 'lineitem.l_orderkey', ${duckBucket("l_orderkey",
                 "lineitem")}
               UNION ALL
               SELECT 'orders.o_custkey', ${duckBucket("o_custkey",
                 "orders")}),
             h AS (
               SELECT audit, bucket_lo, CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(c) AS BIGINT) AS n_rows
               FROM ks GROUP BY audit, bucket_lo)
             SELECT audit, bucket_lo, n_keys, n_rows,
               n_keys * 10000
                 // CAST(sum(n_keys) OVER (PARTITION BY audit) AS BIGINT)
                 AS keys_bp,
               n_rows * 10000
                 // CAST(sum(n_rows) OVER (PARTITION BY audit) AS BIGINT)
                 AS rows_bp
             FROM h ORDER BY audit, bucket_lo""")),
  )

  /** Power-of-two bucket floor for per-key group sizes (≥ 1): 1, 2, 4,
    * …, 2^20, else 2^21 — the q126 histogram discipline on the join-key
    * axis. Integer compares only; no float log anywhere. */
  private def GroupBucketCase: String =
    "CASE " + (0 to 20).map(1L << _)
      .map(b => s"WHEN c < ${b * 2}L THEN CAST(${b}L AS BIGINT)")
      .mkString(" ") + s" ELSE CAST(${1L << 21}L AS BIGINT) END"

  /** The per-key count + bucket subquery for one DuckDB audit leg
    * (DuckDB spells int64 literals bare). */
  private def duckBucket(key: String, table: String): String = {
    val kase = "CASE " + (0 to 20).map(1L << _)
      .map(b => s"WHEN c < ${b * 2} THEN CAST($b AS BIGINT)")
      .mkString(" ") + s" ELSE CAST(${1L << 21} AS BIGINT) END"
    s"""$kase AS bucket_lo, c FROM (
       SELECT CAST(count(*) AS BIGINT) AS c FROM $table GROUP BY $key)"""
  }
}
