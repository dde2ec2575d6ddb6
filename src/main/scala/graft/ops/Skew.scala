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
  )
}
