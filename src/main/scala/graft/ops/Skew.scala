package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val smallS = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, keys :+ "_salt").drop("_salt")
  }
}
