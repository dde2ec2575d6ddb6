package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named capability of the engine, exposed through [[SparkEntry]].
  *
  * @param build  builds the DataFrame over the parquet tables in `dir`
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables;
  *               None where DuckDB cannot express the semantics (the
  *               driver then records a weaker rows-only check)
  *
  * Contract notes (see the driver docs in SparkEntry):
  *   - column names must match between Spark output and oracle SQL;
  *   - every query ends with a deterministic ORDER BY so both engines
  *     produce identical row streams;
  *   - floating aggregates are rounded at a precision where the true value
  *     sits exactly on the decimal grid, so IEEE summation-order noise
  *     cannot flip the rounded result.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** All driver-provided tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as a
    * raw long via the legacy conf and floor-divide to microseconds —
    * exactly the truncation DuckDB applies when casting its TIMESTAMP_NS
    * to TIMESTAMP, so both engines see identical µs values. Oracle SQL
    * referencing `ts` must wrap it in CAST(ts AS TIMESTAMP) for the same
    * reason. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }
}
