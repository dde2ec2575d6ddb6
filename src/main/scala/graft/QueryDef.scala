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

  /** `events.ts` has shipped under two physical parquet types across
    * testdata generations, so the loader adapts to what is on disk:
    *
    *   - TIMESTAMP(NANOS): Spark's reader rejects it outright
    *     ([PARQUET_TYPE_ILLEGAL]); we read nanos as a raw long via the
    *     legacy conf and floor-divide to microseconds — exactly the
    *     truncation DuckDB applies when casting TIMESTAMP_NS to
    *     TIMESTAMP, so both engines see identical µs values.
    *   - TIMESTAMP(MICROS) (current generation): arrives as
    *     TIMESTAMP_NTZ; cast to the session-TZ (UTC) TimestampType so
    *     every downstream window/date function sees the same type and
    *     values as before.
    *
    * Oracle SQL referencing `ts` wraps it in CAST(ts AS TIMESTAMP) —
    * the ns→µs truncation under the old generation, a no-op under the
    * new one. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)")
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }
}
