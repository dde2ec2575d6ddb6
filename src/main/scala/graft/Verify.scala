package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: substring filter over query names — the local
    // single-query iteration loop (the driver always passes two args)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(name.contains) }
      .foreach { case (name, fn) =>
      // several operators persist() intermediates consumed only within
      // their own query; clear between queries so 70+ queries in one
      // session don't compete for executor storage (the same hygiene
      // Bench applies between timed runs)
      spark.catalog.clearCache()
      ops.TransientCache.drainAll()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    spark.catalog.clearCache()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // q52's approx-quantile hash gate is exact only while every
    // (returnflag, linestatus) group fits the sketch's exactness window
    // (ops/Relational.ApproxQuantileAccuracy); above it the operator's
    // designed ε-rank answers would flip the hash compare, so the
    // oracle entry is withheld and the driver records the rows-only
    // check — the documented bench-only demotion, decided from the
    // actual data rather than an SF heuristic.
    val q52Open =
      try ops.Relational.q52WindowOpen(spark, sfDir)
      catch { case _: Exception => true }
    if (!q52Open) System.err.println(
      "[verify] q52 exactness window closed at this SF — demoted to rows-only")
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(k.contains) }
      .filter { case (k, _) => q52Open || k != "q52_approx_quantiles" }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
