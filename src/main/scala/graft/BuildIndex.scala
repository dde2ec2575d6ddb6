package graft

import org.apache.spark.sql.SparkSession

/** Build-once CLI for the persisted IVF ANN index (q97's serve path):
  * `runMain graft.BuildIndex <sfDir> <indexDir>` writes
  * `<indexDir>/centroids.parquet` and the cell-partitioned
  * `<indexDir>/cells.parquet`. Queries then point
  * `spark.graft.ivfIndexDir` at the same directory (or rely on q97's
  * deterministic temp-dir cache). Separating build from serve is the
  * standard ANN service shape — the index is computed once per corpus
  * snapshot and read by every query after.
  */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ops.Similarity.writeIvfIndex(Tables.load(spark, sfDir, "embeddings"),
      outDir, Some(ops.Similarity.corpusFingerprint(spark, sfDir)))
    println(s"[build-index] wrote IVF index to $outDir")
    spark.stop()
  }
}
