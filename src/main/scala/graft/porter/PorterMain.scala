package graft.porter

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's `bin/mongo2mysql` +
  * `src/cli.php` surface: export every collection from a [[Source]] (a
  * directory of JSONL/parquet stand-ins, or live MongoDB via
  * `--mongo-uri`) into a destination (parquet directory, or JDBC when a
  * `--jdbc` URL is given).
  *
  * Usage:
  *   graft.PorterMain <srcDir> <destDir> [--skip t1,t2] [--limit N]
  *                    [--dataonly] [--jdbc url]
  *                    [--mongo-uri uri] [--mongo-db db] [--collections c1,c2]
  *
  * Options map 1:1 to the reference CLI (`/root/reference/src/cli.php:
  * 15-26`): `--skip` (csv of destination tables), `--limit` (rows per
  * collection), `--dataonly` (no DDL; truncate-once; skip missing).
  * `--mongo-uri` switches the source to the MongoDB Spark connector
  * (the reference's MongoClient, Porter.php:490-496); `<srcDir>` is then
  * ignored, `--mongo-db` names the database and `--collections` the
  * collections to export.
  */
object PorterMain {

  private val valueOpts =
    Set("--skip", "--limit", "--jdbc", "--mongo-uri", "--mongo-db", "--collections")

  /** Source selection from CLI options (exposed for the dispatch test):
    * `--mongo-uri` wins over the file-directory stand-in. */
  def selectSource(srcDir: String, opt: String => Option[String]): Source =
    opt("mongo-uri") match {
      case Some(uri) =>
        new MongoSource(uri,
          opt("mongo-db").getOrElse("test"),
          opt("collections").map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty))
      case None => new FileSource(srcDir)
    }

  def main(args: Array[String]): Unit = {
    val positional = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < args.length) {
        if (valueOpts.contains(args(i))) i += 2      // option + its value
        else if (args(i).startsWith("--")) i += 1    // bare flag
        else { out += args(i); i += 1 }
      }
      out.result()
    }
    require(positional.length == 2,
      "usage: PorterMain <srcDir> <destDir> [--skip t1,t2] [--limit N] [--dataonly] " +
        "[--jdbc url] [--mongo-uri uri] [--mongo-db db] [--collections c1,c2]")
    val Seq(srcDir, destDir) = positional
    def opt(name: String): Option[String] = {
      val i = args.indexOf(s"--$name")
      if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }
    val config = PorterConfig(
      skip = opt("skip").map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty),
      limit = opt("limit").map(_.toInt),
      dataOnly = args.contains("--dataonly"))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sink: Sink = opt("jdbc") match {
      case Some(url) => new JdbcReplaceSink(url, new java.util.Properties)
      case None      => new ParquetSink(destDir)
    }

    val porter = new Porter(spark, sink, config)
    val counts = porter.exportCollections(
      selectSource(srcDir, opt).collections(spark))
    counts.toSeq.sortBy(_._1).foreach { case (t, n) =>
      println(s"[porter] $t: $n rows")
    }
    println(s"[porter] Done. ${counts.size} tables, ${counts.values.sum} rows.")
    spark.stop()
  }
}
