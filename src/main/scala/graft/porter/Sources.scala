package graft.porter

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Where collections come from — the seam the reference hides inside its
  * lazy `MongoClient` + `selectDB` (`/root/reference/src/Porter.php:
  * 490-496`). Implementations produce one DataFrame per collection; the
  * Porter pipeline is source-agnostic from there.
  */
trait Source {
  /** (collectionName, DataFrame) pairs, sorted by collection name. */
  def collections(spark: SparkSession): Seq[(String, DataFrame)]
}

/** Offline stand-in source: a directory holding one JSONL/JSON/parquet
  * file per collection (what the sandbox tests feed the pipeline). */
final class FileSource(srcDir: String) extends Source {
  override def collections(spark: SparkSession): Seq[(String, DataFrame)] =
    Files.list(Paths.get(srcDir)).iterator().asScala
      .map(_.toFile)
      .filter(f => f.getName.endsWith(".jsonl") || f.getName.endsWith(".json")
        || f.getName.endsWith(".parquet"))
      .toSeq.sortBy(_.getName)
      .map { f =>
        val name = f.getName.replaceAll("\\.(jsonl|json|parquet)$", "")
        val df =
          if (f.getName.endsWith(".parquet")) spark.read.parquet(f.getPath)
          else spark.read.json(f.getPath)
        name -> df
      }
}

/** Live MongoDB source through the public MongoDB Spark connector
  * (`spark.read.format("mongodb")`). Collection names are passed in
  * explicitly: the connector reads one collection per load and does not
  * enumerate a database, so listing (the reference's `listCollections`,
  * Porter.php:498-503) belongs to the deployment — a tiny driver-side
  * client call or a static config. The connector jar is not present in
  * this sandbox, so `load()` cannot execute here; the seam, its option
  * wiring and CLI dispatch are what the tests pin.
  */
final class MongoSource(
    uri: String,
    database: String,
    collectionNames: Seq[String]) extends Source {

  /** Exposed for tests: the reader options one collection maps to. */
  def readOptions(collection: String): Map[String, String] = Map(
    "connection.uri" -> uri,
    "database"       -> database,
    "collection"     -> collection)

  override def collections(spark: SparkSession): Seq[(String, DataFrame)] =
    collectionNames.sorted.map { c =>
      c -> spark.read.format("mongodb").options(readOptions(c)).load()
    }
}
