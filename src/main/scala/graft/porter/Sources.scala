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
  * (`spark.read.format("mongodb")`). Explicit collection names win; when
  * none are given the source enumerates the database itself — the
  * reference's `listCollections` loop (Porter.php:344-349, 498-503) — via
  * a driver-side `listCollectionNames` call. The connector reads one
  * collection per load, so enumeration is a plain Mongo Java-driver call,
  * injectable for tests. Neither the connector nor the Java driver jar is
  * present in this sandbox (zero egress), so `load()` and the default
  * enumerator cannot execute here; the seam, option wiring, enumeration
  * fallback and CLI dispatch are what the tests pin. Deployment is
  * config-only: put `mongo-spark-connector` (which brings
  * `mongodb-driver-sync`) on the Spark classpath — see build.sbt.
  */
final class MongoSource(
    uri: String,
    database: String,
    collectionNames: Seq[String],
    enumerate: MongoSource.Enumerator = MongoSource.driverEnumerator,
    reader: MongoSource.Reader = MongoSource.connectorReader)
  extends Source {

  /** Exposed for tests: the reader options one collection maps to. */
  def readOptions(collection: String): Map[String, String] = Map(
    "connection.uri" -> uri,
    "database"       -> database,
    "collection"     -> collection)

  /** Explicit names, or the enumerated database when none were passed. */
  def names: Seq[String] =
    (if (collectionNames.nonEmpty) collectionNames
     else enumerate(uri, database)).sorted

  override def collections(spark: SparkSession): Seq[(String, DataFrame)] =
    names.map { c => c -> reader(spark, readOptions(c)) }
}

object MongoSource {
  /** (uri, database) → collection names. */
  type Enumerator = (String, String) => Seq[String]

  /** The per-collection wire read: (session, connector options) → one
    * collection's DataFrame. The default goes through the public MongoDB
    * Spark connector; tests inject a recorded-document double here, so
    * the WHOLE [[MongoSource]] path — enumeration, option wiring, the
    * per-collection loop — runs end-to-end with only the wire call
    * swapped (RecordedMongoE2ESpec drives it into Porter → MiniMySql). */
  type Reader = (SparkSession, Map[String, String]) => DataFrame

  val connectorReader: Reader = (spark, opts) =>
    spark.read.format("mongodb").options(opts).load()

  /** Driver-side `listCollectionNames` through the public MongoDB Java
    * driver (`com.mongodb.client.MongoClients`), resolved reflectively so
    * this module compiles and tests without the jar; production gets it
    * transitively from the connector dependency. */
  val driverEnumerator: Enumerator = (uri, database) => {
    val clientIface = Class.forName("com.mongodb.client.MongoClient")
    val client = Class.forName("com.mongodb.client.MongoClients")
      .getMethod("create", classOf[String]).invoke(null, uri)
    try {
      val db = clientIface.getMethod("getDatabase", classOf[String])
        .invoke(client, database)
      val names = Class.forName("com.mongodb.client.MongoDatabase")
        .getMethod("listCollectionNames").invoke(db)
      names.asInstanceOf[java.lang.Iterable[String]].asScala.toSeq
    } finally clientIface.getMethod("close").invoke(client)
  }
}
