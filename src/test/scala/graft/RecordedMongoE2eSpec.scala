package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.porter.{JdbcReplaceSink, MongoSource, Porter}

/** End-to-end "Mongo" → MySQL-subset export with NO parquet/JSONL file
  * stand-ins: a wire-level double of the MongoDB connector (recorded
  * extended-JSON documents served through [[MongoSource]]'s reader seam,
  * a recorded `listCollectionNames` enumerator) drives the REAL
  * `MongoSource.collections` path — enumeration, option wiring, the
  * per-collection loop — into `Porter.exportCollections` and out through
  * [[JdbcReplaceSink]] into [[MiniMySql]], which parses and executes the
  * generated SQL. This is the closest the offline sandbox gets to the
  * reference's live `mongod` → `mysqld` round trip (Porter.php:490-503):
  * every layer is the production code except the two wire calls. */
class RecordedMongoE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("recorded-document Mongo double → MongoSource → Porter → MiniMySql round trip") {
    MiniMySql.register
    MiniMySql.reset()
    // the recorded "database": documents exactly as the connector would
    // surface them — nested objects (flatten), arrays (child tables),
    // and a NodeBB-style keyed collection (routing fan-out)
    val recorded = Map(
      "users" -> Seq(
        """{"_id":"u1","name":"ada","age":36,"address":{"city":"london","zip":"e1 6an"}}""",
        """{"_id":"u2","name":"lin","age":29,"address":{"city":"paris","zip":"75008"}}"""),
      "posts" -> Seq(
        """{"_id":"p1","author":"u1","score":4.5,"tags":["intro","spark"]}""",
        """{"_id":"p2","author":"u2","score":1.25,"tags":["scala"]}"""),
      "objects" -> Seq(
        """{"_key":"category:7","name":"general"}""",
        """{"_key":"user:3","joindate":1700000000}"""))
    val enumCalls = mutable.Buffer.empty[(String, String)]
    val readCalls = mutable.Buffer.empty[Map[String, String]]
    val src = new MongoSource(
      uri = "mongodb://recorded-host:27017",
      database = "appdb",
      collectionNames = Seq.empty, // force the enumeration path
      enumerate = (uri, db) => { enumCalls += ((uri, db)); recorded.keys.toSeq },
      reader = (s, opts) => {
        readCalls += opts
        import s.implicits._
        s.read.json(s.createDataset(recorded(opts("collection"))))
      })
    val sink = new JdbcReplaceSink("jdbc:mini:db",
      new java.util.Properties, batchSize = 100)
    val counts = new Porter(spark, sink).exportCollections(src.collections(spark))

    // the wire layer saw exactly the configured coordinates: one
    // enumeration call, one per-collection read with full options
    assert(enumCalls == Seq(("mongodb://recorded-host:27017", "appdb")))
    assert(readCalls.map(_("collection")).sorted ==
      Seq("objects", "posts", "users"))
    assert(readCalls.forall(o =>
      o("connection.uri") == "mongodb://recorded-host:27017" &&
        o("database") == "appdb"))

    // destinations: flattened users, posts + array child, routed objects
    assert(counts == Map(
      "users" -> 2L, "posts" -> 2L, "posts__tags" -> 3L,
      "category" -> 1L, "user" -> 1L))

    // rows LANDED in the SQL engine, typed and flattened: the nested
    // address became underscore columns, the child rows carry
    // (_parentid, _index), the keyed docs fanned out by family
    val users = MiniMySql.rowsOf("users")
      .map(r => r("_id").toString -> r("address_city").toString).toMap
    assert(users == Map("u1" -> "london", "u2" -> "paris"))
    assert(MiniMySql.colTypes("users")("age") == "INT")
    val tags = MiniMySql.rowsOf("posts__tags")
      .map(r => (r("_parentid").toString, r("_index").toString.toInt,
        r("tags").toString)).toSet
    assert(tags == Set(("p1", 0, "intro"), ("p1", 1, "spark"),
      ("p2", 0, "scala")))
    assert(MiniMySql.rowsOf("category").head("name").toString == "general")
    assert(MiniMySql.rowsOf("user").head("joindate").toString == "1700000000")
  }

  test("re-export over an evolved schema emits ALTER TABLE through the full Porter → sink chain") {
    MiniMySql.register
    MiniMySql.reset()
    def exportDocs(docs: Seq[String]): Map[String, Long] = {
      val src = new MongoSource(
        uri = "mongodb://recorded-host:27017",
        database = "appdb",
        collectionNames = Seq("users"),
        enumerate = (_, _) => fail("explicit collection list must skip enumeration"),
        reader = (s, opts) => {
          import s.implicits._
          s.read.json(s.createDataset(docs))
        })
      val sink = new JdbcReplaceSink("jdbc:mini:db",
        new java.util.Properties, batchSize = 100)
      new Porter(spark, sink).exportCollections(src.collections(spark))
    }

    // export #1: age is an INT everywhere
    exportDocs(Seq(
      """{"_id":"u1","name":"ada","age":36}""",
      """{"_id":"u2","name":"lin","age":29}"""))
    assert(MiniMySql.colTypes("users")("age") == "INT")
    assert(!MiniMySql.tables("users").cols.contains("email"))

    // export #2 into the EXISTING table: a NEW column (email) and a
    // WIDENED column (age now arrives as a string → the reference's
    // mixed-pair collapse, int ⊔ varchar = varchar(255), Porter.php:405-429)
    // must surface as executed ALTER TABLE ADD/MODIFY statements — the
    // TableDef.evolve logic driven through Porter.exportCollections and
    // the sink's metadata read-back, not called directly
    val counts2 = exportDocs(Seq(
      """{"_id":"u1","name":"ada lovelace","age":36,"email":"ada@calc.io"}""",
      """{"_id":"u3","name":"eve","age":"unknown","email":"eve@x.io"}"""))
    assert(counts2 == Map("users" -> 2L))
    val types = MiniMySql.colTypes("users")
    assert(types("age") == "VARCHAR(255)", types)
    assert(types("email").startsWith("VARCHAR"), types)

    // REPLACE semantics on the PK: u1 was upserted with the new name and
    // email; u2 (absent from export #2) survived with a null-backfilled
    // email column from the ALTER ADD
    val byId = MiniMySql.rowsOf("users")
      .map(r => r("_id").toString -> r).toMap
    assert(byId.keySet == Set("u1", "u2", "u3"))
    assert(byId("u1")("name").toString == "ada lovelace")
    assert(byId("u1")("email").toString == "ada@calc.io")
    assert(byId("u2")("email") == null)
    assert(byId("u3")("age").toString == "unknown")
  }
}
