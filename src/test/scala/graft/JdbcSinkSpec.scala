package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.DType._
import graft.porter.{FileSource, JdbcReplaceSink, MongoSource, Porter, PorterConfig, PorterMain, TableDef}

/** Executes [[JdbcReplaceSink]] against the recording [[FakeJdbc]] driver:
  * real `DriverManager.getConnection` calls, real `PreparedStatement`
  * batching — the wire behavior the reference produces row-at-a-time
  * (`Porter.php:207`) is pinned here in its set-oriented form. */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def sink(bs: Int = 1000) =
    new JdbcReplaceSink("jdbc:fake:db", new java.util.Properties, batchSize = bs)

  private def fresh(): Unit = { FakeJdbc.register; FakeJdbc.reset() }

  test("tableExists consults driver metadata; ensureTable creates once") {
    fresh()
    val s = sink()
    assert(!s.tableExists("users"))
    s.ensureTable("users", TableDef(Seq("_id" -> DVarchar(24), "n" -> DInt), Seq("_id")))
    assert(FakeJdbc.eventList.contains("create:users"))
    assert(s.tableExists("users"))
  }

  test("write round-trips rows through batched REPLACE, committing per batch") {
    fresh()
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, s"v$i")).toDF("_id", "v").coalesce(1)
    sink(bs = 2).write("users", df, TableDef(Seq.empty, Seq.empty))
    val ev = FakeJdbc.eventList
    assert(ev.contains("prepare:REPLACE INTO `users` (`_id`, `v`) VALUES (?, ?)"))
    // 5 rows at batchSize 2 → flushes of 2, 2, then the final 1
    assert(ev.filter(_.startsWith("executeBatch:users:")) ==
      Seq("executeBatch:users:2", "executeBatch:users:2", "executeBatch:users:1"))
    assert(ev.count(_ == "commit") == 3)
    // the exact values arrive, in order
    assert(FakeJdbc.rowList.map(_._2) ==
      (1L to 5L).map(i => Seq(java.lang.Long.valueOf(i), s"v$i")))
  }

  test("writeMany writes every routed table in one connection pass with per-table statements") {
    fresh()
    import spark.implicits._
    val df = Seq(
      ("a", 1L), ("b", 2L), ("a", 3L), ("b", 4L), ("a", 5L)
    ).toDF("_table", "n").coalesce(1)
    val ddls = Map("a" -> TableDef(Seq.empty, Seq.empty),
                   "b" -> TableDef(Seq.empty, Seq.empty))
    sink().writeMany(df, "_table", ddls)
    val ev = FakeJdbc.eventList
    // one partition → ONE connection for both tables (single cursor pass)
    assert(ev.count(_.startsWith("connect:")) == 1)
    assert(ev.contains("prepare:REPLACE INTO `a` (`n`) VALUES (?)"))
    assert(ev.contains("prepare:REPLACE INTO `b` (`n`) VALUES (?)"))
    val byTable = FakeJdbc.rowList.groupBy(_._1)
    assert(byTable("a").map(_._2.head) == Seq(1L, 3L, 5L).map(java.lang.Long.valueOf))
    assert(byTable("b").map(_._2.head) == Seq(2L, 4L).map(java.lang.Long.valueOf))
  }

  test("porter dataonly to JDBC: skip-missing, truncate exactly once, rows land (Porter.php:158-179)") {
    fresh()
    FakeJdbc.existing.add("user")
    val porter = new Porter(spark, sink(), PorterConfig(dataOnly = true))
    val df = spark.read.json(getClass.getResource("/docs/objects.jsonl").getPath)
    val counts = porter.exportCollection("objects", df)
    assert(counts("user") == 2L)
    assert(counts("tag_topics") == 0L)
    val ev = FakeJdbc.eventList
    assert(ev.count(_ == "truncate:user") == 1)
    assert(!ev.exists(_.startsWith("truncate:tag_topics")))
    assert(FakeJdbc.rowList.forall(_._1 == "user"))
    assert(FakeJdbc.rowList.size == 2)
  }
}

/** Source-seam dispatch (`Porter.php:490-496`): `--mongo-uri` selects the
  * connector-backed source; otherwise the file-directory stand-in. */
class SourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def opts(pairs: (String, String)*): String => Option[String] =
    pairs.toMap.get _

  test("CLI dispatch: --mongo-uri selects MongoSource with db and collections") {
    val src = PorterMain.selectSource("/ignored",
      opts("mongo-uri" -> "mongodb://h:27017", "mongo-db" -> "nodebb",
        "collections" -> "objects,sessions"))
    val mongo = src.asInstanceOf[MongoSource]
    assert(mongo.readOptions("objects") == Map(
      "connection.uri" -> "mongodb://h:27017",
      "database" -> "nodebb",
      "collection" -> "objects"))
  }

  test("CLI dispatch: no --mongo-uri falls back to the file stand-in, which reads collections") {
    val dir = java.nio.file.Files.createTempDirectory("src").toString
    val fixture = getClass.getResource("/docs/users.jsonl").getPath
    java.nio.file.Files.copy(java.nio.file.Paths.get(fixture),
      java.nio.file.Paths.get(dir, "users.jsonl"))
    val src = PorterMain.selectSource(dir, opts())
    assert(src.isInstanceOf[FileSource])
    val cols = src.collections(spark)
    assert(cols.map(_._1) == Seq("users"))
    assert(cols.head._2.count() == 3L)
  }
}
