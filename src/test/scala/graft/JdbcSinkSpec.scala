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

/** Executes the sink's generated SQL text against [[MiniMySql]], the
  * SQL-parsing in-memory MySQL-subset engine: CREATE/REPLACE round-trip,
  * REPLACE-on-PK-collision upsert semantics, and destination DDL evolution
  * on re-export (`ensureRowStructure`, Porter.php:86-123). FakeJdbc only
  * records strings; these tests validate the statements themselves. */
class MiniMySqlSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def sink(bs: Int = 1000) =
    new JdbcReplaceSink("jdbc:mini:db", new java.util.Properties, batchSize = bs)
  private def fresh(): Unit = { MiniMySql.register; MiniMySql.reset() }

  test("CREATE + REPLACE round-trip: rows land typed; PK collisions upsert") {
    fresh()
    import spark.implicits._
    val s = sink()
    s.ensureTable("users",
      TableDef(Seq("_id" -> DVarchar(50), "n" -> DInt), Seq("_id")))
    assert(MiniMySql.colTypes("users") ==
      Map("_id" -> "VARCHAR(50)", "n" -> "INT"))
    s.write("users", Seq(("a", 1), ("b", 2)).toDF("_id", "n").coalesce(1),
      TableDef(Seq.empty, Seq.empty))
    // second export REPLACEs _id=a (PK collision → overwrite) and adds c
    s.write("users", Seq(("a", 10), ("c", 3)).toDF("_id", "n").coalesce(1),
      TableDef(Seq.empty, Seq.empty))
    val rows = MiniMySql.rowsOf("users").map(r => r("_id") -> r("n")).toMap
    assert(rows == Map("a" -> 10, "b" -> 2, "c" -> 3))
  }

  test("re-export evolves the destination DDL: widen conflicting types, add unseen columns (Porter.php:86-123)") {
    fresh()
    import spark.implicits._
    val s = sink()
    // run 1: narrow types; a row lands
    s.ensureTable("t", TableDef(Seq("_id" -> DVarchar(50), "n" -> DInt), Seq("_id")))
    s.write("t", Seq(("a", 1)).toDF("_id", "n").coalesce(1),
      TableDef(Seq.empty, Seq.empty))
    // run 2 infers wider strings, doubles, and a brand-new column
    s.ensureTable("t", TableDef(
      Seq("_id" -> DVarchar(100), "n" -> DDouble, "extra" -> DText), Seq("_id")))
    assert(MiniMySql.colTypes("t") ==
      Map("_id" -> "VARCHAR(100)", "n" -> "DOUBLE", "extra" -> "TEXT"))
    // run 1's row survived the ALTERs, with NULL for the added column
    assert(MiniMySql.rowsOf("t") == Seq(Map("_id" -> "a", "n" -> 1, "extra" -> null)))
    // run 3: int observations against the now-double column stay double
    // (widen is the lattice, not last-writer-wins), nothing re-narrows
    s.ensureTable("t", TableDef(Seq("n" -> DInt), Seq.empty))
    assert(MiniMySql.colTypes("t")("n") == "DOUBLE")
  }

  test("tableDef reads the evolved definition back through JDBC metadata") {
    fresh()
    val s = sink()
    s.ensureTable("t", TableDef(Seq("_id" -> DVarchar(50), "n" -> DInt), Seq("_id")))
    s.ensureTable("t", TableDef(Seq("n" -> DDouble, "s" -> DVarchar(255)), Seq.empty))
    assert(s.tableDef("t") == Some(TableDef(
      Seq("_id" -> DVarchar(50), "n" -> DDouble, "s" -> DVarchar(255)), Seq("_id"))))
    assert(s.tableDef("missing") == None)
  }

  test("MiniMySql rejects DDL with types the sink never emits (unmodeled semantics)") {
    fresh()
    val e = intercept[IllegalArgumentException] {
      MiniMySql.executeUpdate("CREATE TABLE IF NOT EXISTS `x` (`a` JSON NULL)")
    }
    assert(e.getMessage.contains("does not model"))
  }
}

/** Property test for the destination DDL-evolution path: ANY random
  * sequence of inferred definitions, replayed through the real sink →
  * MiniMySql round-trip (CREATE, metadata read-back, ALTER diff), must
  * leave the destination exactly at the pure lattice fold
  * `inferred₁ evolve inferred₂ evolve …` — i.e. the stateful SQL path and
  * the pure model can never drift apart, whatever the widening order. */
class DdlEvolvePropertySpec extends AnyFunSuite {
  import graft.kernel.DType

  private def sink() =
    new JdbcReplaceSink("jdbc:mini:prop", new java.util.Properties)

  private def renderSql(t: DType): String = t match {
    case DInt        => "INT"
    case DDouble     => "DOUBLE"
    case DDatetime   => "DATETIME"
    case DText       => "TEXT"
    case DVarchar(n) => s"VARCHAR($n)"
  }

  test("random widen sequences: destination DDL always equals the lattice fold") {
    val types = Vector[DType](DInt, DDouble, DDatetime, DText,
      DVarchar(50), DVarchar(100), DVarchar(255), DVarchar(512))
    val cols = Vector("a", "b", "c", "d")
    val rnd = new scala.util.Random(17)
    (1 to 25).foreach { trial =>
      MiniMySql.register
      MiniMySql.reset()
      val s = sink()
      val name = s"t$trial"
      var expected: Option[TableDef] = None
      (1 to 5).foreach { _ =>
        val chosen = {
          val cs = cols.filter(_ => rnd.nextBoolean())
          if (cs.isEmpty) Vector(cols(rnd.nextInt(cols.size))) else cs
        }
        val inferred = TableDef(
          chosen.map(c => c -> types(rnd.nextInt(types.size))),
          Seq(chosen.head))
        s.ensureTable(name, inferred)
        expected = Some(expected.map(TableDef.evolve(_, inferred)).getOrElse(inferred))
      }
      val want = expected.get
      // destination column types equal the fold, rendered to MySQL
      assert(MiniMySql.colTypes(name) ==
        want.columns.map { case (c, t) => c -> renderSql(t) }.toMap,
        s"trial $trial drifted from the lattice fold")
      // and the JDBC metadata read-back reproduces the fold exactly
      // (types, column order, primary key)
      assert(s.tableDef(name) == Some(want), s"trial $trial read-back")
    }
  }
}

/** [[TableDef.evolve]] is the pure merge the evolution path rides. */
class TableDefEvolveSpec extends AnyFunSuite {
  test("evolve widens conflicts, appends unseen columns, keeps destination order and pk") {
    val existing = TableDef(
      Seq("_id" -> DVarchar(50), "a" -> DInt, "b" -> DVarchar(100)), Seq("_id"))
    val inferred = TableDef(
      Seq("b" -> DVarchar(255), "a" -> DDouble, "c" -> DDatetime), Seq.empty)
    val merged = TableDef.evolve(existing, inferred)
    assert(merged == TableDef(
      Seq("_id" -> DVarchar(50), "a" -> DDouble, "b" -> DVarchar(255),
        "c" -> DDatetime), Seq("_id")))
    // columns only the destination knows are untouched; same def → no-op
    assert(TableDef.evolve(merged, inferred) == merged)
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

  test("MongoSource with no explicit collections enumerates the database (Porter.php:344-349)") {
    val enumerated = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val src = new MongoSource("mongodb://h:27017", "nodebb", Seq.empty,
      enumerate = (uri, db) => { enumerated += uri -> db; Seq("sessions", "objects") })
    assert(src.names == Seq("objects", "sessions")) // sorted
    assert(enumerated.toSeq == Seq("mongodb://h:27017" -> "nodebb"))
    // explicit names suppress enumeration
    val explicit = new MongoSource("mongodb://h:27017", "nodebb", Seq("only"),
      enumerate = (_, _) => fail("must not enumerate"))
    assert(explicit.names == Seq("only"))
  }

  test("CLI dispatch: no --mongo-uri falls back to the file stand-in, which reads collections") {
    val dir = TestDirs.scratch("src")
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
