package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.DType._
import graft.porter.{JdbcReplaceSink, ParquetSink, Porter, PorterConfig, TableDef}

/** Golden end-to-end fixtures (FIXTURES.md §B): JSONL collections through
  * route → flatten → explode → infer → sink, asserting resulting tables,
  * schemas and rows against the cited reference behaviors. */
class PorterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(name: String): DataFrame =
    spark.read.json(getClass.getResource(s"/docs/$name.jsonl").getPath)

  private def runPorter(collections: (String, DataFrame)*)
      : (Map[String, Long], String) = {
    val out = TestDirs.scratch("porter")
    val porter = new Porter(spark, new ParquetSink(out))
    (porter.exportCollections(collections.toSeq), out)
  }

  private def schemaJson(out: String, table: String): String =
    Files.readString(java.nio.file.Paths.get(s"$out/$table/_schema.json"))

  private def readTable(out: String, table: String): DataFrame =
    spark.read.parquet(s"$out/$table/data")

  test("users: flatten + type inference end-to-end (Porter.php:277-298, :358-396)") {
    val (counts, out) = runPorter("users" -> fixture("users"))
    assert(counts == Map("users" -> 3L))
    val t = readTable(out, "users")
    // underscore paths (:288); _num appended
    assert(t.columns.toSet == Set("_id", "age", "bio", "joined", "name",
      "profile_city", "profile_geo_lat", "profile_geo_lon", "score", "_num"))
    val s = schemaJson(out, "users")
    assert(s.contains(""""_id": "varchar(24)""""))     // ObjectId shape (:359-360)
    assert(s.contains(""""age": "int""""))
    assert(s.contains(""""score": "double""""))
    assert(s.contains(""""joined": "datetime""""))     // ISO promotion (:372-373)
    assert(s.contains(""""bio": "text""""))            // >512 widens via text-absorb
    assert(s.contains(""""name": "varchar(100)""""))   // 59-char name → 100 bucket
    assert(s.contains(""""primary_key": ["_id"]"""))   // PK _id (:116-117)
    // _num is 1-based in _id order
    val nums = t.orderBy("_id").collect().map(_.getAs[Long]("_num")).toSeq
    assert(nums == Seq(1L, 2L, 3L))
  }

  test("posts: child tables from arrays and wide objects (Porter.php:245-268, :281)") {
    val (counts, out) = runPorter("posts" -> fixture("posts"))
    assert(counts.keySet == Set("posts", "posts__tags", "posts__comments", "posts__big"))
    // scalar array → single column named after the path (:256-258)
    val tags = readTable(out, "posts__tags")
    assert(tags.columns.toSet == Set("_parentid", "_index", "tags", "_num"))
    assert(counts("posts__tags") == 3L)
    // document array → flattened element (intent, not the :254 bug);
    // nested array `deep` dropped (:255)
    val comments = readTable(out, "posts__comments")
    assert(comments.columns.toSet == Set("_parentid", "_index", "uid", "txt", "_num"))
    assert(counts("posts__comments") == 3L)
    assert(schemaJson(out, "posts__comments")
      .contains(""""primary_key": ["_parentid", "_index"]""")) // PK (:118-119)
    // >25-key object diverted (:281)
    assert(counts("posts__big") == 26L)
    // parents keep scalar columns only
    val posts = readTable(out, "posts")
    assert(posts.columns.toSet == Set("_id", "title", "_num"))
  }

  test("objects: _key routing fans one collection into many tables (Porter.php:300-339)") {
    val (counts, _) = runPorter("objects" -> fixture("objects"))
    assert(counts == Map(
      "tag_topics" -> 1L,              // kludge 1
      "group_privileges_members" -> 1L, // kludge 2
      "ip_uid" -> 1L,                  // kludge 6
      "settings" -> 1L,                // family collapse
      "user" -> 2L,                    // digits → # → trimmed
      "objects" -> 1L))                // all-digit key → collection fallback
  }

  test("widen: conflicting observations fold through the lattice (Porter.php:405-429)") {
    val (_, out) = runPorter("widen" -> fixture("widen"))
    val s = schemaJson(out, "widen")
    assert(s.contains(""""n": "double""""))    // int ⊔ double (JSON-level widening)
    assert(s.contains(""""s": "text""""))      // varchar(50) ⊔ text
    assert(s.contains(""""d": "varchar(255)"""")) // datetime ⊔ varchar → 255 wart
  }

  test("skip-list drops routed tables before child export (Porter.php:156-157)") {
    val porterOut = TestDirs.scratch("porter")
    val porter = new Porter(spark, new ParquetSink(porterOut),
      PorterConfig(skip = Set("user", "settings")))
    val counts = porter.exportCollection("objects", fixture("objects"))
    assert(!counts.contains("user") && !counts.contains("settings"))
    assert(counts.contains("tag_topics"))
    // the $allKeys tally runs before the skip check (Porter.php:150-157):
    // skipped families are still counted
    assert(porter.keyTally("user") == 2L)
    assert(porter.keyTally("settings") == 1L)
  }

  test("$allKeys tally: occurrences per normalized key family (Porter.php:328-332)") {
    val out = TestDirs.scratch("porter")
    val porter = new Porter(spark, new ParquetSink(out))
    porter.exportCollection("objects", fixture("objects"))
    // an all-digit key normalizes to the empty-string family — tallied
    // even though the row itself falls back to the collection table
    assert(porter.keyTally == Map(
      "tag_topics" -> 1L, "group_privileges_members" -> 1L, "ip_uid" -> 1L,
      "settings" -> 1L, "user" -> 2L, "" -> 1L))
  }

  test("limit caps rows per collection (Porter.php:141-144)") {
    val porterOut = TestDirs.scratch("porter")
    val porter = new Porter(spark, new ParquetSink(porterOut),
      PorterConfig(limit = Some(2)))
    val counts = porter.exportCollection("users", fixture("users"))
    assert(counts("users") == 2L)
  }

  test("strict types fail fast on booleans with the column named (Porter.php:388-395)") {
    import spark.implicits._
    val df = Seq((1L, true)).toDF("_id", "flag")
    val porterOut = TestDirs.scratch("porter")
    val porter = new Porter(spark, new ParquetSink(porterOut))
    val e = intercept[graft.kernel.DocValue.UnknownTypeException] {
      porter.exportCollection("flags", df)
    }
    assert(e.getMessage.contains("flag"))
  }

  test("dataonly: missing destinations skipped and remembered, existing ones written (Porter.php:158-179)") {
    val out = TestDirs.scratch("porter")
    // first pass creates only the `user` table (skip everything else)
    val allTables = Set("tag_topics", "group_privileges_members", "ip_uid",
      "settings", "objects")
    new Porter(spark, new ParquetSink(out), PorterConfig(skip = allTables))
      .exportCollection("objects", fixture("objects"))
    // dataonly pass: only destinations that already exist receive rows
    val counts = new Porter(spark, new ParquetSink(out),
      PorterConfig(dataOnly = true))
      .exportCollection("objects", fixture("objects"))
    assert(counts("user") == 2L)                  // existing table written
    assert(counts("tag_topics") == 0L)            // missing → skipped
    assert(counts("settings") == 0L)
    assert(readTable(out, "user").count() == 2L)
  }

  test("wide-row guard: >500-column rows drop but their children still export (Porter.php:182-194)") {
    import scala.jdk.CollectionConverters._
    // two docs: one flattening to 502 columns (+_id+tags), one narrow;
    // both carry an array child. Children export BEFORE the guard fires.
    val wideFields = (1 to 501).map(i => s""""k$i": $i""").mkString(", ")
    val rows = Seq(
      s"""{"_id":"a07f1f77bcf86cd799439051", $wideFields, "tags":["w1","w2"]}""",
      s"""{"_id":"a07f1f77bcf86cd799439052", "k1": 1, "tags":["n1"]}""")
    val tmp = java.nio.file.Paths.get(TestDirs.scratch("widejson"))
    Files.write(tmp.resolve("wide.jsonl"), rows.asJava)
    val df = spark.read.json(tmp.resolve("wide.jsonl").toString)
    val out = TestDirs.scratch("porter")
    val porter = new Porter(spark, new ParquetSink(out))
    val counts = porter.exportCollection("wide", df)
    // parent keeps only the narrow row; both rows' children exported
    assert(counts("wide") == 1L)
    assert(counts("wide__tags") == 3L)
    val parent = readTable(out, "wide")
    assert(parent.count() == 1L)
    assert(parent.head().getAs[String]("_id").endsWith("52"))
  }

  test("progress cadence: >=10s AND >=1% between reports (Porter.php:210-225)") {
    var now = 0L
    val p = new graft.porter.Progress(1000, () => now)
    assert(p.report(10).isEmpty)          // 1% but no 10s elapsed
    now = 11000
    assert(p.report(10).exists(_.contains("1%")))
    now = 12000
    assert(p.report(500).isEmpty)         // 50% but <10s since last print
    now = 22000
    val line = p.report(500)
    assert(line.exists(_.contains("50%")))
    assert(line.exists(_.contains("22s left"))) // linear ETA: 22s for 50%
  }

  test("JDBC sink DDL and REPLACE shapes (Porter.php:207, :116-120)") {
    val sink = new JdbcReplaceSink("jdbc:mysql://example/db", new java.util.Properties)
    val ddl = TableDef(
      Seq("_id" -> DVarchar(24), "age" -> DInt, "bio" -> DText, "_num" -> DInt),
      Seq("_id"))
    assert(sink.createTableSql("users", ddl) ==
      "CREATE TABLE IF NOT EXISTS `users` (`_id` VARCHAR(24) NULL, `age` INT NULL, " +
        "`bio` TEXT NULL, `_num` INT NULL, PRIMARY KEY (`_id`))")
    assert(sink.replaceSql("users", Seq("_id", "age")) ==
      "REPLACE INTO `users` (`_id`, `age`) VALUES (?, ?)")
  }
}
