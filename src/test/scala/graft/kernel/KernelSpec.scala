package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

import DocValue._
import DType._

class DTypeSpec extends AnyFunSuite {
  // The whole type space — exhaustive pairs beat random sampling here.
  private val allTypes: Seq[DType] =
    Seq(DInt, DDouble, DDatetime, DText) ++
      Seq(24, 50, 100, 255, 512).map(DVarchar(_))

  test("widen is commutative (forced by the reference's asort, Porter.php:406-408)") {
    for (a <- allTypes; b <- allTypes) assert(widen(a, b) == widen(b, a), s"$a ⊔ $b")
  }

  test("widen is idempotent") {
    for (a <- allTypes) assert(widen(a, a) == a)
  }

  test("text absorbs everything (Porter.php:412-413)") {
    for (a <- allTypes) assert(widen(a, DText) == DText)
  }

  test("double ⊔ int = double (Porter.php:414-415)") {
    assert(widen(DDouble, DInt) == DDouble)
    assert(widen(DInt, DDouble) == DDouble)
  }

  test("varchar widening takes the max length (Porter.php:416-423)") {
    assert(widen(DVarchar(50), DVarchar(255)) == DVarchar(255))
    assert(widen(DVarchar(512), DVarchar(100)) == DVarchar(512))
  }

  test("lattice wart: varchar(512) ⊔ int collapses to varchar(255) (Porter.php:424-426)") {
    assert(widen(DVarchar(512), DInt) == DVarchar(255))
  }

  test("other mixed pairs collapse to varchar(255) (Porter.php:424-426)") {
    assert(widen(DDatetime, DInt) == DVarchar(255))
    assert(widen(DDatetime, DDouble) == DVarchar(255))
    assert(widen(DDatetime, DVarchar(100)) == DVarchar(255))
  }

  test("varchar bucketing is monotone and lands on 50/100/255/512 (Porter.php:375-386)") {
    for (a <- 0 to 511) assert(bucketVarchar(a) <= bucketVarchar(a + 1), s"len $a")
    assert(bucketVarchar(0) == 50)
    assert(bucketVarchar(49) == 50)
    assert(bucketVarchar(50) == 100)  // strict `<` in the reference
    assert(bucketVarchar(99) == 100)
    assert(bucketVarchar(100) == 255)
    assert(bucketVarchar(254) == 255)
    assert(bucketVarchar(255) == 512) // strict `<` again
    assert(bucketVarchar(512) == 512)
  }

  test("string typing: >512 → text, ISO prefix → datetime (Porter.php:366-386)") {
    assert(ofString("x" * 513) == DText)
    assert(ofString("2014-03-01T12:00:00") == DDatetime)
    assert(ofString("2014-03-01T12:00:00.1234") == DDatetime)
    assert(ofString("2014-03-01T12:00:00 trailing junk is fine") == DDatetime)
    assert(ofString("2014-03-01") == DVarchar(50))
    assert(ofString("x" * 512) == DVarchar(512))
  }

  test("widenAll is deterministic regardless of observation order") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val ts = Vector.fill(1 + rnd.nextInt(6))(allTypes(rnd.nextInt(allTypes.size)))
      assert(widenAll(ts) == widenAll(ts.reverse))
      assert(widenAll(ts) == widenAll(rnd.shuffle(ts)))
    }
  }

  test("render/parse round-trips") {
    for (a <- allTypes) assert(parse(a.render) == a)
  }
}

class InferSpec extends AnyFunSuite {
  test("guessDbType mapping (Porter.php:358-396)") {
    assert(infer(DocObjectId("507f1f77bcf86cd799439011")) == DVarchar(24))
    assert(infer(DocDate(0L)) == DDatetime)
    assert(infer(DocInt(3)) == DInt)
    assert(infer(DocNull) == DInt) // nulls deliberately infer to int (:363-364)
    assert(infer(DocDouble(1.5)) == DDouble)
    assert(infer(DocString("hi")) == DVarchar(50))
  }

  test("unsupported types fail fast with context (Porter.php:388-395)") {
    val e = intercept[UnknownTypeException] {
      infer(DocBool(true), "flag", """{"flag":true}""")
    }
    assert(e.getMessage.contains("flag"))
  }

  test("MongoDate renders gmdate('c')-style ISO-8601 UTC (Porter.php:290-292)") {
    assert(isoUtc(1393675200L) == "2014-03-01T12:00:00+00:00")
    assert(isoUtc(0L) == "1970-01-01T00:00:00+00:00")
  }
}

class FlattenSpec extends AnyFunSuite {
  private def obj(fs: (String, DocValue)*) = DocObj(fs.toVector)

  test("nested objects flatten to underscore paths (Porter.php:288)") {
    val d = obj(
      "_id" -> DocObjectId("507f1f77bcf86cd799439011"),
      "profile" -> obj("city" -> DocString("mtl"),
        "geo" -> obj("lat" -> DocDouble(45.5), "lon" -> DocDouble(-73.6))))
    val f = Flatten.flatten(d)
    assert(f.columns.keys.toSeq ==
      Seq("_id", "profile_city", "profile_geo_lat", "profile_geo_lon"))
    assert(f.arrays.isEmpty)
  }

  test("dates flatten to ISO strings, re-inferred as datetime (Porter.php:290-292, :372)") {
    val f = Flatten.flatten(obj("joined" -> DocDate(1393675200L)))
    assert(f.columns("joined") == DocString("2014-03-01T12:00:00+00:00"))
    assert(infer(f.columns("joined")) == DDatetime)
  }

  test("arrays and >25-key objects divert to the child channel (Porter.php:281-283)") {
    val wide = obj((1 to 26).map(i => s"k$i" -> (DocInt(i): DocValue)): _*)
    val narrow = obj((1 to 25).map(i => s"k$i" -> (DocInt(i): DocValue)): _*)
    val d = obj("tags" -> DocArr(Vector(DocString("a"))),
      "big" -> wide, "small" -> narrow)
    val f = Flatten.flatten(d)
    assert(f.arrays.keys.toSeq == Seq("tags", "big"))
    assert(f.columns.keys.size == 25) // `small` merged inline as small_k1..k25
    assert(f.columns.contains("small_k1"))
  }

  test("scalar array elements become one column named after the path (Porter.php:256-258)") {
    val rows = Flatten.extractChildren(DocObjectId("a" * 24), "tags",
      DocArr(Vector(DocString("x"), DocString("y"))))
    assert(rows.map(_.index) == Vector(0L, 1L))
    assert(rows.map(_.columns("tags")) == Vector(DocString("x"), DocString("y")))
  }

  test("document elements flatten (intent semantics, not the Porter.php:254 bug) and nested arrays are dropped (:255)") {
    val rows = Flatten.extractChildren(DocObjectId("a" * 24), "comments",
      DocArr(Vector(
        obj("uid" -> DocInt(1), "txt" -> DocString("hi"),
          "deep" -> DocArr(Vector(DocInt(9)))),
        obj("uid" -> DocInt(2), "txt" -> DocString("yo")))))
    assert(rows.size == 2)
    // intent: element's own fields only, no 0_/1_ sibling prefixes
    assert(rows(0).columns.keys.toSeq == Seq("uid", "txt"))
    assert(rows(1).columns("uid") == DocInt(2))
    // nested array dropped, one explode level only
    assert(!rows(0).columns.keys.exists(_.contains("deep")))
  }

  test("child table naming is parent__column (Porter.php:246)") {
    assert(Flatten.childTableName("posts", "comments") == "posts__comments")
  }
}

class FlattenPropertySpec extends AnyFunSuite {
  import Flatten._

  /** Seeded random document generator: objects/arrays/scalars, depth ≤ 4,
    * ≤ 6 keys per object (so inline merging, not the wide-object path,
    * dominates) plus occasional wide objects and arrays. */
  private def randVal(rnd: scala.util.Random, depth: Int): DocValue =
    rnd.nextInt(10) match {
      case 0 | 1 if depth < 4 =>
        DocObj(Vector.tabulate(1 + rnd.nextInt(5))(i =>
          s"f$i" -> randVal(rnd, depth + 1)))
      case 2 if depth < 4 =>
        DocArr(Vector.fill(1 + rnd.nextInt(3))(randVal(rnd, depth + 1)))
      case 3 => DocObj(Vector.tabulate(26 + rnd.nextInt(3))(i =>
        s"w$i" -> (DocInt(i): DocValue))) // wide object → child channel
      case 4 => DocDate(rnd.nextLong() % 4000000000L)
      case 5 => DocDouble(rnd.nextDouble())
      case 6 => DocString(rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
      case 7 => DocNull
      case _ => DocInt(rnd.nextInt(1000))
    }

  test("flatten invariants hold over 300 random documents (Porter.php:277-298)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val doc = DocObj(Vector.tabulate(1 + rnd.nextInt(6))(i =>
        s"top$i" -> randVal(rnd, 1)))
      val f = flatten(doc)
      // 1. columns hold only scalars (dates already rendered to strings)
      assert(f.columns.values.forall {
        case _: DocObj | _: DocArr | _: DocDate => false
        case _                                  => true
      })
      // 2. everything set aside is genuinely child-bearing
      assert(f.arrays.values.forall(isChildBearing))
      // 3. paths are underscore-joined from a top-level field
      assert((f.columns.keys ++ f.arrays.keys).forall(_.startsWith("top")))
      // 4. child extraction of each set-aside value keeps element order
      f.arrays.foreach { case (path, v) =>
        val rows = extractChildren(DocString("p"), path, v)
        assert(rows.map(_.index) == rows.indices.map(_.toLong))
        // one explode level: no nested child-bearing payloads survive
        assert(rows.forall(_.columns.values.forall {
          case _: DocObj | _: DocArr => false
          case _                     => true
        }))
      }
    }
  }
}

class RouteSpec extends AnyFunSuite {
  test("NodeBB kludge rules, first match wins (Porter.php:304-316)") {
    assert(Route.normalizeKey("tag:scala:topics") == "tag_topics")
    assert(Route.normalizeKey("group:cid:7:privileges:groups:members") == "group_privileges_members")
    assert(Route.normalizeKey("group:cid:7:privileges:read") == "group_privileges")
    assert(Route.normalizeKey("group:admins:members") == "group_members")
    assert(Route.normalizeKey("group:admins") == "group")
    assert(Route.normalizeKey("ip:1.2.3.4:uid") == "ip_uid")
  }

  test("settings/widgets families collapse (Porter.php:318-321)") {
    assert(Route.normalizeKey("settings:core") == "settings")
    assert(Route.normalizeKey("widgets:x:y") == "widgets")
  }

  test("digit / NaN / undefined normalization (Porter.php:323-326)") {
    assert(Route.normalizeKey("user:42") == "user")
    assert(Route.normalizeKey("topic:12:posts") == "topic_posts")
    assert(Route.normalizeKey("user:NaN:settings") == "user_settings")
    assert(Route.normalizeKey("a b:c") == "a_b_c")
    assert(Route.normalizeKey("chat:room:5") == "chat_room")
  }

  test("sequential NaN/undefined passes like PHP str_replace") {
    // :NaN: replaced first, then :undefined: runs over the *result*:
    // "x:NaN:undefined:y" → "x:#:undefined:y" → "x:#:#:y" → "x_y"
    assert(Route.normalizeKey("x:NaN:undefined:y") == "x_y")
  }

  test("all-digit keys normalize to empty → fall back to collection (intent, Porter.php:334-338)") {
    assert(Route.normalizeKey("123") == "")
    assert(Route.routeTable(Some("123"), "objects") == "objects")
    assert(Route.routeTable(None, "objects") == "objects")
    assert(Route.routeTable(Some("user:42"), "objects") == "user")
  }
}
