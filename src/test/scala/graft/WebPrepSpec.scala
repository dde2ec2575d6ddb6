package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WebPrep

/** Property pins for the web-prep stages (q114/q115). The DuckDB hash
  * gate proves Spark≡oracle on the corpus; these specs pin the SEMANTIC
  * claims — planted boilerplate is dropped, planted content survives,
  * normalization folds every fixture class and is idempotent. */
class WebPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 30 words, 0 links, plenty of stopwords: must classify as content
  private val ContentText =
    ("the quick brown fox jumps over the lazy dog and then runs " +
      "to the river of stones in a field that is wide and green " +
      "under the open sky today").trim

  test("q114: planted boilerplate lines drop, content lines survive") {
    import spark.implicits._
    val docs = Seq((0L, "src0", ContentText)).toDF("doc_id", "source", "text")
    val v = WebPrep.stripLineVerdicts(WebPrep.synthesizeHtml(docs))
      .select("cw", "nlinks", "nw", "keep").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))

    val byPrefix = (p: String) => v.filter(_._1.startsWith(p))
    // nav: 4 links, 4 words -> dropped (length AND link density)
    assert(byPrefix("Home About").forall(_._4 == 0))
    // heading: 2 words -> dropped
    assert(byPrefix("Document 0").forall(_._4 == 0))
    // cookie banner (doc_id=0 has it): 10 words but 1 stopword -> dropped
    assert(byPrefix("We use cookies").forall(_._4 == 0))
    // related-links farm: 9 words -> dropped
    assert(byPrefix("Related article").forall(_._4 == 0))
    // linky paragraph: 14 words, 4 stopwords BUT 4 links -> link density kills it
    val linky = byPrefix("Read more")
    assert(linky.nonEmpty && linky.forall(r => r._2 == 4 && r._4 == 0))
    // footer: 7 words -> dropped
    assert(byPrefix("Copyright 2026").forall(_._4 == 0))
    // both content paragraphs (25 + 5 words... 30 words total split 25/5):
    // first paragraph (25 words, stopword-rich) survives
    val p1 = byPrefix("the quick brown")
    assert(p1.length == 1 && p1.head._4 == 1)
    // the 5-word tail paragraph fails the length rule — rules are honest
    assert(byPrefix("under the open").forall(_._4 == 0))
  }

  test("q114: summary reassembles kept lines in page order") {
    import spark.implicits._
    val docs = Seq((7L, "srcX", (ContentText + " extra words here for the second paragraph to also pass the length and the stopword rules of this strip")))
      .toDF("doc_id", "source", "text")
    val out = WebPrep.stripBoilerplate(WebPrep.synthesizeHtml(docs)).collect()
    assert(out.length == 1)
    val r = out.head
    // 7 % 3 != 0 -> no cookie line; 7 lines total
    assert(r.getAs[Long]("n_lines") == 7L)
    assert(r.getAs[Long]("n_kept") == 2L)
    // md5 must equal the hash of the two kept cleaned paragraphs joined
    // by newline, in page order
    val ws = (ContentText + " extra words here for the second paragraph to also pass the length and the stopword rules of this strip").split(" +")
    val expect = ws.take(25).mkString(" ") + "\n" + ws.drop(25).mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expect.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("content_md5") == md)
  }

  test("q115: every fold class lands on its ASCII/precomposed target") {
    import spark.implicits._
    graft.expr.TextExpressions.register(spark)
    val df = Seq((1L, WebPrep.DirtyPrefix + "tail text")).toDF("doc_id", "dirty")
    val norm = df.select(WebPrep.normalizeText("dirty").as("n"))
      .head().getString(0)
    assert(norm == WebPrep.CleanPrefix + "tail text")
    // the clean prefix is precomposed NFC: é is ONE char
    assert(WebPrep.CleanPrefix.codePointCount(0, WebPrep.CleanPrefix.length)
      == WebPrep.CleanPrefix.length)
    assert(norm.contains('\u00e9') && !norm.contains('\u0301'))
    assert(!norm.exists(c => c >= 0xff00 || c == '\u00a0' || c == '\u201c'))
  }

  test("q115: normalization is idempotent and ASCII-invariant") {
    import spark.implicits._
    graft.expr.TextExpressions.register(spark)
    val inputs = Seq(
      (1L, WebPrep.DirtyPrefix + "mixed \u201cstate\u201d"),
      (2L, "already clean ascii text"),
      (3L, "\uff41\uff42\uff43 \u2013 x y"))
    val df = inputs.toDF("doc_id", "dirty")
    val once = df.select(col("doc_id"), WebPrep.normalizeText("dirty").as("dirty"))
    val twice = once.select(col("doc_id"), WebPrep.normalizeText("dirty").as("n"))
    val a = once.orderBy("doc_id").collect().map(_.getString(1))
    val b = twice.orderBy("doc_id").collect().map(_.getString(1))
    assert(a.sameElements(b), "normalize must be a fixpoint after one pass")
    assert(a(1) == "already clean ascii text")
    assert(a(2) == "abc - x y")
  }

  test("q119: every URL noise class folds; canonicalization is idempotent") {
    import spark.implicits._
    val urls = Seq(
      // case + www + default port + index.html + tracking + fragment
      (1L, "HTTPS://WWW.Blog.srcA0.COM:443/Articles/3/index.html?id=7&utm_source=feed&ref=home#sec2"),
      // http default port, params out of order, no fragment
      (2L, "http://news.srcA0.com:80/Articles/3?utm_source=feed&ref=home&id=7"),
      // already canonical — must be a fixpoint
      (3L, "https://blog.srca0.com/Articles/3?id=7"),
      // non-default port survives; no params at all
      (4L, "https://blog.srca0.com:8443/Articles/9"))
      .toDF("doc_id", "url").withColumn("source", lit("srcA"))
    val out = WebPrep.canonicalizeUrls(urls)
      .select(col("doc_id"), col("canon_url"), col("domain"),
        col("n_dropped_params"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) ==
      "https://blog.srca0.com/Articles/3/?id=7")
    assert(out(1).getString(1) == "http://news.srca0.com/Articles/3?id=7")
    assert(out(2).getString(1) == "https://blog.srca0.com/Articles/3?id=7",
      "an already-canonical URL passes through unchanged")
    assert(out(3).getString(1) == "https://blog.srca0.com:8443/Articles/9",
      "a non-default port is preserved")
    assert(out.forall(_.getString(2) == "srca0.com"))
    assert(out.map(_.getLong(3)).toSeq == Seq(2L, 2L, 0L, 0L))
    // idempotence over the canonical output
    val again = WebPrep.canonicalizeUrls(
      urls.select(col("doc_id"), col("source"))
        .join(WebPrep.canonicalizeUrls(urls)
          .select(col("doc_id"), col("canon_url").as("url")), "doc_id"))
      .select(col("doc_id"), col("canon_url")).orderBy("doc_id").collect()
    assert(again.map(_.getString(1)).sameElements(out.map(_.getString(1))),
      "canonicalize(canonicalize(u)) == canonicalize(u)")
  }

  test("q119 property: invariants and idempotence hold over 200 random URLs") {
    import spark.implicits._
    // deterministic generator covering every noise axis independently:
    // scheme case, www, subdomain, host case, default/odd/no port,
    // index.html, param multiset + order, fragment
    val rnd = new scala.util.Random(42)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
    val urls = (1L to 200L).map { i =>
      val https = rnd.nextBoolean()
      val scheme = pick(Seq(if (https) "https" else "http",
        if (https) "HTTPS" else "HTTP"))
      val www = pick(Seq("", "www.", "WWW."))
      val host = pick(Seq("alpha", "Beta", "GAMMA")) +
        pick(Seq("", ".cdn")) + ".Site" + rnd.nextInt(3) + ".org"
      val port = pick(Seq("", if (https) ":443" else ":80", ":8080"))
      val path = pick(Seq("", "/a", "/a/b")) +
        pick(Seq("", "/index.html"))
      val params = rnd.shuffle(Seq(
        Some(s"id=${rnd.nextInt(50)}"),
        if (rnd.nextBoolean()) Some("utm_medium=email") else None,
        if (rnd.nextBoolean()) Some("ref=nav") else None,
        if (rnd.nextBoolean()) Some(s"page=${rnd.nextInt(9)}") else None)
        .flatten)
      val query = if (params.isEmpty) "" else "?" + params.mkString("&")
      val frag = pick(Seq("", "#top", "#s2"))
      (i, s"$scheme://$www$host$port$path$query$frag")
    }
    val df = urls.toDF("doc_id", "url").withColumn("source", lit("gen"))
    val out = WebPrep.canonicalizeUrls(df)
      .select(col("doc_id"), col("canon_url"), col("domain"))
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val (canon, domain) = (r.getString(1), r.getString(2))
      assert(canon.matches("^https?://.*"), s"lowercase scheme: $canon")
      val rest = canon.replaceFirst("^https?://", "")
      val hostPart = rest.takeWhile(c => c != '/' && c != '?')
      assert(hostPart == hostPart.toLowerCase, s"lowercase host: $canon")
      assert(!hostPart.startsWith("www."), s"www stripped: $canon")
      assert(!hostPart.endsWith(":443") && !hostPart.endsWith(":80"),
        s"default port stripped: $canon")
      assert(!canon.contains("#"), s"fragment dropped: $canon")
      assert(!canon.contains("utm_") && !canon.contains("ref="),
        s"tracking params dropped: $canon")
      if (canon.contains("?")) {
        val ps = canon.substring(canon.indexOf('?') + 1).split("&").toSeq
        assert(ps == ps.sorted, s"params sorted: $canon")
      }
      assert(domain.matches("^[a-z0-9]+\\.org$"), s"registered domain: $domain")
      assert(!domain.contains(":"), s"domain portless: $domain")
    }
    val again = WebPrep.canonicalizeUrls(
      df.select(col("doc_id"), col("source"))
        .join(WebPrep.canonicalizeUrls(df)
          .select(col("doc_id"), col("canon_url").as("url")), "doc_id"))
      .select(col("doc_id"), col("canon_url")).orderBy("doc_id").collect()
    assert(again.map(_.getString(1)).sameElements(out.map(_.getString(1))),
      "idempotent over the full random sample")
  }

  test("q147: a shared header across same-domain docs is boilerplate; a clean domain reports zeros") {
    import spark.implicits._
    // domain = source + (doc_id % 5) + '.com' under the synthesized
    // URLs: ids 0/5/10 land on acme0.com, ids 1/6 on acme1.com
    val header = (1 to 20).map(i => s"nav$i").mkString(" ")
    def tail(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (0L, "acme", s"$header ${tail("a")}"),
      (5L, "acme", s"$header ${tail("b")}"),
      (10L, "acme", s"$header ${tail("c")}"),
      (1L, "acme", tail("d")),
      (6L, "acme", tail("e"))).toDF("doc_id", "source", "text")
    val out = WebPrep.domainBoilerplate(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // acme0.com: 3 docs x 2 blocks; the header key recurs in 3 docs ->
    // 1 boiler key, 3 instances, 60 of 120 words = 5000 bp
    assert(out("acme0.com") == ((3L, 6L, 4L, 1L, 3L, 60L, 5000L)),
      s"acme0.com: ${out("acme0.com")}")
    // acme1.com: 2 unique docs, nothing repeats
    assert(out("acme1.com") == ((2L, 2L, 2L, 0L, 0L, 0L, 0L)),
      s"acme1.com: ${out("acme1.com")}")
  }

  test("q152: each mojibake family is counted by its own detector; clean text stays unflagged") {
    import spark.implicits._
    val docs = Seq(
      (0L, "s", "donâ€™t trust â€œthese quotes"),      // 2× cp1252
      (1L, "s", "cafÃ© and naÃ¯ve rÃ©sumÃ©"),          // 4× latin1
      (2L, "s", "oddÂ spacingÂ here"),                 // 2× nbsp
      (3L, "s", "bad � byte"),                         // 1× repl
      (4L, "s", "perfectly clean ascii text"),
      (5L, "clean", "nothing wrong at all")
    ).toDF("doc_id", "source", "mtext")
    val out = WebPrep.mojibakeReport(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // (n_docs, n_flagged, cp1252, latin1, nbsp, repl, flagged_bp)
    assert(out("s") == ((5L, 4L, 2L, 4L, 2L, 1L, 8000L)), s"s: ${out("s")}")
    assert(out("clean") == ((1L, 0L, 0L, 0L, 0L, 0L, 0L)),
      s"clean: ${out("clean")}")
  }

  test("q155: the hash-derived policy digit is reproduced and exactly the matching paths block") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, "acme", "some text"))
      .toDF("doc_id", "source", "text")
    def digitOf(domain: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"robots:$domain".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(14)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val out = WebPrep.robotsCompliance(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // independently recompute: domain acme<d%5>.com, article = doc_id/7,
    // blocked iff decimal(article) starts with the domain's digit
    val expected = (0L until 100L).groupBy(i => s"acme${i % 5}.com")
      .map { case (dom, ids) =>
        val d = digitOf(dom)
        dom -> ((ids.size.toLong, d,
          ids.count(i => (i / 7).toString.startsWith(d.toString)).toLong))
      }
    assert(out == expected, s"got $out\nexpected $expected")
    // sanity: at least one domain actually blocks something in this range
    assert(expected.values.exists(_._3 > 0L))
  }

  test("q147: the SAME block in different domains is not boilerplate (domain-scoped, not global)") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"w$i").mkString(" ")
    // ids 0 and 1 land on different domains (doc_id % 5 differs)
    val docs = Seq(
      (0L, "acme", shared),
      (1L, "acme", shared)).toDF("doc_id", "source", "text")
    val out = WebPrep.domainBoilerplate(docs).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(4) == 0L && r.getLong(5) == 0L,
        s"cross-domain block flagged in ${r.getString(0)}")
    }
  }
}
