package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Scrub, Sharding}

/** Specs for q129 blocklist filter, q130 interleave audit, q131 split
  * drift (the drift query is pinned by its oracle; here we pin the two
  * operators with planted inputs). */
class SafetyOrderDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q219: a length-driven score shows the hand-computed slope and r; zero-variance sources report 0") {
    // srcP: all-stopword docs of 2/4/8 words → y = 5100/5200/5400 at
    // x = 1/2/3 whole bits → slope 900/6 = 150.0, r = 900/√840000 = .982
    // srcC: two identical-length docs → x-variance 0 → both 0.0
    val docs = Seq(
      (0L, "srcP", "the and"),
      (1L, "srcP", "the and of to"),
      (2L, "srcP", "the and of to in is a the"),
      (3L, "srcC", "the and of"),
      (4L, "srcC", "the and is"))
      .map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
    val dir = TestDirs.scratch("qlbias")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q219_quality_length_bias")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("srcC", 2L, 0.0, 0.0),
      ("srcP", 3L, 150.0, 0.982)))
  }

  test("q220: a fully-sampled source gaps 0; weight skew tilts the sample measurably") {
    // srcF: 6 docs ≤ K=10 → the sample IS the corpus → every gap 0.
    // srcS: 15 weight-1 short docs vs 15 weight-7 long all-stopword
    // docs → the 10-doc sample over-draws the long bucket → L1 gap > 0.
    val short = Seq.fill(5)("zz").mkString(" ")
    val long = Seq.fill(32)("the").mkString(" ")
    val docs =
      (0 until 6).map(i => (i.toLong, "srcF",
        Seq.fill(5 + 4 * (i % 3))("qq").mkString(" "))) ++
      (0 until 15).map(i => (100L + i, "srcS", short)) ++
      (0 until 15).map(i => (200L + i, "srcS", long))
    val dir = TestDirs.scratch("samprep")
    docs.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q220_sample_representativeness")(
      spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out("srcF")._2 == 0L && out("srcF")._3 == 0L,
      "a fully-sampled source must show zero distribution gap")
    assert(out("srcS")._1 == 2L && out("srcS")._2 > 0L,
      "a weight-skewed source must show a measurable gap")
    // L1 over bp shares is bounded by 2×10⁴
    assert(out("srcS")._2 <= 20000L)
  }

  test("q129: per-category thresholds flag exactly the offending docs") {
    val t = Scrub.BlocklistThreshold
    val docs = Seq(
      // exactly t "slow" hits -> latency category reaches the threshold
      (1L, "a", Seq.fill(t)("slow").mkString(" ") + " table join"),
      // t-1 + t-1 split across categories -> neither reaches t, not flagged
      (2L, "a", (Seq.fill(t - 1)("slow") ++ Seq.fill(t - 1)("scan")).mkString(" ")),
      // clean doc
      (3L, "b", "table join merge"),
      // scan + sort sum to t scanheavy hits -> flagged
      (4L, "b", (Seq.fill(t - 4)("scan") ++ Seq.fill(4)("sort")).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = Scrub.blocklistFilter(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((2L, 1L, (2L * t) - 1L, t - 1L)))  // docs, flagged, latency, scanheavy
    assert(got("b") == ((2L, 1L, 0L, t.toLong)))
  }

  test("q130: runs partition the corpus; a one-source corpus is one run per block") {
    val mixed = spark.range(0, 300).select(col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("source"))
    val audit = Sharding.interleaveAudit(mixed).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(audit.map(_._2).sum == 300L)            // every doc in exactly one run
    for ((_, nDocs, nRuns, maxRun, bp) <- audit) {
      assert(nRuns >= 1 && nRuns <= nDocs && maxRun <= nDocs)
      assert(bp == nRuns * 10000 / nDocs && bp > 0 && bp <= 10000)
    }
    // degenerate order: single source -> exactly one run per touched block
    val solo = spark.range(0, 100).select(col("id").as("doc_id"),
      lit("only").as("source"))
    val nBlocks = solo
      .select(substring(md5(concat(lit("shuffle:"),
        col("doc_id").cast("string"))), 1, 2)).distinct().count()
    val soloAudit = Sharding.interleaveAudit(solo).collect().head
    assert(soloAudit.getLong(2) == nBlocks)
  }

  test("q133: a planted far vector is flagged as its cluster's top outlier") {
    val tight = Seq.fill(64)(1.0)
    val far = Seq.fill(64)(9.0)
    val rows = (0L to 14L).map(id => (id, tight)) :+ (15L, far)
    val emb = rows.toDF("vec_id", "embedding")
    val got = graft.ops.Clustering.embeddingOutliers(emb).collect()
    assert(got.map(_.getLong(1)).sum == 16L)          // every vector profiled
    val flagged = got.filter(_.getLong(3) > 0)
    assert(flagged.length == 1 && flagged.head.getLong(3) == 1L)
    assert(flagged.head.getLong(4) == 15L)            // the planted outlier
  }

  test("q138: planted multilingual texts land on the confusion diagonal") {
    val docs = Seq(
      (1L, "en", "the cat and the dog of the house is a friend"),
      (2L, "es", "el gato y la casa de los perros que corren"),
      (3L, "fr", "le chat et les chiens des maisons un jour une nuit"),
      (4L, "de", "der hund und die katze das haus ein garten zu gehen"),
      (5L, "zh", "zhe shi yi ge fangzi"))  // uncovered -> all-zero -> 'en'
      .toDF("doc_id", "lang", "text")
    val cells = graft.ops.TextOps.langIdConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val pred = cells.map(c => c._1 -> c._2).toMap
    assert(pred("en") == "en" && pred("es") == "es" &&
      pred("fr") == "fr" && pred("de") == "de")
    assert(pred("zh") == "en")  // the documented uncovered-language fall-through
    assert(cells.forall(_._4 == 10000L))  // one doc per lang: full row share
  }

  test("q130: audit is invariant under input repartitioning") {
    val docs = spark.range(0, 200).select(col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 4).cast("string")).as("source"))
    val a = Sharding.interleaveAudit(docs).collect().toSeq
    val b = Sharding.interleaveAudit(docs.repartition(13)).collect().toSeq
    assert(a == b)
  }

  test("q148: each marker fires on its notice, case-folded; multi-marker docs count once in n_flagged") {
    val docs = Seq(
      (1L, "a", "Copyright (C) 2020 Foo Corp. All Rights Reserved. body text"),
      (2L, "a", "Licensed under the Apache License, Version 2.0. body"),
      (3L, "a", "plain content with no notice at all"),
      (4L, "b", "shared under a Creative Commons license. body"))
      .toDF("doc_id", "source", "ltext")
    val got = Scrub.licenseNotices(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // source a: doc 1 fires copyright AND rights_reserved but counts
    // once in n_flagged; doc 3 is clean -> 2 of 3 flagged = 6666 bp
    assert(got("a") == ((3L, 1L, 1L, 1L, 0L, 2L, 6666L)), s"a: ${got("a")}")
    assert(got("b") == ((1L, 0L, 0L, 0L, 1L, 1L, 10000L)), s"b: ${got("b")}")
  }

  test("q169 winnowing: a shared ≥ k+w−1 token run guarantees a shared fingerprint; disjoint docs share none") {
    import graft.ops.TextOps
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 tokens
    val docs = Seq(
      (1L, s"one prefix here $run and one tail"),
      (2L, s"совершенно other start $run different ending text"),
      (3L, "completely unrelated words nowhere matching anything else four five six"))
      .toDF("doc_id", "text")
    val got = TextOps.winnowingFingerprints(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L)._2 >= 1L, s"doc1 shared: ${got(1L)}")
    assert(got(2L)._2 >= 1L, s"doc2 shared: ${got(2L)}")
    assert(got(3L)._2 == 0L, s"doc3 shared: ${got(3L)}")
    // compression: selected fingerprints are a strict subset of grams
    val full = TextOps.winnowingFingerprints(docs).collect()
    full.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("q170: copied docs pair with high overlap; the pair threshold suppresses singleton matches") {
    import graft.ops.TextOps
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, s"$base extra trailing words here"),   // near-copy of 1
      (3L, (100 to 130).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = TextOps.winnowingPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5)))
      .toMap
    val p = pairs.get((1L, 2L))
      .getOrElse(fail(s"copy pair (1,2) missing: $pairs"))
    assert(p._2 >= 9000L, s"overlap ${p._2}")   // ≥90% of the smaller sketch
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc must not pair")
  }

  test("q177: adjacent user→assistant turns become pairs; empty responses and role breaks drop") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "s", "user: q one || assistant: a one || user: q two || assistant: a two"),
      (2L, "s", "user: dangling || user: second ask || assistant: one answer"),
      (3L, "s", "user: asked || assistant: || user: again || assistant: replied"),
      (4L, "s", "no structure at all"))
      .toDF("doc_id", "source", "ctext")
    val r = TextOps.instructionPairs(docs).collect().head
    // doc1: 2 pairs; doc2: (second ask, one answer); doc3: empty response
    // dropped, (again, replied) kept -> 4 pairs from 3 docs
    assert((r.getLong(1), r.getLong(2)) == ((4L, 3L)), r.mkString(","))
    // prompt words: (2+2) + 2 + 1 = 7; response words: (2+2) + 2 + 1 = 7
    assert((r.getLong(3), r.getLong(4)) == ((7L, 7L)), r.mkString(","))
    assert(r.getLong(5) == 4L)
  }

  test("q165: each chat malformation lands in its own counter; prose is not chat") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "s", "user: a || assistant: b || user: c || assistant: d"), // wellformed
      (2L, "s", "user: a || user: b || assistant: c"),                  // role violation
      (3L, "s", "user: a || assistant: || user: c || assistant: d"),    // empty turn
      (4L, "s", "assistant: starts wrong || user: ends wrong"),         // shape violation
      (5L, "s", "plain prose with no structure at all"))
      .toDF("doc_id", "source", "ctext")
    val r = TextOps.chatTurnAudit(docs).collect().head
    // (n_docs, n_chat, n_role_violations, n_empty_turns, n_wellformed)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((5L, 4L, 1L, 1L, 1L)), r.mkString(","))
  }

  test("q166: a loop tail flags at the threshold; a loop in the middle does not") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "s", "normal text then loop loop loop loop"),      // run 4 -> flagged
      (2L, "s", "loop loop loop loop then normal end"),       // tail run 1
      (3L, "s", "three only loop loop loop"),                 // run 3 -> clean
      (4L, "t", "x"))                                         // single token, run 1
      .toDF("doc_id", "source", "ttext")
    val got = TextOps.tailRepetition(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got("s") == ((3L, 1L, 3333L, 4L)), s"s: ${got("s")}")
    assert(got("t") == ((1L, 0L, 0L, 1L)), s"t: ${got("t")}")
  }

  test("q158: a planted code-switching doc is mixed; monolingual docs are not") {
    import graft.ops.TextOps
    val docs = Seq(
      // en: the/and/of (3 hits) + es: el/la/de/que (4 hits) -> mixed
      (1L, "en", "the cat and the dog of el mundo la casa de que"),
      // pure en: 4 en hits, nothing else >= 3
      (2L, "en", "the quick fox and the dog of all things"),
      // pure de: der/die/und/das = 4 de hits
      (3L, "de", "der hund und die katze das haus der garten"))
      .toDF("doc_id", "lang", "text")
    val out = TextOps.languageMixing(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val en = out("en")
    assert(en._1 == 2L && en._2 == 1L && en._3 == 5000L, s"en: $en")
    // doc1: en hits = the,and,the,of = 4; es = el,la,de,que = 4 ->
    // secondary = total - max; doc2 secondary = non-en hits only
    val de = out("de")
    assert(de._2 == 0L && de._3 == 0L, s"de: $de")
  }

  test("q156: keyword-only python and symbol-only JSON both flag; prose flags neither rule") {
    val docs = Seq(
      // 4 keywords, zero class symbols -> keyword rule alone fires
      (1L, "py", "def f of x return x plus one import os then return again"),
      // 9 symbols in 26 chars (346/kchar), zero keywords -> density alone
      (2L, "js", "{ a: [1, 2], b: { c: 3 } }"),
      (3L, "txt", "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "source", "ctext")
    val got = Scrub.codeDetection(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got("py") == ((1L, 1L, 10000L, 0L, 4L)), s"py: ${got("py")}")
    assert(got("js") == ((1L, 1L, 10000L, 9L, 0L)), s"js: ${got("js")}")
    assert(got("txt") == ((1L, 0L, 0L, 0L, 0L)), s"txt: ${got("txt")}")
  }

  test("q156: the fixture plants code on exactly the doc_id % 9 == 2 docs") {
    val out = SparkEntry.queries("q156_code_detection")(
      spark, "/root/testdata/sf0.001").collect()
    val flagged = out.map(_.getLong(2)).sum
    val planted = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") % 9 === 2).count()
    assert(flagged >= planted, s"flagged $flagged < planted $planted")
  }

  test("q148: the synthesized fixture plants a notice on exactly the doc_id % 7 == 0 docs") {
    val out = SparkEntry.queries("q148_license_notices")(
      spark, "/root/testdata/sf0.001").collect()
    val flagged = out.map(_.getLong(6)).sum
    val expect = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") % 7 === 0).count()
    assert(flagged == expect, s"flagged $flagged != planted $expect")
  }

  /** md5-prefix hash exactly as the engine computes it (56-bit / mod m). */
  private def h56mod(s: String, m: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 14)
    java.lang.Long.parseLong(hex, 16) % m
  }

  test("q180: FIM segments tile the document exactly; AR docs pass through") {
    import graft.ops.TextOps
    val docs = (0L until 100L)
      .map(i => (i, s"document number $i with some body text to cut up " +
        ("x" * (i % 17).toInt)))
      .toDF("doc_id", "text")
    val textOf = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextOps.fimTransform(docs).collect()
    assert(out.length == 100)
    val modes = out.map(_.getString(1)).toSet
    assert(modes.subsetOf(Set("ar", "psm", "spm")) &&
      modes.contains("ar") && (modes.contains("psm") || modes.contains("spm")),
      s"modes: $modes")
    val md = java.security.MessageDigest.getInstance("MD5")
    for (r <- out) {
      val (id, mode, lp, lm, ls) = (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val t = textOf(id)
      assert(lp + lm + ls == t.length, s"doc $id segments don't tile")
      val expectAr = h56mod(s"fimr:$id", 2) == 1
      assert((mode == "ar") == expectAr, s"doc $id mode $mode")
      if (mode == "ar") {
        assert(lm == 0 && ls == 0 && lp == t.length)
        md.reset()
        val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        assert(r.getString(5) == hex, s"doc $id ar md5")
      } else {
        // reassemble from the hash-derived cuts and re-derive the md5
        val l = math.max(t.length, 1).toLong
        val c1 = h56mod(s"fim1:$id", l); val c2 = h56mod(s"fim2:$id", l)
        val (lo, hi) = (math.min(c1, c2).toInt, math.max(c1, c2).toInt)
        assert(lp == lo && lm == hi - lo && ls == t.length - hi)
        val (pre, mid, suf) =
          (t.substring(0, lo), t.substring(lo, hi), t.substring(hi))
        val s2 = if (mode == "psm") s"<PRE>$pre<SUF>$suf<MID>$mid"
                 else s"<SUF>$suf<PRE>$pre<MID>$mid"
        md.reset()
        val hex = md.digest(s2.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        assert(r.getString(5) == hex, s"doc $id $mode md5")
      }
    }
  }

  test("q178: a target-vocabulary doc outweighs a junk-vocabulary doc of the same length") {
    import graft.ops.CorpusStats
    val stopRun = "the and of to in is a"          // 7 stopwords
    val docs =
      // 5 stop-dense target docs (ratio 1 >= 1/8)
      (0L until 5L).map(i => (i, "s", (stopRun + " ") * 3 + stopRun)) ++
      // 30 junk docs: unique vocabulary, zero stopwords
      (10L until 40L).map(i => (i, "s",
        (0 until 28).map(j => s"junk${i}w$j").mkString(" "))) ++
      // probe A: target vocabulary but diluted below the target cut
      Seq((50L, "s", stopRun + " " + (0 until 50).map(j => s"fill$j")
        .mkString(" "))) ++
      // probe B: same shape, junk-only vocabulary
      Seq((51L, "s", (0 until 57).map(j => s"probe$j").mkString(" ")))
    val out = CorpusStats.dsirWeights(
      docs.toDF("doc_id", "source", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4), r.getLong(5)))
      .toMap
    for (i <- 0L until 5L) assert(out(i)._1 == 1L, s"doc $i not target")
    assert(out(50L)._1 == 0L && out(51L)._1 == 0L, "probes must not be target")
    // the target-vocab probe must score strictly above the junk probe
    assert(out(50L)._2 > out(51L)._2,
      s"w_units: target-ish ${out(50L)._2} !> junk ${out(51L)._2}")
    assert(out(50L)._3 > out(51L)._3, "wpt_milli must preserve the order")
  }

  test("q181: a consecutive rare run flags; scattered rare tokens do not") {
    import graft.ops.TextOps
    val common = "the table holds rows and columns here"
    val docs = Seq(
      // 6 consecutive corpus-unique tokens mid-text -> one run of 6
      (1L, s"$common sk1x sk2x sk3x sk4x sk5x sk6x $common"),
      // 4 unique tokens each separated by common words -> runs of 1
      (2L, "the uq1 table uq2 holds uq3 rows uq4 and columns"),
      // only common vocabulary -> zero rare tokens
      (3L, s"$common $common"))
      .toDF("doc_id", "text")
    val got = TextOps.rareTokenRuns(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    assert(got(1L) == ((6L, 1L, 6L, 1L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((4L, 0L, 1L, 0L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L, 0L)), s"doc3: ${got(3L)}")
  }

  test("q182: a train doc sharing a long run with an eval doc flags; clean train docs don't") {
    import graft.ops.TextOps
    // pick ids on each side of the q65 split hash
    val ids = (0L until 200L)
    val trainIds = ids.filter(i => h56mod(s"split:$i", 10) < 8)
    val evalIds = ids.filter(i => h56mod(s"split:$i", 10) >= 8)
    val leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def unique(i: Long) = (0 until 12).map(j => s"u${i}w$j").mkString(" ")
    val docs = Seq(
      (trainIds(0), s"${unique(900)} $leaked ${unique(901)}"),
      (evalIds(0), s"${unique(902)} $leaked ${unique(903)}"),
      (trainIds(1), unique(904) + " " + unique(905)))
      .toDF("doc_id", "text")
    val got = TextOps.winnowDecontam(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.contains(trainIds(0)) && got(trainIds(0)) > 0,
      s"leaky train doc missing: $got")
    assert(!got.contains(trainIds(1)), s"clean train doc flagged: $got")
    assert(!got.contains(evalIds(0)), "eval docs must not appear")
  }

  test("q183: a dup cluster spanning naive splits lands in one split; moves are counted") {
    import graft.ops.Dedup
    // identical long docs -> q33 candidate pairs -> one q54 cluster
    val dupBody = (0 until 40).map(j => s"body$j word$j").mkString(" ")
    val dupIds = Seq(11L, 12L, 13L, 14L, 15L)
    def fill(i: Long) = (0 until 40).map(j => s"f${i}x$j").mkString(" ")
    val docs = (dupIds.map(i => (i, "s", dupBody)) ++
      (100L until 110L).map(i => (i, "s", fill(i))))
      .toDF("doc_id", "source", "text")
    val out = Dedup.leakageSafeSplit(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.values.map(_._1).sum == docs.count(), "docs conserved")
    // every dup doc follows the representative's split
    def cls(b: Long) = if (b < 8) "train" else if (b == 8) "validation" else "test"
    val repSplit = cls(h56mod(s"split:${dupIds.min}", 10))
    val movedExpect = dupIds.count(i => cls(h56mod(s"split:$i", 10)) != repSplit)
    val moved = out.values.map(_._3).sum
    assert(moved == movedExpect, s"moved $moved != expected $movedExpect")
    // the cluster's docs all sit in repSplit: that split holds >= 5 docs
    assert(out(("s", repSplit))._1 >= dupIds.size,
      s"cluster not together: $out")
  }

  test("q182 substrate: the per-row array form selects exactly the window form's fingerprints") {
    import graft.ops.TextOps
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (0L until 60L).map { i =>
      val n = 3 + rnd.nextInt(30)  // includes docs below the 7-token floor
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val winForm = TextOps.winnowFps(docs)._1.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rowForm = TextOps.rowWinnowFps(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rowForm == winForm,
      s"diff: ${(rowForm diff winForm) ++ (winForm diff rowForm)}")
  }

  test("q184: the stop-dense decile carries higher DSIR weight than the junk decile") {
    import graft.ops.CorpusStats
    val stopRun = "the and of to in is a"
    val docs =
      (0L until 8L).map(i => (i, "s", (stopRun + " ") * 3 + stopRun)) ++
      (10L until 40L).map(i => (i, "s",
        (0 until 28).map(j => s"junk${i}w$j").mkString(" ")))
    val out = CorpusStats.dsirQualityAgreement(
      docs.toDF("doc_id", "source", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val hi = out.keys.max; val lo = out.keys.min
    assert(hi > lo, s"need two deciles, got $out")
    assert(out(hi)._3 > out(lo)._3,
      s"mean_wpt: hi ${out(hi)._3} !> lo ${out(lo)._3}")
    assert(out(hi)._2 >= out(lo)._2, s"pos_bp ordering: $out")
  }

  test("q185: a label whose membership shift moves vectors drifts; a constant label doesn't") {
    import graft.ops.Snapshot
    val dims = 8
    val rows = (0L until 88L).map { id =>
      val label = (id % 2).toInt
      val v: Seq[Double] =
        if (label == 0) Seq.fill(dims)(0.25)             // constant everywhere
        else {
          // hot docs exist ONLY in the current snapshot (added residue),
          // so the current centroid moves while the previous stays put
          val hot = if (id % Snapshot.SnapMod == Snapshot.AddedRes) 0.9
            else 0.1
          hot +: Seq.fill(dims - 1)(0.1)
        }
      (id, v, label)
    }
    val out = Snapshot.embeddingDrift(rows.toDF("vec_id", "embedding", "label"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val all0 = rows.count(_._3 == 0).toLong
    val ex0p = rows.count(r => r._3 == 0 &&
      r._1 % Snapshot.SnapMod == Snapshot.AddedRes).toLong
    val ex0c = rows.count(r => r._3 == 0 &&
      r._1 % Snapshot.SnapMod == Snapshot.RemovedRes).toLong
    assert(out(0L)._1 == all0 - ex0p && out(0L)._2 == all0 - ex0c,
      s"label0 membership: ${out(0L)}")
    assert(out(0L)._3 == 0L, s"constant label must not drift: ${out(0L)}")
    assert(out(1L)._3 > 0L, s"shifted label must drift: ${out(1L)}")
  }

  test("q186: priorities are the documented surrogate; heavier docs outrank on equal draws") {
    import graft.ops.CorpusStats
    val stopRun = "the and of to in is a"
    val docs =
      (0L until 5L).map(i => (i, "s", (stopRun + " ") * 3 + stopRun)) ++
      (10L until 40L).map(i => (i, "s",
        (0 until 28).map(j => s"junk${i}w$j").mkString(" ")))
    val df = docs.toDF("doc_id", "source", "text")
    val out = CorpusStats.dsirResample(df).collect()
    assert(out.length <= CorpusStats.DsirSampleK)
    val wpt = CorpusStats.dsirWeights(df).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    for (r <- out) {
      val (id, w, p) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(w == math.max(wpt(id) + 1000L, 1L), s"weight of doc $id")
      assert(p == h56mod(s"dsamp:$id", Long.MaxValue) / w ||
        p == parse56(s"dsamp:$id") / w, s"priority of doc $id")
    }
    // determinism: a second run reproduces the identical sample
    val again = CorpusStats.dsirResample(df).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  private def parse56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 14)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q187: every pick meets its recall target at the minimal candidate cost") {
    import graft.ops.Dedup
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, sf, "documents")
    // rows_per_band is IntegerType (BandingConfigs: Seq[Int]) — read as
    // int, widen on the driver; the long columns are counts/bp ratios.
    val sweep = Dedup.bandingSweep(docs).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(2), r.getLong(5))).toSeq // (rpb, nc, recall)
    val picks = SparkEntry.queries("q187_banding_operating_point")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(3), r.getLong(5)))
    assert(picks.length == Dedup.BandRecallTargetsBp.length)
    for ((target, rpb, nc, recall) <- picks) {
      assert(recall >= target, s"target $target: picked recall $recall")
      val cheaper = sweep.filter { case (_, c, rec) =>
        rec >= target && c < nc }
      assert(cheaper.isEmpty,
        s"target $target: cheaper feasible config exists: $cheaper")
    }
  }

  test("q117: the round-13 verdict columns are present and keep is their conjunction") {
    val out = SparkEntry.queries("q117_curation_ledger_full")(
      spark, "/root/testdata/sf0.001")
    val cols = out.columns.toSeq
    assert(cols.contains("is_secret_risk") && cols.contains("is_winnow_leak"))
    val rows = out.collect()
    for (r <- rows) {
      val flags = Seq("is_exact_dup", "is_sem_dropped", "is_contaminated",
        "is_image_dup", "is_decontam_hit", "is_chunk_dup",
        "is_span_contam", "is_blocklisted", "is_secret_risk",
        "is_winnow_leak").map(c => r.getInt(cols.indexOf(c)))
      val keepExpect =
        if (flags.forall(_ == 0) &&
          r.getDouble(cols.indexOf("quality_score")) >= 0.5) 1 else 0
      assert(r.getInt(cols.indexOf("keep")) == keepExpect,
        s"doc ${r.getLong(0)} keep mismatch")
    }
    assert(rows.exists(r => r.getInt(cols.indexOf("is_secret_risk")) == 1) ||
      rows.exists(r => r.getInt(cols.indexOf("is_winnow_leak")) == 1) ||
      rows.nonEmpty)
  }

  test("q179: held-out members of tight single-label clusters vote their own label") {
    import graft.ops.Similarity
    // 4 clusters x 25 vectors, one label each, tiny deterministic jitter
    // so neighbors are cluster-mates with overwhelming probability
    val rows = for (c <- 0 until 4; i <- 0 until 25) yield {
      val id = (c * 25 + i).toLong
      val base = Array.fill(64)(0.0)
      base(c) = 10.0; base((c + 7) % 64) = 5.0
      base(16 + (i % 8)) += 0.01 * ((i % 5) + 1)
      (id, base.toSeq, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelEval(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val nHeld = rows.count { case (id, _, _) => h56mod(s"lp:$id", 5) == 0 }
    assert(out.values.sum == nHeld, s"confusion mass ${out.values.sum} != $nHeld")
    val diag = out.collect { case ((t, p), n) if t == p => n }.sum
    val offdiag = out.collect { case ((t, p), n) if t != p && p != -1 => n }.sum
    assert(diag > offdiag * 3,
      s"diagonal $diag not dominant over $offdiag in $out")
  }
}
