package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Dedup, Snapshot, TextOps}
// q162 spec lives beside the other snapshot tests below

/** Specs for the round's new curation operators: q125 snapshot diff,
  * q126 cluster-size histogram, q127 vocabulary growth, q128
  * contamination run-lengths. */
class SnapshotGrowthSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q125: snapshot diff classifies added/removed/changed/unchanged by hash") {
    val prev = Seq(
      (1L, "s", "h1", 10L), (2L, "s", "h2old", 8L), (3L, "s", "h3", 5L))
      .toDF("doc_id", "source", "h", "n_chars")
    val cur = Seq(
      (1L, "s", "h1", 10L), (2L, "s", "h2new", 9L), (4L, "s", "h4", 7L))
      .toDF("doc_id", "source", "h", "n_chars")
    val got = Snapshot.snapshotDiff(prev, cur)
      .select("doc_id", "status", "n_chars")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> ("unchanged", 10L),
      2L -> ("changed", 9L),     // current side's byte mass
      3L -> ("removed", 5L),     // previous side's byte mass
      4L -> ("added", 7L)))
  }

  test("q125: the synthesized snapshots land every residue class on its status") {
    val docs = spark.range(0, 44).select(col("id").as("doc_id"),
      lit("s").as("source"),
      concat_ws(" ", lit("alpha beta gamma delta"),
        col("id").cast("string")).as("text"))
    val got = Snapshot.snapshotDiff(
      Snapshot.previousSnapshot(docs), Snapshot.currentSnapshot(docs))
    val byStatus = got.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 44 ids = 4 full mod-11 cycles: 4 added, 4 removed, 4 changed
    assert(byStatus("added") == 4 && byStatus("removed") == 4 &&
      byStatus("changed") == 4 && byStatus("unchanged") == 32)
  }

  test("q218: an added doc is all-new, a changed doc's tail gram is new, a stable doc adds nothing") {
    val docs = Seq(
      // res 0: identical in both snapshots → 0 new grams
      (0L, "sA", (1 to 9).map(i => s"a$i").mkString(" ")),
      // res 3 (changed): prev drops the last word → the tail gram is new
      (3L, "sB", (1 to 9).map(i => s"b$i").mkString(" ")),
      // res 7 (added): absent from prev → both grams new
      (7L, "sC", (1 to 9).map(i => s"c$i").mkString(" ")))
      .map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestDirs.scratch("snapnovel")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q218_snapshot_gram_novelty")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq(
      ("sA", 2L, 0L, 0L),
      ("sB", 2L, 1L, 5000L),
      ("sC", 2L, 2L, 10000L)))
  }

  test("q126: planted dup clusters land in size buckets; doc mass is conserved") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 30).map(i => s"v$i").mkString(" ")
    val uniq = (1 to 30).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, words), (2L, words), (3L, words),  // cluster of 3
      (4L, other), (5L, other),               // cluster of 2
      (6L, uniq))                             // singleton
      .toDF("doc_id", "text")
    val hist = Dedup.clusterSizeHistogram(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hist(1L) == ((1L, 1L)))   // one singleton
    assert(hist(2L) == ((2L, 5L)))   // sizes 3 and 2 both bucket to 2
    assert(hist.values.map(_._2).sum == 6L)  // every doc counted once
  }

  test("q127: growth curve is monotone and its last point is the exact total") {
    val docs = Seq(
      (1L, "a", "x y"), (2L, "a", "y z"), (3L, "a", "x z w"),
      (4L, "b", "p p p"))
      .toDF("doc_id", "source", "text")
    val rows = CorpusStats.vocabGrowth(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._1)
    // source a: 3 docs -> prefixes 1,2,4; totals 7 tokens, 4 distinct
    val a = bySrc("a").sortBy(_._2)
    assert(a.map(_._2).toSeq == Seq(1L, 2L, 4L))
    assert(a.last._3 == 7L && a.last._4 == 4L)
    // source b: 1 doc -> one prefix, 3 tokens, 1 distinct term
    val b = bySrc("b")
    assert(b.map(_._2).toSeq == Seq(1L) && b.head._3 == 3L && b.head._4 == 1L)
    // monotone non-decreasing along every curve
    for (curve <- Seq(a, b); Seq(p, n) <- curve.sliding(2).map(_.toSeq).toSeq
         if curve.length > 1) {
      assert(p._3 <= n._3 && p._4 <= n._4)
    }
  }

  test("q128: a verbatim 10-word quote yields a 7-gram run; scattered hits stay runs of 1") {
    val quote = (1 to 10).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (0L, "ev", quote),
      (10L, "tr", s"t1 t2 t3 $quote t4 t5"),
      (11L, "tr", "x1 q1 q2 q3 q4 x2 x3 q6 q7 q8 q9 x4"),
      (12L, "tr", "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "source", "text")
    val got = TextOps.contaminationSpans(docs, evalSource = "ev")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(10L) == ((7L, 7L, 10L)))  // 7 consecutive grams = 10 words
    assert(got(11L) == ((2L, 1L, 4L)))   // two isolated grams
    assert(!got.contains(12L))           // clean doc emits nothing
  }

  test("q162: quality drift catches the changed class; an all-unchanged source drifts 0") {
    import spark.implicits._
    // residues mod 11: ids 0,1,2 (unchanged in src u), 3 (changed in c),
    // 7 (added in c), 5 (removed in c). Changed doc's previous text has
    // one more stopword ('the' is the dropped last word), so prev
    // quality > cur quality for source c.
    val stop = "the and of in is"   // high-stopword base
    val docs = Seq(
      (0L, "u", s"$stop words here"), (1L, "u", s"$stop again now"),
      (2L, "u", s"$stop third doc"),
      (3L, "c", s"plain words entirely without common ones the"),
      (7L, "c", s"plain text no stopwords at all"),
      (5L, "c", s"$stop removed doc"))
      .map { case (i, src, t) => (i, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestDirs.scratch("graft-drift")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q162_quality_drift")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5)))
      .toMap
    assert(out("u") == ((3L, 3L, 0L)), s"u: ${out("u")}")
    val (pc, cc, drift) = out("c")
    assert(pc == 2L && cc == 2L, s"c counts: $pc/$cc")   // 5 prev-only, 7 cur-only
    // removal of the high-stopword doc 5 plus arrival of the stopword-free
    // doc 7 must drag source c's mean quality down between snapshots
    assert(drift < 0L, s"source c must drift negative: $drift")
  }

  test("q163: a single-source corpus yields pure clusters (top share 10000, zero mix entropy)") {
    import spark.implicits._
    val rnd = new scala.util.Random(163)
    val n = 64
    val emb = (0L until n).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val docs = (0L until n).map(i => (i, s"text $i", "en", "only", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestDirs.scratch("graft-mix")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q163_cluster_source_mix")(spark, dir)
      .collect()
    assert(rows.map(_.getLong(1)).sum == n, "members must partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(2) == 1L && r.getLong(3) == 10000L && r.getLong(4) == 0L,
        s"cluster ${r.getLong(0)}: ${r.mkString(",")}")
    }
  }

  test("q173: Heaps exponents land strictly inside (0, 1) on real text; a repeated-doc source collapses toward 0") {
    import spark.implicits._
    val fits = graft.ops.CorpusStats.heapsFit(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"))
      .collect()
    assert(fits.nonEmpty)
    // whole-bit logs on a tiny sf0.001 source can legitimately flatten
    // to b = 0; sublinear (≤ 1) is the hard invariant
    fits.foreach { r =>
      val b = r.getLong(2)
      assert(b >= 0L && b <= 1000L,
        s"${r.getString(0)}: Heaps b $b outside [0, 1000] milli")
    }
    // a source that repeats ONE document contributes no new vocabulary
    // after its first bucket — its exponent must sit far below a
    // fresh-vocabulary source's
    val tmpl = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = ((0L until 64L).map(i => (i, tmpl, "rep")) ++
      (100L until 164L).map(i =>
        (i, (0 to 39).map(j => s"w${i}_$j").mkString(" "), "fresh")))
      .toDF("doc_id", "text", "source")
    val f2 = graft.ops.CorpusStats.heapsFit(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(f2("rep") < f2("fresh"),
      s"rep ${f2("rep")} should collapse below fresh ${f2("fresh")}")
  }

  test("q150: base-card-plus-delta equals the directly computed current card, with every diff class exercised") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // the synthesis must land adds, removals AND changes, or the
    // invertibility claim goes untested
    val statuses = Snapshot
      .snapshotDiff(Snapshot.previousSnapshot(docs), Snapshot.currentSnapshot(docs))
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("added", "removed", "changed", "unchanged"))
    val inc = SparkEntry.queries("q150_incremental_datacard")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val direct = Snapshot.currentSnapshot(docs)
      .withColumn("k", expr("""cast(conv(substring(md5(concat('snap:',
        cast(doc_id as string), ':', h)), 1, 14), 16, 10) as long)"""))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        expr("bit_xor(k)").as("sig"))
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(inc.toSeq == direct.toSeq)
  }
}
