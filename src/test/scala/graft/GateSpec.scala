package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates that turn past round-losing bug CLASSES into failing tests:
  * DuckDB HUGEINT leaking into the driver's hash compare (q25 round 1,
  * q53 round 2) and crashed queries benching as ~0 s. */
class OracleHygieneSpec extends AnyFunSuite {

  /** (start, end) spans of every `sum(`'s balanced argument in `sql`. */
  private def sumArgs(sql: String): Seq[(Int, Int)] = {
    val lower = sql.toLowerCase
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = lower.indexOf("sum(")
    while (i >= 0) {
      var j = i + 3 // at the opening paren
      var depth = 0
      var end = -1
      while (j < sql.length && end < 0) {
        sql.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = j
          case _   =>
        }
        j += 1
      }
      if (end > 0) out += ((i + 4, end))
      i = lower.indexOf("sum(", j)
    }
    out.toSeq
  }

  /** Integer-valued: a CASE whose THEN/ELSE branches are all integer
    * literals (DuckDB types such a sum HUGEINT). A CASE over a double
    * column (`THEN value`) is fine. */
  private def isIntegerCase(arg: String): Boolean = {
    val branches = """(?is)(?:THEN|ELSE)\s+(\S+)""".r
      .findAllMatchIn(arg).map(_.group(1)).toSeq
    branches.nonEmpty && branches.forall(_.matches("-?\\d+"))
  }

  // The simhash signed bit sums (shared CTE of q34/q62, also embedded in
  // q82's pre-cap band recount) are consumed ONLY by `b >= 0` comparisons
  // inside the oracle — HUGEINT never reaches an output column (the
  // signature itself is a sum of integer LITERALS, q62's hamming is
  // bit_count, and q82's report sums are all CAST to BIGINT). All three
  // queries hash-match.
  private val consumedInternally =
    Set("q34_simhash_signatures", "q62_simhash_neardup", "q82_lsh_cap_report")

  /** Known-integer column/function shapes (token counts, term
    * frequencies, list lengths, counts): DuckDB types their sum HUGEINT
    * exactly like the integer CASE. Name-based because a static gate
    * cannot see column types; the n_/tf/cnt prefixes are this repo's
    * integer-column naming convention. */
  private def isIntegerColumn(arg: String): Boolean =
    "(?is)^\\s*(tf|n_\\w+|cnt\\w*|len\\s*\\(.*|count\\s*\\(.*)\\s*$".r
      .matches(arg)

  test("integer sum(CASE...) in every oracle is CAST to BIGINT or folded into a double") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        if (consumedInternally(name)) Nil
        else sumArgs(sql).flatMap { case (start, end) =>
          val arg = sql.substring(start, end)
          if (!isIntegerCase(arg) && !isIntegerColumn(arg)) None
          else {
            val prefix = sql.substring(0, start - 4) // text before "sum("
            val suffix = sql.substring(end + 1)      // text after ")"
            val castWrapped = "(?is).*CAST\\(\\s*$".r.matches(prefix)
            val foldedToDouble = "(?is)^\\s*\\*\\s*1\\.0.*".r.matches(suffix)
            if (castWrapped || foldedToDouble) None
            else Some(s"$name: sum(${arg.trim.take(60)}...)")
          }
        }
    }
    assert(offenders.isEmpty,
      s"HUGEINT-hazard sums (wrap in CAST(... AS BIGINT)): $offenders")
  }

  test("the gate itself recognizes the round-2 q53 bug shape") {
    val bad = "SELECT sum(CASE WHEN x < 2 THEN 1 ELSE 0 END) AS n FROM t"
    val args = sumArgs(bad)
    assert(args.size == 1)
    val arg = bad.substring(args.head._1, args.head._2)
    assert(isIntegerCase(arg))
    assert(!isIntegerCase("CASE WHEN event_type = 'click' THEN value END"))
    // integer-column shapes (q65/q66 class) vs double columns
    assert(isIntegerColumn("n_tokens"))
    assert(isIntegerColumn("tf"))
    assert(isIntegerColumn("len(string_split_regex(text, ' '))"))
    assert(!isIntegerColumn("value"))
    assert(!isIntegerColumn("l_quantity"))
    assert(!isIntegerColumn("new_sess"))
  }
}

/** COVERAGE.md's headline counts went stale in round 4 (said 68/67 while
  * the engine served 80/78); this pins the doc to the code so it cannot
  * drift again. */
class CoverageDocSpec extends AnyFunSuite {
  test("COVERAGE.md headline counts match SparkEntry") {
    val txt = scala.io.Source.fromFile("COVERAGE.md", "UTF-8")
    val head = try txt.mkString finally txt.close()
    val m = """(\d+) queries total: (\d+) oracle-checked""".r
      .findFirstMatchIn(head)
      .getOrElse(fail("COVERAGE.md headline count sentence not found"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"COVERAGE.md says ${m.group(1)} queries; engine serves ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"COVERAGE.md says ${m.group(2)} oracle-checked; engine has ${SparkEntry.oracleSql.size}")
  }

  test("README.md query counts match SparkEntry (went stale at 68 in round 5)") {
    val txt = scala.io.Source.fromFile("README.md", "UTF-8")
    val head = try txt.mkString finally txt.close()
    val m = """(\d+) named queries""".r.findFirstMatchIn(head)
      .getOrElse(fail("README.md query count sentence not found"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README.md says ${m.group(1)} queries; engine serves ${SparkEntry.queries.size}")
    val o = """\((\d+) oracle-checked""".r.findFirstMatchIn(head)
      .getOrElse(fail("README.md oracle count not found"))
    assert(o.group(1).toInt == SparkEntry.oracleSql.size,
      s"README.md says ${o.group(1)} oracle-checked; engine has ${SparkEntry.oracleSql.size}")
  }
}

/** Scale-posture gate over EVERY query's physical plan: no cartesian
  * product anywhere, and broadcast nested-loop joins only where the build
  * side is O(1) rows by construction. A regression that drops a join to a
  * cartesian (the round-1 q41 bug) fails here, not in a bench review. */
class PlanGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Deliberate tiny-build-side nested loops:
    *   - q32/q51/q63: crossJoin with a ONE-ROW aggregate (corpus size /
    *     doc count / funnel totals) to make a scalar available;
    *   - q35: the broadcast query set joined under an inequality
    *     (vec_id <> query_id) — |Q| is small by definition;
    *   - q43: the 16-centroid relation replicated to assign cells;
    *   - q70: the K=8 centroid relation broadcast for k-medians
    *     assignment (same shape as q43 — the build side is the cluster
    *     count, a constant, never the corpus);
    *   - q79: the K-label centroid relation self-joined under
    *     `label_a < label_b` for the pairwise affinity matrix — both
    *     sides are label-count-sized, a constant, never the corpus;
    *   - q82: shingleGroupCounts crossJoins the ONE-ROW doc-count
    *     aggregate (same scalar-availability shape as q32);
    *   - q85: the K=8 seed-centroid relation broadcast for the SemDeDup
    *     cluster assignment (the q43/q70 shape — build side is the
    *     cluster count, a constant; the pair join itself is an equi-join
    *     on cluster_id);
    *   - q87: the ONE-ROW normalizer/total-tokens aggregate crossJoined
    *     back onto the |sources| rows (the q32/q63 scalar shape);
    *   - q89: the ONE-ROW corpus-token total crossJoined onto the vocab
    *     (same scalar shape);
    *   - q90: embeds q85's centroid assignment (the K-row build side);
    *   - q92: embeds q32's jaccardPairs (the one-row doc-count scalar);
    *   - q94: embeds q85's centroid assignment (the K-row build side);
    *   - q97: the 16 PERSISTED centroids replicated to probe the query
    *     set (q43's shape read back from parquet);
    *   - q98: the same persisted-centroid relation replicated twice —
    *     once to assign the delta batch, once to probe the queries.
    * Everything else must ride hash/sort-merge equi-joins. */
  private val bnljAllowed = Set("q32_dedup_ngram_jaccard", "q35_cosine_topk",
    "q43_ivf_ann_topk", "q51_tfidf_top_terms", "q63_conversion",
    "q70_kmedians_clusters", "q79_label_affinity", "q82_lsh_cap_report",
    "q85_semantic_dedup", "q87_mixture_weights", "q89_unigram_surprisal",
    "q90_curation_ledger", "q92_split_leakage", "q94_cluster_balanced_sample",
    "q97_ivf_index_topk", "q98_ivf_incremental_topk",
    // q132: compaction reuses q98's two O(1)-build broadcasts — the
    // 16 persisted centroids replicated to assign the delta during the
    // rewrite and to probe the queries at serve time
    "q132_ivf_compact_topk",
    // q133: the outlier report runs q70's two broadcast assigns (K-row
    // centroid build side, a constant)
    "q133_embedding_outliers",
    // q139: the ONE-ROW training-corpus total crossJoined onto the
    // ≤16-row threshold histogram (the q87/q105 scalar shape)
    "q139_contamination_threshold_sweep",
    // q101: q85's regime probe — the coarse-centroid broadcast (k1 tiny
    // rows) is the same K-row build side as q85's flat path
    "q101_semantic_dedup_hier",
    // q102: the recall report embeds q35's inequality-broadcast exact
    // side and q43's 16-centroid assignment wholesale — both build
    // sides are O(1) by the same arguments as above
    "q102_ann_recall",
    // q105: the ONE-ROW train-token total crossJoined onto the scored
    // validation pairs (the q89 scalar shape)
    "q105_bigram_lm_score",
    // q109: pqEncode runs the q70 assign (8-centroid broadcast, K-row
    // build side) once per subspace, and the per-subspace LUT crossJoins
    // the 10-query side with the 8-row codebook — both O(1) builds
    "q109_pq_ann_topk",
    // q110: the 32-row FIXED-SIZE eval set broadcast against the corpus
    // (benchmarks don't grow with the training corpus — the q35 shape)
    "q110_semantic_decontam",
    // q112: the ONE-ROW normalizer/total-tokens aggregate crossJoined
    // back onto the grid rows (q87's scalar shape, cell-keyed)
    "q112_mixture_grid",
    // q113: the K-centroid relation broadcast for the all-distance join
    // (q70's assign shape — build side is the cluster count, a constant)
    "q113_cluster_quality",
    // q116: the nprobe sweep embeds q35's inequality-broadcast exact
    // side and q43's 16-centroid assignment once (the q102 argument);
    // the four sweep points are filters over that one candidate frame
    "q116_ivf_nprobe_sweep",
    // q117: the extended ledger embeds q85's K-row centroid assignment
    // (q90's shape) and q110's 32-row fixed-size eval-set broadcast —
    // both O(1) build sides by the arguments above
    "q117_curation_ledger_full",
    // q121: five prefix-dim passes of q35's inequality-broadcast exact
    // top-k — the 10-query build side is O(1) by the q35 argument
    "q121_matryoshka_recall",
    // q123: embeds q105's ONE-ROW train-token total crossJoin plus its
    // own ONE-ROW sweep-totals crossJoin onto the ≤few-dozen-row bpw
    // histogram (the q87/q89 scalar shape twice)
    "q123_lm_filter_sweep",
    // q141: the ONE-ROW corpus-doc total crossJoined onto the ≤21-row
    // Jaccard-grid histogram (the q78/q123 scalar shape)
    "q141_jaccard_threshold_sweep",
    // q142: the ONE-ROW truth-total aggregate crossJoined onto the
    // 4-row banding-config frame (the q87/q89 scalar shape)
    "q142_lsh_banding_sweep",
    // q144: the ONE-ROW (N, A) corpus-stats aggregate crossJoined onto
    // the matched (query-term, doc) pairs (the q89 scalar shape); the
    // query workload itself rides broadcast EQUI-joins
    "q144_bm25_retrieval",
    // q145: embeds the same shared scored-candidates pass as q144 —
    // the identical ONE-ROW (N, A) crossJoin; the fusion itself is
    // windows over ≤2·depth rows per query, no further joins
    "q145_rrf_fusion",
    // q146: eight ONE-ROW v-frame broadcasts (one per power-iteration
    // round) crossJoined onto the quantized corpus — the q87/q89
    // scalar shape, one row of 64 longs per round by construction
    "q146_principal_component",
    // q159: the 10-query set broadcast under the vec_id <> query_id
    // inequality — exactly q35's O(1)-build shape (hard negatives are
    // mined from the same exact ranking the positives come from)
    "q159_hard_negatives",
    // q188: the quantized AND exact sides each ride q35's 10-query
    // inequality broadcast — both build sides O(1) by the q35 argument
    "q188_sq_ann_recall",
    // q190: two ONE-ROW crossJoins (corpus totals, uncapped-prefix
    // stats) onto the |sources|-row grid — the q87/q89 scalar shape
    "q190_token_budget_waterfill",
    // q163: rides assignClusters' K-row centroid broadcast (the
    // q70/q85 shape — build side is the cluster count, a constant)
    "q163_cluster_source_mix",
    // q167: the ONE-ROW corpus-total aggregate crossJoined onto the
    // ≤~40-row bucket histogram (q141's scalar shape for the cosine axis)
    "q167_cosine_threshold_sweep",
    // q168: the ONE-ROW corpus-token total crossJoined onto the
    // source-vocab rows (the q89 scalar shape)
    "q168_source_divergence",
    // q174: the |sources|-row top-k-size relation self-joined under
    // source_a < source_b for the pairwise matrix — both sides are
    // source-count-sized, a constant (the q79 label-affinity shape)
    "q174_source_similarity",
    // q171: the 4-row budget relation crossJoined onto the ≤~40-row
    // sweep frame and matched under an inequality — both sides O(1)
    // by construction (q167's histogram is bucket-count-sized)
    "q171_dedup_operating_point",
    // q178: two ONE-ROW totals crossJoins (raw/target token counts)
    // onto the DsirBuckets-row stats LUT — the q87/q89 scalar shape;
    // the per-doc weight join itself is a broadcast EQUI-join on the
    // fixed-size bucket key
    "q178_dsir_weights",
    // q184: embeds q178's weight pipeline wholesale — the same two
    // O(1)-row totals crossJoins; the decile join is a doc_id equi-join
    "q184_dsir_quality_agreement",
    // q186: embeds q178's weight pipeline (same two scalar crossJoins);
    // the sampling itself is a projection + per-source rank window
    "q186_dsir_resample",
    // q187: the 3-row recall-target relation crossJoined onto the 4-row
    // q142 sweep frame under an inequality — both sides O(1) by
    // construction (q171's budget-pick shape on the banding axis)
    "q187_banding_operating_point",
    // q75: two ONE-ROW crossJoins by construction — the sizing
    // aggregate m and the folded bloom bit-array row the native probe
    // reads (the whole filter is a single broadcast row; the gram
    // stream itself never joins)
    "q75_bloom_decontam",
    // q192/q193: the same one-row filter rows (one per swept budget in
    // q193) plus the one-row probe/true totals — every crossJoin build
    // side is a single row by construction
    "q192_bloom_fp_audit",
    "q193_bloom_sizing_sweep",
    // q196: the |sources|-row sketch-source relation self-joined under
    // source_a < source_b (the q79/q174 affinity shape — both sides are
    // source-count-sized, a constant; every sketch-carrying join is a
    // broadcast EQUI-join on the pair key)
    "q196_vocab_overlap_kmv",
    // q198: three ONE-ROW per-stage aggregates crossJoined to assemble
    // the funnel report (q63's scalar shape; every stage join on the
    // event stream is a user_id EQUI-join)
    "q198_funnel",
    // q206: the ONE-ROW basket total crossJoined onto the ≤|types|²-row
    // lift matrix (the q168 scalar shape; the basket self-join and both
    // type-count joins are EQUI-joins)
    "q206_event_type_lift",
    // q208: the ONE-ROW session total crossJoined onto the ≤|types|⁸-
    // bounded path counts (the q206 scalar shape; sessionization itself
    // is windows, no join)
    "q208_session_paths",
    // q211: three ONE-ROW crossJoins by construction — the corpus-max
    // timestamp, the pivoted 1-row quartile-threshold frame from the
    // single melted percentile run, and the user total (the q198
    // scalar-assembly shape; segment assignment itself is map-side)
    "q211_rfm_segments",
    // q214: the ONE-ROW percentile-cut frame crossJoined onto the
    // per-user counts before a single aggregate (q211's threshold
    // shape); the stacked tier report runs on one row
    "q214_user_concentration",
    // q215: two ONE-ROW aggregates (edge sums, node card) crossJoined
    // into the one-row graph shape card
    "q215_dupgraph_assortativity",
    // q222: the dense week×type grid — the broadcast build side is the
    // ≤|types|-row distinct-type frame by construction; weeks are
    // calendar-bounded
    "q222_event_mix_drift",
    // q229: the ONE-ROW corpus word total crossJoined onto the one-row
    // grid aggregate before the stack unpivot (the q198/q208 scalar-
    // assembly shape; the span machinery itself is windows + groupBys)
    "q229_substring_policy_sweep")

  test("no cartesian products; nested-loop joins only on O(1)-row build sides") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val bad = Seq(
          Option.when(plan.contains("CartesianProduct"))("CartesianProduct"),
          Option.when(plan.contains("BroadcastNestedLoopJoin") &&
            !bnljAllowed(name))("BroadcastNestedLoopJoin")).flatten
        bad.map(b => s"$name: $b")
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}

class BenchErrorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a crashing query reports an error marker instead of benching as ~0 s") {
    val (_, err) = Bench.timeOne(spark, "/nonexistent",
      (s, dir) => s.read.parquet(s"$dir/nope.parquet"))
    assert(err.isDefined)
    val (_, ok) = Bench.timeOne(spark, "/root/testdata/sf0.001",
      (s, dir) => SparkEntry.queries("q16_top_orders_global")(s, dir))
    assert(ok.isEmpty)
  }

  test("priorTimes folds suspect_retimed minima so a cleared suspect's inflated time never becomes the next gate's prior") {
    val dir = TestDirs.scratch("benchhist")
    val f = s"$dir/hist.json"
    // qA was flagged at 9.0 s and re-timed clean at 0.4 s; qB unflagged
    java.nio.file.Files.writeString(java.nio.file.Path.of(f),
      """{"metric":"queries_full","sf":"/sf","queries":{"qA":9.0,"qB":0.7},"suspect_retimed":{"qA":0.4}}""")
    assert(Bench.priorTimes(f, "/sf") == Map("qA" -> 0.4, "qB" -> 0.7))
    // a different sf dir yields no comparable history at all
    assert(Bench.priorTimes(f, "/other") == Map.empty[String, Double])
    // and a missing/garbled file degrades to empty, never throws
    assert(Bench.priorTimes(s"$dir/nope.json", "/sf").isEmpty)
  }

  test("priorTimes skips error-marked re-times and prefers a history map when the file carries one") {
    val dir = TestDirs.scratch("benchhist2")
    val f = s"$dir/hist.json"
    // a suspect whose re-runs ALL failed stores the failures' min
    // ELAPSED (0.03 s) — explicitly not a measurement; folding it would
    // sink qA below the 0.05 s gate guard and un-gate it forever
    java.nio.file.Files.writeString(java.nio.file.Path.of(f),
      """{"sf":"/sf","queries":{"qA":9.0,"qB":0.7},"suspect_retimed":{"qA":0.03},"suspect_retime_errors":{"qA":"OutOfMemoryError"}}""")
    assert(Bench.priorTimes(f, "/sf") == Map("qA" -> 9.0, "qB" -> 0.7))
    // a running-min "history" map (written since r15) wins over the
    // measured map — that IS the fold, done at write time
    java.nio.file.Files.writeString(java.nio.file.Path.of(f),
      """{"sf":"/sf","queries":{"qA":9.0,"qB":0.7},"history":{"qA":0.4,"qB":0.6}}""")
    assert(Bench.priorTimes(f, "/sf") == Map("qA" -> 0.4, "qB" -> 0.6))
    // an all-runs-failed query (key in `errors`) stores its failures'
    // min ELAPSED in `queries` — dropped from the legacy fold, or a
    // 0.07 s failure becomes a floor the real 0.25 s steady state can
    // never reach (permanent false still-hot via the running min)
    java.nio.file.Files.writeString(java.nio.file.Path.of(f),
      """{"sf":"/sf","queries":{"qA":0.07,"qB":0.7},"errors":{"qA":"OutOfMemoryError"}}""")
    assert(Bench.priorTimes(f, "/sf") == Map("qB" -> 0.7))
  }

  test("foldHistory anchors the gate to pre-load minima: a loaded run can confirm or improve history, never inflate it") {
    val prior = Map("qA" -> 0.4, "qB" -> 0.7, "qGone" -> 1.0)
    // loaded run: qA at 1.0 s is the silent sub-3× inflation class the
    // r14 gate absorbed; qB flagged at 9.0 and re-timed clean at 0.65;
    // qC is new this suite; qD failed every timed run (0.03 s elapsed
    // is not a measurement)
    val measured = Seq(("qA", 1.0, None), ("qB", 9.0, None),
      ("qC", 0.5, None), ("qD", 0.03, Some("OutOfMemoryError")))
    val retimed = Seq[(String, Double, Option[String])](("qB", 0.65, None))
    val hist = Bench.foldHistory(measured, retimed, prior)
    // qA keeps its idle prior; qB takes the clean re-time; qC enters at
    // its first measurement; qD has no valid basis and no prior → absent
    // (never gated against a failure's elapsed); qGone left the suite
    assert(hist == Map("qA" -> 0.4, "qB" -> 0.65, "qC" -> 0.5))
  }

  test("foldHistory: an all-failed re-time folds nothing; a failed query carries its prior forward") {
    val hist = Bench.foldHistory(
      Seq(("qA", 0.03, Some("Boom")), ("qB", 9.0, None)),
      Seq[(String, Double, Option[String])](("qB", 0.02, Some("Boom"))),
      Map("qA" -> 0.4, "qB" -> 0.7))
    assert(hist == Map("qA" -> 0.4, "qB" -> 0.7))
  }

  test("retimeSuspect runs the main loop's protocol: benchRuns runs, run 1 dropped when steady (r15 verdict item 4)") {
    // steady min-of-runs-2..3: run 1 (the fastest here, 0.1 s) must be
    // EXCLUDED — the old fixed min-of-2 would have reported it
    var calls = 0
    val timings = Seq(0.1, 0.9, 0.5)
    val (sec, err) = Bench.retimeSuspect(() => {
      calls += 1; (timings(calls - 1), None)
    }, benchRuns = 3, steady = true)
    assert(calls == 3 && sec == 0.5 && err.isEmpty)
    // legacy min-of-2 mode times every run
    calls = 0
    val (sec2, _) = Bench.retimeSuspect(() => {
      calls += 1; (timings(calls - 1), None)
    }, benchRuns = 2, steady = false)
    assert(calls == 2 && sec2 == 0.1)
    // a clean run 1 must not adjudicate a suspect whose TIMED runs all
    // failed: the error marker survives (still-hot, not load noise)
    calls = 0
    val (_, errAll) = Bench.retimeSuspect(() => {
      calls += 1
      if (calls == 1) (0.2, None) else (0.01, Some("OutOfMemoryError"))
    }, benchRuns = 3, steady = true)
    assert(errAll.contains("OutOfMemoryError"))
  }

  test("applyRebase drops only the named history prefixes (r15 ADVICE reset path)") {
    val prior = Map("q118_audio" -> 4.9, "q118b_x" -> 1.0, "q193_sweep" -> 3.1)
    assert(Bench.applyRebase(prior, None) == prior)
    // prefix-match, BENCH_ONLY's convention: q118 drops both q118 keys
    assert(Bench.applyRebase(prior, Some("q118")) == Map("q193_sweep" -> 3.1))
    assert(Bench.applyRebase(prior, Some("q118_audio, q193")) ==
      Map("q118b_x" -> 1.0))
    // empty/garbage specs degrade to no-op, never throw
    assert(Bench.applyRebase(prior, Some(" , ")) == prior)
  }
}
