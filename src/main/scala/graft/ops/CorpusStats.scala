package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Corpus-statistics operators for a training-data pipeline: vocabulary
  * coverage (OOV rates against a frequency-derived vocabulary) and
  * count-min-sketch heavy hitters (fixed-memory frequency estimation).
  *
  * Scale shape: the vocabulary is a top-k — small by construction — so
  * coverage is a BROADCAST join the corpus streams through map-side
  * (the q58 decontamination pattern); the count-min sketch is a
  * fixed-size (depth × width) table built by one map-side-combinable
  * groupBy, the standard sublinear substitute for a full term-frequency
  * table when the distinct-term count is corpus-sized.
  */
object CorpusStats {

  /** Vocabulary size for q71 — top terms by corpus frequency with a
    * deterministic tie-break (count DESC, term ASC), mirrored verbatim
    * in the oracle. */
  val VocabSize = 1000

  /** q190's global token budget in basis points of the corpus total
    * (5000 = train on half the corpus). Declared before `defs` — the
    * oracle SQL interpolates it at init. */
  val WaterfillBudgetBp = 5000L

  /** Terms per source entering the q154 Zipf rank-frequency fit — the
    * head of the distribution, where the power law lives (the tail is
    * dominated by hapax counts whose whole-bit log is 0). Declared
    * before `defs` (the oracle SQL interpolates it at init). */
  val ZipfTopK = 64

  /** Count-min sketch geometry: 4 independent hash rows × 1024 buckets.
    * Depth drives the error probability (min over 4 estimates), width
    * the overestimate magnitude (~corpus_tokens/width). 4×1024 int64
    * cells = 32 KiB — broadcastable, mergeable, fixed whatever the
    * corpus size. */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Hashed-feature buckets for the q178 DSIR weights — fixed size, so
    * the per-bucket stats table is a broadcast LUT whatever the corpus
    * size (the paper's hashed n-gram trick, which is what lets DSIR run
    * over raw corpora without materializing a vocabulary). */
  val DsirBuckets = 1024

  /** q186: per-source sample size of the DSIR resample. (Declared
    * before `defs` — the oracle interpolates it at init.) */
  val DsirSampleK = 8

  /** Shared q178/q184 oracle chain: `m2(doc_id, source, ws, is_target)`
    * and `dw(doc_id, w_units)` — the hashed-feature stats LUT and the
    * per-doc whole-bit importance weight. (Declared before `defs` — the
    * oracle strings interpolate it at init.) */
  private lazy val dsirDuckCtes: String =
    s"""meta AS (
               SELECT doc_id, source,
                 CAST(${Quality.duckNWords("text")} AS BIGINT) AS n_words,
                 CAST(${Quality.duckNStop("text")} AS BIGINT) AS n_stop,
                 string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             m2 AS (
               SELECT doc_id, source, ws,
                 CASE WHEN 8 * n_stop >= n_words THEN 1 ELSE 0 END
                   AS is_target
               FROM meta),
             feats AS (
               SELECT doc_id, is_target,
                 CAST(('0x' || substr(md5(w), 1, 14)) AS BIGINT)
                   % $DsirBuckets AS b,
                 count(*) AS c
               FROM (SELECT doc_id, is_target, unnest(ws) AS w FROM m2)
               GROUP BY doc_id, is_target, b),
             raw AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr
                     FROM feats GROUP BY b),
             tgt AS (SELECT b, CAST(sum(c) AS BIGINT) AS ct
                     FROM feats WHERE is_target = 1 GROUP BY b),
             tots AS (
               SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS tr,
                      (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT)
                         FROM tgt) AS tt),
             lut AS (
               SELECT raw.b,
                 CAST(length(bin(tr // (cr + 1))) - 1 AS BIGINT) AS bits_r,
                 CAST(length(bin(tt // (coalesce(ct, 0) + 1))) - 1
                   AS BIGINT) AS bits_t
               FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots),
             dw AS (
               SELECT f.doc_id,
                 CAST(sum(f.c * (l.bits_r - l.bits_t)) AS BIGINT)
                   AS w_units
               FROM feats f JOIN lut l ON f.b = l.b
               GROUP BY f.doc_id)"""

  /** 56-bit md5-derived hash of `term` salted per sketch row, reduced to
    * a bucket — identical text → identical bucket in both engines.
    * Public because the streaming sketch
    * ([[graft.streaming.EventStreams.streamingCountMin]]) must hash
    * identically to the batch one. */
  def bucketSpark(r: Int): String =
    s"graft_md5_56(concat('cms$r:', term)) % $CmsWidth"
  private def bucketDuck(r: Int) =
    s"CAST(('0x' || substr(md5('cms$r:' || term), 1, 14)) AS BIGINT) % $CmsWidth"

  private def words(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(split(lower(col("text")), " +")).as("term"))

  /** q105's operator over a (doc_id, text) frame — exposed so the spec
    * can feed a planted corpus whose backoff classes are hand-checkable.
    * See the q105 entry below for the full semantics/scale story. */
  def bigramLmScore(docsText: DataFrame): DataFrame = {
    // the tokenized+split frame feeds three consumers (train tokens,
    // train pairs, validation pairs) — persist it once
    val d = docsText
      .select(col("doc_id"), split(lower(col("text")), " +").as("ws"),
        expr("""cast(conv(substring(md5(concat('split:',
             cast(doc_id as string))), 1, 14), 16, 10) as long) % 10""")
          .as("b"))
      .transform(TransientCache.scopedDF)
    def pairs(docs: DataFrame): DataFrame = docs
      .filter(size(col("ws")) >= 2) // sequence(1,0) is DESCENDING — filter first (q88)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> struct(element_at(ws, i) AS w1,
                         element_at(ws, i + 1) AS w2))""")).as("pr"))
      .select(col("doc_id"), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val trTok = d.filter(col("b") < 8).select(explode(col("ws")).as("term"))
    val ug = trTok.groupBy(col("term")).agg(count(lit(1)).as("c1"))
      .transform(TransientCache.scopedDF)
    val tot = trTok.agg(count(lit(1)).cast("long").as("t"))
    // per-bigram bits precomputed at train time: c(w1) ≥ c(w1,w2) ≥ 1
    // by construction, so the div never truncates to 0 bits wrongly
    val sbg = pairs(d.filter(col("b") < 8))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .join(ug.withColumnRenamed("term", "w1"), "w1")
      .select(col("w1"), col("w2"),
        (length(bin(expr("c1 div c12"))) - 1).cast("long").as("bgbits"))
    pairs(d.filter(col("b") === 8))
      .join(sbg, Seq("w1", "w2"), "left")
      .join(ug.select(col("term").as("w2"), col("c1").as("c2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("ibits", when(col("bgbits").isNotNull, col("bgbits"))
        .otherwise((length(bin(expr("t div coalesce(c2, 1L)"))) - 1)
          .cast("long") + 2))
      .withColumn("backoff", when(col("bgbits").isNull, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"),
        sum(col("ibits")).as("bits_total"),
        sum(col("backoff")).as("n_backoff"))
      .withColumn("mean_bits",
        round(col("bits_total") * lit(1.0) / col("n_trans"), 4))
      .orderBy(col("doc_id"))
  }

  /** The q105 oracle's CTE chain, factored out so q105 (per-doc scores)
    * and q123 (filter-calibration sweep) splice ONE stupid-backoff
    * bigram-LM definition. Ends at `lm_doc(doc_id, n_trans,
    * bits_total, n_backoff)`: the held-out split's per-document
    * whole-bit surprisal totals. */
  private def bigramLmDuckCtes: String =
    """d AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws,
                 CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                   1, 14)) AS BIGINT) % 10 AS b
               FROM documents),
             tr_tok AS (SELECT unnest(ws) AS term FROM d WHERE b < 8),
             ug AS (SELECT term, count(*) AS c1 FROM tr_tok GROUP BY term),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tr_tok),
             tr_pair AS (
               SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                 i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS pr
               FROM d WHERE b < 8 AND len(ws) >= 2),
             bg AS (
               SELECT pr.w1 AS w1, pr.w2 AS w2, count(*) AS c12
               FROM tr_pair GROUP BY pr.w1, pr.w2),
             sbg AS (
               SELECT w1, w2,
                 CAST(length(bin(c1 // c12)) - 1 AS BIGINT) AS bgbits
               FROM bg JOIN ug ON bg.w1 = ug.term),
             vp AS (
               SELECT doc_id, unnest(list_transform(
                 generate_series(1, len(ws) - 1),
                 i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS pr
               FROM d WHERE b = 8 AND len(ws) >= 2),
             scored AS (
               SELECT vp.doc_id,
                 CASE WHEN sbg.bgbits IS NOT NULL THEN sbg.bgbits
                   ELSE CAST(length(bin(t // coalesce(ug.c1, 1))) - 1
                     AS BIGINT) + 2 END AS ibits,
                 CASE WHEN sbg.bgbits IS NULL THEN 1 ELSE 0 END AS backoff
               FROM vp
               LEFT JOIN sbg ON vp.pr.w1 = sbg.w1 AND vp.pr.w2 = sbg.w2
               LEFT JOIN ug ON vp.pr.w2 = ug.term
               CROSS JOIN tot),
             lm_doc AS (
               SELECT doc_id, count(*) AS n_trans,
                 CAST(sum(ibits) AS BIGINT) AS bits_total,
                 CAST(sum(backoff) AS BIGINT) AS n_backoff
               FROM scored GROUP BY doc_id)"""

  val defs: Map[String, QueryDef] = Map(

    // ---- vocabulary coverage: OOV tokens per language against the
    //      corpus top-1000 vocabulary. The vocab is tiny → broadcast
    //      left join; per-language rates divide two exact int64 sums
    //      (one IEEE division, no float aggregation order anywhere).
    //      high-OOV docs are counted from per-doc exact ratios. ----
    "q71_vocab_coverage" -> QueryDef(
      (s, dir) => {
        // the token explode feeds two consumers (vocab top-k + per-doc
        // flags); persist once, same convention as jaccardPairs
        val w = words(Tables.load(s, dir, "documents"))
          .transform(TransientCache.scopedDF)
        val vocab = w.groupBy(col("term")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term")).limit(VocabSize)
          .select(col("term"), lit(1).as("in_vocab"))
        val perDoc = w.join(broadcast(vocab), Seq("term"), "left")
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        perDoc.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(col("n_oov")).as("oov_tokens"),
            sum(when(col("n_oov") * 2 > col("n_tokens"), 1L).otherwise(0L))
              .as("n_high_oov_docs"))
          .withColumn("oov_rate",
            round(col("oov_tokens") * lit(1.0) / col("total_tokens"), 4))
          .orderBy(col("lang"))
      },
      Some(s"""WITH w AS (
               SELECT doc_id, lang,
                 unnest(string_split_regex(lower(text), ' +')) AS term
               FROM documents),
             vocab AS (
               SELECT term FROM w GROUP BY term
               ORDER BY count(*) DESC, term LIMIT $VocabSize),
             per_doc AS (
               SELECT doc_id, lang, count(*) AS n_tokens,
                 CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov
               FROM w LEFT JOIN vocab v USING (term)
               GROUP BY doc_id, lang)
             SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(n_oov) AS BIGINT) AS oov_tokens,
               CAST(sum(CASE WHEN n_oov * 2 > n_tokens THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_high_oov_docs,
               round(CAST(sum(n_oov) AS BIGINT) * 1.0
                 / CAST(sum(n_tokens) AS BIGINT), 4) AS oov_rate
             FROM per_doc
             GROUP BY lang
             ORDER BY lang""")),

    // ---- the corpus "data card": the per-source summary a curation
    //      run publishes — volume, token-length distribution, exact-dup
    //      rate, language mix. Percentiles are LOWER/discrete order
    //      statistics picked by pure-integer ranks ((n+1) div 2 and
    //      ceil(9n/10) = (9n+9) div 10) from a partitioned window, so
    //      both engines select the identical ELEMENT — no interpolation,
    //      no float rank arithmetic (ceil(0.9·n) in floats can straddle
    //      an integer boundary between engines). Rates divide exact
    //      int64 counts. One pass for the stats, one window for the
    //      order statistics — per-source parallelism. ----
    "q76_corpus_datacard" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("lang"),
            md5(col("text")).as("tkey"),
            size(split(lower(col("text")), " +")).as("n_tokens"))
          .transform(TransientCache.scopedDF)
        val stats = base.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens_total"),
          countDistinct(col("tkey")).as("n_distinct"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_tokens"), col("doc_id"))
        val wc = Window.partitionBy(col("source"))
        val ranked = base
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(wc))
        val p50 = ranked.filter(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("source"), col("n_tokens").as("tokens_p50"))
        val p90 = ranked.filter(col("rn") === expr("(9 * cnt + 9) div 10"))
          .select(col("source"), col("n_tokens").as("tokens_p90"))
        stats.join(p50, "source").join(p90, "source")
          .select(col("source"), col("n_docs"), col("tokens_total"),
            col("tokens_p50"), col("tokens_p90"),
            round((col("n_docs") - col("n_distinct")) * lit(1.0) / col("n_docs"), 4)
              .as("dup_rate"),
            round(col("n_en") * lit(1.0) / col("n_docs"), 4).as("pct_en"))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
               SELECT source, doc_id, lang, md5(text) AS tkey,
                 len(string_split_regex(lower(text), ' +')) AS n_tokens
               FROM documents),
             stats AS (
               SELECT source, count(*) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
                 count(DISTINCT tkey) AS n_distinct,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_en
               FROM base GROUP BY source),
             ranked AS (
               SELECT source, n_tokens,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n_tokens, doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS cnt
               FROM base),
             p50 AS (SELECT source, n_tokens AS tokens_p50
                     FROM ranked WHERE rn = (cnt + 1) // 2),
             p90 AS (SELECT source, n_tokens AS tokens_p90
                     FROM ranked WHERE rn = (9 * cnt + 9) // 10)
             SELECT s.source, n_docs, tokens_total, tokens_p50, tokens_p90,
               round((n_docs - n_distinct) * 1.0 / n_docs, 4) AS dup_rate,
               round(n_en * 1.0 / n_docs, 4) AS pct_en
             FROM stats s
             JOIN p50 USING (source)
             JOIN p90 USING (source)
             ORDER BY source""")),

    // ---- count-min heavy hitters: build the 4×1024 sketch in one
    //      map-side-combinable groupBy, then read back estimates for the
    //      true top-20 terms (est = min over the 4 row estimates;
    //      est >= true always — the overestimate column shows the
    //      sketch's collision cost). Joining the 20 query terms to the
    //      sketch is a broadcast of 80 (row, bucket) probes. ----
    "q73_cms_heavy_hitters" -> QueryDef(
      (s, dir) => {
        graft.expr.Md5Hash56.register(s)
        // fed by both the sketch build and the true top-20 — persist once
        val w = words(Tables.load(s, dir, "documents")).select(col("term"))
          .transform(TransientCache.scopedDF)
        val buckets = (0 until CmsDepth)
          .map(r => s"$r, ${bucketSpark(r)}").mkString(", ")
        val cms = w
          .selectExpr(s"stack($CmsDepth, $buckets) AS (r, bucket)")
          .groupBy(col("r"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val top = w.groupBy(col("term")).agg(count(lit(1)).as("true_n"))
          .orderBy(col("true_n").desc, col("term")).limit(20)
        val probes = top
          .selectExpr("term", "true_n",
            s"stack($CmsDepth, $buckets) AS (r, bucket)")
        cms.join(broadcast(probes), Seq("r", "bucket"))
          .groupBy(col("term"), col("true_n"))
          .agg(min(col("cnt")).as("est_n"))
          .withColumn("overestimate", col("est_n") - col("true_n"))
          .select(col("term"), col("true_n"), col("est_n"), col("overestimate"))
          .orderBy(col("true_n").desc, col("term"))
      },
      Some {
        val bucketSelects = (0 until CmsDepth)
          .map(r => s"SELECT term, $r AS r, ${bucketDuck(r)} AS bucket FROM w")
          .mkString(" UNION ALL ")
        val probeSelects = (0 until CmsDepth)
          .map(r => s"SELECT term, true_n, $r AS r, ${bucketDuck(r)} AS bucket FROM top")
          .mkString(" UNION ALL ")
        s"""WITH w AS (
             SELECT unnest(string_split_regex(lower(text), ' +')) AS term
             FROM documents),
           cells AS ($bucketSelects),
           cms AS (
             SELECT r, bucket, count(*) AS cnt
             FROM cells GROUP BY r, bucket),
           top AS (
             SELECT term, count(*) AS true_n FROM w
             GROUP BY term ORDER BY true_n DESC, term LIMIT 20),
           probes AS ($probeSelects)
           SELECT p.term, p.true_n, min(c.cnt) AS est_n,
             min(c.cnt) - p.true_n AS overestimate
           FROM probes p JOIN cms c ON p.r = c.r AND p.bucket = c.bucket
           GROUP BY p.term, p.true_n
           ORDER BY true_n DESC, term"""
      }),

    // ---- data-mixing weights: per-source sampling weight ∝ √tokens
    //      (α = 0.5 temperature scaling, the Pile/multilingual-mixing
    //      convention that upweights small sources), plus the effective
    //      epochs each source runs when the mixture serves one corpus
    //      pass. √ of an exact int64 is correctly rounded by IEEE (unlike
    //      pow(x, α) generally — why α is spelled sqrt here), and the
    //      5-term normalizer is a SEQUENTIAL fold over the source-sorted
    //      weight list, not a float SUM whose order could differ between
    //      engines (DESIGN.md). The per-source rollup is one int64
    //      groupBy; the totals row is a broadcast crossJoin of ONE row
    //      back onto the |sources| rows. ----
    "q87_mixture_weights" -> QueryDef(
      (s, dir) => {
        // feeds both the per-source rows and the one-row totals — persist
        // the |sources|-row aggregate so the corpus is scanned ONCE
        val ps = Tables.load(s, dir, "documents")
          .select(col("source"), Quality.nWords(col("text")).as("nw"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nw").cast("long")).as("n_tokens"))
          .withColumn("w_raw", sqrt(col("n_tokens")))
          .transform(TransientCache.scopedDF)
        val tot = ps.agg(
          expr("""aggregate(array_sort(collect_list(struct(source, w_raw))),
                    0D, (acc, s) -> acc + s.w_raw)""").as("tot_w"),
          sum(col("n_tokens")).as("tot_tokens"))
        ps.crossJoin(broadcast(tot))
          .withColumn("weight", round(col("w_raw") / col("tot_w"), 4))
          .withColumn("epochs",
            round(col("weight") * col("tot_tokens") / col("n_tokens"), 4))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("weight"), col("epochs"))
          .orderBy(col("source"))
      },
      Some(s"""WITH perdoc AS (
               SELECT source, ${graft.ops.Quality.duckNWords("text")} AS nw
               FROM documents),
             ps AS (
               SELECT source, count(*) AS n_docs,
                 CAST(sum(nw) AS BIGINT) AS n_tokens
               FROM perdoc GROUP BY source),
             w AS (SELECT *, sqrt(n_tokens) AS w_raw FROM ps),
             t AS (
               SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(w_raw ORDER BY source)), (acc, v) -> acc + v) AS tot_w,
                 CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
               FROM w)
             SELECT source, n_docs, n_tokens,
               round(w_raw / tot_w, 4) AS weight,
               round(round(w_raw / tot_w, 4) * tot_tokens / n_tokens, 4)
                 AS epochs
             FROM w CROSS JOIN t
             ORDER BY source""")),

    // ---- BUDGET WATER-FILL: q87 asks "what mixture"; a budgeted run
    //      asks "how many tokens per source under a global cap". The
    //      classic water-filling allocation: every source keeps all its
    //      tokens up to a common level t, t chosen so the total equals
    //      the budget ([[WaterfillBudgetBp]] of corpus tokens). Exact
    //      integer construction: sources sorted by (n_tokens, source),
    //      source i is UNCAPPED iff cum_i + n_tokens_i·(n−i) ≤ B (the
    //      standard monotone feasibility test); the k uncapped sources
    //      keep everything, the remaining m split B − cum_k as
    //      floor-division base + one extra token for the first
    //      (B − cum_k) mod m capped sources in the same order — so
    //      allocations SUM EXACTLY to the budget, with no float level
    //      to disagree on. One |sources|-row rollup, two window passes
    //      over that grid-sized frame, two one-row crossJoins. ----
    "q190_token_budget_waterfill" -> QueryDef(
      (s, dir) => {
        // the |sources|-row rollup feeds the totals, the window pass
        // AND the final projection — persist it so the corpus scan
        // behind it runs ONCE (TransientCache releases it after the
        // caller's action)
        val ps = Tables.load(s, dir, "documents")
          .select(col("source"), Quality.nWords(col("text")).as("nw"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nw").cast("long")).as("n_tokens"))
          .transform(TransientCache.scopedDF)
        val tot = ps.agg(sum(col("n_tokens")).as("tot_tokens"),
          count(lit(1)).as("n_all"))
        val wOrd = Window.orderBy(col("n_tokens"), col("source"))
        val o = ps
          .withColumn("idx", row_number().over(wOrd).cast("long"))
          .withColumn("cum", sum(col("n_tokens")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(tot))
          .withColumn("budget",
            expr(s"tot_tokens * $WaterfillBudgetBp div 10000"))
          .withColumn("unc", when(
            col("cum") + col("n_tokens") * (col("n_all") - col("idx"))
              <= col("budget"), 1L).otherwise(0L))
        val kk = o.agg(coalesce(sum(col("unc")), lit(0L)).as("k"),
          coalesce(sum(when(col("unc") === 1, col("n_tokens"))), lit(0L))
            .as("cum_k"))
        o.crossJoin(broadcast(kk))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            when(col("unc") === 1, col("n_tokens")).otherwise(expr(
              """(budget - cum_k) div (n_all - k)
                 + if(idx - k <= (budget - cum_k) % (n_all - k), 1L, 0L)"""))
              .as("alloc_tokens"),
            (lit(1L) - col("unc")).as("capped"))
          .withColumn("fill_bp", expr("alloc_tokens * 10000 div n_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""WITH perdoc AS (
               SELECT source, ${graft.ops.Quality.duckNWords("text")} AS nw
               FROM documents),
             ps AS (
               SELECT source, count(*) AS n_docs,
                 CAST(sum(nw) AS BIGINT) AS n_tokens
               FROM perdoc GROUP BY source),
             tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
                       count(*) AS n_all
                     FROM ps),
             o AS (
               SELECT ps.*,
                 CAST(row_number() OVER (ORDER BY n_tokens, source)
                   AS BIGINT) AS idx,
                 CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
               FROM ps),
             f AS (
               SELECT o.*, tot.n_all,
                 tot.tot_tokens * $WaterfillBudgetBp // 10000 AS budget,
                 CASE WHEN cum + n_tokens * (tot.n_all - idx)
                     <= tot.tot_tokens * $WaterfillBudgetBp // 10000
                   THEN 1 ELSE 0 END AS unc
               FROM o CROSS JOIN tot),
             kk AS (
               SELECT COALESCE(CAST(sum(unc) AS BIGINT), 0) AS k,
                 COALESCE(CAST(sum(CASE WHEN unc = 1 THEN n_tokens END)
                   AS BIGINT), 0) AS cum_k
               FROM f),
             sel AS (
               SELECT f.source, f.n_docs, f.n_tokens,
                 CASE WHEN f.unc = 1 THEN f.n_tokens
                   ELSE (f.budget - kk.cum_k) // (f.n_all - kk.k)
                     + CASE WHEN f.idx - kk.k
                         <= (f.budget - kk.cum_k) % (f.n_all - kk.k)
                       THEN 1 ELSE 0 END
                 END AS alloc_tokens,
                 CAST(1 - f.unc AS BIGINT) AS capped
               FROM f CROSS JOIN kk)
             SELECT source, n_docs, n_tokens, alloc_tokens, capped,
               alloc_tokens * 10000 // n_tokens AS fill_bp
             FROM sel
             ORDER BY source""")),

    // ---- two-level mixture grid: q87's √tokens temperature weighting
    //      applied to the (source × lang) CELL grid — the mixture table
    //      a multilingual run actually trains from, where balancing must
    //      consider both axes at once (a language dominant overall can
    //      still be the starved minority inside one source). Per cell:
    //      its within-source token share (int64 ratio — exact in both
    //      engines), its global temperature weight, and effective
    //      epochs. Same parity discipline as q87: the normalizer is a
    //      sequential fold over the (source, lang)-sorted weight list,
    //      never an order-sensitive float SUM; the within-source total
    //      is an integer window sum (order-free). Scale shape: one
    //      |sources|·|langs|-row int64 rollup off the corpus scan, a
    //      grid-sized window, and a ONE-ROW totals crossJoin back. ----
    "q112_mixture_grid" -> QueryDef(
      (s, dir) => {
        val wSrc = Window.partitionBy(col("source"))
        val ps = Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"),
            Quality.nWords(col("text")).as("nw"))
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nw").cast("long")).as("n_tokens"))
          .withColumn("w_raw", sqrt(col("n_tokens")))
          .withColumn("src_tokens", sum(col("n_tokens")).over(wSrc))
          .transform(TransientCache.scopedDF)
        val tot = ps.agg(
          expr("""aggregate(array_sort(collect_list(struct(source, lang, w_raw))),
                    0D, (acc, s) -> acc + s.w_raw)""").as("tot_w"),
          sum(col("n_tokens")).as("tot_tokens"))
        ps.crossJoin(broadcast(tot))
          .withColumn("src_share",
            round(col("n_tokens") * lit(1.0) / col("src_tokens"), 4))
          .withColumn("weight", round(col("w_raw") / col("tot_w"), 4))
          .withColumn("epochs",
            round(col("weight") * col("tot_tokens") / col("n_tokens"), 4))
          .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
            col("src_share"), col("weight"), col("epochs"))
          .orderBy(col("source"), col("lang"))
      },
      Some(s"""WITH perdoc AS (
               SELECT source, lang,
                 ${graft.ops.Quality.duckNWords("text")} AS nw
               FROM documents),
             ps AS (
               SELECT source, lang, count(*) AS n_docs,
                 CAST(sum(nw) AS BIGINT) AS n_tokens
               FROM perdoc GROUP BY source, lang),
             w AS (
               SELECT *, sqrt(n_tokens) AS w_raw,
                 CAST(sum(n_tokens) OVER (PARTITION BY source) AS BIGINT)
                   AS src_tokens
               FROM ps),
             t AS (
               SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(w_raw ORDER BY source, lang)), (acc, v) -> acc + v)
                   AS tot_w,
                 CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
               FROM w)
             SELECT source, lang, n_docs, n_tokens,
               round(n_tokens * 1.0 / src_tokens, 4) AS src_share,
               round(w_raw / tot_w, 4) AS weight,
               round(round(w_raw / tot_w, 4) * tot_tokens / n_tokens, 4)
                 AS epochs
             FROM w CROSS JOIN t
             ORDER BY source, lang""")),

    // ---- integer-quantized unigram surprisal: the deterministic stand-in
    //      for a perplexity filter (CCNet-style pipelines score docs with
    //      a KenLM model; the sandbox's honest equivalent is the corpus's
    //      own unigram LM). Per word, surprisal is quantized to WHOLE BITS
    //      as floor(log2(total/cnt)) = length(bin(total div cnt)) - 1 —
    //      pure int64 arithmetic, bitwise identical in both engines, where
    //      a float log would sit outside the cross-engine-exact function
    //      set (the q42/q51 discipline: ln() last-ulp behavior differs
    //      between libm and the JVM). Per-doc mean bits is then one exact
    //      int64 sum (associative — no ordering hazard) and one IEEE
    //      division. Scale shape: vocab counts are a map-side-combinable
    //      groupBy; the doc⋈vocab join is a word-keyed equi-join (the
    //      vocab can be corpus-sized, so no broadcast); the one-row total
    //      rides a broadcast crossJoin onto the vocab. High mean_bits =
    //      rare-word-heavy documents — the filter's outlier signal at
    //      both ends, exactly how perplexity buckets are consumed. ----
    "q89_unigram_surprisal" -> QueryDef(
      (s, dir) => {
        // feeds the vocab build AND the per-doc join — one explode, two jobs
        val w = words(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), col("term"))
          .transform(TransientCache.scopedDF)
        val vocab = w.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        val tot = vocab.agg(sum(col("cnt")).as("t"))
        val scored = vocab.crossJoin(broadcast(tot))
          .select(col("term"),
            (length(bin(expr("t div cnt"))) - 1).cast("long").as("ibits"))
        w.join(scored, "term")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("ibits")).as("bits_total"))
          .withColumn("mean_bits",
            round(col("bits_total") * lit(1.0) / col("n_tokens"), 4))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
               SELECT doc_id,
                 unnest(string_split_regex(lower(text), ' +')) AS term
               FROM documents),
             v AS (SELECT term, count(*) AS cnt FROM w GROUP BY term),
             t AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM v),
             sc AS (
               SELECT term, CAST(length(bin(t // cnt)) - 1 AS BIGINT) AS ibits
               FROM v CROSS JOIN t)
             SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(ibits) AS BIGINT) AS bits_total,
               round(CAST(sum(ibits) AS BIGINT) * 1.0 / count(*), 4)
                 AS mean_bits
             FROM w JOIN sc USING (term)
             GROUP BY doc_id
             ORDER BY doc_id""")),

    // ---- held-out bigram LM scoring: the trained-model upgrade of
    //      q89's unigram surprisal, and the closest deterministic
    //      mirror of a CCNet/KenLM perplexity filter the cross-engine
    //      gate can certify. The LM (unigram + bigram counts) is
    //      trained ONLY on q65's 80% train split (same md5 'split:'
    //      bucket — adding docs never changes the split), and scores
    //      the HELD-OUT validation split, so unseen bigrams genuinely
    //      occur and the backoff path does real work. Per transition
    //      (w1,w2): seen → whole-bit conditional surprisal
    //      floor(log2(c(w1)/c(w1,w2))) via the q89 length(bin()) trick;
    //      unseen → stupid backoff to the unigram, α = 1/4 spelled as
    //      an integer +2 bits: floor(log2(T/c(w2))) + 2 (unseen w2
    //      backs off at count 1). Pure int64 throughout; the only float
    //      is the final rounded IEEE division. Scale shape: both count
    //      tables are map-side-combinable groupBys; the bigram-bits
    //      precompute and both scoring joins are word-keyed equi-joins
    //      (the vocabulary is corpus-sized — never broadcast); the
    //      1-row totals frame rides a broadcast crossJoin (q89
    //      precedent). High mean_bits = documents the trained LM finds
    //      surprising — the perplexity filter's outlier signal, now
    //      measured out-of-sample like the real pipelines do. ----
    "q105_bigram_lm_score" -> QueryDef(
      (s, dir) => bigramLmScore(Tables.load(s, dir, "documents")),
      Some(s"""WITH $bigramLmDuckCtes
             SELECT doc_id, n_trans, bits_total, n_backoff,
               round(bits_total * 1.0 / n_trans, 4) AS mean_bits
             FROM lm_doc ORDER BY doc_id""")),

    // ---- PERPLEXITY-FILTER retention curve: the q78 threshold-sweep
    //      shape over the q105 bigram-LM scores — per observed
    //      whole-bits-per-transition value (bits_total div n_trans,
    //      exact int64), the cumulative documents and transitions a
    //      "keep if bpw ≤ τ" filter would retain, in basis points.
    //      This is the CCNet-family calibration step: train the LM on
    //      the training split, read the retention curve off the
    //      HELD-OUT split, and only then pick the production cutoff —
    //      never calibrate on data the model saw. Scale shape: the
    //      q105 scoring plan (word-keyed equi-joins) feeds a ≤
    //      few-dozen-row bpw histogram; the cumulative window and the
    //      1-row totals crossJoin run on the histogram, never the
    //      corpus (the q78 rule). ----
    "q123_lm_filter_sweep" -> QueryDef(
      (s, dir) => {
        // persisted: the histogram AND the totals both fold the scored
        // frame — unpersisted, the whole LM scoring chain (train-pair
        // aggregation + both scoring joins) ran twice (guide §2.4)
        val db = bigramLmScore(Tables.load(s, dir, "documents"))
          .withColumn("bpw", expr("bits_total div n_trans"))
          .transform(TransientCache.scopedDF)
        val h = db.groupBy(col("bpw"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_trans")).as("n_trans"))
        val tot = db.agg(count(lit(1)).cast("long").as("td"),
          sum(col("n_trans")).cast("long").as("tt"))
        val w = Window.orderBy(col("bpw"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        h.crossJoin(broadcast(tot))
          .withColumn("docs_kept", sum(col("n_docs")).over(w).cast("long"))
          .withColumn("trans_kept", sum(col("n_trans")).over(w).cast("long"))
          .select(col("bpw"), col("n_docs"),
            col("docs_kept"),
            expr("docs_kept * 10000L div td").as("docs_kept_bp"),
            col("trans_kept"),
            expr("trans_kept * 10000L div tt").as("trans_kept_bp"))
          .orderBy(col("bpw"))
      },
      Some(s"""WITH $bigramLmDuckCtes,
             db AS (
               SELECT doc_id, n_trans, bits_total // n_trans AS bpw
               FROM lm_doc),
             h AS (
               SELECT bpw, count(*) AS n_docs,
                 CAST(sum(n_trans) AS BIGINT) AS n_trans
               FROM db GROUP BY bpw),
             t AS (
               SELECT CAST(count(*) AS BIGINT) AS td,
                 CAST(sum(n_trans) AS BIGINT) AS tt
               FROM db)
             SELECT bpw, n_docs,
               CAST(sum(n_docs) OVER (ORDER BY bpw
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS docs_kept,
               (CAST(sum(n_docs) OVER (ORDER BY bpw
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) * 10000) // td
                 AS docs_kept_bp,
               CAST(sum(n_trans) OVER (ORDER BY bpw
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS trans_kept,
               (CAST(sum(n_trans) OVER (ORDER BY bpw
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) * 10000) // tt
                 AS trans_kept_bp
             FROM h CROSS JOIN t
             ORDER BY bpw""")),

    // ---- hierarchical (mergeable) data card: q76's statistics computed
    //      the way a 100 TB pipeline actually computes them — per-shard
    //      PARTIALS aggregated as data lands, then MERGED per source,
    //      never a full-corpus rescan. The Spark side explicitly runs
    //      the two-level tree (groupBy (source, shard) → groupBy
    //      source); the oracle computes the same card DIRECTLY in one
    //      level, so the hash compare is a machine-checked proof that
    //      every statistic in the card is decomposable: counts and sums
    //      merge by +, extremes by min/max, and the content signature by
    //      bit_xor (commutative, associative, self-inverse — order- and
    //      grouping-insensitive over the 56-bit md5 text hashes, and it
    //      cannot overflow where a SUM of hashes eventually would). A
    //      statistic that does NOT merge (an exact distinct, an exact
    //      median) cannot pass this gate — which is the point: the card
    //      is certified safe for incremental per-shard maintenance. ----
    "q108_mergeable_datacard" -> QueryDef(
      (s, dir) => {
        val partials = Tables.load(s, dir, "documents")
          .select(col("source"),
            expr("""cast(conv(substring(md5(concat('card:',
                 cast(doc_id as string))), 1, 14), 16, 10) as long) % 16""")
              .as("shard"),
            size(split(lower(col("text")), " +")).cast("long").as("nw"),
            expr("cast(conv(substring(md5(text), 1, 14), 16, 10) as long)")
              .as("h"))
          .groupBy(col("source"), col("shard"))
          .agg(count(lit(1)).as("p_docs"), sum(col("nw")).as("p_tokens"),
            min(col("nw")).as("p_min"), max(col("nw")).as("p_max"),
            expr("bit_xor(h)").as("p_sig"))
        partials
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_shards"), sum(col("p_docs")).as("n_docs"),
            sum(col("p_tokens")).as("n_tokens"),
            min(col("p_min")).as("min_tokens"),
            max(col("p_max")).as("max_tokens"),
            expr("bit_xor(p_sig)").as("xor_sig"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
               SELECT source,
                 CAST(('0x' || substr(md5('card:' ||
                   CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 16
                   AS shard,
                 CAST(len(string_split_regex(lower(text), ' +'))
                   AS BIGINT) AS nw,
                 CAST(('0x' || substr(md5(text), 1, 14)) AS BIGINT) AS h
               FROM documents)
             SELECT source,
               count(DISTINCT shard) AS n_shards,
               count(*) AS n_docs,
               CAST(sum(nw) AS BIGINT) AS n_tokens,
               min(nw) AS min_tokens,
               max(nw) AS max_tokens,
               bit_xor(h) AS xor_sig
             FROM d GROUP BY source ORDER BY source""")),

    // ---- vocabulary growth (Heaps-law) curve: per source, distinct
    //      vocabulary size and token mass after the first 1,2,4,…,2^k
    //      documents in a deterministic hash order — the curve that
    //      decides whether a tokenizer vocab is sized right and whether
    //      dedup is working (a corpus whose vocab keeps growing linearly
    //      is full of noise; one that flattens too early is full of
    //      dups; Heaps 1978's V = K·n^β empirically). The prefix order
    //      is md5-derived (the q53/q65 hash-order family), so the curve
    //      is reproducible across runs/engines/layouts and extending
    //      the corpus never reorders existing prefixes. Scale shape:
    //      each token contributes its FIRST-occurrence doc rank via one
    //      (source, token) groupBy — the vocabulary never materializes
    //      per-prefix; prefix vocab sizes are a cumulative window over
    //      the ≤11-bucket histogram. The per-source rank window uses the
    //      same per-source-partition pattern as q80/q107 (at corpus
    //      scale: the q66 two-pass range-partitioned rank). ----
    "q127_vocab_growth" -> QueryDef(
      (s, dir) => vocabGrowth(Tables.load(s, dir, "documents")),
      Some(s"""WITH $vocabGrowthDuckCtes
             SELECT source, n_docs_prefix, cum_tokens, cum_vocab
             FROM growth
             ORDER BY source, n_docs_prefix""")),

    // ---- HEAPS-LAW fit: integer OLS over (whole-bit log cum_tokens,
    //      whole-bit log cum_vocab) of q127's growth curve — V ≈ K·N^b,
    //      so the slope is b in milli-units (English corpora sit near
    //      b ≈ 0.5; a source whose b collapses toward 0 has stopped
    //      contributing new vocabulary — the saturation read that says
    //      when more crawl buys nothing). The q154 closed-form OLS on
    //      the q127 points; everything int64. ----
    // ---- DSIR importance weights (Xie et al. 2023): per document, the
    //      whole-bit log-likelihood ratio between a hashed-feature
    //      target distribution (the stopword-dense sub-corpus — an
    //      integer-exact predicate) and the raw corpus. THE principled
    //      alternative to threshold filters for matching a target
    //      domain: rank by w_units and resample (q107's machinery takes
    //      wpt_milli as its weight column). Scale: the per-bucket stats
    //      LUT is DsirBuckets rows whatever the corpus — broadcast;
    //      both corpus passes map-side-combinable; shuffles carry
    //      (doc_id, bucket, count), never text. ----
    "q178_dsir_weights" -> QueryDef(
      (s, dir) => dsirWeightsCached(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH $dsirDuckCtes
             SELECT m.doc_id, m.source, CAST(m.is_target AS BIGINT)
                 AS is_target,
               CAST(len(m.ws) AS BIGINT) AS n_tokens, dw.w_units,
               CASE WHEN dw.w_units < 0
                 THEN -((-dw.w_units) * 1000 // len(m.ws))
                 ELSE dw.w_units * 1000 // len(m.ws) END AS wpt_milli
             FROM m2 m JOIN dw ON m.doc_id = dw.doc_id
             ORDER BY m.doc_id""")),

    // ---- DSIR RESAMPLE: the second half of the DSIR recipe — q178's
    //      importance weights drive an Efraimidis-Spirakis weighted
    //      sample (q107's integer-surrogate priority h56 div weight,
    //      weight = max(wpt_milli + 1000, 1) so the monotone
    //      more-target-like ⇒ more-likely-kept holds and the operand
    //      stays positive), keeping the top [[DsirSampleK]] per source.
    //      The deterministic, insert-stable export of
    //      importance-resampled training data. Scale: q178's passes +
    //      one per-row priority projection + a per-source top-k window
    //      (at corpus scale: the q66 two-pass range-partitioned rank). ----
    "q186_dsir_resample" -> QueryDef(
      (s, dir) => dsirResample(Tables.load(s, dir, "documents"),
        preWeights = Some(dsirWeightsCached(s, dir))),
      Some(s"""WITH $dsirDuckCtes,
             wp AS (
               SELECT m2.doc_id, m2.source,
                 CASE WHEN dw.w_units < 0
                   THEN -((-dw.w_units) * 1000 // len(m2.ws))
                   ELSE dw.w_units * 1000 // len(m2.ws) END AS wpt_milli
               FROM m2 JOIN dw ON m2.doc_id = dw.doc_id),
             pri AS (
               SELECT doc_id, source, wpt_milli,
                 greatest(wpt_milli + 1000, 1) AS weight,
                 CAST(('0x' || substr(md5('dsamp:' ||
                   CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                   // greatest(wpt_milli + 1000, 1) AS priority
               FROM wp),
             r AS (
               SELECT *, row_number() OVER (PARTITION BY source
                 ORDER BY priority, doc_id) AS rk
               FROM pri)
             SELECT source, doc_id, wpt_milli, weight, priority,
               CAST(rk AS BIGINT) AS rk
             FROM r WHERE rk <= $DsirSampleK
             ORDER BY source, rk""")),

    // ---- DSIR-vs-QUALITY agreement: per fixed-grid quality decile
    //      (q137's integer surrogate), the DSIR weight profile — doc
    //      count, share with non-negative weight, and the signed mean
    //      weight per token in milli-units. THE cross-signal sanity
    //      check before trusting either selector alone: if high-quality
    //      deciles don't skew toward positive importance weights, the
    //      hashed-feature target is mis-specified (or the quality
    //      heuristic is). Scale: q178's passes + one map-side decile
    //      projection and a ≤10-row rollup; sign-split division keeps
    //      Spark `div` and DuckDB `//` on non-negative operands. ----
    "q184_dsir_quality_agreement" -> QueryDef(
      (s, dir) => dsirQualityAgreement(Tables.load(s, dir, "documents"),
        preWeights = Some(dsirWeightsCached(s, dir))),
      Some(s"""WITH $dsirDuckCtes,
             qd AS (
               SELECT doc_id,
                 least(CAST(round(round(${Quality.duckScore("text")}, 4)
                   * 10000, 0) AS BIGINT) // 1000, 9) AS decile
               FROM documents),
             wp AS (
               SELECT m2.doc_id,
                 CASE WHEN dw.w_units < 0
                   THEN -((-dw.w_units) * 1000 // len(m2.ws))
                   ELSE dw.w_units * 1000 // len(m2.ws) END AS wpt
               FROM m2 JOIN dw ON m2.doc_id = dw.doc_id),
             j AS (
               SELECT qd.decile, wp.wpt
               FROM qd JOIN wp ON qd.doc_id = wp.doc_id)
             SELECT decile, count(*) AS n_docs,
               CAST(sum(CASE WHEN wpt >= 0 THEN 1 ELSE 0 END) AS BIGINT)
                 * 10000 // count(*) AS pos_bp,
               CASE WHEN CAST(sum(wpt) AS BIGINT) < 0
                 THEN -((-CAST(sum(wpt) AS BIGINT)) // count(*))
                 ELSE CAST(sum(wpt) AS BIGINT) // count(*) END
                 AS mean_wpt_milli
             FROM j GROUP BY decile ORDER BY decile""")),

    "q173_heaps_fit" -> QueryDef(
      (s, dir) => heapsFit(Tables.load(s, dir, "documents")),
      Some(s"""WITH $vocabGrowthDuckCtes,
             pts AS (
               SELECT source,
                 CAST(length(bin(cum_tokens)) - 1 AS BIGINT) AS x,
                 CAST(length(bin(cum_vocab)) - 1 AS BIGINT) AS y
               FROM growth),
             f AS (
               SELECT source, count(*) AS n_points,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
               FROM pts GROUP BY source)
             SELECT source, n_points,
               (n_points * sxy - sx * sy) * 1000
                 // (n_points * sxx - sx * sx) AS b_milli,
               (sy * sxx - sx * sxy) * 1000
                 // (n_points * sxx - sx * sx) AS logk_milli
             FROM f ORDER BY source""")),

    // ---- LEXICAL-DIVERSITY card: per source, type/token ratio, bigram
    //      type ratio and a whole-bit unigram entropy — the diversity
    //      axis of a data mixture (a source of templated near-identical
    //      text shows low TTR / low entropy however many bytes it
    //      contributes; mixture tuning wants that signal next to the
    //      volume numbers q87/q112 already carry). All ratios are int64
    //      basis points and the entropy is the q89 whole-bit surrogate
    //      Σ cnt·floor(log2(tot/cnt)) — floats never enter. Scale
    //      shape: two map-side-combinable groupBys (unigram, bigram per
    //      source), one source-keyed equi-join chain on a 20-value key;
    //      bigrams row-explode via the q105 index-transform (never a
    //      HOF lambda downstream of the explode). ----
    "q153_lexical_diversity" -> QueryDef(
      (s, dir) => lexicalDiversity(Tables.load(s, dir, "documents")),
      Some("""WITH d AS (
               SELECT doc_id, source,
                 string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             uni AS (
               SELECT source, term, count(*) AS cnt FROM (
                 SELECT source, unnest(ws) AS term FROM d)
               GROUP BY source, term),
             srcs AS (
               SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
                 count(*) AS n_types
               FROM uni GROUP BY source),
             ent AS (
               SELECT u.source,
                 CAST(sum(cnt * (length(bin(n_tokens // cnt)) - 1))
                   AS BIGINT) AS ent_units
               FROM uni u JOIN srcs s ON u.source = s.source
               GROUP BY u.source),
             bgu AS (
               SELECT source, b, count(*) AS bc FROM (
                 SELECT source,
                   unnest(list_transform(generate_series(1, len(ws) - 1),
                     i -> ws[i] || ' ' || ws[i + 1])) AS b
                 FROM d WHERE len(ws) >= 2)
               GROUP BY source, b),
             bgs AS (
               SELECT source, CAST(sum(bc) AS BIGINT) AS n_bigrams,
                 count(*) AS n_bigram_types
               FROM bgu GROUP BY source),
             nd AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source)
             SELECT nd.source, nd.n_docs, s.n_tokens, s.n_types,
               s.n_types * 10000 // s.n_tokens AS ttr_bp,
               b.n_bigrams, b.n_bigram_types,
               b.n_bigram_types * 10000 // b.n_bigrams AS bigram_ttr_bp,
               e.ent_units * 1000 // s.n_tokens AS mean_bits_milli
             FROM nd JOIN srcs s ON nd.source = s.source
             JOIN bgs b ON nd.source = b.source
             JOIN ent e ON nd.source = e.source
             ORDER BY nd.source""")),

    // ---- SOURCE-DIVERGENCE report: a whole-bit KL(source ‖ corpus)
    //      surrogate per source — Σ_w cnt_s(w)·(bits_c(w) − bits_s(w))
    //      over the source's tokens, in milli-bits/token, where
    //      bits_x(w) = floor(log2(tokens_x / cnt_x(w))) is the q89
    //      integer surprisal under distribution x. A source whose
    //      vocabulary usage matches the corpus sits near 0; templated
    //      or off-domain sources diverge — the distribution-shift
    //      signal mixture tuning reads next to q153/q154 (true KL needs
    //      float logs outside the cross-engine-exact set; the whole-bit
    //      form keeps the ranking and the gate). Scale: two
    //      map-side-combinable groupBys + one word-keyed equi-join
    //      (corpus vocab is corpus-sized — never broadcast). ----
    "q168_source_divergence" -> QueryDef(
      (s, dir) => sourceDivergence(Tables.load(s, dir, "documents")),
      Some("""WITH w AS (
               SELECT source,
                 unnest(string_split_regex(lower(text), ' +')) AS term
               FROM documents),
             sv AS (
               SELECT source, term, count(*) AS cs
               FROM w GROUP BY source, term),
             st AS (
               SELECT source, CAST(sum(cs) AS BIGINT) AS ts
               FROM sv GROUP BY source),
             cv AS (
               SELECT term, CAST(sum(cs) AS BIGINT) AS cc FROM sv
               GROUP BY term),
             ct AS (SELECT CAST(sum(cc) AS BIGINT) AS tc FROM cv),
             d AS (
               SELECT sv.source,
                 CAST(sum(sv.cs * (
                   (length(bin(tc // cc)) - 1)
                     - (length(bin(ts // cs)) - 1))) AS BIGINT) AS units,
                 CAST(sum(sv.cs) AS BIGINT) AS toks
               FROM sv
               JOIN st ON sv.source = st.source
               JOIN cv ON sv.term = cv.term
               CROSS JOIN ct
               GROUP BY sv.source)
             SELECT source, toks AS n_tokens,
               units AS div_units,
               units * 1000 // toks AS div_milli_bits
             FROM d ORDER BY source""")),

    // ---- PER-SOURCE LENGTH PROFILE: exact token-length P50/P90/P99
    //      per source (plus extremes) — the packing/context-window
    //      input q84's fixed 512-token windows and q149's efficiency
    //      rollup assume; a source whose P99 dwarfs its P50 fragments
    //      badly and wants its own chunking policy. Percentile index =
    //      ceil(p·n) computed in INTEGER arithmetic ((p·n + p) div 1
    //      forms below), matching DuckDB quantile_disc's element (the
    //      q52-certified correspondence); the value at a tied rank is
    //      order-independent because equal values are interchangeable.
    //      One per-source sort window over the (source, n_tokens)
    //      projection. ----
    "q175_length_profile" -> QueryDef(
      (s, dir) => lengthProfile(Tables.load(s, dir, "documents")),
      Some("""WITH t AS (
               SELECT source,
                 CAST(len(string_split_regex(lower(text), ' +')) AS BIGINT)
                   AS nt
               FROM documents)
             SELECT source, count(*) AS n_docs,
               CAST(min(nt) AS BIGINT) AS min_tokens,
               CAST(quantile_disc(nt, 0.5) AS BIGINT) AS p50_tokens,
               CAST(quantile_disc(nt, 0.9) AS BIGINT) AS p90_tokens,
               CAST(quantile_disc(nt, 0.99) AS BIGINT) AS p99_tokens,
               CAST(max(nt) AS BIGINT) AS max_tokens
             FROM t GROUP BY source ORDER BY source""")),

    // ---- SOURCE-SIMILARITY matrix: Jaccard (in basis points) of each
    //      source pair's top-[[ZipfTopK]] term sets — the coarse "which
    //      sources are near-duplicates of each other" read a mixture
    //      designer takes before treating sources as independent axes
    //      (two mirrors of the same site deserve one weight, not two).
    //      Complements q56 (doc-level cross-source dup pairs) at the
    //      vocabulary level and q168 (corpus-relative divergence) with
    //      a pairwise structure. Scale: per-source top-k via one window
    //      (k·|sources| rows thereafter), then a term-keyed self-join
    //      over ≤ k·|sources| rows — never the corpus. ----
    "q174_source_similarity" -> QueryDef(
      (s, dir) => sourceSimilarity(Tables.load(s, dir, "documents")),
      Some(s"""WITH uni AS (
               SELECT source, term, count(*) AS cnt FROM (
                 SELECT source,
                   unnest(string_split_regex(lower(text), ' +')) AS term
                 FROM documents)
               GROUP BY source, term),
             topk AS (
               SELECT source, term,
                 row_number() OVER (PARTITION BY source
                   ORDER BY cnt DESC, term) AS rk
               FROM uni QUALIFY rk <= $ZipfTopK),
             ks AS (SELECT source, count(*) AS k FROM topk GROUP BY source),
             ov AS (
               SELECT x.source AS source_a, y.source AS source_b,
                 count(*) AS n_shared
               FROM topk x JOIN topk y
                 ON x.term = y.term AND x.source < y.source
               GROUP BY x.source, y.source)
             SELECT a.source AS source_a, b.source AS source_b,
               coalesce(ov.n_shared, 0) AS n_shared,
               CAST(coalesce(ov.n_shared, 0) * 10000
                 // (a.k + b.k - coalesce(ov.n_shared, 0)) AS BIGINT)
                 AS jaccard_bp
             FROM ks a JOIN ks b ON a.source < b.source
             LEFT JOIN ov ON ov.source_a = a.source
               AND ov.source_b = b.source
             ORDER BY source_a, source_b""")),

    // ---- ZIPF rank-frequency fit: per source, an integer least-squares
    //      slope over (whole-bit log rank, whole-bit log count) of the
    //      top-[[ZipfTopK]] terms — natural text slopes near −1; heavily
    //      templated or machine-generated sources drift off it, which
    //      makes the slope a cheap distribution-shape fingerprint next
    //      to q153's diversity card. Every sum is int64; the closed-form
    //      OLS numerators/denominator divide once, scaled to
    //      milli-units (both engines truncate integer division toward
    //      zero — negative slopes stay parity-safe). Scale shape: one
    //      unigram groupBy, a per-source top-k window over it (k rows
    //      per source thereafter), then a 20-row fold. ----
    "q154_zipf_fit" -> QueryDef(
      (s, dir) => zipfFit(Tables.load(s, dir, "documents")),
      Some(s"""WITH uni AS (
               SELECT source, term, count(*) AS cnt FROM (
                 SELECT source,
                   unnest(string_split_regex(lower(text), ' +')) AS term
                 FROM documents)
               GROUP BY source, term),
             topk AS (
               SELECT source, cnt,
                 row_number() OVER (PARTITION BY source
                   ORDER BY cnt DESC, term) AS rk
               FROM uni QUALIFY rk <= $ZipfTopK),
             pts AS (
               SELECT source,
                 CAST(length(bin(rk)) - 1 AS BIGINT) AS x,
                 CAST(length(bin(cnt)) - 1 AS BIGINT) AS y
               FROM topk),
             f AS (
               SELECT source, count(*) AS n_terms,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
               FROM pts GROUP BY source)
             SELECT source, n_terms,
               (n_terms * sxy - sx * sy) * 1000
                 // (n_terms * sxx - sx * sx) AS slope_milli,
               (sy * sxx - sx * sxy) * 1000
                 // (n_terms * sxx - sx * sx) AS intercept_milli
             FROM f ORDER BY source""")),

    // ---- CROSS-SOURCE VOCABULARY OVERLAP via mergeable KMV sketches
    //      (q195's substrate applied where it actually scales): the
    //      exact pairwise vocabulary Jaccard (q56/q174 measure DOC and
    //      top-k overlap) needs the full per-source vocabularies in one
    //      place — corpus-sized state at 100 TB. KMV sketches are
    //      MERGEABLE on a shared hash domain (Bar-Yossef et al. 2002 /
    //      Beyer et al. SIGMOD 2007): one bounded graft_kmin pass gives
    //      k=128 smallest distinct token hashes per source, and every
    //      pairwise union/Jaccard/intersection estimate is then
    //      arithmetic over |sources|·k rows — per-pair work is O(k),
    //      never a vocabulary join. ρ = |S_k(A∪B) ∩ A ∩ B| / |S_k(A∪B)|
    //      estimates J(A,B); union_est = (k−1)·2^56 div h_(k) (exact
    //      below k); inter_est spelled (union_est div n_union) ·
    //      n_shared IN THAT ORDER in both engines — the div-first form
    //      is what keeps every intermediate under 2^63 (n_shared ≤ k
    //      = 128 and union_est div n_union ≤ 2^56 when n_union = k).
    //      DuckDB replays the identical hashes and window arithmetic. ----
    "q196_vocab_overlap_kmv" -> QueryDef(
      (s, dir) => kmvVocabOverlap(Tables.load(s, dir, "documents")),
      Some("""WITH tok AS (
               SELECT DISTINCT source,
                 CAST(('0x' || substr(md5('vkmv:' || term), 1, 14)) AS BIGINT) AS h
               FROM (SELECT source,
                       unnest(string_split_regex(lower(text), ' +')) AS term
                     FROM documents)
             ), sk AS (
               SELECT source, h FROM (
                 SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
                 FROM tok)
               WHERE rn <= 128
             ), pr AS (
               SELECT a.source AS sa, b.source AS sb
               FROM (SELECT DISTINCT source FROM sk) a
               JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
             ), memb AS (
               SELECT pr.sa, pr.sb, s.h,
                 max(CASE WHEN s.source = pr.sa THEN 1 ELSE 0 END) AS ina,
                 max(CASE WHEN s.source = pr.sb THEN 1 ELSE 0 END) AS inb
               FROM pr JOIN sk s ON s.source = pr.sa OR s.source = pr.sb
               GROUP BY pr.sa, pr.sb, s.h
             ), ru AS (
               SELECT sa, sb, h, ina, inb,
                 row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
               FROM memb
             ), ag AS (
               SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_union_kept,
                 CAST(sum(CASE WHEN ina + inb = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
                 max(h) AS hk
               FROM ru WHERE rn <= 128 GROUP BY sa, sb
             ), est AS (
               SELECT sa, sb, n_union_kept, n_shared,
                 CASE WHEN n_union_kept < 128 THEN n_union_kept
                      ELSE 9151314442816847872 // greatest(hk, 1) END AS union_est
               FROM ag
             )
             SELECT sa AS source_a, sb AS source_b, n_union_kept,
               union_est, n_shared,
               n_shared * 1000 // n_union_kept AS jac_milli,
               (union_est // n_union_kept) * n_shared AS inter_est
             FROM est ORDER BY source_a, source_b""")),
  )

  /** q196's pipeline: ONE bounded-sketch corpus pass, then pure
    * arithmetic over |sources|·k rows. The exploded sketch frame is
    * scoped-cached because the pair-membership union consumes it twice
    * (once per pair side) — without the pin the corpus tokenize+sketch
    * pass would run twice. */
  def kmvVocabOverlap(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    graft.expr.Md5Hash56.register(s)
    graft.expr.KMinDistinct.register(s)
    val K = 128
    val sk = docs
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("source"),
        explode(split(lower(col("text")), " +")).as("term"))
      .select(col("source"),
        expr("graft_md5_56(concat('vkmv:', term))").as("h"))
      .groupBy(col("source")).agg(expr(s"graft_kmin(h, $K)").as("sk"))
      .select(col("source"), explode(col("sk")).as("h"))
      .transform(TransientCache.scopedDF)
    val srcs = sk.select(col("source")).distinct()
    // |sources|² candidate pairs under sa < sb — both sides are
    // source-count-sized, a constant (the q79/q174 affinity shape)
    val pairs = srcs.toDF("sa")
      .join(srcs.toDF("sb"), col("sa") < col("sb"))
    // union membership via TWO broadcast equi-joins (an OR-join would
    // plan as a nested loop): each sketch row lands under every pair
    // its source participates in, with a side flag
    val memb = pairs
      .join(sk.toDF("sa", "h"), "sa")
      .select(col("sa"), col("sb"), col("h"),
        lit(1).as("ina"), lit(0).as("inb"))
      .unionByName(pairs
        .join(sk.toDF("sb", "h"), "sb")
        .select(col("sa"), col("sb"), col("h"),
          lit(0).as("ina"), lit(1).as("inb")))
      .groupBy(col("sa"), col("sb"), col("h"))
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
    memb
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
      .filter(col("rn") <= K)
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("n_union_kept"),
        sum(when(col("ina") + col("inb") === 2, 1L).otherwise(0L))
          .as("n_shared"),
        max(col("h")).as("hk"))
      .select(col("sa"), col("sb"), col("n_union_kept"), col("n_shared"),
        expr(graft.expr.KMinDistinct
            .estimateFromKthSql("n_union_kept", "hk", K))
          .as("union_est"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("n_union_kept"), col("union_est"), col("n_shared"),
        expr("n_shared * 1000 div n_union_kept").as("jac_milli"),
        expr("(union_est div n_union_kept) * n_shared").as("inter_est"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q127's pipeline over a (doc_id, source, text) frame, exposed for
    * growth-invariant specs (monotone curve; final point = exact totals). */
  def vocabGrowth(raw: DataFrame): DataFrame = {
    val docs = raw
      .withColumn("rk", row_number().over(Window
        .partitionBy(col("source"))
        .orderBy(md5(concat(lit("vg:"), col("doc_id").cast("string"))),
          col("doc_id"))))
      .withColumn("bucket", expr(rankBucket("rk")))
      .withColumn("words", split(lower(col("text")), " +"))
    val tokMass = docs
      .groupBy(col("source"), col("bucket"))
      .agg(sum(size(col("words")).cast("long")).as("btokens"))
    val vocab = docs
      .select(col("source"), col("rk"), explode(col("words")).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(min(col("rk")).as("first_rk"))
      .withColumn("bucket", expr(rankBucket("first_rk")))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("bvocab"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("bucket"))
    tokMass.join(vocab, Seq("source", "bucket"), "left_outer")
      .select(col("source"), col("bucket").as("n_docs_prefix"),
        sum(col("btokens")).over(wCum).as("cum_tokens"),
        sum(coalesce(col("bvocab"), lit(0L))).over(wCum).as("cum_vocab"))
      .orderBy(col("source"), col("n_docs_prefix"))
  }

  /** Ceil-power-of-two bucket of a 1-based doc rank: 1,2,4,…,1024, else
    * 2048 — prefix "first 2^k docs" checkpoints. bucket(rk) ≤ B iff
    * rk ≤ B for every power-of-two B, so cumulative sums over buckets
    * equal exact prefix counts at the checkpoints. The CASE text is
    * engine-agnostic — the same string feeds Spark `expr` and DuckDB. */
  /** q127's oracle chain ending at `growth(source, n_docs_prefix,
    * cum_tokens, cum_vocab)` — spliced by q127 and q173. */
  private def vocabGrowthDuckCtes: String =
    s"""ranked AS (
               SELECT source, text,
                 row_number() OVER (PARTITION BY source
                   ORDER BY md5('vg:' || CAST(doc_id AS VARCHAR)), doc_id)
                   AS rk
               FROM documents),
             d AS (
               SELECT source, rk, ${rankBucket("rk")} AS bucket,
                 string_split_regex(lower(text), ' +') AS words
               FROM ranked),
             tok AS (
               SELECT source, bucket,
                 CAST(sum(len(words)) AS BIGINT) AS btokens
               FROM d GROUP BY source, bucket),
             firsts AS (
               SELECT source, term, min(rk) AS first_rk FROM (
                 SELECT source, rk, unnest(words) AS term FROM d)
               GROUP BY source, term),
             voc AS (
               SELECT source, ${rankBucket("first_rk")} AS bucket,
                 count(*) AS bvocab
               FROM firsts GROUP BY source, 2),
             growth AS (
               SELECT t.source, t.bucket AS n_docs_prefix,
                 CAST(sum(t.btokens) OVER (PARTITION BY t.source
                   ORDER BY t.bucket) AS BIGINT) AS cum_tokens,
                 CAST(sum(coalesce(v.bvocab, 0)) OVER (PARTITION BY t.source
                   ORDER BY t.bucket) AS BIGINT) AS cum_vocab
               FROM tok t LEFT JOIN voc v
                 ON t.source = v.source AND t.bucket = v.bucket)"""

  private def rankBucket(c: String): String =
    "CASE " + (0 to 10).map(1 << _)
      .map(b => s"WHEN $c <= $b THEN CAST($b AS BIGINT)").mkString(" ") +
      " ELSE CAST(2048 AS BIGINT) END"

  /** q153's card over a (doc_id, source, text) frame — exposed for
    * hand-checkable specs. See the defs entry for semantics/scale. */
  def lexicalDiversity(docs: DataFrame): DataFrame = {
    // the testdata parquet is one row group — without the repartition the
    // tokenize+explode+partial-agg map side runs on ONE task (the q104
    // codec-chain lesson applied to heavy projections)
    val d = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"),
        split(lower(col("text")), " +").as("ws"))
      .transform(TransientCache.scopedDF)
    val uni = d.select(col("source"), explode(col("ws")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cnt"))
      .transform(TransientCache.scopedDF)
    val srcs = uni.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"))
    val ent = uni.join(srcs.select(col("source"), col("n_tokens")), "source")
      .select(col("source"),
        (col("cnt") * (length(bin(expr("n_tokens div cnt"))) - 1).cast("long"))
          .as("wb"))
      .groupBy(col("source")).agg(sum(col("wb")).as("ent_units"))
    val bgs = d.filter(size(col("ws")) >= 2)
      .select(col("source"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"""))
        .as("b"))
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("bc"))
      .groupBy(col("source"))
      .agg(sum(col("bc")).as("n_bigrams"), count(lit(1)).as("n_bigram_types"))
    val nd = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    nd.join(srcs, "source").join(bgs, "source").join(ent, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
        expr("n_types * 10000 div n_tokens").as("ttr_bp"),
        col("n_bigrams"), col("n_bigram_types"),
        expr("n_bigram_types * 10000 div n_bigrams").as("bigram_ttr_bp"),
        expr("ent_units * 1000 div n_tokens").as("mean_bits_milli"))
      .orderBy(col("source"))
  }

  /** q168 over a (doc_id, source, text) frame — exposed for
    * hand-checkable specs. Whole-bit KL(source ‖ corpus) surrogate; see
    * the defs entry. Integer division of the possibly-negative unit sum
    * truncates toward zero in both engines. */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val sv = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("source"),
        explode(split(lower(col("text")), " +")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cs"))
      .transform(TransientCache.scopedDF)
    val st = sv.groupBy(col("source")).agg(sum(col("cs")).as("ts"))
    val cv = sv.groupBy(col("term")).agg(sum(col("cs")).as("cc"))
    val ct = cv.agg(sum(col("cc")).as("tc"))
    sv.join(st, "source").join(cv, "term").crossJoin(broadcast(ct))
      .select(col("source"), col("cs"),
        ((length(bin(expr("tc div cc"))) - 1) -
          (length(bin(expr("ts div cs"))) - 1)).cast("long").as("db"))
      .groupBy(col("source"))
      .agg(sum(col("cs") * col("db")).as("units"), sum(col("cs")).as("toks"))
      .select(col("source"), col("toks").as("n_tokens"),
        col("units").as("div_units"),
        expr("units * 1000 div toks").as("div_milli_bits"))
      .orderBy(col("source"))
  }

  /** q154's integer OLS Zipf fit over a (doc_id, source, text) frame —
    * exposed for exact-arithmetic specs (power-of-two counts make every
    * whole-bit point and the closed-form slope hand-checkable). */
  def zipfFit(docs: DataFrame): DataFrame = {
    val uni = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("source"),
        explode(split(lower(col("text")), " +")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("term"))
    val pts = uni.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ZipfTopK)
      .select(col("source"),
        (length(bin(col("rk"))) - 1).cast("long").as("x"),
        (length(bin(col("cnt"))) - 1).cast("long").as("y"))
    pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n_terms"),
        expr("(n_terms * sxy - sx * sy) * 1000 div (n_terms * sxx - sx * sx)")
          .as("slope_milli"),
        expr("(sy * sxx - sx * sxy) * 1000 div (n_terms * sxx - sx * sx)")
          .as("intercept_milli"))
      .orderBy(col("source"))
  }

  /** q175 over a (doc_id, source, text) frame — exposed for exact-index
    * specs. Percentile index ceil(p·n) in pure integer arithmetic;
    * ties are value-interchangeable so the picked VALUE is stable. */
  def lengthProfile(docs: DataFrame): DataFrame = {
    val t = docs.select(col("source"),
      size(split(lower(col("text")), " +")).cast("long").as("nt"))
    val w = Window.partitionBy(col("source")).orderBy(col("nt"))
    t.withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        min(col("nt")).as("min_tokens"),
        max(when(col("rk") === expr("(n + 1) div 2"), col("nt")))
          .as("p50_tokens"),
        max(when(col("rk") === expr("(9 * n + 9) div 10"), col("nt")))
          .as("p90_tokens"),
        max(when(col("rk") === expr("(99 * n + 99) div 100"), col("nt")))
          .as("p99_tokens"),
        max(col("nt")).as("max_tokens"))
      .orderBy(col("source"))
  }

  /** q174 over a (doc_id, source, text) frame — exposed for
    * hand-checkable specs. Jaccard (bp) of source-pair top-k term sets. */
  def sourceSimilarity(docs: DataFrame): DataFrame = {
    val uni = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("source"),
        explode(split(lower(col("text")), " +")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("term"))
    val topk = uni.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ZipfTopK)
      .select(col("source"), col("term"))
      .transform(TransientCache.scopedDF)
    val ks = topk.groupBy(col("source")).agg(count(lit(1)).as("k"))
    val ov = topk.as("x")
      .join(topk.as("y"),
        col("x.term") === col("y.term") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    ks.as("a").join(ks.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.k").as("ka"), col("b.k").as("kb"))
      .join(ov, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("n_shared"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        expr("n_shared * 10000 div (ka + kb - n_shared)").as("jaccard_bp"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q173 over a (doc_id, source, text) frame: the q154 integer OLS on
    * q127's growth points under whole-bit logs — slope = Heaps b in
    * milli-units. Exposed for power-of-two-exact specs. */
  def heapsFit(docs: DataFrame): DataFrame = {
    val pts = vocabGrowth(docs)
      .select(col("source"),
        (length(bin(col("cum_tokens"))) - 1).cast("long").as("x"),
        (length(bin(col("cum_vocab"))) - 1).cast("long").as("y"))
    pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n_points"),
        expr("(n_points * sxy - sx * sy) * 1000 div (n_points * sxx - sx * sx)")
          .as("b_milli"),
        expr("(sy * sxx - sx * sxy) * 1000 div (n_points * sxx - sx * sx)")
          .as("logk_milli"))
      .orderBy(col("source"))
  }

  /** The (doc_id, source, is_target, ws) normalization of the DSIR
    * pipeline — one spelling shared by [[dsirWeights]] and the
    * streaming LUT freeze ([[dsirLutRow]]). */
  private def dsirMeta(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("source"),
      Quality.nWords(col("text")).cast("long").as("n_words"),
      Quality.nStop(col("text")).cast("long").as("n_stop"),
      split(lower(col("text")), " +").as("ws"))
    .withColumn("is_target",
      (col("n_stop") * 8 >= col("n_words")).cast("long"))

  /** Per-(doc, is_target, bucket) hashed-feature counts off
    * [[dsirMeta]]. */
  private def dsirFeatsOf(meta: DataFrame): DataFrame = {
    graft.expr.Md5Hash56.register(meta.sparkSession)
    meta
    .select(col("doc_id"), col("is_target"), explode(col("ws")).as("w"))
    .select(col("doc_id"), col("is_target"),
      expr(s"graft_md5_56(w) % $DsirBuckets").as("b"))
    .groupBy(col("doc_id"), col("is_target"), col("b"))
    .agg(count(lit(1)).as("c"))
  }

  /** The trained whole-bit LUT (b, bits_r, bits_t) off the feature
    * counts — THE single spelling of the q178 statistics table, used
    * by [[dsirWeights]] and frozen for the streaming scorer by
    * [[dsirLutRow]]. */
  private def dsirLutOf(feats: DataFrame): DataFrame = {
    val raw = feats.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val tgt = feats.filter(col("is_target") === 1L)
      .groupBy(col("b")).agg(sum(col("c")).as("ct"))
    // coalesce: an empty target set (possible at tiny fixtures) must
    // yield bits_t = 0 on both engines, not a null cascade
    val tots = raw.agg(sum(col("cr")).as("tr"))
      .crossJoin(tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("tt")))
    raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("ct"))
      .crossJoin(tots)
      .select(col("b"),
        (length(bin(expr("tr div (cr + 1)"))) - 1).cast("long").as("bits_r"),
        (length(bin(expr("tt div (ct + 1)"))) - 1).cast("long").as("bits_t"))
  }

  /** The q178 LUT frozen to ONE row carrying a dense [[DsirBuckets]]-
    * element array of per-bucket deltas (bits_r − bits_t): the form a
    * streaming scorer broadcast-crossJoins onto arriving docs
    * ([[graft.streaming.EventStreams.streamingDsirScore]]). Buckets
    * absent from the training corpus carry 0, mirroring the batch
    * inner join where absent buckets contribute nothing to w_units. */
  def dsirLutRow(docs: DataFrame): DataFrame =
    dsirLutOf(dsirFeatsOf(dsirMeta(docs))
        .transform(TransientCache.scopedDF))
      .select(col("b"), (col("bits_r") - col("bits_t")).as("delta"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("delta"))))
        .as("m"))
      .select(expr(
        s"""transform(sequence(cast(0 as bigint),
              cast(${DsirBuckets - 1} as bigint)),
            i -> coalesce(element_at(m, i), 0L))""").as("lut"))

  /** q178 over a (doc_id, source, text) frame: DSIR importance weights
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling") under the engine's whole-bit-log parity
    * discipline. Features are words hashed into [[DsirBuckets]] buckets;
    * the target distribution is the stopword-dense sub-corpus (the
    * integer-exact proxy for "looks like curated text":
    * 8·n_stop ≥ n_words — a pure int64 predicate, no float threshold;
    * ~5% of this corpus, the small-target/big-raw shape DSIR assumes).
    * Per document, the importance weight is
    *
    *   w_units = Σ_b c_doc(b) · (bits_raw(b) − bits_target(b))
    *
    * where bits_x(b) = floor(log2(tokens_x / (cnt_x(b)+1))) is the q89
    * whole-bit surprisal with add-one smoothing (buckets absent from
    * the target stay finite). Positive w_units ⇔ the doc's hashed
    * feature profile is more probable under the target than under the
    * raw corpus — exactly log(p_T/p_R) with whole-bit logs. wpt_milli
    * divides by doc length with an explicit sign split so Spark `div`
    * and DuckDB `//` only ever see non-negative operands (measured:
    * both TRUNCATE on BIGINT — DESIGN.md round-14 — but the invariant
    * keeps parity independent of that engine detail).
    *
    * Scale shape: the feature table is [[DsirBuckets]] rows whatever
    * the corpus size — a broadcast LUT join the per-doc counts stream
    * through map-side; both corpus passes are map-side-combinable
    * groupBys; the shuffle carries (doc_id, bucket, count) triples,
    * never text. Exposed for sign/planted-fixture specs. */
  def dsirWeights(docs: DataFrame): DataFrame = {
    val meta = dsirMeta(docs).transform(TransientCache.scopedDF)
    // (doc, bucket) counts feed three consumers: raw stats, target
    // stats, per-doc weights — persist once (jaccardPairs convention)
    val feats = dsirFeatsOf(meta).transform(TransientCache.scopedDF)
    val lut = dsirLutOf(feats)
    val dw = feats.join(broadcast(lut), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * (col("bits_r") - col("bits_t"))).as("w_units"))
    meta
      .select(col("doc_id"), col("source"), col("is_target"),
        size(col("ws")).cast("long").as("n_tokens"))
      .join(dw, Seq("doc_id"))
      .withColumn("wpt_milli", expr(
        """CASE WHEN w_units < 0
             THEN -((-w_units) * 1000 div n_tokens)
             ELSE w_units * 1000 div n_tokens END"""))
      .select(col("doc_id"), col("source"), col("is_target"),
        col("n_tokens"), col("w_units"), col("wpt_milli"))
      .orderBy(col("doc_id"))
  }

  /** Cache-format version ([[FrameCache.path]]): bump with any
    * semantic change to the DSIR pipeline ([[DsirBuckets]], the hash,
    * the target predicate, the whole-bit LUT, the sign-split). */
  private val DsirCacheV = 1

  /** [[dsirWeights]] over a data dir's documents table, served from the
    * fingerprint cache ([[FrameCache]]): q178 (display), q186
    * (resample) and q184 (quality agreement) each re-ran both corpus
    * passes. All-int64 columns — exact in parquet; row order is not
    * preserved, so the q178 entry re-sorts and the other consumers
    * window/aggregate. */
  def dsirWeightsCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("dsirw", DsirCacheV,
        Similarity.corpusFingerprint(s, dir, "documents"))) {
      dsirWeights(Tables.load(s, dir, "documents"))
    }

  /** q186 over a (doc_id, source, text) frame: Efraimidis-Spirakis
    * weighted sampling (q107's integer-surrogate priority) driven by
    * q178's importance weights. Exposed for monotonicity specs (a
    * heavier doc with the same hash draw always outranks a lighter
    * one). `preWeights` substitutes the cached weight frame. */
  def dsirResample(docs: DataFrame,
      k: Int = DsirSampleK,
      preWeights: Option[DataFrame] = None): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
    preWeights.getOrElse(dsirWeights(docs))
      .select(col("doc_id"), col("source"), col("wpt_milli"))
      .withColumn("weight",
        greatest(col("wpt_milli") + 1000L, lit(1L)))
      .withColumn("priority", expr(
        """cast(conv(substring(md5(concat('dsamp:',
             cast(doc_id as string))), 1, 14), 16, 10) as long)
           div weight"""))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("source"), col("doc_id"), col("wpt_milli"),
        col("weight"), col("priority"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** q184 over a (doc_id, source, text) frame: per q137-surrogate
    * quality decile, the DSIR weight profile (count, non-negative-weight
    * share in basis points, signed mean wpt in milli-units with
    * sign-split division). Exposed for monotone-trend specs on planted
    * corpora. */
  def dsirQualityAgreement(docs: DataFrame,
      preWeights: Option[DataFrame] = None): DataFrame = {
    val w = preWeights.getOrElse(dsirWeights(docs))
      .select(col("doc_id"), col("wpt_milli"))
    val qd = docs
      .withColumn("qint",
        round(round(Quality.score(col("text")), 4) * 10000, 0).cast("long"))
      .select(col("doc_id"),
        least(expr("qint div 1000"), lit(9L)).as("decile"))
    qd.join(w, "doc_id")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("wpt_milli") >= 0, 1L).otherwise(0L)).as("pos"),
        sum(col("wpt_milli")).as("sw"))
      .select(col("decile"), col("n_docs"),
        expr("pos * 10000 div n_docs").as("pos_bp"),
        expr("""CASE WHEN sw < 0 THEN -((-sw) div n_docs)
                ELSE sw div n_docs END""").as("mean_wpt_milli"))
      .orderBy(col("decile"))
  }
}
