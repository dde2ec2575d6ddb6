package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-analysis operators for a training-data pipeline over `documents`:
  * exact dedup, n-gram Jaccard near-dup, language ID, quality scoring,
  * token counting, and content fingerprinting.
  *
  * Scale design: everything is expression-level (codegen'd) except the
  * near-dup join, which is the standard inverted-index shape — explode
  * distinct shingles, self-join on the shingle (the only shuffle key),
  * count intersections, filter by Jaccard. No all-pairs cross join: the
  * candidate set is bounded by shared-shingle frequency, and stopword-like
  * shingles that would make a self-join group quadratic are removed by a
  * document-frequency cutoff (see [[hotShingles]]) before the join —
  * standard MinHash/inverted-index practice.
  */
object TextOps {

  /** Cache-format versions ([[FrameCache.path]]): bump with any
    * semantic change to the owning builder (winnowing window/gram
    * constants, span run rule, CDC gear-hash params, shingle hot-cap
    * constants). */
  private val WinnowCacheV = 1
  private val ContSpansCacheV = 1
  private val CdcCacheV = 1
  private val JacPairsCacheV = 1
  private val DecontamCacheV = 1
  private val PosGramStatsCacheV = 1
  private val NovFirstsCacheV = 1
  private val RareRunsCacheV = 1
  private val WinnowLeakCacheV = 1
  private val CdcDocCacheV = 1

  /** n-word shingle set of the lowercased text, distinct, as a Column
    * expression over a `words` array column. `private[graft]` so the
    * streaming bloom gate computes the IDENTICAL gram set in-row. */
  private[graft] def shingleExpr(n: Int) =
    expr(s"""array_distinct(transform(
              sequence(0, size(words) - $n),
              i -> concat_ws(' ', slice(words, i + 1, $n))))""")

  /** Exploded distinct (doc_id, s) n-gram shingle pairs of a
    * (doc_id, text) frame. */
  def wordShingles(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("words", split(lower(col("text")), " +"))
      .filter(size(col("words")) >= n)
      .select(col("doc_id"), explode(shingleExpr(n)).as("s"))

  /** The near-dup pipeline's 3-gram shingling. */
  def shingles(docs: DataFrame): DataFrame = wordShingles(docs, 3)

  /** q58's per-training-doc distinct shared-4-gram counts against the
    * src0 eval set — the eval-gram intersection verdict shared by q58,
    * q60, q90 and q117 (a doc is CONTAMINATED iff it appears here, so
    * the flag consumers read just the doc_id column). */
  private[graft] def decontamCounts(docs: DataFrame): DataFrame = {
    val evalGrams = wordShingles(docs.filter(col("source") === "src0"), 4)
      .select(col("s")).distinct()
    wordShingles(docs.filter(col("source") =!= "src0"), 4)
      .join(broadcast(evalGrams), "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[decontamCounts]] served from the fingerprint-keyed parquet cache
    * ([[FrameCache]]): the verdict is deterministic per corpus and the
    * training-side 4-gram explode — the expensive side — was re-run by
    * each of its four consumers (q58/q60/q90/q117); now it runs once
    * per corpus (guide §6, the thumbs/decontam/span-branch pattern). */
  private[graft] def decontamCountsCached(s: SparkSession,
      dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("decontam4", DecontamCacheV,
      Similarity.corpusFingerprint(s, dir, "documents"))) {
      decontamCounts(Tables.load(s, dir, "documents"))
    }

  /** q37/q138 shared per-language stopword regexes, in ARGMAX TIE-BREAK
    * ORDER (equal hit counts resolve en > es > fr > de; zh has no set —
    * an uncovered language falls to the first branch on all-zero hits,
    * which q138 makes visible instead of hiding). */
  private[ops] val LangStopRes: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|a)\\b",
    "es" -> "\\b(el|la|los|de|que|y)\\b",
    "fr" -> "\\b(le|les|et|des|un|une)\\b",
    "de" -> "\\b(der|die|das|und|ein|zu)\\b")

  /** q158: a language "participates" in a document at this many stopword
    * hits; a doc with ≥2 participating languages is MIXED. (Declared
    * before `defs` — the oracle interpolates it.) */
  val MixMinHits = 3

  /** The q37 argmax over per-language hit expressions supplied by `h` —
    * ONE predictor definition for the standalone query and the q138
    * confusion audit. */
  private def predLangFrom(h: String => Column): Column =
    when(h("en") >= h("es") && h("en") >= h("fr") && h("en") >= h("de"), "en")
      .when(h("es") >= h("fr") && h("es") >= h("de"), "es")
      .when(h("fr") >= h("de"), "fr")
      .otherwise("de")

  private def duckLangHits(l: String, text: String): String =
    s"len(regexp_extract_all(lower($text), '${LangStopRes.toMap.apply(l)}'))"

  /** DuckDB mirror of [[predLangFrom]] over a raw text column. */
  private def predLangDuck(text: String): String = {
    def h(l: String) = duckLangHits(l, text)
    s"""CASE WHEN ${h("en")} >= ${h("es")} AND ${h("en")} >= ${h("fr")}
                AND ${h("en")} >= ${h("de")} THEN 'en'
           WHEN ${h("es")} >= ${h("fr")} AND ${h("es")} >= ${h("de")}
             THEN 'es'
           WHEN ${h("fr")} >= ${h("de")} THEN 'fr'
           ELSE 'de' END"""
  }

  /** The shared q169/q170 substrate over a (doc_id, text) frame:
    * (fps(doc_id, fp) distinct selected fingerprints — PERSISTED,
    * consumed by two aggregations; grams(doc_id, mp, n_grams)). */
  /** [[winnowFps]] over a data dir's documents table, both frames
    * served from the fingerprint-keyed parquet cache ([[FrameCache]]):
    * the winnowing gram explode + position window is the shared
    * substrate of q169/q170/q182 and the q117 ledger's winnow-leak
    * verdict. The lazy single build is written to two cache dirs; a
    * one-time double materialization of the gram scan on first build
    * is the price of two independent serve paths. */
  private[graft] def winnowFpsCached(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val cfp = Similarity.corpusFingerprint(s, dir, "documents")
    // v-bump with any change to the winnowing window/gram constants
    lazy val built = winnowFps(Tables.load(s, dir, "documents"))
    (FrameCache.serve(s, FrameCache.path("winfp", WinnowCacheV, cfp)) { built._1 },
      FrameCache.serve(s, FrameCache.path("winmp", WinnowCacheV, cfp)) { built._2 })
  }

  private[graft] def winnowFps(docs: DataFrame): (DataFrame, DataFrame) = {
    val s = docs.sparkSession
    graft.expr.Md5Hash56.register(s)
    val grams = docs
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(lower(col("text")), " +").as("ws"))
      .filter(size(col("ws")) >= WinnowK)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(ws) - $WinnowK),
             i -> concat_ws(' ', slice(ws, i + 1, $WinnowK)))"""))
        .as(Seq("pos", "gram")))
      .withColumn("h", expr("graft_md5_56(gram)"))
      .drop("gram")
      .transform(TransientCache.scopedDF)
    val mp = grams.groupBy(col("doc_id"))
      .agg(max(col("pos")).as("mp"), count(lit(1)).as("n_grams"))
    val wWin = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, WinnowW - 1)
    val fps = grams.withColumn("fp", min(col("h")).over(wWin))
      .join(mp.select(col("doc_id"), col("mp")), "doc_id")
      .filter(col("pos") <= col("mp") - (WinnowW - 1))
      .select(col("doc_id"), col("fp")).distinct()
      .transform(TransientCache.scopedDF)
    (fps, mp)
  }

  /** The winnowing fingerprint selection of [[winnowFps]] as ONE pure
    * per-row array expression — no window, no shuffle — so it runs
    * unchanged on a STREAMING DataFrame (WindowExec is batch-only).
    * Returns the same distinct (doc_id, fp) set as the window form
    * (spec-pinned): per-position k-gram hashes, then the minimum of
    * each w-wide hash window, deduplicated per document. The per-row
    * cost is O(tokens · w) array arithmetic inside codegen — the form
    * a streaming ingest gate wants anyway, since each doc's sketch
    * depends on that doc alone. */
  def rowWinnowFps(docs: DataFrame): DataFrame = {
    graft.expr.Md5Hash56.register(docs.sparkSession)
    docs
    .select(col("doc_id"), split(lower(col("text")), " +").as("ws"))
    .filter(size(col("ws")) >= WinnowK + WinnowW - 1)
    .withColumn("hs", expr(
      s"""transform(sequence(0, size(ws) - $WinnowK),
           i -> graft_md5_56(
             concat_ws(' ', slice(ws, i + 1, $WinnowK))))"""))
    .select(col("doc_id"), explode(expr(
      s"""array_distinct(transform(sequence(0, size(hs) - $WinnowW),
           i -> array_min(slice(hs, i + 1, $WinnowW))))""")).as("fp"))
  }

  /** q169 over a (doc_id, text) frame — exposed for guarantee specs
    * (two docs sharing a ≥ k+w−1-token run share a fingerprint). */
  def winnowingFingerprints(docs: DataFrame,
      pre: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val (fps, mp) = pre.getOrElse(winnowFps(docs))
    // fps is distinct on (doc_id, fp) by construction, so the sharer
    // count is a plain count — countDistinct planned a second
    // (fp, doc_id)-keyed exchange + dedup aggregate for nothing
    val shared = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") > 1)
      .select(col("fp")).withColumn("sh", lit(1L))
    fps.join(shared, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        sum(coalesce(col("sh"), lit(0L))).as("n_shared_fp"))
      .join(mp.select(col("doc_id"), col("n_grams")), "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_fp"), col("n_shared_fp"),
        expr("n_shared_fp * 10000 div n_fp").as("shared_bp"))
      .orderBy(col("doc_id"))
  }

  /** q170 over a (doc_id, text) frame — exposed for planted copy-pair
    * specs. See the defs entry for the cap/threshold semantics. */
  def winnowingPairs(docs: DataFrame,
      pre: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val (fps, _) = pre.getOrElse(winnowFps(docs))
    // fps is distinct on (doc_id, fp) by construction — plain count,
    // not countDistinct (same cut as q169's sharer count)
    val hot = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") > WinnowFpCap)
      .select(col("fp"))
    val cold = fps.join(broadcast(hot), Seq("fp"), "left_anti")
      .transform(TransientCache.scopedDF)
    val fct = cold.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    val pr = cold.as("x")
      .join(cold.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowPairMin)
    pr.join(fct.select(col("doc_id").as("da"), col("nf").as("na")), "da")
      .join(fct.select(col("doc_id").as("db"), col("nf").as("nb")), "db")
      .select(col("da"), col("db"), col("n_shared"), col("na"), col("nb"),
        expr("n_shared * 10000 div least(na, nb)").as("overlap_bp"))
      .orderBy(col("da"), col("db"))
  }

  /** q181 over a (doc_id, text) frame — exposed for planted-secret
    * specs. Rare = corpus frequency ≤ [[RareFreqMax]]; a gaps-and-
    * islands pass (pos − row_number over the rare positions) groups
    * consecutive rare tokens into runs; runs ≥ [[RareRunMin]] flag the
    * document. Scale shape: one posexplode (persisted — feeds the
    * frequency table and the rare join; per-doc totals are a plain
    * projection over docs), one
    * map-side-combinable vocabulary groupBy, one word-keyed equi-join
    * (the vocabulary is corpus-sized — never broadcast), and doc-keyed
    * windows; shuffles carry (doc_id, pos) pairs, never text. */
  def rareTokenRuns(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val toks = docs
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " +")).as(Seq("pos", "w")))
      .transform(TransientCache.scopedDF)
    val freq = toks.groupBy(col("w")).agg(count(lit(1)).as("cf"))
    // per-doc token count = the split array's size — a projection on
    // docs, not an aggregate over the exploded token table (the oracle
    // already computes it as len(ws)); saves one token-table pass and
    // its doc-keyed exchange (guide §2.4)
    val nt = docs.select(col("doc_id"),
      size(split(lower(col("text")), " +")).cast("long").as("n_tokens"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = toks.join(freq, "w")
      .filter(col("cf") <= RareFreqMax)
      .select(col("doc_id"), col("pos"))
      .withColumn("grp", col("pos") - row_number().over(wOrd))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
    val perDoc = runs.groupBy(col("doc_id"))
      .agg(sum(col("run_len")).as("n_rare"),
        sum(when(col("run_len") >= RareRunMin, 1L).otherwise(0L))
          .as("n_runs"),
        max(col("run_len")).as("max_run"))
    nt.join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_rare", "n_runs", "max_run"))
      .withColumn("flagged", (col("n_runs") > 0).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** [[rareTokenRuns]] served from the fingerprint-keyed parquet cache:
    * deterministic per corpus and consumed by BOTH q181 and q117's
    * secret-risk verdict — the explode + vocabulary groupBy + rare join
    * + run windows now run once per corpus (guide §6, the
    * image/decontam/span branch pattern). Consumers re-apply their own
    * ORDER BY after the read (parquet read order is unspecified). */
  private[graft] def rareTokenRunsCached(s: SparkSession,
      dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("rareruns", RareRunsCacheV,
      Similarity.corpusFingerprint(s, dir, "documents"))) {
      rareTokenRuns(Tables.load(s, dir, "documents"))
    }

  /** [[winnowDecontam]] served from the fingerprint-keyed parquet
    * cache: deterministic per corpus and consumed by BOTH q182 and
    * q117's winnow-leak verdict — the fp-keyed eval join over the
    * winnowing sketch runs once per corpus (guide §6). */
  private[graft] def winnowDecontamCached(s: SparkSession,
      dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("winleak", WinnowLeakCacheV,
      Similarity.corpusFingerprint(s, dir, "documents"))) {
      winnowDecontam(Tables.load(s, dir, "documents"),
        Some(winnowFpsCached(s, dir)))
    }

  /** q182 over a (doc_id, text) frame — exposed for planted-leak specs.
    * Winnowing-fingerprint decontamination: the q65 hash split tags
    * eval docs (buckets 8-9); a TRAIN doc sharing selected fingerprints
    * with ANY eval doc carries a ≥ WinnowK+WinnowW−1-token verbatim run
    * into the held-out set (the MOSS guarantee, pointed at leakage —
    * catches long spans q58's scattered 4-gram count underweights).
    * Scale shape: one winnowing pass over the corpus (q169's substrate,
    * persisted), then fp-keyed equi-joins only — the eval fingerprint
    * set is corpus-scaled, so it is NOT broadcast. */
  def winnowDecontam(docs: DataFrame,
      pre: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val (fps, _) = pre.getOrElse(winnowFps(docs))
    // The q65 split bucket is a pure function of doc_id, so it is a
    // projection on the fingerprint frame — the former docs⋈fps join
    // shuffled the whole fingerprint table by doc_id just to attach a
    // hash of the join key (guide §2.4).
    val fb = fps.withColumn("b",
      expr("""cast(conv(substring(md5(concat('split:',
           cast(doc_id as string))), 1, 14), 16, 10) as long) % 10"""))
    val evalFps = fb.filter(col("b") >= 8).select(col("fp")).distinct()
    // LEFT join against the (distinct) eval set keeps every train row,
    // so the sketch size n_fp and the eval-shared count fold into ONE
    // doc-keyed aggregate — the former shape paid a separate n_fp
    // aggregate, a separate shared-count aggregate, and a doc-keyed
    // join to glue them (guide §2.3 aggregate before you shuffle).
    // The inner-join semantics (only docs sharing ≥ 1 fp) return as
    // the n_eval_fp > 0 filter.
    fb.filter(col("b") < 8)
      .join(evalFps.withColumn("he", lit(1L)), Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        sum(coalesce(col("he"), lit(0L))).as("n_eval_fp"))
      .filter(col("n_eval_fp") > 0)
      .select(col("doc_id"), col("n_fp"), col("n_eval_fp"),
        expr("n_eval_fp * 10000 div n_fp").as("eval_bp"))
      .orderBy(col("doc_id"))
  }

  /** q165 over a (doc_id, source, ctext) frame — exposed for
    * per-malformation specs. See the defs entry for the rule set. */
  def chatTurnAudit(docs: DataFrame): DataFrame = docs
    .select(col("source"),
      expr("split(ctext, ' [|][|] ')").as("turns"))
    .withColumn("roles", expr(
      """transform(turns, x ->
           CASE WHEN startswith(x, 'user:') THEN 'u'
                WHEN startswith(x, 'assistant:') THEN 'a'
                ELSE 'x' END)"""))
    .withColumn("is_chat", expr(
      "CASE WHEN size(turns) >= 2 AND element_at(roles, 1) != 'x' THEN 1L ELSE 0L END"))
    // sequence(1, 0) is DESCENDING in Spark — guard the 1-turn case
    .withColumn("same_adj", expr(
      """CASE WHEN size(roles) < 2 THEN 0L
         ELSE cast(size(filter(sequence(1, size(roles) - 1), i ->
           element_at(roles, i) = element_at(roles, i + 1))) AS long) END"""))
    .withColumn("empties", expr(
      """size(filter(turns, x ->
           trim(regexp_replace(x, '^(user:|assistant:)', '')) = ''))""")
      .cast("long"))
    .withColumn("badroles",
      expr("size(filter(roles, x -> x = 'x'))").cast("long"))
    .withColumn("shape_ok", expr(
      """CASE WHEN size(roles) >= 2 AND element_at(roles, 1) = 'u'
              AND element_at(roles, size(roles)) = 'a' THEN 1L ELSE 0L END"""))
    .groupBy(col("source"))
    .agg(count(lit(1)).as("n_docs"),
      sum(col("is_chat")).as("n_chat"),
      sum(when(col("is_chat") === 1L, col("same_adj")).otherwise(0L))
        .as("n_role_violations"),
      sum(when(col("is_chat") === 1L, col("empties")).otherwise(0L))
        .as("n_empty_turns"),
      sum(when(col("is_chat") === 1L && col("same_adj") === 0L &&
        col("empties") === 0L && col("badroles") === 0L &&
        col("shape_ok") === 1L, 1L).otherwise(0L)).as("n_wellformed"))
    .orderBy(col("source"))

  /** q180 over a (doc_id, text) frame — exposed for reassembly specs
    * (segments concatenate back to the document; lengths tile exactly).
    * Deterministic FIM rewrite: md5-derived 50% doc selection, two
    * md5-derived character cuts, hash-chosen PSM/SPM sentinel order;
    * the output md5 is over the reassembled training string. All
    * per-row string arithmetic — no shuffle before the output sort. */
  def fimTransform(docs: DataFrame): DataFrame = {
    def h(salt: String) = expr(
      s"""cast(conv(substring(md5(concat('$salt:',
           cast(doc_id as string))), 1, 14), 16, 10) as long)""")
    docs
      .select(col("doc_id"), col("text"),
        greatest(length(col("text")), lit(1)).cast("long").as("l"),
        (h("fimr") % 2).as("hr"), (h("fimm") % 2).as("hm"),
        (h("fim1") % greatest(length(col("text")), lit(1))).as("c1"),
        (h("fim2") % greatest(length(col("text")), lit(1))).as("c2"))
      .withColumn("lo", least(col("c1"), col("c2")))
      .withColumn("hi", greatest(col("c1"), col("c2")))
      .withColumn("pre", expr("substring(text, 1, lo)"))
      .withColumn("mid", expr("substring(text, lo + 1, hi - lo)"))
      .withColumn("suf", expr("substring(text, hi + 1)"))
      .select(col("doc_id"),
        when(col("hr") === 1, "ar")
          .when(col("hm") === 0, "psm").otherwise("spm").as("mode"),
        when(col("hr") === 1, length(col("text")).cast("long"))
          .otherwise(col("lo")).as("len_prefix"),
        when(col("hr") === 1, 0L)
          .otherwise(col("hi") - col("lo")).as("len_middle"),
        when(col("hr") === 1, 0L)
          .otherwise(length(col("text")).cast("long") - col("hi"))
          .as("len_suffix"),
        when(col("hr") === 1, md5(col("text")))
          .when(col("hm") === 0, md5(concat(lit("<PRE>"), col("pre"),
            lit("<SUF>"), col("suf"), lit("<MID>"), col("mid"))))
          .otherwise(md5(concat(lit("<SUF>"), col("suf"),
            lit("<PRE>"), col("pre"), lit("<MID>"), col("mid"))))
          .as("out_md5"))
      .orderBy(col("doc_id"))
  }

  /** q177 over a (doc_id, source, ctext) frame — exposed for planted
    * transcript specs. Adjacent (user, assistant) turns with non-empty
    * response become (prompt, response) examples. */
  def instructionPairs(docs: DataFrame): DataFrame = {
    val wl = Window.partitionBy(col("doc_id")).orderBy(col("ti"))
    docs
      .select(col("doc_id"), col("source"),
        posexplode(expr("split(ctext, ' [|][|] ')")).as(Seq("ti", "turn")))
      .withColumn("nturn", lead(col("turn"), 1).over(wl))
      .filter(expr("startswith(turn, 'user:')") &&
        col("nturn").isNotNull &&
        expr("startswith(nturn, 'assistant:')") &&
        expr("trim(regexp_replace(nturn, '^assistant:', ''))") =!= "")
      .withColumn("prompt", expr("trim(regexp_replace(turn, '^user:', ''))"))
      .withColumn("response",
        expr("trim(regexp_replace(nturn, '^assistant:', ''))"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(size(split(col("prompt"), " +")).cast("long"))
          .as("prompt_words"),
        sum(size(split(col("response"), " +")).cast("long"))
          .as("response_words"),
        countDistinct(expr("md5(concat(prompt, chr(31), response))"))
          .as("n_distinct_pairs"))
      .orderBy(col("source"))
  }

  /** q166 over a (doc_id, source, ttext) frame — exposed for planted
    * loop-tail specs. Trailing run = n − max index whose token differs
    * from the last (empty filter ⇒ the whole doc is one repeated
    * token). */
  def tailRepetition(docs: DataFrame): DataFrame = docs
    .select(col("source"), expr("split(ttext, ' +')").as("ws"))
    .withColumn("run", expr(
      """CASE WHEN size(ws) < 2 THEN cast(size(ws) AS long)
         ELSE size(ws) - coalesce(array_max(filter(
           sequence(1, size(ws) - 1),
           i -> element_at(ws, i) != element_at(ws, size(ws)))), 0L) END"""))
    .groupBy(col("source"))
    .agg(count(lit(1)).as("n_docs"),
      sum(when(col("run") >= TailRepeatMin, 1L).otherwise(0L))
        .as("n_flagged"),
      max(col("run")).as("max_tail_run"))
    .select(col("source"), col("n_docs"), col("n_flagged"),
      expr("n_flagged * 10000 div n_docs").as("flagged_bp"),
      col("max_tail_run"))
    .orderBy(col("source"))

  /** q158 over a (doc_id, lang, text) frame — exposed for planted
    * code-switching specs. A doc is mixed when ≥2 stopword families
    * reach [[MixMinHits]]; secondary_hits is the total hit mass the
    * winning language does not explain. */
  def languageMixing(docs: DataFrame): DataFrame = {
    val hits = LangStopRes.map { case (l, re) =>
      size(regexp_extract_all(lower(col("text")), lit(re), lit(0)))
        .cast("long").as(s"${l}_hits")
    }
    val hcols = LangStopRes.map(p => col(s"${p._1}_hits"))
    docs.select(col("doc_id") +: col("lang") +: hits: _*)
      .withColumn("langs_hit",
        hcols.map(c => when(c >= MixMinHits, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("sec_hits",
        hcols.reduce(_ + _) - greatest(hcols: _*))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("langs_hit") >= 2L, 1L).otherwise(0L)).as("n_mixed"),
        sum(col("sec_hits")).as("secondary_hits"))
      .select(col("lang").as("tagged_lang"), col("n_docs"), col("n_mixed"),
        expr("n_mixed * 10000 div n_docs").as("mixed_bp"),
        col("secondary_hits"))
      .orderBy(col("tagged_lang"))
  }

  /** q138's pipeline over a (doc_id, lang, text) frame, exposed for
    * planted multilingual specs. */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    val t = lower(col("text"))
    docs
      .select(col("lang").as("tagged_lang"),
        predLangFrom(l => size(regexp_extract_all(t,
          lit(LangStopRes.toMap.apply(l)), lit(0)))).as("pred_lang"))
      .groupBy(col("tagged_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_bp", expr("n_docs * 10000 div sum(n_docs)" +
        " OVER (PARTITION BY tagged_lang)"))
      .orderBy(col("tagged_lang"), col("pred_lang"))
  }

  /** Span-contamination policy gate: a doc whose longest consecutive
    * hit-gram run reaches this many 4-grams (= run + 3 words verbatim,
    * so 10 grams ≈ a 13-word quote — the GPT-3-appendix-C order) is
    * span-contaminated. Consumed by the q117 ledger. */
  val SpanRunGate = 10

  /** POSITIONAL n-gram shingles — (doc_id, i, s) with i the 0-based word
    * offset, duplicates kept — for operators that need where a gram sits
    * (q128's contamination run-lengths), unlike [[wordShingles]]'s
    * distinct set semantics. */
  def positionalWordShingles(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("words", split(lower(col("text")), " +"))
      .filter(size(col("words")) >= n)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(words) - $n),
              i -> concat_ws(' ', slice(words, i + 1, $n)))"""))
        .as(Seq("i", "s")))

  /** q128's pipeline over a (doc_id, source, text) frame, exposed for
    * planted-quote specs: positional 4-grams of non-eval docs hit the
    * eval source's distinct gram set; hit positions collapse to maximal
    * consecutive runs (gaps-and-islands); a run of r grams spans r+3
    * words. */
  /** [[contaminationSpans]] over a data dir's documents table, served
    * from the fingerprint cache ([[FrameCache]]): the positional-gram
    * hit collapse is consumed by THREE queries — q128, q139's
    * threshold sweep and the q117 ledger's span verdict. Order is NOT
    * preserved; q128 re-sorts. v-bump with any change to the gram
    * size, run rule or eval-source convention. */
  def contaminationSpansCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("contspans", ContSpansCacheV,
        Similarity.corpusFingerprint(s, dir, "documents"))) {
      contaminationSpans(graft.Tables.load(s, dir, "documents"))
    }

  def contaminationSpans(docs: DataFrame,
      evalSource: String = "src0"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evalGrams = wordShingles(docs.filter(col("source") === evalSource), 4)
      .select(col("s")).distinct()
    val hits = positionalWordShingles(
      docs.filter(col("source") =!= evalSource), 4)
      .join(broadcast(evalGrams), "s")
      .select(col("doc_id"), col("i"))
    val wRn = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    hits
      .withColumn("grp", col("i") - row_number().over(wRn))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("doc_id"))
      .agg(sum(col("run_len")).as("n_hit_grams"),
        max(col("run_len")).as("max_run_grams"))
      .withColumn("max_span_words", col("max_run_grams") + lit(3L))
      .orderBy(col("doc_id"))
  }

  /** DuckDB CTEs building the POSITIONAL (doc_id, i, s) 4-gram rows `pg`
    * over `documents` — the oracle mirror of [[positionalWordShingles]]
    * at n = 4 (i is 1-based here; only differences of i are consumed, so
    * the base offset cancels). */
  private[ops] val posGramDuckCtes: String =
    """pw AS (
               SELECT doc_id,
                 unnest(string_split_regex(lower(text), ' +')) AS word,
                 generate_subscripts(string_split_regex(lower(text), ' +'), 1) AS i
               FROM documents),
             pg AS (
               SELECT doc_id, i, s FROM (
                 SELECT doc_id, i,
                   concat_ws(' ', word,
                     lead(word, 1) OVER (PARTITION BY doc_id ORDER BY i),
                     lead(word, 2) OVER (PARTITION BY doc_id ORDER BY i),
                     lead(word, 3) OVER (PARTITION BY doc_id ORDER BY i)) AS s,
                   lead(word, 3) OVER (PARTITION BY doc_id ORDER BY i) AS tail
                 FROM pw)
               WHERE tail IS NOT NULL)"""

  /** A shingle shared by k documents contributes a k-member join group —
    * k·(k-1)/2 candidate pairs — to the inverted-index self-join, so the
    * cap must be on the ABSOLUTE group size, not the document fraction: a
    * shingle carried by just 1 % of a 10-billion-doc corpus still forms a
    * ~10¹⁶-pair group. Mirrors [[Dedup.HotBandCap]]; chosen so nothing is
    * excluded at the test scales (max observed df is 25 at sf0.1) while
    * bounding every join group at corpus scale. */
  val HotShingleCap = 200

  /** Window width (words) for q99's repeated-span report — the fixed
    * granularity at which exact substring repetition is detected. 16
    * words ≈ the shortest span worth rewriting; the Lee et al. 2022
    * production setting is 50 BPE tokens, the same order of text. */
  val SpanWords = 16

  /** q229's candidate minimum-span floors (words) for the keep-first
    * rewrite policy — [[SpanWords]] itself (mask everything detected)
    * up to the Lee et al. 50-token order and beyond. ONE constant
    * feeds the Spark conditional aggregate and the generated oracle
    * SQL (the q226/q223 discipline: grid drift between engines
    * impossible by construction). Declared before `defs`, whose
    * oracle string interpolates it eagerly at object init. */
  val SubstringSweepGrid: Seq[Long] = Seq(16L, 24L, 32L, 48L, 64L)

  /** q99's pipeline over a (doc_id, text) frame, exposed for planted
    * span specs: sliding `w`-word windows (stride 1) md5-keyed, a window
    * repeated iff its key occurs in any other (doc, pos) slot — same-doc
    * repeats count too, matching the substring-dedup semantic. */
  def repeatedSpansReport(docs: DataFrame, w: Int = SpanWords,
      pre: Option[DataFrame] = None): DataFrame =
    pre.getOrElse(posGramStats(docs, w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_repeated"))
      .withColumn("repeat_frac",
        round(col("n_repeated") / col("n_windows"), 4))
      .orderBy(col("doc_id"))

  /** (doc_id, pos, mn, mx, occ) for every stride-1 `w`-word window: the
    * gram key's corpus-wide min/max doc_id and occurrence count —
    * everything q99 (occ), q227 (mn/mx) and q228/q229 (mn) read off the
    * gram-keyed window, computed in ONE pass so the gram explode and
    * the 32-byte-key exchange are shared. The gram key itself is
    * projected away: consumers only consume the three int64 stats. */
  private[graft] def posGramStats(docs: DataFrame,
      w: Int = SpanWords): DataFrame = {
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("wkey"))
    posKeyedGrams(docs, w)
      .withColumn("mn", min(col("doc_id")).over(byKey))
      .withColumn("mx", max(col("doc_id")).over(byKey))
      .withColumn("occ", count(lit(1)).over(byKey))
      .select(col("doc_id"), col("pos"), col("mn"), col("mx"), col("occ"))
  }

  /** [[posGramStats]] at [[SpanWords]] served from the fingerprint-keyed
    * parquet cache: deterministic per corpus, and its four consumers
    * (q99/q227/q228/q229) each re-ran the explode + gram-keyed window —
    * now one build per corpus, read back with full column pruning
    * (guide §6). */
  private[graft] def posGramStatsCached(s: SparkSession,
      dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("posgramstats", PosGramStatsCacheV,
      Similarity.corpusFingerprint(s, dir, "documents"))) {
      posGramStats(Tables.load(s, dir, "documents"))
    }

  /** (doc_id, pos, wkey) for every stride-1 `w`-word window — the
    * shared substrate of q99 (repeat counting), q227 (span extraction)
    * and q228 (rewrite ledger): [[positionalWordShingles]]' grams,
    * md5-keyed. One definition so the tokenization can never diverge
    * between the three and their shared oracle spelling. */
  private def posKeyedGrams(docs: DataFrame, w: Int): DataFrame =
    positionalWordShingles(docs, w)
      .select(col("doc_id"), col("i").as("pos"), md5(col("s")).as("wkey"))

  /** q227's pipeline over a (doc_id, text) frame, exposed for planted
    * span specs: MAXIMAL token spans shared VERBATIM with at least one
    * OTHER document — the exact-substring extraction the sketch family
    * cannot give. q33's winnowing SAMPLES fingerprints (a 50-token
    * verbatim run between two docs can fall between anchors), q99
    * COUNTS repeated windows without extracting spans (and counts
    * same-doc repeats), q212 attributes firsts; this query walks every
    * stride-1 [[SpanWords]]-gram (every position of a shared run ≥ w
    * IS a shared gram — exhaustive, not sampled), keeps grams whose
    * key occurs in ≥ 2 DISTINCT docs, and extends consecutive shared
    * positions into maximal runs per doc (gaps-and-islands).
    *
    * Output per (doc, island): 1-based word start, window count, span
    * length in words (= windows + w − 1), and `witness_doc` — the
    * smallest other doc sharing one of the span's grams. Gram-level
    * semantics, stated honestly: each GRAM of the span is shared with
    * some other doc; a long span may be stitched from different
    * partners ("covered by other corpus content"), which is the
    * contamination readout a rewrite/mask pass needs — per-pair whole-
    * span agreement would put a doc-pair join on hot grams (quadratic
    * in sharers) for no extra masking power.
    *
    * Scale shape (q99/q212's): ONE stride-1 explode (rows ≈ corpus
    * tokens, shuffle carries (doc_id, pos, 32-byte key)), ONE
    * gram-keyed window computing min/max doc_id (cross-doc ⇔
    * min ≠ max — no count-distinct, no self-join; a span shared by a
    * million docs costs a million-row window group, never a pair
    * set), one per-doc islands window (bounded by doc length), one
    * map-side island rollup. Pure int64 output. */
  def crossDocSpansReport(docs: DataFrame, w: Int = SpanWords,
      pre: Option[DataFrame] = None): DataFrame = {
    val wnd = org.apache.spark.sql.expressions.Window
    val shared = pre.getOrElse(posGramStats(docs, w))
      .filter(col("mn") =!= col("mx"))
      .withColumn("witness",
        when(col("mn") =!= col("doc_id"), col("mn")).otherwise(col("mx")))
    val byDocPos = wnd.partitionBy(col("doc_id")).orderBy(col("pos"))
    shared
      .withColumn("grp", col("pos") - row_number().over(byDocPos))
      .groupBy(col("doc_id"), col("grp"))
      .agg((min(col("pos")) + 1).cast("long").as("span_start"),
        count(lit(1)).as("n_windows"),
        (count(lit(1)) + (w - 1)).cast("long").as("span_words"),
        min(col("witness")).as("witness_doc"))
      .select(col("doc_id"), col("span_start"), col("n_windows"),
        col("span_words"), col("witness_doc"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** q228's pipeline over a (doc_id, text) frame, exposed for planted
    * specs: the keep-one-copy substring-dedup REWRITE ledger — the
    * actionable form of [[crossDocSpansReport]]'s extraction, with the
    * Lee et al. 2022 ExactSubstr policy ("Deduplicating Training Data
    * Makes Language Models Better": remove every LATER copy of a
    * duplicated span, keep the first). A window at (doc, pos) is a DUP
    * iff its gram's corpus-first occurrence (min doc_id — ingest
    * order's deterministic proxy, q212's rule) is an EARLIER doc; dup
    * windows cover [p, p+w−1] and overlapping/abutting intervals
    * coalesce (q191's running-max gaps-and-islands construction, so
    * both engines agree bitwise on pure int64). Per affected doc: word
    * count, merged masked-span count, masked word total, and
    * retained_bp — what a loss-masking or rewrite step consumes
    * directly, and the per-doc cost sheet a dedup-policy debate needs
    * (q227 says WHERE the shared text is; this says what the
    * keep-first policy would DO to each doc). The keeper copy and
    * purely-internal repetition are untouched by construction
    * (mn = doc_id fails the strict <): within-doc repetition is q99's
    * domain, deliberately not this policy's.
    *
    * Scale shape: [[posKeyedGrams]] (one stride-1 explode, linear in
    * corpus tokens), ONE gram-keyed min window (no self-join — a span
    * duplicated by a million docs costs a million-row window group),
    * one per-doc ordered window pair for interval merge (bounded by
    * doc length), map-side rollups, one doc-keyed equi-join to pick up
    * word counts. Pure int64 output. */
  /** The merged keep-first dup spans (doc_id, s, e) behind q228's
    * ledger and q229's policy sweep: dup windows (corpus-first
    * occurrence elsewhere) coalesced into maximal 1-based word
    * intervals per doc — q191's running-max gaps-and-islands. */
  private def crossDocDupSpans(docs: DataFrame, w: Int,
      pre: Option[DataFrame] = None): DataFrame = {
    val wnd = org.apache.spark.sql.expressions.Window
    val dup = pre.getOrElse(posGramStats(docs, w))
      .filter(col("mn") < col("doc_id"))
      .select(col("doc_id"), (col("pos") + 1L).as("p"))
    val wOrd = wnd.partitionBy(col("doc_id")).orderBy(col("p"))
    val isl = dup
      .withColumn("prev_end", max(col("p") + (w - 1)).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_isl", when(
        col("prev_end").isNull || col("p") > col("prev_end") + 1L,
        1L).otherwise(0L))
      .withColumn("island", sum(col("new_isl")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("s"), (max(col("p")) + (w - 1)).as("e"))
      .select(col("doc_id"), col("s"), col("e"))
  }

  def crossDocRewriteLedger(docs: DataFrame, w: Int = SpanWords,
      pre: Option[DataFrame] = None): DataFrame = {
    val nWords = docs
      .select(col("doc_id"),
        size(split(lower(col("text")), " +")).cast("long").as("n_words"))
    crossDocDupSpans(docs, w, pre)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1L).as("n_masked_words"))
      .join(nWords, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_spans"),
        col("n_masked_words"),
        expr("(n_words - n_masked_words) * 10000 div n_words")
          .as("retained_bp"))
      .orderBy(col("doc_id"))
  }

  /** q229: the policy sweep over q228's rewrite — before a production
    * run hard-codes a minimum masked-span floor, measure what each
    * candidate floor t in [[SubstringSweepGrid]] would do: spans are
    * detected and MERGED exactly as shipped ([[crossDocDupSpans]], the
    * q139 convention — the gate applies to the measured statistic, not
    * inside the detector), then a floor keeps only merged spans of
    * ≥ t words. Per t: affected docs, kept spans, masked words, and
    * the masked share of the whole corpus in basis points — the
    * cost/aggressiveness curve that separates "mask every 16-word
    * echo" from "only rewrite wholesale copies". Grid points with no
    * qualifying spans report zeros (the otherwise-0 arms); an entirely
    * span-free corpus reports nulls, identically in both engines.
    *
    * Scale shape: the span frame is already bounded (merged spans ≪
    * corpus rows); the sweep is ONE one-row conditional aggregate over
    * it carrying the whole grid (q226's shape — no per-t rescan),
    * one-row-cross-joined with the corpus word total and
    * stack-unpivoted to |grid| rows. Empty-grid rows report zeros via
    * the conditional sums. Pure int64. */
  def substringPolicySweep(docs: DataFrame, w: Int = SpanWords,
      pre: Option[DataFrame] = None): DataFrame = {
    val grid = SubstringSweepGrid
    val spans = crossDocDupSpans(docs, w, pre)
      .withColumn("width", col("e") - col("s") + 1L)
    val totalWords = docs.agg(
      sum(size(split(lower(col("text")), " +")).cast("long"))
        .as("total_words"))
    val gridAggs = grid.flatMap { t => Seq(
      countDistinct(when(col("width") >= t, col("doc_id"))).as(s"d_$t"),
      sum(when(col("width") >= t, 1L).otherwise(0L)).as(s"s_$t"),
      sum(when(col("width") >= t, col("width")).otherwise(0L)).as(s"m_$t"))
    }
    spans.agg(gridAggs.head, gridAggs.tail: _*)
      .crossJoin(totalWords)
      .select(
        expr(s"stack(${grid.size}, ${grid.map(t =>
            s"${t}L, d_$t, s_$t, m_$t").mkString(", ")}) " +
          "as (min_span_words, n_docs, n_spans, masked_words)"),
        col("total_words"))
      .select(col("min_span_words"), col("n_docs"), col("n_spans"),
        col("masked_words"),
        expr("masked_words * 10000L div total_words").as("masked_bp"))
      .orderBy(col("min_span_words"))
  }

  /** Gram width for q212's novelty attribution — 8 words, the scale
    * where a match means shared phrasing rather than shared vocabulary
    * (the q58/q128 contamination family uses 4; novelty wants the
    * stricter width so boilerplate function-word runs don't mask
    * genuinely new content). */
  val NoveltyWords = 8

  /** Per-document n-gram NOVELTY: the share of a doc's distinct
    * [[NoveltyWords]]-grams whose FIRST corpus occurrence (min doc_id —
    * ingest order's deterministic proxy) is the doc itself. The
    * marginal-contribution read behind dedup-threshold debates (Lee et
    * al. 2022): a doc can be no exact or near dup of any single other
    * doc and still be ~0 novel because every phrase of it appeared
    * scattered across earlier docs — invisible to q31/q33/q99, which
    * test pairwise or count recurrences without attributing firsts.
    *
    * Scale shape: one explode with per-doc `array_distinct` (so a
    * doc's internal repetition doesn't inflate its own novelty), ONE
    * gram-keyed window for the corpus-wide min (the q99 shape — no
    * self-join, no broadcast), then a map-side doc rollup. Pure int64
    * basis points. */
  def ngramNoveltyReport(docs: DataFrame, w: Int = NoveltyWords,
      pre: Option[DataFrame] = None): DataFrame =
    pre.getOrElse(noveltyFirsts(docs, w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000L div n_grams"))
      .orderBy(col("doc_id"))

  /** (doc_id, first_doc) for every distinct [[NoveltyWords]]-gram
    * instance — the corpus-first attribution behind q212/q213/q216,
    * computed in ONE explode + gram-keyed window. The gram key is
    * projected away; per-source attribution re-attaches `source` via
    * the functional doc_id → source map (doc-keyed equi-joins). */
  private[graft] def noveltyFirsts(docs: DataFrame,
      w: Int = NoveltyWords): DataFrame = {
    val wnd = org.apache.spark.sql.expressions.Window
    docs
      .withColumn("words", split(lower(col("text")), " +"))
      .filter(size(col("words")) >= w)
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(
              sequence(0, size(words) - $w),
              i -> md5(concat_ws(' ', slice(words, i + 1, $w)))))"""))
        .as("wkey"))
      .withColumn("first_doc",
        min(col("doc_id")).over(wnd.partitionBy(col("wkey"))))
      .select(col("doc_id"), col("first_doc"))
  }

  /** [[noveltyFirsts]] at [[NoveltyWords]] served from the
    * fingerprint-keyed parquet cache: deterministic per corpus; its
    * three consumers (q212/q213/q216) each re-ran the distinct-gram
    * explode + gram-keyed window — now one build per corpus (guide §6). */
  private[graft] def noveltyFirstsCached(s: SparkSession,
      dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("novfirsts", NovFirstsCacheV,
      Similarity.corpusFingerprint(s, dir, "documents"))) {
      noveltyFirsts(Tables.load(s, dir, "documents"))
    }

  /** Per-SOURCE novelty attribution — [[ngramNoveltyReport]]'s rollup
    * axis for mixture weighting: of each source's distinct-gram
    * instances, how many are corpus firsts (novel_bp), and how many of
    * the non-first instances repeat content whose first occurrence
    * lives in a DIFFERENT source (xsource_bp) vs earlier docs of the
    * same source. A source can be internally clean (q31/q33 find
    * nothing) yet contribute almost nothing the rest of the corpus
    * hasn't already said — its weight in q87/q172's mixture math
    * should see that. Same scale shape as q212 plus one broadcast-size
    * doc→source join on the window's first_doc. */
  def sourceNoveltyReport(docs: DataFrame, w: Int = NoveltyWords,
      pre: Option[DataFrame] = None): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    pre.getOrElse(noveltyFirsts(docs, w))
      .join(src, "doc_id") // doc_id → source is functional: 1 row in, 1 out
      .join(src.select(col("doc_id").as("first_doc"),
        col("source").as("first_source")), "first_doc")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"),
        sum(when(col("first_doc") =!= col("doc_id") &&
          col("first_source") =!= col("source"), 1L).otherwise(0L))
          .as("n_xsource_repeat"))
      .select(col("source"), col("n_grams"), col("n_novel"),
        expr("n_novel * 10000L div n_grams").as("novel_bp"),
        col("n_xsource_repeat"),
        expr("n_xsource_repeat * 10000L div n_grams").as("xsource_bp"))
      .orderBy(col("source"))
  }

  /** Merge rounds for q100's BPE TRAINER — true iterative training
    * (argmax pair → apply merge → RECOUNT), unlike q95 which applies a
    * static table. Small and fixed so both engines replay the identical
    * deterministic iterations (the ORACLE unrolls one CTE pair per
    * round, so the gated round count stays small; the Spark-side
    * trainer itself is bounded by jobs, not expression depth — see
    * [[trainBpe]] — and BpeTrainSpec runs it to 64 merges). */
  val TrainMerges = 4

  /** Merge rounds for q103's DEEP trainer gate — 4× the q100 depth. The
    * q100 oracle unrolls one CTE pair per round (its budget must stay
    * small); q103's oracle instead iterates a `WITH RECURSIVE` whose
    * whole round state (the tokenized vocabulary) lives in ONE row as a
    * list-of-structs, so its depth costs iterations, not SQL text. 16
    * rounds puts the realistic later-merges-contain-earlier behavior
    * (see the BpeTrainSpec 64-merge mirror) under the DuckDB hash gate
    * instead of spec-only trust. */
  val TrainMergesDeep = 16

  /** Vocabulary cap for q103: the recursive oracle recounts pairs with
    * O(|pairs|·|distinct pairs|) scalar list work per round on its
    * single state row, so the gated vocabulary is the top-[[DeepVocab]]
    * words — plenty to exercise 16 real merge rounds, small enough that
    * the oracle replays them in well under a second. The Spark trainer
    * itself has no such cap (its per-round cost is one vocab-sized
    * distributed aggregation regardless of vocabulary size). */
  val DeepVocab = 64

  private def escSq(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")

  /** ONE greedy left-to-right merge pass over a token-array column:
    * every (ta, tb) adjacency collapses to `m`, left association (the
    * fold consumes its own output, so "aaa" under a+a → [aa, a]). */
  private def bpeMergeFoldExpr(src: String, ta: String, tb: String,
      m: String): String =
    s"""aggregate($src, cast(array() as array<string>),
          (acc, t) -> case
            when size(acc) = 0 then array(t)
            when element_at(acc, -1) = '${escSq(ta)}' and t = '${escSq(tb)}'
              then concat(slice(acc, 1, size(acc) - 1),
                          array('${escSq(m)}'))
            else concat(acc, array(t)) end)"""

  /** True BPE training over a (word, wcnt) vocabulary: each round counts
    * wcnt-weighted adjacent-token pairs over the CURRENT tokenization,
    * takes the deterministic argmax (cnt DESC, then pair), applies the
    * merge, and recounts — later merges can contain earlier ones.
    *
    * The tokenization is MATERIALIZED per round (eager `localCheckpoint`
    * on the vocab-sized frame) instead of re-nesting the greedy fold
    * expression once per round: the expression tree each round presents
    * to analysis/codegen is ONE fold deep regardless of the merge
    * budget, so a realistic 1k-32k-merge vocabulary is bounded by Spark
    * JOBS (one vocab-sized aggregation + a 1-row argmax collect per
    * round — inherent to BPE's sequential argmax), never by
    * analyzer/Janino depth walls. Driver state stays ≤ one (rank, pair,
    * count) tuple per round — the tokenizer artifact itself.
    * BpeTrainSpec pins a 64-merge run bitwise against an in-memory
    * reference trainer (the 4-round oracle CTE chain pins the gated
    * configuration). */
  /** The q95 merge-application vocabulary: for every DISTINCT word in
    * `docs`, its char count and its token count after the top-
    * [[BpeMerges]] q88 merge rules are applied as rank-ordered greedy
    * folds. Factored out so q95 (per-doc encode report) and q122
    * (per-source×lang tokenizer-fertility report) apply ONE definition.
    * The folds run once per distinct word — the vocabulary, which grows
    * sublinearly in the corpus — and callers join the (word, w_chars,
    * w_toks) frame back onto word instances by the word key (shuffle,
    * not broadcast: vocab can be huge at corpus scale). The merge table
    * is a bounded tokenizer artifact (≤ [[BpeMerges]] rows, the same
    * bounded-metadata collect class as the percentile cuts) folded into
    * the expression tree. */
  private def bpeVocabToks(docs: DataFrame): DataFrame = {
    def esc(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
    val merges = docs
      .select(explode(split(lower(col("text")), " +")).as("word"))
      .filter(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(BpeMerges)
      .collect().map(_.getString(0))
    val chars0 =
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    val folded = merges.foldLeft(chars0) { (toks, p) =>
      val (a, b) = (esc(p.substring(0, 1)), esc(p.substring(1, 2)))
      s"""aggregate($toks, cast(array() as array<string>),
            (acc, t) -> case
              when size(acc) = 0 then array(t)
              when element_at(acc, -1) = '$a' and t = '$b'
                then concat(slice(acc, 1, size(acc) - 1), array('${esc(p)}'))
              else concat(acc, array(t)) end)"""
    }
    docs
      .select(explode(split(lower(col("text")), " +")).as("word"))
      .filter(length(col("word")) >= 1)
      .select(col("word")).distinct()
      .withColumn("toks", expr(folded))
      .select(col("word"), length(col("word")).as("w_chars"),
        size(col("toks")).as("w_toks"))
  }

  /** The q95 oracle's CTE chain, factored out (`bpe_`-prefixed names)
    * so q95 and q122 splice ONE merge-application definition. Ends at
    * `bpe_toks(doc_id, word, toks)`: every word instance with its
    * post-merge token list (the DuckDB mirror of [[bpeVocabToks]]
    * joined back onto instances — the oracle folds per instance, which
    * is fine at oracle scale). */
  private def bpeEncodeDuckCtes: String = {
    val msel = (1 to BpeMerges)
      .map(r => s"max(CASE WHEN rk = $r THEN pair END) AS p$r")
      .mkString(", ")
    val charsDuck =
      "list_transform(generate_series(1, length(word)), i -> substr(word, i, 1))"
    val foldedDuck = (1 to BpeMerges).foldLeft(charsDuck) { (toks, r) =>
      s"""list_reduce(
            list_prepend(CAST([] AS VARCHAR[]),
              list_transform($toks, t -> [t])),
            (acc, x) -> CASE
              WHEN len(acc) = 0 THEN x
              WHEN acc[-1] = substr(p$r, 1, 1) AND x[1] = substr(p$r, 2, 1)
                THEN list_append(acc[1:len(acc) - 1], p$r)
              ELSE list_append(acc, x[1]) END)"""
    }
    s"""bpe_w AS (
             SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS word
             FROM documents),
           bpe_mp AS (
             SELECT unnest(list_transform(generate_series(1, length(word) - 1),
               i -> substr(word, i, 2))) AS pair
             FROM bpe_w WHERE length(word) >= 2),
           bpe_merges AS (
             SELECT pair, row_number() OVER (ORDER BY count(*) DESC, pair) AS rk
             FROM bpe_mp GROUP BY pair),
           bpe_msel AS (SELECT $msel FROM bpe_merges WHERE rk <= $BpeMerges),
           bpe_toks AS (
             SELECT doc_id, word, $foldedDuck AS toks
             FROM bpe_w CROSS JOIN bpe_msel
             WHERE length(word) >= 1)"""
  }

  /** [[trainBpe]] over a DRIVER-LOCAL bounded vocabulary — the q103
    * path, whose vocabulary is top-[[DeepVocab]] (= 64) words by
    * construction. The distributed loop costs 2 Spark jobs per round
    * (a vocab aggregation + a 1-row argmax collect) — 32 scheduled
    * jobs to merge-train 64 words; the local loop runs the identical
    * argmax (cnt DESC, ta, tb) and identical left-associative greedy
    * fold in plain Scala. Driver traffic is ONE bounded collect of the
    * 64-word vocabulary instead of 16 argmax collects — strictly less
    * than before, and the same bounded-artifact class (a tokenizer
    * merge table) as the per-round tuples trainBpe already collected.
    * Semantics pinned bitwise against [[trainBpe]] by BpeTrainSpec.
    * Unbounded vocabularies (q100) stay on the distributed loop. */
  private[graft] def trainBpeLocal(words: Seq[(String, Long)], rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var toks: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((v, c) <- toks; i <- 0 until v.length - 1)
        counts((v(i), v(i + 1))) = counts.getOrElse((v(i), v(i + 1)), 0L) + c
      if (counts.isEmpty) exhausted = true
      else {
        val ((ta, tb), cnt) =
          counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        val m = ta + tb
        out += ((r, ta, tb, m, cnt))
        toks = toks.map { case (v, c) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          v.foreach { t =>
            if (acc.nonEmpty && acc.last == ta && t == tb) {
              acc.remove(acc.length - 1); acc += m
            } else acc += t
          }
          acc.toVector -> c
        }
        r += 1
      }
    }
    out.toSeq
  }

  private[graft] def trainBpe(vocab0: DataFrame, rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    val chars =
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    var cur = vocab0.withColumn("toks", expr(chars))
      .select(col("word"), col("wcnt"), col("toks"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = cur
        .filter(size(col("toks")) >= 2)
        .select(col("wcnt"), explode(expr(
          """transform(sequence(1, size(toks) - 1),
               i -> struct(element_at(toks, i) AS ta,
                           element_at(toks, i + 1) AS tb))"""))
          .as("p"))
        .groupBy(col("p.ta"), col("p.tb"))
        .agg(sum(col("wcnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("ta"), col("tb"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (ta, tb, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        val m = ta + tb
        merges += ((r, ta, tb, m, cnt))
        if (r < rounds) {
          // eager checkpoint: `next` is fully materialized before the
          // previous round's blocks are dropped, so nothing downstream
          // can try to recompute through an unpersisted checkpoint
          val next = cur
            .withColumn("toks", expr(bpeMergeFoldExpr("toks", ta, tb, m)))
            .localCheckpoint()
          cur.unpersist()
          cur = next
        }
        r += 1
      }
    }
    cur.unpersist()
    merges.toSeq
  }

  /** Merge-table size for q95's BPE application: the top-BpeMerges q88
    * pairs (ranked cnt DESC, pair ASC) become the merge rules, applied
    * in rank order. Small and fixed — the merge table is a bounded
    * tokenizer artifact, and each rule costs one fold pass per word. */
  val BpeMerges = 8

  /** q111's content-defined-chunking geometry: a boundary opens where
    * the 56-bit hash of the trailing [[CdcHashWindow]]-word window is
    * ≡ 0 mod [[CdcBoundaryMod]]; expected chunk length ≈ the modulus.
    * 16 is calibrated to this corpus's ~54-word documents (~3-4 chunks
    * per doc); a production corpus with book-length docs raises it. */
  val CdcHashWindow = 4
  val CdcBoundaryMod = 16

  /** Content-defined chunks of a (doc_id, text) frame: one row per
    * chunk with its 1-based index, token count and 16-char md5 prefix.
    * Boundary hashes run over ROW-EXPLODED positions (the q99 shape —
    * codegen'd md5 projection; the same predicate as a `filter(...)`
    * higher-order lambda runs interpreted per element and was ~10×
    * slower), then the few boundary positions per doc regroup into a
    * `starts` array — the only exchanges carry (doc_id, int64) pairs
    * plus the one doc_id-keyed join putting `starts` next to the words.
    * Exposed so CdcSpec can pin the shift-robustness property. */
  /** [[cdcChunks]] over a data dir's documents table, served from the
    * fingerprint-keyed parquet cache ([[FrameCache]]) — shared by q111
    * and the q117 ledger's chunk-dup verdict. */
  def cdcChunksCached(s: SparkSession, dir: String): DataFrame =
    // v-bump with any change to the CDC gear-hash/chunk-bound params
    FrameCache.serve(s, FrameCache.path("cdc", CdcCacheV,
        Similarity.corpusFingerprint(s, dir, "documents"))) {
      cdcChunks(Tables.load(s, dir, "documents"))
    }

  /** Per-doc CDC chunk-duplication rollup — ONE chunk-hash groupBy +
    * join-back over the cached chunk table, serving BOTH q111's report
    * and q117's chunk-dup verdict from the fingerprint-keyed parquet
    * cache (each re-ran the rollup inline). tot_tokens rides along so
    * the ledger's dup*2 >= tot gate needs no second pass. */
  private[graft] def cdcDocRollupCached(s: SparkSession,
      dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("cdcdoc", CdcDocCacheV,
      Similarity.corpusFingerprint(s, dir, "documents"))) {
      val ch = cdcChunksCached(s, dir)
      val cnt = ch.groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      ch.join(cnt, "chunk_hash")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
          sum(col("chunk_tokens")).as("tot_tokens"),
          sum(when(col("nd") >= 2, col("chunk_tokens")).otherwise(0L))
            .as("dup_tokens"))
    }

  def cdcChunks(docs: DataFrame): DataFrame = {
    graft.expr.Md5Hash56.register(docs.sparkSession)
    val d = docs
      .withColumn("ws", split(lower(col("text")), " +"))
      .select(col("doc_id"), col("ws"))
    val bpos = d
      .filter(size(col("ws")) >= CdcHashWindow + 1)
      .select(col("doc_id"), col("ws"),
        posexplode(expr(s"sequence(${CdcHashWindow + 1}, size(ws))"))
          .as(Seq("pi", "i")))
      .filter(expr(s"""graft_md5_56(concat_ws(' ',
          slice(ws, i - $CdcHashWindow, $CdcHashWindow)))
          % $CdcBoundaryMod = 0"""))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("i").cast("long"))).as("bpos"))
    d.join(bpos, Seq("doc_id"), "left")
      .withColumn("starts", expr("""concat(array(cast(1 as bigint)),
          coalesce(bpos, cast(array() as array<bigint>)))"""))
      .select(col("doc_id"), col("ws"), col("starts"),
        posexplode(col("starts")).as(Seq("j0", "stw")))
      .withColumn("en", expr("""CASE WHEN j0 + 2 <= size(starts)
          THEN element_at(starts, j0 + 2) - 1
          ELSE cast(size(ws) as bigint) END"""))
      .select(col("doc_id"),
        (col("j0") + 1).cast("long").as("chunk_idx"),
        (col("en") - col("stw") + 1).as("chunk_tokens"),
        expr("""substring(md5(concat_ws(' ',
            slice(ws, cast(stw as int), cast(en - stw + 1 as int)))),
            1, 16)""").as("chunk_hash"))
  }

  /** The q111 oracle's CTE chain, factored out (`cdc_`-prefixed names)
    * so the extended curation ledger (q117) reuses the content-defined
    * chunking definition verbatim. Ends at `cdc_h(doc_id, chunk_idx,
    * chunk_tokens, chunk_hash)` (one row per chunk) and
    * `cdc_cnt(chunk_hash, nd)` (distinct-doc count per chunk hash). */
  private[ops] val cdcDuckCtes: String =
    s"""cdc_d AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             cdc_st AS (
               SELECT doc_id, ws,
                 list_prepend(CAST(1 AS BIGINT),
                   list_filter(generate_series(5, len(ws)),
                     i -> CAST(('0x' || substr(md5(array_to_string(
                            ws[i - $CdcHashWindow : i - 1], ' ')), 1, 14))
                          AS BIGINT) % $CdcBoundaryMod = 0)) AS starts
               FROM cdc_d),
             cdc_idx AS (
               SELECT doc_id, unnest(generate_series(1, len(starts))) AS j,
                 ws, starts
               FROM cdc_st),
             cdc_ch AS (
               SELECT doc_id, j AS chunk_idx, starts[j] AS stw,
                 CASE WHEN j < len(starts) THEN starts[j + 1] - 1
                      ELSE len(ws) END AS en,
                 ws
               FROM cdc_idx),
             cdc_h AS (
               SELECT doc_id, chunk_idx, en - stw + 1 AS chunk_tokens,
                 substr(md5(array_to_string(ws[stw:en], ' ')), 1, 16)
                   AS chunk_hash
               FROM cdc_ch),
             cdc_cnt AS (
               SELECT chunk_hash, count(DISTINCT doc_id) AS nd
               FROM cdc_h GROUP BY chunk_hash)"""

  /** 56-bit md5-derived shingle key — the inverted-index join/group key,
    * so the exchange carries one int64 per shingle instead of the 3-gram
    * TEXT. Collisions between distinct shingles are ~|S|²/2⁵⁷ (≪ 1 for
    * any realistic distinct-shingle count) and the oracle computes the
    * identical hash, so both engines see the same keys either way. */
  private val shingleKeySpark = "graft_md5_56(s)"
  private val shingleKeyDuck =
    "CAST(('0x' || substr(md5(s), 1, 14)) AS BIGINT)"

  /** Exploded (doc_id, g) HASHED 3-gram shingles — the inverted-index
    * rows the q32 join runs on. */
  def hashedShingles(docs: DataFrame): DataFrame = {
    graft.expr.Md5Hash56.register(docs.sparkSession)
    shingles(docs).select(col("doc_id"), expr(shingleKeySpark).as("g"))
  }

  /** Hashed shingle keys whose document frequency makes the self-join
    * quadratic: df above the absolute [[HotShingleCap]], or df in more
    * than half of all documents (stopword-like 3-grams with no
    * discriminative value for Jaccard ≥ 0.8). The list is tiny by
    * construction, so the exclusion below is a broadcast anti-join. */
  def hotShingles(sh: DataFrame, cap: Int = HotShingleCap): DataFrame = {
    val total = sh.agg(countDistinct(col("doc_id")).as("total"))
    sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .crossJoin(total)
      .filter(col("df") * 2 > col("total") || col("df") > cap)
      .select(col("g"))
  }

  /** (cnt, hot) per hashed 3-gram shingle — the pre-cutoff group sizes
    * the q32 inverted-index join would see, with `hot` mirroring the
    * [[hotShingles]] condition. Feeds q82's cap report (see
    * [[Dedup.capRow]]). */
  def shingleGroupCounts(docs: DataFrame): DataFrame = {
    val sh = hashedShingles(docs)
    val total = sh.agg(countDistinct(col("doc_id")).as("total"))
    sh.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .crossJoin(total)
      .select(col("cnt"),
        (col("cnt") * 2 > col("total") || col("cnt") > HotShingleCap).as("hot"))
  }

  /** Near-duplicate pairs by shingle-set Jaccard ≥ `minJ` over a
    * (doc_id, text) frame: inverted-index equi self-join on the HASHED
    * shingle (the string itself is dropped before any shuffle), hot
    * shingles removed first. Sizes are computed AFTER the cutoff so
    * numerator and denominator describe the same (capped) sets. */
  /** [[jaccardPairs]] over a data dir's documents table at threshold
    * `minJ`, served from the fingerprint-keyed parquet cache
    * ([[FrameCache]], threshold folded into the key) — shared by q32's
    * pair report and q92's split-leakage audit. */
  def jaccardPairsCached(s: SparkSession, dir: String,
      minJ: Double): DataFrame =
    // v-bump with any change to the shingle hash / hot-cap constants
    FrameCache.serve(s,
        FrameCache.path(s"jacpairs${math.round(minJ * 100)}", JacPairsCacheV,
          Similarity.corpusFingerprint(s, dir, "documents"))) {
      jaccardPairs(Tables.load(s, dir, "documents"), minJ)
    }

  def jaccardPairs(docsText: DataFrame, minJ: Double): DataFrame = {
    // the shingle explode feeds four consumers (hot list, sizes, both join
    // sides); cache it once instead of recomputing the explode per
    // subtree — MEMORY_AND_DISK so a corpus-scale shingle set spills
    // rather than evicting the executors
    val raw = hashedShingles(docsText)
      .transform(TransientCache.scopedDF)
    val docs = raw.join(broadcast(hotShingles(raw)), Seq("g"), "left_anti")
    val sizes = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = docs.as("a")
      .join(docs.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .withColumn("jac",
        col("c") * lit(1.0) / (col("sa.n") + col("sb.n") - col("c")))
      .filter(col("jac") >= minJ)
      .select(col("da"), col("db"), col("c").as("n_shared"),
        round(col("jac"), 3).as("jaccard"))
      .orderBy(col("da"), col("db"))
  }

  /** Fixed parameterization of the deterministic bloom filter below:
    * 10 bits per eval gram and k = 7 salted hashes (the optimal k for
    * 10 bits/element is ln 2 · 10 ≈ 6.9), giving a theoretical
    * false-positive rate of (1 − e^(−7/10))^7 ≈ 0.82 %. INTEGER
    * parameters by design — m = 10·n is exact int64 arithmetic in both
    * engines, where the usual ⌈−n·ln p / ln²2⌉ sizing could flip at the
    * ceil boundary between two float implementations. */
  private[ops] val BloomBitsPerElem = 10L
  /** K and word packing live on the native probe expression — the
    * single source of truth both the build side here and the probe
    * loop compile against. */
  private[ops] val BloomK = graft.expr.BloomProbe.K
  private[ops] val BloomWordBits = graft.expr.BloomProbe.WordBits.toLong

  /** Bloom-filter benchmark decontamination — the fixed-memory form of
    * q58's broadcast semi-join. q58 broadcasts the eval set's DISTINCT
    * n-grams verbatim; that is exact but the broadcast grows with the
    * eval corpus. The bloom variant compresses the eval grams into a
    * fixed-size bit array ([[BloomBitsPerElem]] bits per gram), which is
    * what a 100 TB decontamination run actually ships to every executor
    * when the benchmark suite is itself large.
    *
    * The filter is built as DATA, not as a driver-side sketch: one md5
    * per gram split into two 56-bit halves (h1 = hex digits 1-14,
    * h2 = 15-28), and bit position i is `(h1 + i·(2·h2+1)) mod m` —
    * Kirsch–Mitzenmacher double hashing ("Less Hashing, Same
    * Performance", ESA 2006: two hash functions generate k with no
    * asymptotic fpp loss), chosen here because k md5s per gram was the
    * measured bottleneck and int64 stepping is free. The step is forced
    * odd so a zero h2 cannot collapse the k probes onto one bit; all
    * arithmetic stays under 2^61, no overflow in either engine. The
    * m-bit array is a (word_index → int64 word) map packed with a
    * `bit_or` aggregation at [[BloomWordBits]] bits per word and folded
    * into ONE broadcast row (~2.6 bytes per eval gram — ≈2× Guava's 1.2
    * at the same fpp, bought back many times over by what it enables).
    * The probe is a map lookup plus bitwise-AND test per salt over that
    * one-row broadcast — whole-stage-codegen expressions end to end, no
    * UDF, and every step (md5, mod, shift, OR, AND) is replayable in
    * ANSI SQL, so q75 carries a full DuckDB hash oracle instead of the
    * rows-only check the earlier Guava `mightContain` UDF forced.
    *
    * Guarantee: NO FALSE NEGATIVES — every truly contaminated doc is
    * flagged (CorpusOpsSpec pins flagged ⊇ q58's exact doc set and
    * per-doc counts ≥ exact counts); false positives inflate counts by
    * ≈0.8 % of probes (the fp-rate contract the Guava version had at
    * fpp = 1 % is spec-pinned against the q58 exact semi-join). */
  /** h1/step double-hash columns from ONE md5 of the gram column `s` —
    * shared by the filter build and the probe so the position formula
    * exists once (the oracle mirrors it with the '0x' hex cast). */
  private def bloomHashed(grams: DataFrame): DataFrame =
    grams.withColumn("hx", md5(col("s")))
      .withColumn("h1",
        expr("cast(conv(substring(hx, 1, 14), 16, 10) as bigint)"))
      .withColumn("step",
        expr("2 * cast(conv(substring(hx, 15, 14), 16, 10) as bigint) + 1"))

  /** The eval-side DISTINCT gram set, scoped-persisted — it feeds the
    * sizing aggregate and the bit-array build (and the q192/q193
    * ground-truth semi-joins) in one plan. */
  private def bloomEvalGrams(docs: DataFrame, evalSource: String)
      : DataFrame =
    wordShingles(docs.filter(col("source") === evalSource), 4)
      .select(col("s")).distinct()
      .transform(TransientCache.scopedDF)

  /** The whole bloom filter folded to ONE row (m, bloom: array<bigint>)
    * at `bitsPerElem` bits per eval gram — the same broadcast-once shape
    * the Guava filter had, but built as an aggregation INSIDE the plan
    * (no driver round-trip; m = greatest(bitsPerElem·|ev|, 64) rides the
    * plan as a one-row broadcast, so the oracle recomputes the identical
    * sizing). Dense array rather than a (wi → word) map because Spark's
    * map element_at is a LINEAR scan of ArrayBasedMapData — O(words) per
    * probe — while the array lookup is O(1): sequence out every word
    * index, left-join the sparse bit_or words (absent index = all-zero
    * word), fold in wi order. */
  private def bloomFilterRow(evalGrams: DataFrame, bitsPerElem: Long)
      : DataFrame = {
    val params = evalGrams.agg(
      greatest(count(lit(1)) * lit(bitsPerElem), lit(64L)).as("m"))
    val sparse = bloomHashed(evalGrams).crossJoin(broadcast(params))
      .withColumn("salt", explode(array((0 until BloomK).map(lit): _*)))
      .withColumn("pos", expr("(h1 + salt * step) % m"))
      .groupBy(expr(s"pos div $BloomWordBits").as("wi"))
      .agg(expr(
        s"bit_or(shiftleft(cast(1 as bigint), cast(pos % $BloomWordBits as int)))")
        .as("word"))
    params
      .select(col("m"), expr(s"""explode(sequence(cast(0 as bigint),
          (m + ${BloomWordBits - 1}) div $BloomWordBits - 1))""").as("wi"))
      .join(sparse, Seq("wi"), "left")
      .na.fill(0L, Seq("word"))
      .groupBy(col("m"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(wi, word))), x -> x.word)")
        .as("bloom"))
  }

  /** The deployed-parameter q75 filter row (m, bloom) for a corpus —
    * public so the streaming ingest gate
    * ([[graft.streaming.EventStreams.streamingBloomGate]]) trains the
    * IDENTICAL filter once and freezes it. */
  def bloomFilterRowFor(docs: DataFrame, evalSource: String = "src0")
      : DataFrame =
    bloomFilterRow(bloomEvalGrams(docs, evalSource), BloomBitsPerElem)

  def bloomDecontam(docs: DataFrame, evalSource: String = "src0")
      : DataFrame = {
    graft.expr.BloomProbe.register(docs.sparkSession)
    val filterRow = bloomFilterRowFor(docs, evalSource)
    // probe: all BloomK salted positions must be set — the native
    // [[graft.expr.BloomProbe]] expression over the one-row broadcast
    // (one md5 per gram, early-exit bit loop), no joins, one
    // whole-stage-codegen span. NOT spelled inline with the h1/step
    // columns: CollapseProject + PushPredicateThroughProject re-expand
    // every column reference into its md5+conv definition, so a
    // 7-conjunct filter pays 14-28 md5s per gram (measured +2 s at
    // sf0.1) — see the BloomProbe Scaladoc
    wordShingles(docs.filter(col("source") =!= evalSource), 4)
      .crossJoin(broadcast(filterRow))
      .filter(expr("graft_bloom_probe(s, bloom, m)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_flagged"))
      .orderBy(col("doc_id"))
  }

  /** q192: per-source realized bloom false-positive rate — the sizing
    * audit a deployment consults before trusting the q75 filter at the
    * configured 10 bits/element (theory: fpp ≈ 0.82 %, so fp_bp ≈ 82).
    * For every probed training gram occurrence the bloom verdict is
    * compared against the exact q58 semi-join's: n_flagged − n_true is
    * PURE false positives (the filter has no false negatives, which the
    * CorpusOpsSpec contract pins), reported in integer basis points of
    * the probe volume. Scale shape: the probe stream is the q75 probe
    * plus the q58 broadcast semi-join, both map-side over one cached
    * gram explode; outputs are |sources| rows. */
  def bloomFpAudit(docs: DataFrame, evalSource: String = "src0")
      : DataFrame = {
    graft.expr.BloomProbe.register(docs.sparkSession)
    val evalGrams = bloomEvalGrams(docs, evalSource)
    val filterRow = bloomFilterRow(evalGrams, BloomBitsPerElem)
    val probe = docs.filter(col("source") =!= evalSource)
      .withColumn("words", split(lower(col("text")), " +"))
      .filter(size(col("words")) >= 4)
      .select(col("doc_id"), col("source"), explode(shingleExpr(4)).as("s"))
      .transform(TransientCache.scopedDF)
    val probes = probe.groupBy(col("source"))
      .agg(count(lit(1)).as("n_probes"))
    val flagged = probe.crossJoin(broadcast(filterRow))
      .filter(expr("graft_bloom_probe(s, bloom, m)"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_flagged"))
    val trueHits = probe.join(broadcast(evalGrams), Seq("s"), "leftsemi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_true"))
    probes
      .join(flagged, Seq("source"), "left")
      .join(trueHits, Seq("source"), "left")
      .na.fill(0L, Seq("n_flagged", "n_true"))
      .withColumn("fp_bp",
        expr("((n_flagged - n_true) * 10000) div n_probes"))
      .orderBy(col("source"))
  }

  /** Bits-per-element grid for q193's sizing sweep — brackets the
    * deployed [[BloomBitsPerElem]] both ways at the fixed probe count
    * [[BloomK]] (so the sweep isolates the memory-budget axis: k = 7 is
    * what the native probe ships). */
  private val BloomSweepBits = Seq(6L, 8L, 10L, 12L, 14L)

  /** All `budgets` filters built in ONE pass (r16, guide §2.4/§2.3):
    * the pre-r16 sweep ran [[bloomFilterRow]] once per budget — five
    * independent hash+explode+bit_or+dense-fold pipelines crossJoined
    * (~15 exchanges, 10 one-row broadcasts). The budget is just one
    * more explode axis over the SAME hashed gram stream, so one
    * (budget × salt) explode, one (budget, word-index) `bit_or`, one
    * dense-grid fold and a |budgets|-row → one-row pivot build the
    * whole family. Position arithmetic and sizing are bit-identical to
    * [[bloomFilterRow]] (m_b = greatest(b·|ev|, 64)); the pivot's
    * `first(when(...))` is deterministic because the groupBy leaves
    * exactly one row per budget. */
  private def bloomFilterRowMulti(evalGrams: DataFrame, budgets: Seq[Long])
      : DataFrame = {
    val params = evalGrams.agg(count(lit(1)).as("n_ev"))
    val budgetArr = array(budgets.map(lit): _*)
    val sparse = bloomHashed(evalGrams).crossJoin(broadcast(params))
      .withColumn("b", explode(budgetArr))
      .withColumn("m", expr("greatest(b * n_ev, 64L)"))
      .withColumn("salt", explode(array((0 until BloomK).map(lit): _*)))
      .withColumn("pos", expr("(h1 + salt * step) % m"))
      .groupBy(col("b"), expr(s"pos div $BloomWordBits").as("wi"))
      .agg(expr(
        s"bit_or(shiftleft(cast(1 as bigint), cast(pos % $BloomWordBits as int)))")
        .as("word"))
    val grid = params
      .select(explode(budgetArr).as("b"), col("n_ev"))
      .withColumn("m", expr("greatest(b * n_ev, 64L)"))
      .select(col("b"), col("m"), expr(s"""explode(sequence(cast(0 as bigint),
          (m + ${BloomWordBits - 1}) div $BloomWordBits - 1))""").as("wi"))
    val perBudget = grid.join(sparse, Seq("b", "wi"), "left")
      .na.fill(0L, Seq("word"))
      .groupBy(col("b"), col("m"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(wi, word))), x -> x.word)")
        .as("bloom"))
    val pivotCols = budgets.flatMap { b => Seq(
      max(when(col("b") === b, col("m"))).as(s"m$b"),
      first(when(col("b") === b, col("bloom")), ignoreNulls = true)
        .as(s"bloom$b"))
    }
    perBudget.agg(pivotCols.head, pivotCols.tail: _*)
  }

  /** q193: bloom sizing sweep — realized false-positive mass per
    * bits-per-element budget, measured BEFORE a deployment hard-codes
    * q75's 10 bits/element. One row per budget: the filter size m, the
    * probe volume, flagged and truly-contaminated gram counts, and the
    * realized fp basis points (the q139 threshold-sweep shape pointed at
    * the bloom's memory axis). All five budgets' filters build in ONE
    * pass over the hashed eval grams ([[bloomFilterRowMulti]] — r16;
    * previously five independent bloomFilterRow pipelines) and fold
    * into ONE combined broadcast row; the gram stream is probed in a
    * SINGLE pass with ONE md5 per gram ([[graft.expr.BloomProbeMulti]]
    * — the five per-budget `graft_bloom_probe` calls each re-hashed
    * the gram; the per-budget verdicts are the mask's bits, summed as
    * five conditional sums in one aggregate — the per-budget
    * filter-then-count alternative re-pays the shingle explode per
    * budget, measured 4.2 s vs ~1.5 s at sf0.1); the one-row result
    * unpivots to the sweep grid via `stack`. */
  def bloomSizingSweep(docs: DataFrame, evalSource: String = "src0")
      : DataFrame = {
    graft.expr.BloomProbe.register(docs.sparkSession)
    val evalGrams = bloomEvalGrams(docs, evalSource)
    val probe = wordShingles(docs.filter(col("source") =!= evalSource), 4)
      .transform(TransientCache.scopedDF)
    val totals = probe.agg(count(lit(1)).as("n_probes"))
      .crossJoin(broadcast(
        probe.join(broadcast(evalGrams), Seq("s"), "leftsemi")
          .agg(count(lit(1)).as("n_true"))))
    val combined = bloomFilterRowMulti(evalGrams, BloomSweepBits)
    val bloomsArr =
      s"array(${BloomSweepBits.map(b => s"bloom$b").mkString(", ")})"
    val msArr = s"array(${BloomSweepBits.map(b => s"m$b").mkString(", ")})"
    // conditional sums, not filter-then-count: a global aggregate
    // always yields its one row even when nothing is flagged, so every
    // budget keeps its sweep row. `flags` is a plain column from the
    // projection below the aggregate, so the five bit reads share the
    // ONE probe evaluation instead of re-running it.
    val aggs = BloomSweepBits.zipWithIndex.flatMap { case (b, j) =>
      Seq(max(col(s"m$b")).as(s"m$b"),
        sum(expr(s"shiftright(flags, $j) & 1L")).as(s"f$b"))
    }
    val stacked = BloomSweepBits
      .map(b => s"cast($b as bigint), m$b, f$b").mkString(", ")
    probe.crossJoin(broadcast(combined))
      .withColumn("flags",
        expr(s"graft_bloom_probe_multi(s, $bloomsArr, $msArr)"))
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${BloomSweepBits.size}, $stacked)")
        .as(Seq("bits_per_elem", "m", "n_flagged")))
      .crossJoin(broadcast(totals))
      .withColumn("fp_bp",
        expr("((n_flagged - n_true) * 10000) div n_probes"))
      .select(col("bits_per_elem"), col("m"), col("n_probes"),
        col("n_flagged"), col("n_true"), col("fp_bp"))
      .orderBy(col("bits_per_elem"))
  }

  /** Shared DuckDB CTEs for the bloom family (q75/q192/q193), built
    * over [[fourGramDuckCtes]]' `g`: the distinct eval gram set `ev`,
    * its double-hash halves `eh`, the salt grid, and the hashed
    * training grams with source `trh` — so the gram/hash definitions
    * exist once per engine. */
  private def bloomBaseDuck: String =
    s"""ev AS (
               SELECT DISTINCT g.s FROM g
               JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
             eh AS (
               SELECT CAST(('0x' || substr(md5(s), 1, 14)) AS BIGINT) AS h1,
                 2 * CAST(('0x' || substr(md5(s), 15, 14)) AS BIGINT) + 1
                   AS step
               FROM ev),
             salts AS (SELECT unnest(range($BloomK)) AS salt),
             trh AS (
               SELECT g.doc_id, g.s, d.source,
                 CAST(('0x' || substr(md5(s), 1, 14)) AS BIGINT) AS h1,
                 2 * CAST(('0x' || substr(md5(s), 15, 14)) AS BIGINT) + 1
                   AS step
               FROM g
               JOIN documents d USING (doc_id) WHERE d.source <> 'src0')"""

  /** One bloom arm at `b` bits per element: sizing `p{b}`, packed words
    * `bits{b}`, probe positions and the flagged gram set `fl{b}` —
    * suffixed so q193's sweep instantiates several arms in one query. */
  private def bloomArmDuck(b: Long): String =
    s"""p$b AS (SELECT greatest(count(*) * $b, 64) AS m FROM ev),
             epos$b AS (
               SELECT (h1 + salt * step) % m AS pos FROM eh, salts, p$b),
             bits$b AS (
               SELECT pos // $BloomWordBits AS wi,
                 bit_or(1::BIGINT << CAST(pos % $BloomWordBits AS INT))
                   AS word
               FROM epos$b GROUP BY 1),
             ppos$b AS (
               SELECT doc_id, s, source, (h1 + salt * step) % m AS pos
               FROM trh, salts, p$b),
             hg$b AS (
               SELECT doc_id, s, source, count(*) AS n_hits
               FROM ppos$b JOIN bits$b
                 ON ppos$b.pos // $BloomWordBits = bits$b.wi
                 AND (bits$b.word &
                   (1::BIGINT << CAST(ppos$b.pos % $BloomWordBits AS INT)))
                   != 0
               GROUP BY doc_id, s, source),
             fl$b AS (
               SELECT doc_id, s, source FROM hg$b WHERE n_hits = $BloomK)"""

  /** DuckDB CTE chain mirroring [[jaccardPairs]] at threshold `minJ`,
    * ending at `jp` (da, db, n_shared, jac) — shared by the q32 oracle
    * and the q92 split-leakage oracle so the near-dup definition exists
    * once per engine. */
  private[ops] def jaccardPairsDuckCtes(minJ: Double): String =
    s"""w AS (
               SELECT doc_id,
                 unnest(string_split_regex(lower(text), ' +')) AS word,
                 generate_subscripts(string_split_regex(lower(text), ' +'), 1) AS i
               FROM documents),
             sh0 AS (
               SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                   concat_ws(' ', word,
                     lead(word, 1) OVER (PARTITION BY doc_id ORDER BY i),
                     lead(word, 2) OVER (PARTITION BY doc_id ORDER BY i)) AS s,
                   lead(word, 2) OVER (PARTITION BY doc_id ORDER BY i) AS tail
                 FROM w)
               WHERE tail IS NOT NULL),
             shg AS (SELECT doc_id, $shingleKeyDuck AS g FROM sh0),
             hot AS (
               SELECT g FROM shg GROUP BY g
               HAVING count(*) * 2 > (SELECT count(DISTINCT doc_id) FROM shg)
                   OR count(*) > $HotShingleCap),
             sh AS (
               SELECT shg.doc_id, shg.g FROM shg
               WHERE shg.g NOT IN (SELECT g FROM hot)),
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             inter AS (
               SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
               FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY da, db),
             jp AS (
               SELECT da, db, c AS n_shared,
                 c * 1.0 / (sa.n + sb.n - c) AS jac
               FROM inter
               JOIN sizes sa ON sa.doc_id = da
               JOIN sizes sb ON sb.doc_id = db
               WHERE c * 1.0 / (sa.n + sb.n - c) >= $minJ)"""

  /** DuckDB CTEs building the distinct (doc_id, s) 4-gram set `g` over
    * `documents` — the oracle mirror of [[wordShingles]] at n = 4, shared
    * by the q58 decontamination oracle and the q90 curation-ledger oracle
    * so the gram definition exists once per engine. */
  private[ops] val fourGramDuckCtes: String =
    """w AS (
               SELECT doc_id,
                 unnest(string_split_regex(lower(text), ' +')) AS word,
                 generate_subscripts(string_split_regex(lower(text), ' +'), 1) AS i
               FROM documents),
             g AS (
               SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                   concat_ws(' ', word,
                     lead(word, 1) OVER (PARTITION BY doc_id ORDER BY i),
                     lead(word, 2) OVER (PARTITION BY doc_id ORDER BY i),
                     lead(word, 3) OVER (PARTITION BY doc_id ORDER BY i)) AS s,
                   lead(word, 3) OVER (PARTITION BY doc_id ORDER BY i) AS tail
                 FROM w)
               WHERE tail IS NOT NULL)"""

  /** Words per "paragraph" for q83. The synthetic corpus has no newline
    * structure (one space-separated stream per doc), so a paragraph is a
    * fixed 20-word block — the unit itself is a parameter; a real corpus
    * would split on `\n\n` and everything downstream is unchanged. */
  val ParaWords = 20

  /** Per-document paragraph-level exact-dedup report — the C4/RefinedWeb
    * curation step BETWEEN document dedup and chunking: paragraphs are
    * deduped ACROSS documents (keeper = globally first occurrence by
    * (doc_id, para_idx)), and each document reports how many of its
    * paragraphs a rewrite would drop.
    *
    * Scale shape: the md5 paragraph key is computed INSIDE the transform
    * (before the explode), so the keeper window's exchange partitions on
    * the 32-byte hash and ships (doc_id, para_idx, pkey) only — never
    * paragraph text (q31's shuffle discipline). One window + one groupBy,
    * both on bounded rows-per-doc. */
  def paragraphDedupReport(docs: DataFrame, paraWords: Int = ParaWords): DataFrame = {
    val keyed = docs
      .withColumn("words", split(lower(col("text")), " +"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
              sequence(0, cast(ceil(size(words) / $paraWords.0) as int) - 1),
              i -> md5(concat_ws(' ', slice(words, i * $paraWords + 1, $paraWords))))"""))
        .as(Seq("para_idx", "pkey")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pkey")).orderBy(col("doc_id"), col("para_idx"))
    keyed.withColumn("rk", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_dropped"))
      .withColumn("rewritten", col("n_dropped") > 0)
      .orderBy(col("doc_id"))
  }

  /** Max paragraphs per document for q96's composite paragraph id
    * (pid = doc_id · ParaCap + para_idx): one int64 key the MinHash band
    * join can shuffle and order on. 4096 paragraphs × 20 words bounds a
    * document at ~82k words — beyond that a real corpus splits the doc
    * first. doc_id · 4096 stays inside int64 up to ~2.2e15 documents. */
  val ParaCap = 4096L

  /** q83's segmentation re-exposed as a (doc_id, text) corpus whose unit
    * is the PARAGRAPH: doc_id = composite pid (see [[ParaCap]]), text =
    * the 20-word block. Feeds the whole q33 MinHash pipeline unchanged —
    * near-dup detection at paragraph granularity is document-granularity
    * machinery over smaller units. */
  def paragraphDocs(docs: DataFrame, paraWords: Int = ParaWords): DataFrame =
    docs
      .withColumn("words", split(lower(col("text")), " +"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
              sequence(0, cast(ceil(size(words) / $paraWords.0) as int) - 1),
              i -> concat_ws(' ', slice(words, i * $paraWords + 1, $paraWords)))"""))
        .as(Seq("para_idx", "ptext")))
      // a document beyond ParaCap paragraphs would silently collide into
      // the next doc_id's pid space — fail LOUDLY instead (raise_error is
      // codegen'd and free on the valid path)
      .select(expr(
        s"""CASE WHEN para_idx < $ParaCap
              THEN doc_id * ${ParaCap}L + para_idx
              ELSE raise_error(concat('paragraphDocs: doc ',
                cast(doc_id as string),
                ' exceeds $ParaCap paragraphs — split the document first'))
            END""").as("doc_id"),
        col("ptext").as("text"))

  /** Oracle mirror of [[paragraphDocs]]: a CTE named `name` yielding the
    * composite-pid paragraph relation, shared by the q96 and q82
    * oracles. */
  private[ops] def paragraphDocsDuckCte(name: String): String =
    s"""$name AS (
         SELECT doc_id * $ParaCap + para_idx AS doc_id,
           array_to_string(
             ws[para_idx * $ParaWords + 1 : para_idx * $ParaWords + $ParaWords],
             ' ') AS text
         FROM (
           SELECT doc_id,
             unnest(generate_series(0,
               CAST(ceil(len(ws) / $ParaWords.0) AS INT) - 1)) AS para_idx,
             ws
           FROM (SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
                 FROM documents)))"""

  /** Power-of-two bucket floor for a token count: [1,2)→1, [2,4)→2, …,
    * [1024,2048)→1024, else 2048. Plain integer comparisons, evaluated
    * from the SAME text by Spark and DuckDB. */
  private val TokenBucketCase: String =
    "CASE " + (0 to 10).map(1 << _)
      .map(b => s"WHEN n_tokens < ${b * 2} THEN $b").mkString(" ") +
      " ELSE 2048 END"

  /** q144's fixed query workload: the ranked-retrieval probe set (every
    * term drawn from the synthetic corpus vocabulary so df > 0 paths and
    * the common-term idf=0 suppression are both exercised). A real
    * deployment feeds live queries; the workload here is part of the
    * operator contract so both engines score identical requests.
    * (Declared before `defs` — the oracle string is built eagerly.) */
  val BmQueries: Seq[(Int, String)] = Seq(
    1 -> "hash join table",
    2 -> "window agg stream",
    3 -> "customer order big",
    4 -> "vector scan filter",
    5 -> "spark batch merge",
    6 -> "dup query sort")

  /** Top-k documents returned per q144 query. */
  val BmTopK = 5

  /** q145's reciprocal-rank-fusion constant (Cormack, Clarke & Büttcher
    * 2009: 1/(60 + rank)) and the per-ranker candidate depth the fusion
    * reads. */
  val RrfK = 60L
  val FuseDepth = 20

  /** Shared candidate scoring for the ranked-retrieval family (q144/
    * q145): per (query, matching doc) BOTH lexical kernels over ONE
    * token explode —
    *
    *   - `score_milli` — BM25 with k1=1, b=1/2: the exact rational
    *     idf · 4A·tf/(2A·tf + A + dl·N) in milli-units (A = Σdl);
    *   - `lex_milli`   — saturation-free length-normalized TF-IDF:
    *     idf · 1000·tf·A/(dl·N) (tf × avgdl/dl) — no tf damping and a
    *     LINEAR length penalty, so it genuinely disagrees with BM25 on
    *     long/repetitive documents, which is what makes fusing the two
    *     lists informative.
    *
    * idf is the add-one-smoothed whole-bit `length(bin(N div df))` in
    * both kernels. Pure int64 throughout (headroom: 1000·idf·4A·tf ≲
    * 10^13 at the 30× smoke). */
  private[graft] def bmScoredCandidates(docs: DataFrame,
      queries: Seq[(Int, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    val qterms = queries.flatMap { case (qid, q) =>
      q.split(" ").distinct.map(t => (qid, q, t))
    }.toDF("qid", "query", "term")
    // Only query-term POSTINGS are ever aggregated: the broadcast semi
    // filter runs map-side on the exploded stream, so the full token
    // table is never shuffled (guide §2.3 aggregate-before-shuffle +
    // §3.2 pre-filter the big side) — the old shape exchanged every
    // token twice (the (doc,term) tf groupBy and the doc-length
    // groupBy) to score a fixed handful of query terms.
    val qtf = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " +")).as("term"))
      .join(broadcast(qterms.select(col("term")).distinct()), "term")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // per-doc length is a projection over docs (the q181 shape: the
    // oracle computes it as len(ws)), not an aggregate over the
    // exploded token table; persisted because BOTH the corpus stats row
    // and the contrib join read it — unpersisted, the planner re-split
    // the whole corpus text once per consumer
    val dl = docs.select(col("doc_id"),
      size(split(lower(col("text")), " +")).cast("long").as("dl"))
      .transform(TransientCache.scopedDF)
    val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("a_total"))
    // per-term document frequency rides a window over the (small)
    // matched-posting frame instead of a separate aggregate+broadcast:
    // qtf is unique per (doc_id, term) by construction, so count(*)
    // over the term partition IS countDistinct(doc_id) — and qtf keeps
    // a SINGLE consumer, so it needs no persist (a persisted twin fed
    // two concurrent stages — the main join and the df broadcast build
    // — which raced to materialize the same cache entry and computed
    // the posting scan twice per cold run)
    val wTerm = Window.partitionBy(col("term"))
    val contrib = qtf
      .withColumn("df", count(lit(1)).over(wTerm))
      .join(broadcast(qterms), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("ibits",
        length(bin(expr("n_docs div df"))).cast("long"))
      .withColumn("sc", expr(
        """(1000L * ibits * 4 * a_total * tf)
           div (2 * a_total * tf + a_total + dl * n_docs)"""))
      .withColumn("lx", expr(
        "(1000L * ibits * tf * a_total) div (dl * n_docs)"))
    contrib.groupBy(col("qid"), col("query"), col("doc_id"))
      .agg(sum(col("sc")).as("score_milli"),
        sum(col("lx")).as("lex_milli"))
  }

  /** q144's integer-surrogate BM25 (k1=1, b=1/2) top-k retrieval over a
    * (doc_id, text) corpus — exposed for planted-corpus specs. Term
    * weight is add-one-smoothed whole-bit idf `length(bin(N div df))`;
    * the tf/length kernel is the exact rational 4A·tf/(2A·tf + A + dl·N)
    * in milli-units (A = Σdl). Ties break on doc_id. */
  def bm25TopK(docs: DataFrame, queries: Seq[(Int, String)],
      k: Int = BmTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bmScoredCandidates(docs, queries)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_milli").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("query"), col("rank"), col("doc_id"),
        col("score_milli"))
      .orderBy(col("qid"), col("rank"))
  }

  /** q145: HYBRID retrieval via reciprocal-rank fusion — the standard
    * way a RAG / retrieval-dedup stack combines rankers that disagree
    * (Cormack, Clarke & Büttcher 2009). Both lexical kernels come from
    * ONE [[bmScoredCandidates]] pass; each is ranked per query
    * (row_number, doc_id tie-break), a document appearing in either
    * ranker's top-`depth` earns `1_000_000 div (60 + rank)` micro-units
    * per list it appears in, and the fused top-k is re-ranked on that
    * sum (ties by doc_id). Integer floor division keeps the fused score
    * on an exact grid — no float reciprocal noise between engines.
    *
    * Scale shape: the only corpus-sized work is the shared token
    * explode; candidate ranking is a per-query window over matched docs
    * (bounded by the query terms' posting lists — at 100 TB the hot-term
    * cap story of q32 applies before this operator sees candidates);
    * the fusion itself touches ≤ 2·depth rows per query. */
  def rrfFuseTopK(docs: DataFrame, queries: Seq[(Int, String)],
      depth: Int = FuseDepth, k: Int = BmTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bmScoredCandidates(docs, queries)
    val wBm = Window.partitionBy(col("qid"))
      .orderBy(col("score_milli").desc, col("doc_id"))
    val wLex = Window.partitionBy(col("qid"))
      .orderBy(col("lex_milli").desc, col("doc_id"))
    val ranked = scored
      .withColumn("r_bm25", row_number().over(wBm).cast("long"))
      .withColumn("r_lex", row_number().over(wLex).cast("long"))
      .withColumn("rrf_micro",
        when(col("r_bm25") <= depth,
          expr(s"1000000L div ($RrfK + r_bm25)")).otherwise(0L) +
        when(col("r_lex") <= depth,
          expr(s"1000000L div ($RrfK + r_lex)")).otherwise(0L))
      .filter(col("rrf_micro") > 0L)
    val wFuse = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    ranked.withColumn("rank", row_number().over(wFuse).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("query"), col("rank"), col("doc_id"),
        col("rrf_micro"), col("r_bm25"), col("r_lex"))
      .orderBy(col("qid"), col("rank"))
  }

  // ---- q165/q166 constants (declared before `defs` — oracle strings
  //      interpolate them at init) ----

  /** q165 planted chat transcripts, class = doc_id % 3 on the
    * doc_id % 8 == 1 grid: well-formed, double-user role violation,
    * empty assistant turn. Turns are ` || `-delimited. */
  private val chatBodies = Seq(
    "user: how do tables work || assistant: they hold rows || user: and columns || assistant: those too",
    "user: first question || user: second question || assistant: one answer",
    "user: anything there || assistant: || user: hello || assistant: yes")

  private[ops] val chatSynthSpark: String =
    s"""CASE WHEN doc_id % 8 = 1 THEN
          CASE ${chatBodies.zipWithIndex.map { case (b, i) =>
            s"WHEN doc_id % 3 = $i THEN '$b'" }.mkString(" ")} END
        ELSE text END"""

  /** q166: a trailing run of the same token at least this long flags a
    * degenerate-generation tail. */
  val TailRepeatMin = 4

  /** q169 winnowing geometry (Schleimer, Wilkerson & Aiken 2003, MOSS):
    * k-gram size and window width. Guarantee: any shared token run of
    * length ≥ WinnowK + WinnowW − 1 (= 7 words here) yields at least one
    * shared selected fingerprint. */
  val WinnowK = 4
  val WinnowW = 4

  /** q170: a fingerprint selected by more than this many documents is
    * boilerplate (dropped before pairing, the hot-band cap's analog);
    * pairs need ≥ [[WinnowPairMin]] shared fingerprints to report. */
  val WinnowFpCap = 50
  val WinnowPairMin = 2

  /** q181: a token whose CORPUS frequency is ≤ RareFreqMax is "rare";
    * a run of ≥ RareRunMin consecutive rare tokens is secret-shaped
    * (keys, tokens, hashes, dense identifiers — the memorization-risk
    * spans Carlini et al. 2021 showed models regurgitate). */
  val RareFreqMax = 2
  val RareRunMin = 5

  /** Shared q169/q170 oracle chain: `whashed(doc_id, pos, h)` per-gram
    * hashes and `fps(doc_id, fp)` the distinct selected winnowing
    * fingerprints. (Before `defs` — interpolated at init.) */
  private val winnowDuckCtes: String =
    s"""wds AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             gr AS (
               SELECT doc_id,
                 unnest(generate_series(0, len(ws) - $WinnowK)) AS pos, ws
               FROM wds WHERE len(ws) >= $WinnowK),
             whashed AS (
               SELECT doc_id, pos,
                 CAST(('0x' || substr(md5(array_to_string(
                   ws[pos + 1 : pos + $WinnowK], ' ')), 1, 14)) AS BIGINT)
                   AS h
               FROM gr),
             wmx AS (SELECT doc_id, max(pos) AS mp FROM whashed
                    GROUP BY doc_id),
             wmin AS (
               SELECT h2.doc_id,
                 min(h2.h) OVER (PARTITION BY h2.doc_id ORDER BY h2.pos
                   ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING)
                   AS fp,
                 h2.pos, wmx.mp
               FROM whashed h2 JOIN wmx ON h2.doc_id = wmx.doc_id),
             fps AS (
               SELECT DISTINCT doc_id, fp FROM wmin
               WHERE pos <= mp - ${WinnowW - 1})"""

  /** q181's flagged-doc set as a spliceable oracle chain (`rr_` prefix):
    * `rr_flagged(doc_id)` = docs with ≥ 1 rare-token run of length
    * ≥ [[RareRunMin]]. Consumed by q117's ledger oracle. */
  private[ops] lazy val rareRunDuckCtes: String =
    s"""rr_d AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             rr_toks AS (
               SELECT doc_id, unnest(ws) AS w,
                 generate_subscripts(ws, 1) - 1 AS pos
               FROM rr_d),
             rr_freq AS (SELECT w, count(*) AS cf FROM rr_toks GROUP BY w),
             rr_rare AS (
               SELECT t.doc_id, t.pos
               FROM rr_toks t JOIN rr_freq f ON t.w = f.w
               WHERE f.cf <= $RareFreqMax),
             rr_grps AS (
               SELECT doc_id,
                 pos - row_number() OVER (PARTITION BY doc_id
                   ORDER BY pos) AS grp
               FROM rr_rare),
             rr_flagged AS (
               SELECT DISTINCT doc_id FROM (
                 SELECT doc_id, grp, count(*) AS c FROM rr_grps
                 GROUP BY doc_id, grp)
               WHERE c >= $RareRunMin)"""

  /** q182's flagged-train-doc set as a spliceable oracle chain (built
    * on [[winnowDuckCtes]]'s `fps`, `wl_` prefix): `wl_flagged(doc_id)`
    * = train-split docs sharing ≥ 1 winnowing fingerprint with any
    * eval-split doc. Consumed by q117's ledger oracle. */
  private[ops] lazy val winnowLeakDuckCtes: String =
    s"""$winnowDuckCtes,
             wl_sp AS (
               SELECT doc_id,
                 CAST(('0x' || substr(md5('split:' ||
                   CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 10 AS b
               FROM documents),
             wl_fb AS (SELECT f.doc_id, f.fp, wl_sp.b
                       FROM fps f JOIN wl_sp USING (doc_id)),
             wl_ef AS (SELECT DISTINCT fp FROM wl_fb WHERE b >= 8),
             wl_flagged AS (
               SELECT DISTINCT doc_id FROM wl_fb
               JOIN wl_ef USING (fp) WHERE b < 8)"""

  private[ops] val tailSynthSpark: String =
    """CASE WHEN doc_id % 10 = 6
         THEN concat(text, ' loop loop loop loop loop')
         ELSE text END"""

  val defs: Map[String, QueryDef] = Map(

    // ---- exact dedup: keeper = min doc_id per identical text. The
    //      group key is md5(text), not the text: the exchange then
    //      carries a fixed 32-byte key instead of full document bodies
    //      (at 128 bits a collision needs ~2⁶⁴ distinct docs — not a real
    //      risk below; the streaming dedup state uses the same key).
    //      Per-doc columns (text_len) are computed BEFORE the shuffle and
    //      carried through the aggregate. ----
    "q31_dedup_exact" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("tkey"),
            length(col("text")).as("text_len"))
          .groupBy(col("tkey"))
          .agg(min(col("doc_id")).as("keeper_id"),
            count(lit(1)).as("n_copies"),
            max(col("text_len")).as("text_len"))
          .select(col("keeper_id"), col("n_copies"), col("text_len"))
          .orderBy(col("keeper_id")),
      Some("""SELECT min(doc_id) AS keeper_id, count(*) AS n_copies,
               max(length(text)) AS text_len
             FROM documents
             GROUP BY md5(text)
             ORDER BY keeper_id""")),

    // ---- paragraph-level exact dedup across documents: fixed 20-word
    //      blocks, md5-keyed, keeper = first (doc_id, para_idx)
    //      occurrence; per-doc report of paragraphs a rewrite drops.
    //      The oracle rebuilds the blocks with list slicing — an
    //      independent segmentation path — and mirrors hash + keeper
    //      rule exactly. ----
    "q83_paragraph_dedup" -> QueryDef(
      (s, dir) => paragraphDedupReport(Tables.load(s, dir, "documents")),
      Some(s"""WITH wds AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             paras AS (
               SELECT doc_id,
                 unnest(generate_series(0,
                   CAST(ceil(len(ws) / $ParaWords.0) AS INT) - 1)) AS para_idx,
                 ws
               FROM wds),
             keyed AS (
               SELECT doc_id, para_idx,
                 md5(array_to_string(
                   ws[para_idx * $ParaWords + 1 : para_idx * $ParaWords + $ParaWords],
                   ' ')) AS pkey
               FROM paras),
             flagged AS (
               SELECT doc_id, para_idx,
                 row_number() OVER (PARTITION BY pkey
                   ORDER BY doc_id, para_idx) AS rk
               FROM keyed)
             SELECT doc_id, count(*) AS n_paras,
               CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped,
               CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) > 0
                 AS rewritten
             FROM flagged
             GROUP BY doc_id
             ORDER BY doc_id""")),

    // ---- repeated-span report: the exact-substring dedup signal
    //      (Lee et al. 2022 "Deduplicating Training Data Makes Language
    //      Models Better") at fixed 16-word granularity — every sliding
    //      16-word window is md5-keyed, and a window whose key occurs in
    //      ANY other (doc, pos) slot is a repeated span. Per document:
    //      window count, repeated-window count, repeated fraction — the
    //      read-out that decides which documents a substring-level
    //      rewrite would touch. Scale shape: one explode (stride 1 —
    //      rows ≈ corpus tokens), the shuffle carries (doc_id, pos,
    //      32-byte key) only, occurrence counting is one count window
    //      over the key, per-doc rollup is map-side combinable. Unlike
    //      q32/q33 there is NO self-join — a span shared by a million
    //      docs costs a million-row count group, never a quadratic pair
    //      set. ----
    "q99_repeated_spans" -> QueryDef(
      (s, dir) => repeatedSpansReport(Tables.load(s, dir, "documents"),
        pre = Some(posGramStatsCached(s, dir))),
      Some(s"""WITH wds AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             sp AS (
               SELECT doc_id,
                 unnest(generate_series(0, len(ws) - $SpanWords)) AS pos, ws
               FROM wds WHERE len(ws) >= $SpanWords),
             keyed AS (
               SELECT doc_id, pos,
                 md5(array_to_string(
                   ws[pos + 1 : pos + $SpanWords], ' ')) AS wkey
               FROM sp),
             occs AS (
               SELECT doc_id, count(*) OVER (PARTITION BY wkey) AS occ
               FROM keyed)
             SELECT doc_id,
               count(*) AS n_windows,
               CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_repeated,
               round(CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 * 1.0 / count(*), 4) AS repeat_frac
             FROM occs
             GROUP BY doc_id
             ORDER BY doc_id""")),

    // ---- exact cross-document substring spans: MAXIMAL verbatim
    //      token runs shared with at least one OTHER document — the
    //      extraction the sketch family samples past (q33 winnowing
    //      anchors) and q99 only counts (see [[crossDocSpansReport]]).
    //      The masking feed for a substring-level decontamination
    //      rewrite. ----
    "q227_crossdoc_substring_spans" -> QueryDef(
      (s, dir) => crossDocSpansReport(Tables.load(s, dir, "documents"),
        pre = Some(posGramStatsCached(s, dir))),
      Some(s"""WITH wds AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             sp AS (
               SELECT doc_id,
                 unnest(generate_series(0, len(ws) - $SpanWords)) AS pos, ws
               FROM wds WHERE len(ws) >= $SpanWords),
             keyed AS (
               SELECT doc_id, pos,
                 md5(array_to_string(
                   ws[pos + 1 : pos + $SpanWords], ' ')) AS wkey
               FROM sp),
             mm AS (
               SELECT doc_id, pos,
                 min(doc_id) OVER (PARTITION BY wkey) AS mn,
                 max(doc_id) OVER (PARTITION BY wkey) AS mx
               FROM keyed),
             sh AS (
               SELECT doc_id, pos,
                 CASE WHEN mn <> doc_id THEN mn ELSE mx END AS witness
               FROM mm WHERE mn <> mx),
             isl AS (
               SELECT doc_id, pos, witness,
                 pos - row_number() OVER (PARTITION BY doc_id
                   ORDER BY pos) AS grp
               FROM sh)
             SELECT doc_id,
               CAST(min(pos) + 1 AS BIGINT) AS span_start,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(count(*) + $SpanWords - 1 AS BIGINT) AS span_words,
               CAST(min(witness) AS BIGINT) AS witness_doc
             FROM isl
             GROUP BY doc_id, grp
             ORDER BY doc_id, span_start""")),

    // ---- keep-one-copy substring-dedup rewrite ledger: q227 says
    //      WHERE cross-doc verbatim text lives; this applies the
    //      Lee et al. ExactSubstr policy (later copies masked, first
    //      occurrence keeps) and reports, per affected doc, the merged
    //      masked spans and the retained share — the per-doc cost
    //      sheet of the dedup policy (see [[crossDocRewriteLedger]]). ----
    "q228_substring_dedup_ledger" -> QueryDef(
      (s, dir) => crossDocRewriteLedger(Tables.load(s, dir, "documents"),
        pre = Some(posGramStatsCached(s, dir))),
      Some(s"""WITH wds AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             sp AS (
               SELECT doc_id,
                 unnest(generate_series(0, len(ws) - $SpanWords)) AS pos, ws
               FROM wds WHERE len(ws) >= $SpanWords),
             keyed AS (
               SELECT doc_id, pos,
                 md5(array_to_string(
                   ws[pos + 1 : pos + $SpanWords], ' ')) AS wkey
               FROM sp),
             dup AS (
               SELECT doc_id, pos + 1 AS p
               FROM (
                 SELECT doc_id, pos,
                   min(doc_id) OVER (PARTITION BY wkey) AS mn
                 FROM keyed)
               WHERE mn < doc_id),
             pe AS (
               SELECT doc_id, p,
                 max(p + $SpanWords - 1) OVER (PARTITION BY doc_id
                   ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_end
               FROM dup),
             isl AS (
               SELECT doc_id, p,
                 CAST(sum(CASE WHEN prev_end IS NULL OR p > prev_end + 1
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS island
               FROM pe),
             spans AS (
               SELECT doc_id, island, min(p) AS s,
                 max(p) + $SpanWords - 1 AS e
               FROM isl GROUP BY doc_id, island),
             perdoc AS (
               SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                 CAST(sum(e - s + 1) AS BIGINT) AS n_masked_words
               FROM spans GROUP BY doc_id)
             SELECT d.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
               d.n_spans, d.n_masked_words,
               (CAST(len(w.ws) AS BIGINT) - d.n_masked_words) * 10000
                 // CAST(len(w.ws) AS BIGINT) AS retained_bp
             FROM perdoc d JOIN wds w USING (doc_id)
             ORDER BY d.doc_id""")),

    // ---- minimum-span-floor policy sweep over q228's rewrite: per
    //      candidate floor t, affected docs / kept spans / masked words
    //      and the corpus masked share — measured BEFORE a production
    //      run hard-codes the floor (see [[substringPolicySweep]]). ----
    "q229_substring_policy_sweep" -> QueryDef(
      (s, dir) => substringPolicySweep(Tables.load(s, dir, "documents"),
        pre = Some(posGramStatsCached(s, dir))),
      Some(s"""WITH wds AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             sp AS (
               SELECT doc_id,
                 unnest(generate_series(0, len(ws) - $SpanWords)) AS pos, ws
               FROM wds WHERE len(ws) >= $SpanWords),
             keyed AS (
               SELECT doc_id, pos,
                 md5(array_to_string(
                   ws[pos + 1 : pos + $SpanWords], ' ')) AS wkey
               FROM sp),
             dup AS (
               SELECT doc_id, pos + 1 AS p
               FROM (
                 SELECT doc_id, pos,
                   min(doc_id) OVER (PARTITION BY wkey) AS mn
                 FROM keyed)
               WHERE mn < doc_id),
             pe AS (
               SELECT doc_id, p,
                 max(p + $SpanWords - 1) OVER (PARTITION BY doc_id
                   ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_end
               FROM dup),
             isl AS (
               SELECT doc_id, p,
                 CAST(sum(CASE WHEN prev_end IS NULL OR p > prev_end + 1
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS island
               FROM pe),
             wspans AS (
               SELECT doc_id,
                 max(p) + $SpanWords - 1 - min(p) + 1 AS width
               FROM isl GROUP BY doc_id, island),
             tot AS (
               SELECT CAST(sum(len(ws)) AS BIGINT) AS total_words
               FROM wds),
             agg AS (
               SELECT
                 ${SubstringSweepGrid.map(t =>
                   s"""CAST(count(DISTINCT CASE WHEN width >= $t THEN doc_id END) AS BIGINT) AS d_$t,
                 CAST(sum(CASE WHEN width >= $t THEN 1 ELSE 0 END) AS BIGINT) AS s_$t,
                 CAST(sum(CASE WHEN width >= $t THEN width ELSE 0 END) AS BIGINT) AS m_$t""")
                   .mkString(",\n                 ")}
               FROM wspans)
             ${SubstringSweepGrid.map(t =>
               s"""SELECT CAST($t AS BIGINT) AS min_span_words,
                 d_$t AS n_docs, s_$t AS n_spans, m_$t AS masked_words,
                 m_$t * 10000 // total_words AS masked_bp
               FROM agg CROSS JOIN tot""")
               .mkString("\n             UNION ALL\n             ")}
             ORDER BY min_span_words""")),

    // ---- per-doc n-gram novelty: share of a doc's distinct 8-grams
    //      first seen (min doc_id) in the doc itself — the marginal-
    //      contribution read q31/q33/q99 can't give (see
    //      [[ngramNoveltyReport]]). ----
    "q212_ngram_novelty" -> QueryDef(
      (s, dir) => ngramNoveltyReport(Tables.load(s, dir, "documents"),
        pre = Some(noveltyFirstsCached(s, dir))),
      Some(s"""WITH wds AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             gr AS (
               SELECT DISTINCT doc_id,
                 md5(array_to_string(
                   ws[pos + 1 : pos + $NoveltyWords], ' ')) AS wkey
               FROM (
                 SELECT doc_id,
                   unnest(generate_series(0, len(ws) - $NoveltyWords)) AS pos,
                   ws
                 FROM wds WHERE len(ws) >= $NoveltyWords)),
             f AS (
               SELECT doc_id,
                 min(doc_id) OVER (PARTITION BY wkey) AS first_doc
               FROM gr)
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_novel,
               CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000
                 // CAST(count(*) AS BIGINT) AS novelty_bp
             FROM f
             GROUP BY doc_id
             ORDER BY doc_id""")),

    // ---- per-source novelty attribution: q212 rolled to the mixture
    //      axis, with cross-source repetition split out (see
    //      [[sourceNoveltyReport]]). ----
    "q213_source_novelty" -> QueryDef(
      (s, dir) => sourceNoveltyReport(Tables.load(s, dir, "documents"),
        pre = Some(noveltyFirstsCached(s, dir))),
      Some(s"""WITH wds AS (
               SELECT doc_id, source,
                 string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             gr AS (
               SELECT DISTINCT doc_id, source,
                 md5(array_to_string(
                   ws[pos + 1 : pos + $NoveltyWords], ' ')) AS wkey
               FROM (
                 SELECT doc_id, source,
                   unnest(generate_series(0, len(ws) - $NoveltyWords)) AS pos,
                   ws
                 FROM wds WHERE len(ws) >= $NoveltyWords)),
             f AS (
               SELECT doc_id, source,
                 min(doc_id) OVER (PARTITION BY wkey) AS first_doc
               FROM gr),
             j AS (
               SELECT f.source, f.doc_id, f.first_doc,
                 d.source AS first_source
               FROM f JOIN documents d ON f.first_doc = d.doc_id)
             SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_novel,
               CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000
                 // CAST(count(*) AS BIGINT) AS novel_bp,
               CAST(sum(CASE WHEN first_doc <> doc_id
                   AND first_source <> source THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_xsource_repeat,
               CAST(sum(CASE WHEN first_doc <> doc_id
                   AND first_source <> source THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000
                 // CAST(count(*) AS BIGINT) AS xsource_bp
             FROM j
             GROUP BY source
             ORDER BY source""")),

    // ---- NOVELTY × DEDUP cross-signal audit (the q137/q161/q184
    //      discipline pointed at q212): per novelty decile, how many
    //      docs sit in a q54 near-dup cluster. The two signals measure
    //      different things — pairwise resemblance vs scattered
    //      first-occurrence attribution — and a healthy corpus shows
    //      cluster membership CONCENTRATED in the low-novelty deciles;
    //      high-novelty docs inside clusters are banding false
    //      positives (or templated docs with fresh slots), low-novelty
    //      docs OUTSIDE clusters are exactly the scattered-phrase
    //      repetition dedup cannot catch pairwise — each corner is an
    //      actionable review queue. Deciles are int64 novelty_bp div
    //      1000 (no float comparison); one left join of the novelty
    //      frame against the CC labels + a ≤10-row rollup. ----
    "q216_novelty_dedup_agreement" -> QueryDef(
      (s, dir) => {
        val nov = ngramNoveltyReport(Tables.load(s, dir, "documents"),
          pre = Some(noveltyFirstsCached(s, dir)))
        val clustered = Dedup.connectedComponents(
            Dedup.lshCandidatePairsCached(s, dir))
          .select(col("doc_id"), lit(1L).as("in_cluster"))
        nov.join(clustered, Seq("doc_id"), "left")
          .withColumn("decile", expr("least(novelty_bp div 1000, 9L)"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("in_cluster"), lit(0L))).as("n_clustered"))
          .withColumn("clustered_bp",
            expr("n_clustered * 10000L div n_docs"))
          .orderBy(col("decile"))
      },
      Some(s"""WITH RECURSIVE ${Dedup.duckCandPairsBody()},
             cedges AS (SELECT da AS src, db AS dst FROM cand_pairs
                        UNION ALL SELECT db, da FROM cand_pairs),
             reach(doc_id, r) AS (
               SELECT DISTINCT src AS doc_id, src AS r FROM cedges
               UNION
               SELECT e.dst AS doc_id, reach.r
               FROM reach JOIN cedges e ON e.src = reach.doc_id),
             clustered AS (SELECT DISTINCT doc_id FROM reach),
             nwds AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             ngr AS (
               SELECT DISTINCT doc_id,
                 md5(array_to_string(
                   ws[pos + 1 : pos + $NoveltyWords], ' ')) AS wkey
               FROM (
                 SELECT doc_id,
                   unnest(generate_series(0, len(ws) - $NoveltyWords)) AS pos,
                   ws
                 FROM nwds WHERE len(ws) >= $NoveltyWords)),
             nf AS (
               SELECT doc_id,
                 min(doc_id) OVER (PARTITION BY wkey) AS first_doc
               FROM ngr),
             nov AS (
               SELECT doc_id,
                 CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                   AS BIGINT) * 10000
                   // CAST(count(*) AS BIGINT) AS novelty_bp
               FROM nf GROUP BY doc_id),
             dd AS (
               SELECT least(n.novelty_bp // 1000, 9) AS decile,
                 CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END
                   AS in_cluster
               FROM nov n LEFT JOIN clustered c ON n.doc_id = c.doc_id)
             SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(in_cluster) AS BIGINT) AS n_clustered,
               CAST(sum(in_cluster) AS BIGINT) * 10000
                 // CAST(count(*) AS BIGINT) AS clustered_bp
             FROM dd
             GROUP BY decile
             ORDER BY decile""")),

    // ---- WINNOWING fingerprints (Schleimer/Wilkerson/Aiken 2003 — the
    //      MOSS algorithm): per position the md5 of the [[WinnowK]]-gram,
    //      then the MINIMUM hash of each [[WinnowW]]-wide window is a
    //      selected fingerprint; the distinct selected set per document
    //      is its sketch. The guarantee q39's whole-doc md5 and q99's
    //      fixed spans lack: ANY shared run of ≥ k+w−1 tokens shares a
    //      selected fingerprint, at ~2/(w+1) the storage of all grams.
    //      Output per doc: grams, selected fingerprints, fingerprints
    //      shared with ANY other doc, and share basis points — the
    //      plagiarism/copy-detection signal at fingerprint cost. Scale:
    //      one explode + one per-doc position window + a fingerprint-
    //      keyed groupBy; no self-join. ----
    "q169_winnowing_fingerprints" -> QueryDef(
      (s, dir) => winnowingFingerprints(Tables.load(s, dir, "documents"),
        Some(winnowFpsCached(s, dir))),
      Some(s"""WITH $winnowDuckCtes,
             shared AS (
               SELECT fp FROM fps GROUP BY fp
               HAVING count(DISTINCT doc_id) > 1),
             gct AS (SELECT doc_id, count(*) AS n_grams FROM whashed
                     GROUP BY doc_id)
             SELECT f.doc_id, g.n_grams,
               count(*) AS n_fp,
               CAST(sum(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_shared_fp,
               CAST(sum(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000 // count(*) AS shared_bp
             FROM fps f
             JOIN gct g ON f.doc_id = g.doc_id
             LEFT JOIN shared s ON f.fp = s.fp
             GROUP BY f.doc_id, g.n_grams
             ORDER BY f.doc_id""")),

    // ---- WINNOWING copy-pair report — MOSS's second half: documents
    //      sharing ≥ [[WinnowPairMin]] selected fingerprints, paired
    //      through a fingerprint-keyed equi self-join after dropping
    //      boilerplate fingerprints selected by > [[WinnowFpCap]] docs
    //      (the hot-band cap's analog — a header fragment shared by
    //      hundreds of docs would otherwise quadratically dominate).
    //      Overlap is reported against the SMALLER doc's sketch (the
    //      q160 containment convention), so a short doc lifted into a
    //      long one still scores high. ----
    "q170_winnowing_pairs" -> QueryDef(
      (s, dir) => winnowingPairs(Tables.load(s, dir, "documents"),
        Some(winnowFpsCached(s, dir))),
      Some(s"""WITH $winnowDuckCtes,
             hot AS (
               SELECT fp FROM fps GROUP BY fp
               HAVING count(DISTINCT doc_id) > $WinnowFpCap),
             cold AS (
               SELECT f.* FROM fps f ANTI JOIN hot h USING (fp)),
             fct AS (SELECT doc_id, count(*) AS nf FROM cold
                     GROUP BY doc_id),
             pr AS (
               SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS n_shared
               FROM cold x JOIN cold y
                 ON x.fp = y.fp AND x.doc_id < y.doc_id
               GROUP BY x.doc_id, y.doc_id)
             SELECT pr.da, pr.db, pr.n_shared,
               a.nf AS na, b.nf AS nb,
               pr.n_shared * 10000 // least(a.nf, b.nf) AS overlap_bp
             FROM pr
             JOIN fct a ON pr.da = a.doc_id
             JOIN fct b ON pr.db = b.doc_id
             WHERE pr.n_shared >= $WinnowPairMin
             ORDER BY pr.da, pr.db""")),

    // ---- CONTENT-DEFINED chunking + chunk-level dedup: a chunk
    //      boundary opens wherever the 56-bit hash of the trailing
    //      [[CdcHashWindow]]-word window ≡ 0 mod [[CdcBoundaryMod]] —
    //      the Rabin-fingerprint trick (LBFS/rsync lineage) that makes
    //      boundaries a function of LOCAL content only. Insert a
    //      sentence at the top of a copied document and q59's
    //      fixed-stride chunks all shift (every fingerprint changes);
    //      these chunks re-align at the first surviving boundary, so
    //      the copied tail still collides. The per-doc report counts
    //      chunks whose hash recurs in ANOTHER document — the
    //      shift-robust exact-dedup signal. Scale shape: boundary
    //      detection and chunk hashing are per-row array expressions
    //      (zero shuffle); the only exchanges are the chunk-hash
    //      groupBy and the hash-keyed join back — 16-char keys, never
    //      text (DESIGN.md "shuffle keys are hashes"). Expected chunk
    //      length is the modulus (~16 words) + the window floor; both
    //      engines fold the identical md5 arithmetic, so boundaries,
    //      hashes and counts agree bitwise. ----
    "q111_cdc_chunks" -> QueryDef(
      (s, dir) => cdcDocRollupCached(s, dir)
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          col("dup_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""WITH $cdcDuckCtes
             SELECT doc_id, count(*) AS n_chunks,
               CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_chunks,
               CAST(sum(CASE WHEN nd >= 2 THEN chunk_tokens ELSE 0 END)
                 AS BIGINT) AS dup_tokens
             FROM cdc_h JOIN cdc_cnt USING (chunk_hash)
             GROUP BY doc_id
             ORDER BY doc_id""")),

    // ---- BPE TRAINER: [[TrainMerges]] true training iterations — count
    //      weighted ADJACENT-TOKEN pairs over the current tokenization,
    //      take the argmax (cnt DESC, then token pair — deterministic),
    //      apply it as a greedy fold, RECOUNT. Each round sees the
    //      previous round's merged tokens, so (unlike q95's static
    //      table) later merges can contain earlier ones — real BPE.
    //      Scale shape: all counting runs over the VOCABULARY weighted
    //      by word frequency (pair counts over instances ≡ wcnt-weighted
    //      counts over distinct words), each round is one vocab-sized
    //      aggregation plus a 1-row argmax collect — bounded driver
    //      state, the tokenizer artifact itself. The oracle replays the
    //      identical rounds as a CTE chain, each round's 1-row argmax
    //      CROSS JOINed into the next round's fold. ----
    "q100_bpe_train" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val vocab = Tables.load(s, dir, "documents")
          .select(explode(split(lower(col("text")), " +")).as("word"))
          .filter(length(col("word")) >= 1)
          .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
        trainBpe(vocab, TrainMerges)
          .toDF("rank", "token_a", "token_b", "merged", "pair_count")
          .orderBy(col("rank"))
      },
      Some {
        val fold = (toks: String, src: String) =>
          s"""list_reduce(
                list_prepend(CAST([] AS VARCHAR[]),
                  list_transform($toks, t -> [t])),
                (acc, x) -> CASE
                  WHEN len(acc) = 0 THEN x
                  WHEN acc[-1] = $src.ta AND x[1] = $src.tb
                    THEN list_append(acc[1:len(acc) - 1], $src.m)
                  ELSE list_append(acc, x[1]) END)"""
        def pairsCte(tSrc: String, p: String) =
          s"""$p AS (
               SELECT z[1] AS ta, z[2] AS tb,
                 CAST(sum(wcnt) AS BIGINT) AS cnt
               FROM (
                 SELECT wcnt,
                   unnest(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)])) AS z
                 FROM $tSrc WHERE len(toks) >= 2)
               GROUP BY 1, 2)"""
        def argmaxCte(p: String, m: String) =
          s"""$m AS (SELECT ta, tb, ta || tb AS m, cnt FROM $p
                     ORDER BY cnt DESC, ta, tb LIMIT 1)"""
        def applyCte(tPrev: String, m: String, tNext: String) =
          s"""$tNext AS (
               SELECT word, wcnt, ${fold("toks", m)} AS toks
               FROM $tPrev CROSS JOIN $m)"""
        val rounds = (1 to TrainMerges).map { i =>
          val apply =
            if (i < TrainMerges) "," + applyCte(s"t${i - 1}", s"m$i", s"t$i")
            else ""
          s"${pairsCte(s"t${i - 1}", s"p$i")},\n${argmaxCte(s"p$i", s"m$i")}$apply"
        }.mkString(",\n")
        val sel = (1 to TrainMerges)
          .map(i => s"SELECT $i AS rank, ta AS token_a, tb AS token_b, m AS merged, cnt AS pair_count FROM m$i")
          .mkString(" UNION ALL ")
        s"""WITH w AS (
             SELECT unnest(string_split_regex(lower(text), ' +')) AS word
             FROM documents),
           v AS (SELECT word, count(*) AS wcnt FROM w
                 WHERE length(word) >= 1 GROUP BY word),
           t0 AS (
             SELECT word, wcnt,
               list_transform(generate_series(1, length(word)),
                 i -> substr(word, i, 1)) AS toks
             FROM v),
           $rounds
           $sel
           ORDER BY rank"""
      }),

    // ---- DEEP BPE TRAINER GATE: the same [[trainBpe]] loop as q100 but
    //      run to [[TrainMergesDeep]] = 16 rounds over a bounded
    //      deterministic vocabulary (top-[[DeepVocab]] pure-[a-z] words
    //      of the first 50 docs). The oracle is a DuckDB WITH RECURSIVE
    //      whose recursive term carries the ENTIRE tokenized vocabulary
    //      in one list-of-structs row: each iteration flattens adjacent
    //      token pairs from that state with list lambdas, counts them
    //      per distinct pair key, takes the (cnt DESC, ta, tb) argmax
    //      via list_reduce, applies the greedy left-associative merge
    //      fold to every word, and emits one (rank, merge) row —
    //      bit-for-bit the q100 semantics, but depth costs recursion
    //      steps instead of unrolled SQL, which is what lets 16 rounds
    //      (4× q100's gated depth) sit under the hash compare. Early
    //      exhaustion (no pairs left) terminates both engines
    //      identically. ----
    "q103_bpe_train_deep" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // the distributed vocabulary selection (combinable groupBy +
        // TakeOrdered top-64) stays in Spark; the 16 merge rounds run
        // driver-local over the 64 collected words ([[trainBpeLocal]] —
        // one bounded collect instead of 32 vocab-sized Spark jobs)
        val vocab = Tables.load(s, dir, "documents")
          .filter(col("doc_id") < 50)
          .select(explode(split(lower(col("text")), " +")).as("word"))
          .filter(col("word").rlike("^[a-z]+$"))
          .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
          .orderBy(col("wcnt").desc, col("word")).limit(DeepVocab)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        trainBpeLocal(vocab, TrainMergesDeep)
          .toDF("rank", "token_a", "token_b", "merged", "pair_count")
          .orderBy(col("rank"))
      },
      Some(s"""WITH RECURSIVE
           w0 AS (
             SELECT unnest(string_split_regex(lower(text), ' +')) AS word
             FROM documents WHERE doc_id < 50),
           v AS (
             SELECT word, count(*) AS wcnt FROM w0
             WHERE regexp_matches(word, '^[a-z]+$$')
             GROUP BY word
             ORDER BY wcnt DESC, word LIMIT $DeepVocab),
           t0 AS (
             SELECT word, wcnt,
               list_transform(generate_series(1, length(word)),
                 i -> substr(word, i, 1)) AS toks
             FROM v),
           steps AS (
             SELECT 0 AS r, CAST(NULL AS VARCHAR) AS ta,
                    CAST(NULL AS VARCHAR) AS tb, CAST(NULL AS VARCHAR) AS m,
                    CAST(NULL AS BIGINT) AS cnt,
                    (SELECT list({'word': word, 'wcnt': wcnt, 'toks': toks}
                                 ORDER BY word) FROM t0) AS state
             UNION ALL
             SELECT r + 1, best.ta, best.tb, best.ta || best.tb, best.cnt,
               list_transform(state, w -> {'word': w.word, 'wcnt': w.wcnt,
                 'toks': list_reduce(
                   list_prepend(CAST([] AS VARCHAR[]),
                     list_transform(w.toks, t -> [t])),
                   (acc, x) -> CASE
                     WHEN len(acc) = 0 THEN x
                     WHEN acc[-1] = best.ta AND x[1] = best.tb
                       THEN list_append(acc[1:len(acc) - 1], best.ta || best.tb)
                     ELSE list_append(acc, x[1]) END)})
             FROM (
               SELECT r, state,
                 CASE WHEN len(counted) = 0 THEN NULL ELSE
                   list_reduce(counted, (a, b) -> CASE
                     WHEN b.cnt > a.cnt OR (b.cnt = a.cnt AND
                       (b.ta < a.ta OR (b.ta = a.ta AND b.tb < a.tb)))
                     THEN b ELSE a END)
                 END AS best
               FROM (
                 SELECT r, state,
                   list_transform(
                     list_distinct(list_transform(pairs, p -> p.k)),
                     d -> {'ta': split_part(d, chr(31), 1),
                           'tb': split_part(d, chr(31), 2),
                           'cnt': CAST(list_sum(list_transform(pairs,
                                    p -> CASE WHEN p.k = d THEN p.wcnt
                                         ELSE 0 END)) AS BIGINT)}) AS counted
                 FROM (
                   SELECT r, state,
                     flatten(list_transform(state, w ->
                       list_transform(
                         list_zip(w.toks[1:len(w.toks) - 1],
                                  w.toks[2:len(w.toks)]),
                         z -> {'k': z[1] || chr(31) || z[2],
                               'wcnt': w.wcnt}))) AS pairs
                   FROM steps WHERE r < $TrainMergesDeep))
             ) WHERE best IS NOT NULL)
           SELECT r AS rank, ta AS token_a, tb AS token_b, m AS merged,
             cnt AS pair_count
           FROM steps WHERE r >= 1 ORDER BY rank""")),

    // ---- near-dup pairs by 3-gram Jaccard ≥ 0.8 (inverted-index join on
    //      the HASHED shingle with the hot-shingle cutoff; the oracle
    //      recomputes shingles with a window-lead formulation — an
    //      independent shingling path — and mirrors the hash and the
    //      cutoff exactly) ----
    "q32_dedup_ngram_jaccard" -> QueryDef(
      (s, dir) => jaccardPairsCached(s, dir, 0.8)
        .orderBy(col("da"), col("db")),
      Some(s"""WITH ${jaccardPairsDuckCtes(0.8)}
             SELECT da, db, n_shared, round(jac, 3) AS jaccard
             FROM jp
             ORDER BY da, db""")),

    // ---- incremental-ingestion dedup: a "new batch" (every 5th doc)
    //      dedups WITHIN itself (q31's keeper rule) and then against the
    //      existing corpus via an anti-join on the md5 content key — the
    //      shape every recurring crawl-ingest run has. Per source:
    //      batch size, within-batch uniques, and genuinely novel docs.
    //      Scale: the anti-join and the keeper groupBy both ride the
    //      32-byte hash; the three per-source rollups are tiny frames
    //      joined at the end. ----
    "q74_incremental_dedup" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val newB = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
          .select(col("doc_id"), col("source"), md5(col("text")).as("tkey"))
        val baseKeys = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4)
          .select(md5(col("text")).as("tkey")).distinct()
        val keepers = newB.groupBy(col("tkey"))
          .agg(min(col("doc_id")).as("keeper_id"),
            expr("min_by(source, doc_id)").as("source"))
        val novel = keepers.join(baseKeys, Seq("tkey"), "left_anti")
        val nBatch = newB.groupBy(col("source")).agg(count(lit(1)).as("n_batch"))
        val nUnique = keepers.groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
        val nNovel = novel.groupBy(col("source")).agg(count(lit(1)).as("n_novel"))
        nBatch
          .join(nUnique, Seq("source"), "left")
          .join(nNovel, Seq("source"), "left")
          .select(col("source"), col("n_batch"),
            coalesce(col("n_unique"), lit(0L)).as("n_unique"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .orderBy(col("source"))
      },
      Some("""WITH newb AS (
               SELECT doc_id, source, md5(text) AS tkey
               FROM documents WHERE doc_id % 5 = 4),
             base AS (
               SELECT DISTINCT md5(text) AS tkey
               FROM documents WHERE doc_id % 5 <> 4),
             keepers AS (
               SELECT tkey, min(doc_id) AS keeper_id,
                 min_by(source, doc_id) AS source
               FROM newb GROUP BY tkey),
             novel AS (
               SELECT k.* FROM keepers k ANTI JOIN base b USING (tkey)),
             nb AS (SELECT source, count(*) AS n_batch FROM newb GROUP BY source),
             nu AS (SELECT source, count(*) AS n_unique FROM keepers GROUP BY source),
             nn AS (SELECT source, count(*) AS n_novel FROM novel GROUP BY source)
             SELECT nb.source, nb.n_batch,
               CAST(coalesce(nu.n_unique, 0) AS BIGINT) AS n_unique,
               CAST(coalesce(nn.n_novel, 0) AS BIGINT) AS n_novel
             FROM nb
             LEFT JOIN nu USING (source)
             LEFT JOIN nn USING (source)
             ORDER BY source""")),

    // ---- bloom decontamination under the driver gate, with a FULL
    //      oracle: the filter is an explicit md5-salted bit array
    //      (build AND probe are integer expressions), so DuckDB replays
    //      the exact construction — word size 62 because 1 << 63
    //      overflows there (see [[BloomWordBits]]). ----
    "q75_bloom_decontam" -> QueryDef(
      (s, dir) => bloomDecontam(Tables.load(s, dir, "documents")),
      Some(s"""WITH $fourGramDuckCtes,
             $bloomBaseDuck,
             ${bloomArmDuck(BloomBitsPerElem)}
             SELECT doc_id, count(*) AS n_flagged
             FROM fl$BloomBitsPerElem
             GROUP BY doc_id
             ORDER BY doc_id""")),

    // ---- q192: the q75 filter's realized false-positive rate per
    //      source, against the exact q58 ground truth — integer basis
    //      points, flagged ⊇ true by the no-false-negative contract ----
    "q192_bloom_fp_audit" -> QueryDef(
      (s, dir) => bloomFpAudit(Tables.load(s, dir, "documents")),
      Some(s"""WITH $fourGramDuckCtes,
             $bloomBaseDuck,
             ${bloomArmDuck(BloomBitsPerElem)},
             probes AS (
               SELECT source, count(*) AS n_probes FROM trh GROUP BY 1),
             flg AS (
               SELECT source, count(*) AS n_flagged
               FROM fl$BloomBitsPerElem GROUP BY 1),
             tru AS (
               SELECT source, count(*) AS n_true
               FROM trh JOIN ev USING (s) GROUP BY 1)
             SELECT p.source, p.n_probes,
               coalesce(f.n_flagged, 0) AS n_flagged,
               coalesce(t.n_true, 0) AS n_true,
               ((coalesce(f.n_flagged, 0) - coalesce(t.n_true, 0)) * 10000)
                 // p.n_probes AS fp_bp
             FROM probes p
             LEFT JOIN flg f USING (source)
             LEFT JOIN tru t USING (source)
             ORDER BY p.source""")),

    // ---- q193: bloom sizing sweep over the bits-per-element grid,
    //      k fixed at the shipped 7 probes — one arm per budget ----
    "q193_bloom_sizing_sweep" -> QueryDef(
      (s, dir) => bloomSizingSweep(Tables.load(s, dir, "documents")),
      Some(s"""WITH $fourGramDuckCtes,
             $bloomBaseDuck,
             ${BloomSweepBits.map(bloomArmDuck).mkString(",\n             ")},
             pr AS (SELECT count(*) AS n_probes FROM trh),
             tru AS (
               SELECT count(*) AS n_true FROM trh JOIN ev USING (s))
             SELECT * FROM (${BloomSweepBits.map { b =>
        s"""SELECT CAST($b AS BIGINT) AS bits_per_elem,
               (SELECT m FROM p$b) AS m, n_probes,
               (SELECT count(*) FROM fl$b) AS n_flagged, n_true,
               (((SELECT count(*) FROM fl$b) - n_true) * 10000)
                 // n_probes AS fp_bp
             FROM pr, tru"""
      }.mkString("\n             UNION ALL\n             ")})
             ORDER BY bits_per_elem""")),

    // ---- language ID: stopword-hit scoring, deterministic argmax
    //      (predictor defined ONCE in [[predLang]]/[[predLangDuck]],
    //      shared with q138's confusion audit) ----
    "q37_language_id" -> QueryDef(
      (s, dir) => {
        val t = lower(col("text"))
        val hits = LangStopRes.map { case (l, re) =>
          size(regexp_extract_all(t, lit(re), lit(0))).as(s"${l}_hits")
        }
        Tables.load(s, dir, "documents")
          .select(col("doc_id") +: col("lang").as("tagged_lang") +: hits: _*)
          .withColumn("pred_lang", predLangFrom(l => col(s"${l}_hits")))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, lang AS tagged_lang,
               ${LangStopRes.map { case (l, _) =>
                 s"${duckLangHits(l, "text")} AS ${l}_hits" }.mkString(",\n               ")},
               ${predLangDuck("text")} AS pred_lang
             FROM documents
             ORDER BY doc_id""")),

    // ---- language-ID CONFUSION audit: the q37 predictor against the
    //      corpus's gold lang tags — per (tagged, predicted) cell the
    //      doc count and its share of the tagged language in basis
    //      points. The classifier-health read every multilingual
    //      pipeline takes before trusting lang-conditioned stages
    //      (q112's mixture grid, q122's fertility table): a language
    //      whose row mass sits off-diagonal is being routed to the
    //      wrong tokenizer/filters. zh has no stopword set, so its row
    //      shows exactly where an uncovered language lands — the
    //      honest failure mode, visible instead of hidden. One
    //      groupBy + a tagged-lang share window over ≤ |langs|² rows. ----
    "q138_langid_confusion" -> QueryDef(
      (s, dir) => langIdConfusion(Tables.load(s, dir, "documents")),
      Some(s"""WITH p AS (
               SELECT lang AS tagged_lang,
                 ${predLangDuck("text")} AS pred_lang
               FROM documents)
             SELECT tagged_lang, pred_lang, count(*) AS n_docs,
               count(*) * 10000 // CAST(sum(count(*))
                 OVER (PARTITION BY tagged_lang) AS BIGINT) AS row_bp
             FROM p
             GROUP BY tagged_lang, pred_lang
             ORDER BY tagged_lang, pred_lang""")),

    // ---- LANGUAGE-MIXING detection: documents where a SECOND language's
    //      stopwords participate materially (≥ [[MixMinHits]] hits from
    //      ≥2 of the q37 stopword families) — the code-switching /
    //      concatenated-crawl signal a multilingual curation run flags
    //      before lang-conditioned stages, because a mixed doc poisons
    //      whichever single-language bucket it lands in (q138 only
    //      audits the ARGMAX, which hides the runner-up mass this
    //      measures). secondary_hits = total stopword hits minus the
    //      winning language's — the runner-up mass itself. Per-row
    //      regex counts + one rollup on the gold lang tag. ----
    "q158_language_mixing" -> QueryDef(
      (s, dir) => languageMixing(Tables.load(s, dir, "documents")),
      Some {
        def h(l: String) = s"${l}_hits"
        val participates = LangStopRes.map { case (l, _) =>
          s"CASE WHEN ${h(l)} >= $MixMinHits THEN 1 ELSE 0 END" }
          .mkString(" + ")
        s"""WITH hh AS (
               SELECT doc_id, lang,
                 ${LangStopRes.map { case (l, _) =>
                   s"${duckLangHits(l, "text")} AS ${h(l)}" }
                   .mkString(",\n                 ")}
               FROM documents),
             v AS (
               SELECT lang,
                 ($participates) AS langs_hit,
                 (${LangStopRes.map(p => h(p._1)).mkString(" + ")})
                   - greatest(${LangStopRes.map(p => h(p._1)).mkString(", ")})
                   AS sec_hits
               FROM hh)
             SELECT lang AS tagged_lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN langs_hit >= 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_mixed,
               CAST(sum(CASE WHEN langs_hit >= 2 THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000 // count(*) AS mixed_bp,
               CAST(sum(sec_hits) AS BIGINT) AS secondary_hits
             FROM v GROUP BY lang ORDER BY tagged_lang"""
      }),

    // ---- CHAT-TURN structure audit: the SFT/chat-data gate that runs
    //      before conversation data trains anything — parse the turn
    //      structure, validate role alternation, flag empty and
    //      unknown-role turns, and certify well-formedness (starts with
    //      user, ends with assistant, ≥2 turns, zero violations). The
    //      corpus is plain text, so transcripts are PLANTED on the
    //      doc_id % 8 == 1 grid with one malformation per class (q148
    //      discipline); the detector keys on STRUCTURE (≥2 delimited
    //      turns with a role prefix), not the grid. Delimiters and role
    //      regexes avoid backslashes entirely (character-class split,
    //      literal alternation — the q152 dialect rule). Per-row array
    //      expressions + one source rollup. ----
    "q165_chat_turn_audit" -> QueryDef(
      (s, dir) => chatTurnAudit(Tables.load(s, dir, "documents")
        .withColumn("ctext", expr(chatSynthSpark))),
      // chatSynthSpark is dialect-neutral SQL (CASE + string literals,
      // no concat operator), so the oracle interpolates it verbatim
      Some(s"""WITH ct AS (
               SELECT doc_id, source, $chatSynthSpark AS ctext
               FROM documents),
             t AS (
               SELECT source,
                 string_split_regex(ctext, ' [|][|] ') AS turns
               FROM ct),
             r AS (
               SELECT source, turns,
                 list_transform(turns, x ->
                   CASE WHEN starts_with(x, 'user:') THEN 'u'
                        WHEN starts_with(x, 'assistant:') THEN 'a'
                        ELSE 'x' END) AS roles
               FROM t),
             v AS (
               SELECT source,
                 CASE WHEN len(turns) >= 2 AND roles[1] <> 'x'
                   THEN 1 ELSE 0 END AS is_chat,
                 len(list_filter(generate_series(1, len(roles) - 1),
                   i -> roles[i] = roles[i + 1])) AS same_adj,
                 len(list_filter(turns, x ->
                   trim(regexp_replace(x, '^(user:|assistant:)', '')) = ''))
                   AS empties,
                 len(list_filter(roles, x -> x = 'x')) AS badroles,
                 CASE WHEN len(roles) >= 2 AND roles[1] = 'u'
                       AND roles[len(roles)] = 'a' THEN 1 ELSE 0 END
                   AS shape_ok
               FROM r),
             f AS (
               SELECT source, is_chat,
                 CASE WHEN is_chat = 1 THEN same_adj ELSE 0 END AS rv,
                 CASE WHEN is_chat = 1 THEN empties ELSE 0 END AS et,
                 CASE WHEN is_chat = 1 AND same_adj = 0 AND empties = 0
                       AND badroles = 0 AND shape_ok = 1
                   THEN 1 ELSE 0 END AS wf
               FROM v)
             SELECT source, count(*) AS n_docs,
               CAST(sum(is_chat) AS BIGINT) AS n_chat,
               CAST(sum(rv) AS BIGINT) AS n_role_violations,
               CAST(sum(et) AS BIGINT) AS n_empty_turns,
               CAST(sum(wf) AS BIGINT) AS n_wellformed
             FROM f GROUP BY source ORDER BY source""")),

    // ---- INSTRUCTION-PAIR extraction: the step after q165's audit —
    //      every (user turn, immediately-following assistant turn) with
    //      non-empty response becomes an SFT (prompt, response)
    //      example. Per source: pair count, docs contributing, prompt/
    //      response word mass and a distinct-pair content signature
    //      (md5 over prompt ␟ response — the q77 discipline: the
    //      checksum verifies the EXTRACTED TEXT, not just counts).
    //      Adjacency rides one lead() window per doc. ----
    // ---- FILL-IN-THE-MIDDLE transform (Bavarian et al. 2022): the
    //      deterministic document rewrite code-model training applies to
    //      ~half its corpus — two md5-derived character cuts split each
    //      selected doc into (prefix, middle, suffix), reassembled as
    //      PSM '<PRE>p<SUF>s<MID>m' or SPM '<SUF>s<PRE>p<MID>m' (mode
    //      also hash-chosen); unselected docs pass through as plain
    //      autoregressive text. Output carries the segment lengths
    //      (span-boundary accounting the loss masking needs) and the
    //      md5 of the reassembled training string — the hash gate that
    //      proves both engines build byte-identical sequences. Scale:
    //      a pure per-row projection — whole-stage codegen, zero
    //      shuffles beyond the output sort; the transform is applied at
    //      read time, never materialized corpus-wide. ----
    "q180_fim_transform" -> QueryDef(
      (s, dir) => fimTransform(Tables.load(s, dir, "documents")),
      Some("""WITH h AS (
               SELECT doc_id, text,
                 greatest(length(text), 1) AS l,
                 CAST(('0x' || substr(md5('fimr:' ||
                   CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 2 AS hr,
                 CAST(('0x' || substr(md5('fimm:' ||
                   CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 2 AS hm,
                 CAST(('0x' || substr(md5('fim1:' ||
                   CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                   % greatest(length(text), 1) AS c1,
                 CAST(('0x' || substr(md5('fim2:' ||
                   CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                   % greatest(length(text), 1) AS c2
               FROM documents),
             cut AS (
               SELECT doc_id, text, l, hr, hm,
                 least(c1, c2) AS lo, greatest(c1, c2) AS hi
               FROM h),
             seg AS (
               SELECT doc_id, hr, hm, l, lo, hi,
                 substr(text, 1, lo) AS pre,
                 substr(text, lo + 1, hi - lo) AS mid,
                 substr(text, hi + 1) AS suf,
                 text
               FROM cut)
             SELECT doc_id,
               CASE WHEN hr = 1 THEN 'ar'
                    WHEN hm = 0 THEN 'psm' ELSE 'spm' END AS mode,
               CASE WHEN hr = 1 THEN CAST(length(text) AS BIGINT)
                    ELSE CAST(lo AS BIGINT) END AS len_prefix,
               CASE WHEN hr = 1 THEN 0
                    ELSE CAST(hi - lo AS BIGINT) END AS len_middle,
               CASE WHEN hr = 1 THEN 0
                    ELSE CAST(length(text) - hi AS BIGINT) END AS len_suffix,
               CASE WHEN hr = 1 THEN md5(text)
                    WHEN hm = 0 THEN
                      md5('<PRE>' || pre || '<SUF>' || suf || '<MID>' || mid)
                    ELSE
                      md5('<SUF>' || suf || '<PRE>' || pre || '<MID>' || mid)
               END AS out_md5
             FROM seg ORDER BY doc_id""")),

    // ---- RARE-TOKEN-RUN detector: runs of ≥ RareRunMin consecutive
    //      tokens whose corpus frequency is ≤ RareFreqMax — the
    //      secret-shaped spans (API keys, session tokens, dense
    //      identifiers, one-off PII) that q77's pattern regexes miss
    //      because secrets don't match known formats; the memorization-
    //      risk signal (Carlini et al. 2021) a privacy review reads per
    //      document. Scale: explode + combinable vocab groupBy +
    //      word-keyed equi-join + doc-keyed windows (see rareTokenRuns
    //      Scaladoc); no self-joins anywhere. ----
    "q181_rare_token_runs" -> QueryDef(
      (s, dir) => rareTokenRunsCached(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH d AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
               FROM documents),
             toks AS (
               SELECT doc_id, unnest(ws) AS w,
                 generate_subscripts(ws, 1) - 1 AS pos
               FROM d),
             freq AS (SELECT w, count(*) AS cf FROM toks GROUP BY w),
             rare AS (
               SELECT t.doc_id, t.pos FROM toks t JOIN freq f ON t.w = f.w
               WHERE f.cf <= $RareFreqMax),
             grps AS (
               SELECT doc_id,
                 pos - row_number() OVER (PARTITION BY doc_id
                   ORDER BY pos) AS grp
               FROM rare),
             runs AS (SELECT doc_id, grp, count(*) AS run_len
                      FROM grps GROUP BY doc_id, grp),
             pd AS (
               SELECT doc_id, CAST(sum(run_len) AS BIGINT) AS n_rare,
                 CAST(sum(CASE WHEN run_len >= $RareRunMin THEN 1 ELSE 0
                   END) AS BIGINT) AS n_runs,
                 CAST(max(run_len) AS BIGINT) AS max_run
               FROM runs GROUP BY doc_id),
             nt AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens
                    FROM d)
             SELECT nt.doc_id, nt.n_tokens,
               coalesce(pd.n_rare, 0) AS n_rare,
               coalesce(pd.n_runs, 0) AS n_runs,
               coalesce(pd.max_run, 0) AS max_run,
               CASE WHEN coalesce(pd.n_runs, 0) > 0 THEN 1 ELSE 0 END
                 AS flagged
             FROM nt LEFT JOIN pd ON nt.doc_id = pd.doc_id
             ORDER BY nt.doc_id""")),

    // ---- WINNOWING DECONTAMINATION: q169's selected fingerprints
    //      joined across the q65 split boundary — train docs sharing a
    //      fingerprint with ANY eval doc carry a ≥ 7-token verbatim run
    //      into the held-out set (the MOSS guarantee as a leakage gate;
    //      the long-span complement of q58's scattered-gram count and
    //      q92's near-dup-pair audit). Output: every contaminated train
    //      doc with its sketch size, eval-shared fingerprints and the
    //      shared share in basis points. Scale: one winnowing pass +
    //      fp-keyed equi-joins; the eval fp set is corpus-scaled and
    //      NOT broadcast. ----
    "q182_winnow_decontam" -> QueryDef(
      (s, dir) => winnowDecontamCached(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH $winnowDuckCtes,
             sp AS (
               SELECT doc_id,
                 CAST(('0x' || substr(md5('split:' ||
                   CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 10 AS b
               FROM documents),
             fb AS (SELECT f.doc_id, f.fp, sp.b
                    FROM fps f JOIN sp USING (doc_id)),
             ef AS (SELECT DISTINCT fp FROM fb WHERE b >= 8),
             tf AS (SELECT doc_id, fp FROM fb WHERE b < 8),
             nfp AS (SELECT doc_id, count(*) AS n_fp FROM tf
                     GROUP BY doc_id),
             hits AS (
               SELECT tf.doc_id, count(*) AS n_eval_fp
               FROM tf JOIN ef USING (fp) GROUP BY tf.doc_id)
             SELECT h.doc_id, nfp.n_fp, h.n_eval_fp,
               h.n_eval_fp * 10000 // nfp.n_fp AS eval_bp
             FROM hits h JOIN nfp ON h.doc_id = nfp.doc_id
             ORDER BY h.doc_id""")),

    "q177_instruction_pairs" -> QueryDef(
      (s, dir) => instructionPairs(Tables.load(s, dir, "documents")
        .withColumn("ctext", expr(chatSynthSpark))),
      Some(s"""WITH ct AS (
               SELECT doc_id, source, $chatSynthSpark AS ctext
               FROM documents),
             t AS (
               SELECT doc_id, source,
                 unnest(string_split_regex(ctext, ' [|][|] ')) AS turn,
                 generate_subscripts(
                   string_split_regex(ctext, ' [|][|] '), 1) AS ti
               FROM ct),
             r AS (
               SELECT doc_id, source, ti, turn,
                 lead(turn) OVER (PARTITION BY doc_id ORDER BY ti)
                   AS nturn
               FROM t),
             p AS (
               SELECT doc_id, source,
                 trim(regexp_replace(turn, '^user:', '')) AS prompt,
                 trim(regexp_replace(nturn, '^assistant:', '')) AS response
               FROM r
               WHERE starts_with(turn, 'user:')
                 AND nturn IS NOT NULL
                 AND starts_with(nturn, 'assistant:')
                 AND trim(regexp_replace(nturn, '^assistant:', '')) <> '')
             SELECT source,
               count(*) AS n_pairs,
               count(DISTINCT doc_id) AS n_docs,
               CAST(sum(len(string_split_regex(prompt, ' +'))) AS BIGINT)
                 AS prompt_words,
               CAST(sum(len(string_split_regex(response, ' +'))) AS BIGINT)
                 AS response_words,
               count(DISTINCT md5(prompt || chr(31) || response))
                 AS n_distinct_pairs
             FROM p GROUP BY source ORDER BY source""")),

    // ---- TAIL-REPETITION (degenerate-loop) detection: documents whose
    //      final token repeats ≥ [[TailRepeatMin]] times at the end —
    //      the model-generated-loop artifact synthetic/SFT curation
    //      filters (distinct from q64's global repetition ratios, which
    //      a long doc with a short loop tail passes). Planted on the
    //      doc_id % 10 == 6 grid. The trailing-run length is pure array
    //      arithmetic: n − max index whose token differs from the last
    //      (empty filter ⇒ the whole doc is one token repeated). ----
    "q166_tail_repetition" -> QueryDef(
      (s, dir) => tailRepetition(Tables.load(s, dir, "documents")
        .withColumn("ttext", expr(tailSynthSpark))),
      // tailSynthSpark is dialect-neutral (CASE + concat(), both engines)
      Some(s"""WITH tt AS (
               SELECT doc_id, source, $tailSynthSpark AS ttext
               FROM documents),
             w AS (
               SELECT source, string_split_regex(ttext, ' +') AS ws
               FROM tt),
             rn AS (
               SELECT source, len(ws) AS n,
                 CASE WHEN len(ws) < 2 THEN len(ws)
                   ELSE len(ws) - coalesce(list_max(list_filter(
                     generate_series(1, len(ws) - 1),
                     i -> ws[i] <> ws[len(ws)])), 0) END AS run
               FROM w)
             SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN run >= $TailRepeatMin THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_flagged,
               CAST(sum(CASE WHEN run >= $TailRepeatMin THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000 // count(*) AS flagged_bp,
               CAST(max(run) AS BIGINT) AS max_tail_run
             FROM rn GROUP BY source ORDER BY source""")),

    // ---- quality scoring: length/punct/stopword ratios ----
    "q38_quality_score" -> QueryDef(
      (s, dir) => {
        val t = col("text")
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            length(t).as("n_chars"),
            Quality.nWords(t).as("n_words"),
            size(regexp_extract_all(t, lit("[.,;:!?]"), lit(0))).as("n_punct"),
            Quality.nStop(t).as("n_stop"))
          .withColumn("avg_word_len",
            round((col("n_chars") - col("n_words") + 1) * lit(1.0) / col("n_words"), 4))
          .withColumn("stop_ratio", round(col("n_stop") * lit(1.0) / col("n_words"), 4))
          .withColumn("quality_score",
            round(Quality.scoreFrom(col("n_words"), col("n_stop")), 4))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
               length(text) AS n_chars,
               ${Quality.duckNWords("text")} AS n_words,
               len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
               ${Quality.duckNStop("text")} AS n_stop,
               round((length(text) - ${Quality.duckNWords("text")} + 1) * 1.0
                 / ${Quality.duckNWords("text")}, 4) AS avg_word_len,
               round(${Quality.duckNStop("text")} * 1.0
                 / ${Quality.duckNWords("text")}, 4) AS stop_ratio,
               round(${Quality.duckScore("text")}, 4) AS quality_score
             FROM documents
             ORDER BY doc_id""")),

    // ---- TF-IDF top terms per document, rational idf. This operator's
    //      DEFINED semantics are tf·(N/df) — not the classical tf·ln(N/df).
    //      The two scores can rank terms differently (monotonicity of ln
    //      does not survive multiplication by tf), so this is a deliberate
    //      semantic choice, made because the rational score is a single
    //      IEEE division both engines compute bit-identically, where ln()
    //      could differ by an ulp between libm and the JVM and flip a
    //      rounded value (DESIGN.md parity rules). ----
    "q51_tfidf_top_terms" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val words = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(lower(col("text")), " +")).as("term"))
          .transform(TransientCache.scopedDF)
        val n = Tables.load(s, dir, "documents")
          .agg(count(lit(1)).as("n_docs"))
        val tf = words.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = words.select(col("doc_id"), col("term")).distinct()
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))
        tf.join(dfreq, "term").crossJoin(n)
          .withColumn("tfidf",
            col("tf") * col("n_docs") * lit(1.0) / col("df"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"),
            col("df"), round(col("tfidf"), 4).as("tfidf"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""WITH words AS (
               SELECT doc_id,
                 unnest(string_split_regex(lower(text), ' +')) AS term
               FROM documents),
             n AS (SELECT count(*) AS n_docs FROM documents),
             tf AS (SELECT doc_id, term, count(*) AS tf
                    FROM words GROUP BY doc_id, term),
             dfreq AS (SELECT term, count(*) AS df FROM
                       (SELECT DISTINCT doc_id, term FROM words)
                       GROUP BY term),
             scored AS (
               SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                 tf.tf * n.n_docs * 1.0 / dfreq.df AS tfidf
               FROM tf JOIN dfreq USING (term) CROSS JOIN n),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term) AS rank
               FROM scored)
             SELECT doc_id, rank, term, tf, df, round(tfidf, 4) AS tfidf
             FROM ranked WHERE rank <= 3
             ORDER BY doc_id, rank""")),

    // ---- deterministic stratified sampling: an md5-derived hash of the
    //      doc id decides membership, so the sample is reproducible across
    //      runs, engines and cluster layouts (no rand()), and the rate
    //      holds per language stratum. The standard trick for carving
    //      train/eval splits out of a 100 TB corpus. ----
    "q53_stratified_sample" -> QueryDef(
      (s, dir) => {
        val inSample =
          expr("""cast(conv(substring(md5(concat('sample:',
                    cast(doc_id as string))), 1, 14), 16, 10) as long)""")
            .%(10) < 2
        Tables.load(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(inSample, 1L).otherwise(0L)).as("n_sampled"))
          .withColumn("rate",
            round(col("n_sampled") * lit(1.0) / col("n_total"), 4))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_total,
               CAST(sum(CASE WHEN CAST(('0x' || substr(md5('sample:' ||
                     CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 10 < 2
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               round(sum(CASE WHEN CAST(('0x' || substr(md5('sample:' ||
                     CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 10 < 2
                   THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS rate
             FROM documents
             GROUP BY lang
             ORDER BY lang""")),

    // ---- token-count histogram in power-of-two buckets per language
    //      (corpus length profiling for context-window planning). The
    //      bucket is an integer CASE ladder whose TEXT is identical in
    //      both engines — no float log2 that could flip at an exact power
    //      of two. Map-side combinable: one groupBy, no joins. ----
    "q55_token_histogram" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("lang"),
            size(split(lower(col("text")), " +")).as("n_tokens"))
          .withColumn("bucket_lo", expr(TokenBucketCase))
          .groupBy(col("lang"), col("bucket_lo"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("bucket_lo")),
      Some(s"""WITH t AS (
               SELECT lang,
                 len(string_split_regex(lower(text), ' +')) AS n_tokens
               FROM documents)
             SELECT lang, $TokenBucketCase AS bucket_lo, count(*) AS n_docs
             FROM t
             GROUP BY lang, bucket_lo
             ORDER BY lang, bucket_lo""")),

    // ---- benchmark decontamination: training docs sharing any 4-gram
    //      with the eval set (source 'src0' stands in for a benchmark
    //      suite). The eval side's DISTINCT shingle set is small by
    //      construction (benchmarks are tiny next to a training corpus),
    //      so the contamination check is a BROADCAST semi-join against it
    //      — the training corpus streams through map-side, no shuffle of
    //      the big side. n_shared counts distinct shared 4-grams per
    //      training doc. ----
    "q58_decontam" -> QueryDef(
      (s, dir) => decontamCountsCached(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH $fourGramDuckCtes,
             ev AS (
               SELECT DISTINCT g.s FROM g
               JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
             tr AS (
               SELECT g.* FROM g
               JOIN documents d USING (doc_id) WHERE d.source <> 'src0')
             SELECT doc_id, count(*) AS n_shared
             FROM tr JOIN ev USING (s)
             GROUP BY doc_id
             ORDER BY doc_id""")),

    // ---- context-window chunking: split each document into 32-word
    //      chunks with stride 24 (8-word overlap) — the standard
    //      sequence-prep step before tokenization. Chunk count is pure
    //      integer arithmetic ((n+15) div 24, min 1) and the chunk
    //      fingerprint is an md5 prefix, so both engines agree exactly.
    //      One posexplode per doc, no shuffle until the final sort. ----
    "q59_chunking" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("words", split(lower(col("text")), " +"))
          .withColumn("n_chunks", expr("greatest(1, (size(words) + 15) div 24)"))
          .select(col("doc_id"), col("words"),
            posexplode(expr("sequence(0, n_chunks - 1)")).as(Seq("chunk_idx", "start24")))
          .withColumn("chunk", expr("slice(words, chunk_idx * 24 + 1, 32)"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("chunk")).as("chunk_tokens"),
            expr("substring(md5(concat_ws(' ', chunk)), 1, 16)").as("chunk_hash"))
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH d AS (
               SELECT doc_id, string_split_regex(lower(text), ' +') AS words,
                 greatest(1, (len(string_split_regex(lower(text), ' +')) + 15) // 24)
                   AS n_chunks
               FROM documents),
             c AS (
               SELECT doc_id,
                 unnest(generate_series(0, n_chunks - 1)) AS chunk_idx,
                 words
               FROM d),
             sliced AS (
               SELECT doc_id, chunk_idx,
                 list_slice(words, chunk_idx * 24 + 1, chunk_idx * 24 + 32) AS chunk
               FROM c)
             SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
               len(chunk) AS chunk_tokens,
               substr(md5(array_to_string(chunk, ' ')), 1, 16) AS chunk_hash
             FROM sliced
             ORDER BY doc_id, chunk_idx""")),

    // ---- the full curation funnel, composed from the pipeline's own
    //      stages: language filter → quality threshold → exact-dedup
    //      keeper → benchmark decontamination. One row of cumulative
    //      survivor counts — the report a 100 TB curation run ends with.
    //      Each flag is computed with the exact formula of its standalone
    //      query (q37/q38/q31/q58), so the funnel is the composition, not
    //      a reimplementation. The keeper flag is a min-over-text window
    //      (same shuffle key as q31's groupBy); the contamination probe is
    //      the q58 broadcast semi-join. ----
    "q60_curation_funnel" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        // the cached q58 verdict IS the contaminated doc-id set (one
        // row per contaminated training doc by construction)
        val contaminated = decontamCountsCached(s, dir)
          .select(col("doc_id")).withColumn("contam", lit(1))
        // every text-derived column is computed BEFORE the keeper window
        // and the text itself is dropped, so the window's exchange
        // partitions on the 32-byte md5 key and ships only scalar flags —
        // never document bodies (q31's shuffle discipline)
        val flags = docs
          .withColumn("quality_score", Quality.score(col("text")))
          .select(col("doc_id"), col("lang"), col("source"),
            col("quality_score"), md5(col("text")).as("tkey"))
          .withColumn("keeper",
            col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("tkey"))))
          .join(broadcast(contaminated), Seq("doc_id"), "left")
        def cnt(c: org.apache.spark.sql.Column, name: String) =
          sum(when(c, 1L).otherwise(0L)).as(name)
        val en = col("lang") === "en"
        val q = col("quality_score") >= 0.3
        val k = col("keeper")
        val clean = col("contam").isNull && col("source") =!= "src0"
        flags.agg(
          count(lit(1)).as("n_total"),
          cnt(en, "n_en"),
          cnt(en && q, "n_quality"),
          cnt(en && q && k, "n_keeper"),
          cnt(en && q && k && clean, "n_final"))
      },
      Some(s"""WITH w AS (
               SELECT doc_id,
                 unnest(string_split_regex(lower(text), ' +')) AS word,
                 generate_subscripts(string_split_regex(lower(text), ' +'), 1) AS i
               FROM documents),
             g AS (
               SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                   concat_ws(' ', word,
                     lead(word, 1) OVER (PARTITION BY doc_id ORDER BY i),
                     lead(word, 2) OVER (PARTITION BY doc_id ORDER BY i),
                     lead(word, 3) OVER (PARTITION BY doc_id ORDER BY i)) AS s,
                   lead(word, 3) OVER (PARTITION BY doc_id ORDER BY i) AS tail
                 FROM w)
               WHERE tail IS NOT NULL),
             ev AS (
               SELECT DISTINCT g.s FROM g
               JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
             contam AS (
               SELECT DISTINCT g.doc_id FROM g
               JOIN documents d USING (doc_id)
               JOIN ev USING (s)
               WHERE d.source <> 'src0'),
             flags AS (
               SELECT doc_id, lang, source,
                 ${Quality.duckScore("text")} AS quality_score,
                 doc_id = min(doc_id) OVER (PARTITION BY text) AS keeper,
                 doc_id IN (SELECT doc_id FROM contam) AS contaminated
               FROM documents)
             SELECT count(*) AS n_total,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
               CAST(sum(CASE WHEN lang = 'en' AND quality_score >= 0.3
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(sum(CASE WHEN lang = 'en' AND quality_score >= 0.3 AND keeper
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_keeper,
               CAST(sum(CASE WHEN lang = 'en' AND quality_score >= 0.3 AND keeper
                    AND NOT contaminated AND source <> 'src0'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_final
             FROM flags""")),

    // ---- global bigram top-20 (corpus n-gram statistics) ----
    "q57_bigram_topk" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("words", split(lower(col("text")), " +"))
          .filter(size(col("words")) >= 2)
          .select(explode(expr(
            """transform(sequence(0, size(words) - 2),
                 i -> concat_ws(' ', slice(words, i + 1, 2)))""")).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20),
      Some("""WITH w AS (
               SELECT doc_id,
                 unnest(string_split_regex(lower(text), ' +')) AS word,
                 generate_subscripts(string_split_regex(lower(text), ' +'), 1) AS i
               FROM documents),
             bg AS (
               SELECT concat_ws(' ', word,
                 lead(word, 1) OVER (PARTITION BY doc_id ORDER BY i)) AS bigram,
                 lead(word, 1) OVER (PARTITION BY doc_id ORDER BY i) AS tail
               FROM w)
             SELECT bigram, count(*) AS n
             FROM bg WHERE tail IS NOT NULL
             GROUP BY bigram
             ORDER BY n DESC, bigram
             LIMIT 20""")),

    // ---- token counting + polynomial content fingerprint. The fold is
    //      sequential in both engines (functions.aggregate ≡ list_reduce
    //      over a 0-prepended list) and stays in [0, 1e9+7) so int64
    //      arithmetic cannot overflow in either. ----
    "q39_token_fingerprint" -> QueryDef(
      (s, dir) => {
        graft.expr.Md5Hash56.register(s)
        Tables.load(s, dir, "documents")
          .withColumn("words", split(lower(col("text")), " +"))
          .select(col("doc_id"),
            size(col("words")).as("ws_tokens"),
            size(regexp_extract_all(lower(col("text")),
              lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("bpe_ish_tokens"),
            expr("""aggregate(words, 0L,
                (acc, w) -> (acc * 31 +
                  graft_md5_56(w) % 1000000007) % 1000000007)""")
              .as("fingerprint"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
               len(string_split_regex(lower(text), ' +')) AS ws_tokens,
               len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split_regex(lower(text), ' +'),
                     w -> CAST(('0x' || substr(md5(w), 1, 14)) AS BIGINT) % 1000000007)),
                 (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
             FROM documents
             ORDER BY doc_id""")),

    // ---- Gopher-style repetition signals: the fraction of tokens taken
    //      by the single most frequent term (high → boilerplate/spam) and
    //      the distinct-token ratio (low → repetitive). Plan (audited):
    //      two aggregation shuffles, each with a map-side partial — the
    //      first combines (doc,term) counts before the exchange, so the
    //      second shuffle carries at most one row per distinct term per
    //      doc, not one per token. Ratios are IEEE divisions of exact
    //      int64s (identical bit patterns in both engines) and both
    //      engines round half-away-from-zero at 4 dp. ----
    "q64_repetition_ratio" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(lower(col("text")), " +")).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("n_tokens"),
            max(col("tf")).as("top_tf"),
            count(lit(1)).as("n_distinct"))
          .withColumn("rep_ratio",
            round(col("top_tf") * lit(1.0) / col("n_tokens"), 4))
          .withColumn("uniq_ratio",
            round(col("n_distinct") * lit(1.0) / col("n_tokens"), 4))
          .orderBy(col("doc_id")),
      Some("""WITH tf AS (
               SELECT doc_id, term, count(*) AS tf FROM (
                 SELECT doc_id,
                   unnest(string_split_regex(lower(text), ' +')) AS term
                 FROM documents)
               GROUP BY doc_id, term)
             SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS n_tokens,
               max(tf) AS top_tf,
               count(*) AS n_distinct,
               round(max(tf) * 1.0 / CAST(sum(tf) AS BIGINT), 4) AS rep_ratio,
               round(count(*) * 1.0 / CAST(sum(tf) AS BIGINT), 4) AS uniq_ratio
             FROM tf
             GROUP BY doc_id
             ORDER BY doc_id""")),

    // ---- deterministic train/validation/test split: an md5-derived
    //      bucket of the doc id (the q53 sampling hash with a different
    //      salt) assigns 80/10/10, reported per source. Because the
    //      bucket is a pure function of the id, the split is stable
    //      across runs, engines and cluster layouts, and adding new docs
    //      never reassigns existing ones — the property a 100 TB corpus
    //      split must have (re-hashing the world per run is not an
    //      option). One groupBy, map-side combinable. ----
    "q65_train_split" -> QueryDef(
      (s, dir) => {
        val b = expr("""cast(conv(substring(md5(concat('split:',
                   cast(doc_id as string))), 1, 14), 16, 10) as long) % 10""")
        Tables.load(s, dir, "documents")
          .withColumn("split",
            when(b < 8, "train").when(b === 8, "validation").otherwise("test"))
          .withColumn("n_tokens", size(split(lower(col("text")), " +")))
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tokens"))
          .orderBy(col("source"), col("split"))
      },
      Some("""WITH t AS (
               SELECT source,
                 CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'validation'
                      ELSE 'test' END AS split,
                 len(string_split_regex(lower(text), ' +')) AS n_tokens
               FROM (SELECT source, text,
                 CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 14))
                   AS BIGINT) % 10 AS b
                 FROM documents))
             SELECT source, split, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens
             FROM t
             GROUP BY source, split
             ORDER BY source, split""")),

    // ---- BPE merge-candidate statistics: corpus frequency of every
    //      adjacent character pair inside words — the count a BPE
    //      tokenizer trainer computes to pick its first merge (the
    //      argmax pair), here the top-20 with a deterministic tie-break.
    //      Shape: two generator explodes (word, then its length-1
    //      in-word bigrams via a loop-shaped transform over sequence —
    //      never an unrolled projection) into a map-side-combinable
    //      groupBy on the 2-char key; top-20 is TakeOrderedAndProject,
    //      not a global sort. Words shorter than 2 chars are filtered
    //      BEFORE the pair transform on both sides — Spark's
    //      sequence(1, 0) would yield a DESCENDING [1, 0] where DuckDB's
    //      generate_series(1, 0) yields [], a cross-engine trap the
    //      filter removes outright. ----
    "q88_bpe_pairs" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(explode(split(lower(col("text")), " +")).as("word"))
          .filter(length(col("word")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
            .as("pair"))
          .groupBy(col("pair"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair"))
          .limit(20),
      Some("""WITH w AS (
               SELECT unnest(string_split_regex(lower(text), ' +')) AS word
               FROM documents),
             p AS (
               SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                 i -> substr(word, i, 2))) AS pair
               FROM w WHERE length(word) >= 2)
             SELECT pair, count(*) AS cnt
             FROM p GROUP BY pair
             ORDER BY cnt DESC, pair
             LIMIT 20""")),

    // ---- BPE merge APPLICATION: re-tokenize the corpus under the
    //      top-[[BpeMerges]] q88 merge rules — the pipeline step after
    //      pair counting, reported as per-document token counts before
    //      (characters) and after (BPE tokens). Each word starts as its
    //      character sequence; each rule (a,b)→ab is one left-to-right
    //      greedy fold (the same sequential-fold trick as the float
    //      normalizers: Spark `aggregate` ≡ DuckDB 0-prepended
    //      `list_reduce`), applied in rank order — later rules see
    //      earlier rules' merged tokens, exactly like a real BPE
    //      encoder. Non-overlap falls out of the fold: once "aa" is
    //      merged its token no longer equals "a". The merge table is a
    //      bounded tokenizer artifact (≤ 8 rows): Spark collects it and
    //      folds it into the expression tree (the same bounded-metadata
    //      collect class as the percentile cuts); the oracle pivots the
    //      ranked pairs into one broadcast row and nests the identical
    //      8 folds, with missing ranks (tiny corpora) degrading to
    //      identity passes via NULL comparisons. CASE arms (not AND)
    //      guard the empty-accumulator probe so ANSI element_at can
    //      never see index -1 on an empty array. ----
    "q95_bpe_encode" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val words = docs
          .select(col("doc_id"), explode(split(lower(col("text")), " +")).as("word"))
          .filter(length(col("word")) >= 1)
        words.join(bpeVocabToks(docs), "word")
          .groupBy(col("doc_id"))
          .agg(sum(col("w_chars")).as("n_chars"),
            sum(col("w_toks")).as("n_bpe_tokens"))
          .withColumn("compression",
            round(col("n_chars") / col("n_bpe_tokens"), 4))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $bpeEncodeDuckCtes
           SELECT doc_id,
             CAST(sum(length(word)) AS BIGINT) AS n_chars,
             CAST(sum(len(toks)) AS BIGINT) AS n_bpe_tokens,
             round(CAST(sum(length(word)) AS DOUBLE)
                 / CAST(sum(len(toks)) AS BIGINT), 4)
               AS compression
           FROM bpe_toks
           GROUP BY doc_id
           ORDER BY doc_id""")),

    // ---- TOKENIZER FERTILITY report: the q95 merge table applied
    //      corpus-wide, rolled up per (source × lang) — tokens-per-word
    //      (fertility) and chars-per-token, the two numbers a
    //      multilingual run reads before trusting one tokenizer across
    //      sources (a high-fertility cell burns context budget; the
    //      metric every tokenizer paper reports per language). Ratios
    //      are int64 floor-division (basis points / centi-chars) so the
    //      hash gate never touches a float. Shape: exactly q95's
    //      vocabulary fold + word-keyed join, with the rollup key
    //      swapped from doc_id to the (source, lang) grid — one extra
    //      join back to documents for the grid columns, doc_id-keyed. ----
    "q122_tokenizer_fertility" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val words = docs
          .select(col("doc_id"), col("source"), col("lang"),
            explode(split(lower(col("text")), " +")).as("word"))
          .filter(length(col("word")) >= 1)
        words.join(bpeVocabToks(docs), "word")
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("w_chars")).as("n_chars"),
            sum(col("w_toks")).as("n_tokens"))
          .withColumn("fertility_bp",
            expr("n_tokens * 10000L div n_words"))
          .withColumn("chars_per_token_c",
            expr("n_chars * 100L div n_tokens"))
          .orderBy(col("source"), col("lang"))
      },
      Some(s"""WITH $bpeEncodeDuckCtes
           SELECT d.source, d.lang,
             count(*) AS n_words,
             CAST(sum(length(t.word)) AS BIGINT) AS n_chars,
             CAST(sum(len(t.toks)) AS BIGINT) AS n_tokens,
             (CAST(sum(len(t.toks)) AS BIGINT) * 10000) // count(*)
               AS fertility_bp,
             (CAST(sum(length(t.word)) AS BIGINT) * 100)
               // CAST(sum(len(t.toks)) AS BIGINT) AS chars_per_token_c
           FROM bpe_toks t JOIN documents d USING (doc_id)
           GROUP BY d.source, d.lang
           ORDER BY d.source, d.lang""")),

    // ---- train/test split-leakage audit: near-duplicate pairs (q32's
    //      Jaccard ≥ 0.8 definition, via the SAME jaccardPairs code and
    //      shared oracle CTEs) bucketed by which q65 splits their two
    //      docs landed in. A cross-split near-dup pair is evaluation
    //      leakage — the audit real pipelines run after splitting,
    //      because document-level hash splits do NOT prevent near-dup
    //      leakage (only dedup-then-split or cluster-aware splitting
    //      does). Split names are ordered (least/greatest) so each
    //      unordered split pair is one row; `leaky` flags cross-split
    //      rows. Scale: the pair set is the (already capped) q32 join;
    //      the split tags ride two equi-joins on doc_id. ----
    "q92_split_leakage" -> QueryDef(
      (s, dir) => {
        val b = expr("""cast(conv(substring(md5(concat('split:',
                   cast(doc_id as string))), 1, 14), 16, 10) as long) % 10""")
        val splits = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            when(b < 8, "train").when(b === 8, "validation")
              .otherwise("test").as("split"))
        jaccardPairsCached(s, dir, 0.8)
          .join(splits.select(col("doc_id").as("da"), col("split").as("spa")), "da")
          .join(splits.select(col("doc_id").as("db"), col("split").as("spb")), "db")
          .select(least(col("spa"), col("spb")).as("split_a"),
            greatest(col("spa"), col("spb")).as("split_b"))
          .groupBy(col("split_a"), col("split_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("leaky", (col("split_a") =!= col("split_b")).cast("int"))
          .orderBy(col("split_a"), col("split_b"))
      },
      Some(s"""WITH ${jaccardPairsDuckCtes(0.8)},
             sp AS (
               SELECT doc_id,
                 CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'validation'
                      ELSE 'test' END AS split
               FROM (SELECT doc_id,
                 CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 14))
                   AS BIGINT) % 10 AS b
                 FROM documents)),
             g2 AS (
               SELECT least(a.split, b.split) AS split_a,
                 greatest(a.split, b.split) AS split_b
               FROM jp
               JOIN sp a ON jp.da = a.doc_id
               JOIN sp b ON jp.db = b.doc_id)
             SELECT split_a, split_b, count(*) AS n_pairs,
               CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS INT)
                 AS leaky
             FROM g2
             GROUP BY split_a, split_b
             ORDER BY split_a, split_b""")),

    // ---- contamination RUN-LENGTH report: q58 counts how many eval
    //      4-grams a training doc shares; real decontamination policies
    //      (GPT-3 appendix C, Llama's n-gram rules) key on the LONGEST
    //      CONSECUTIVE overlapping span — 20 shared grams scattered as
    //      single words are noise, 20 consecutive ones are a verbatim
    //      benchmark quote. Positional 4-grams (no distinct) join the
    //      broadcast eval set; hit positions collapse to maximal runs by
    //      gaps-and-islands (pos − row_number is constant within a run);
    //      a run of r consecutive hit grams covers r+3 words. Scale:
    //      identical to q58 (map-side broadcast semi-join) plus one
    //      per-doc window over hit positions only — hits, not grams,
    //      shuffle. ----
    "q128_contamination_spans" -> QueryDef(
      (s, dir) => contaminationSpansCached(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH $posGramDuckCtes,
             ev AS (
               SELECT DISTINCT pg.s FROM pg
               JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
             hits AS (
               SELECT pg.doc_id, pg.i FROM pg
               JOIN documents d USING (doc_id)
               JOIN ev USING (s)
               WHERE d.source <> 'src0'),
             runs AS (
               SELECT doc_id,
                 i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
                   AS grp
               FROM hits),
             rl AS (
               SELECT doc_id, grp, count(*) AS run_len
               FROM runs GROUP BY doc_id, grp)
             SELECT doc_id, CAST(sum(run_len) AS BIGINT) AS n_hit_grams,
               max(run_len) AS max_run_grams,
               max(run_len) + 3 AS max_span_words
             FROM rl GROUP BY doc_id
             ORDER BY doc_id""")),

    // ---- split-drift audit: per (split × lang) the doc count and the
    //      lang's share WITHIN its split in basis points, against the
    //      train split's share of the same lang — validation/test are
    //      only trustworthy if they are distributionally exchangeable
    //      with train, and a hash split (q65) guarantees that only in
    //      expectation; this measures the realized drift before anyone
    //      reads a validation metric. Pure int64 (shares by floor
    //      division), two tiny groupBys + one lang-keyed self-join on
    //      the ≤ splits×langs frame. ----
    "q131_split_drift" -> QueryDef(
      (s, dir) => {
        val b = expr("""cast(conv(substring(md5(concat('split:',
                   cast(doc_id as string))), 1, 14), 16, 10) as long) % 10""")
        val cnt = Tables.load(s, dir, "documents")
          .withColumn("split",
            when(b < 8, "train").when(b === 8, "validation").otherwise("test"))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("share_bp", expr(
            "n_docs * 10000 div sum(n_docs) OVER (PARTITION BY split)"))
        val train = cnt.filter(col("split") === "train")
          .select(col("lang"), col("share_bp").as("train_share_bp"))
        cnt.join(train, Seq("lang"), "left_outer")
          .select(col("split"), col("lang"), col("n_docs"), col("share_bp"),
            coalesce(col("train_share_bp"), lit(0L)).as("train_share_bp"),
            abs(col("share_bp") - coalesce(col("train_share_bp"), lit(0L)))
              .as("drift_bp"))
          .orderBy(col("split"), col("lang"))
      },
      Some("""WITH t AS (
               SELECT lang,
                 CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'validation'
                      ELSE 'test' END AS split
               FROM (SELECT lang,
                 CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 14))
                   AS BIGINT) % 10 AS b
                 FROM documents)),
             cnt AS (
               SELECT split, lang, count(*) AS n_docs,
                 count(*) * 10000 // CAST(sum(count(*))
                   OVER (PARTITION BY split) AS BIGINT) AS share_bp
               FROM t GROUP BY split, lang),
             tr AS (
               SELECT lang, share_bp AS train_share_bp FROM cnt
               WHERE split = 'train')
             SELECT c.split, c.lang, c.n_docs, c.share_bp,
               coalesce(tr.train_share_bp, 0) AS train_share_bp,
               abs(c.share_bp - coalesce(tr.train_share_bp, 0)) AS drift_bp
             FROM cnt c LEFT JOIN tr ON c.lang = tr.lang
             ORDER BY c.split, c.lang""")),

    // ---- leaked-benchmark-items report: q58 asks "which TRAINING docs
    //      are contaminated"; the eval-set owner asks the inverse —
    //      WHICH benchmark items leaked, and how widely. Per eval doc:
    //      distinct training docs sharing any 4-gram and distinct
    //      leaked grams. A benchmark item found in hundreds of training
    //      docs is boilerplate (discount it); one found in exactly one
    //      is a verbatim leak (drop the doc, or retire the item). Same
    //      broadcast shape as q58 with the small side keyed per eval
    //      doc. ----
    "q135_leaked_eval_items" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val ev = wordShingles(docs.filter(col("source") === "src0"), 4)
          .select(col("doc_id").as("eval_doc"), col("s"))
        val tr = wordShingles(docs.filter(col("source") =!= "src0"), 4)
        tr.join(broadcast(ev), "s")
          .groupBy(col("eval_doc"))
          .agg(countDistinct(col("doc_id")).as("n_train_docs"),
            countDistinct(col("s")).as("n_leaked_grams"))
          .orderBy(col("eval_doc"))
      },
      Some(s"""WITH $fourGramDuckCtes,
             evd AS (
               SELECT g.doc_id AS eval_doc, g.s FROM g
               JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
             trg AS (
               SELECT g.doc_id, g.s FROM g
               JOIN documents d USING (doc_id) WHERE d.source <> 'src0')
             SELECT eval_doc,
               count(DISTINCT trg.doc_id) AS n_train_docs,
               count(DISTINCT evd.s) AS n_leaked_grams
             FROM evd JOIN trg ON evd.s = trg.s
             GROUP BY eval_doc
             ORDER BY eval_doc""")),

    // ---- SPAN-LEVEL decontamination mask: q128 says "this doc is
    //      contaminated"; at 100 TB the better remedy is often
    //      SURGICAL — mask the leaked spans, keep the document. Per
    //      training doc, the maximal merged intervals of eval-4-gram
    //      hits (a hit at word p covers [p, p+3]; intervals that
    //      overlap or abut — next start ≤ current end + 1 — coalesce),
    //      as 1-based word positions a loss-masking step consumes
    //      directly. Merging is the gaps-and-islands construction on
    //      pure int64 (prev-end running max → island ids → per-island
    //      min/max), so both engines agree bitwise. Scale shape: the
    //      eval gram set is the broadcast side (q58's shape), hit rows
    //      are bounded by matches, and the windows partition by
    //      doc_id — never a global sort until the output. ----
    "q191_decontam_span_mask" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val evalGrams = wordShingles(docs.filter(col("source") === "src0"), 4)
          .select(col("s")).distinct()
        val hits = positionalWordShingles(
            docs.filter(col("source") =!= "src0"), 4)
          .join(broadcast(evalGrams), "s")
          .select(col("doc_id"), (col("i") + 1L).as("p"))  // 1-based
        val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
        val isl = hits
          .withColumn("prev_end", max(col("p") + 3L).over(
            wOrd.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("new_isl", when(
            col("prev_end").isNull || col("p") > col("prev_end") + 1L,
            1L).otherwise(0L))
          .withColumn("island", sum(col("new_isl")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        isl.groupBy(col("doc_id"), col("island"))
          .agg(min(col("p")).as("span_start"), max(col("p")).as("maxp"),
            count(lit(1)).as("n_grams"))
          .select(col("doc_id"), col("span_start"),
            (col("maxp") + 3L).as("span_end"),
            (col("maxp") + 3L - col("span_start") + 1L).as("span_words"),
            col("n_grams"))
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some(s"""WITH $posGramDuckCtes,
             ev AS (
               SELECT DISTINCT pg.s FROM pg
               JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
             hits AS (
               SELECT pg.doc_id, pg.i AS p FROM pg
               JOIN documents d USING (doc_id)
               JOIN ev ON ev.s = pg.s
               WHERE d.source <> 'src0'),
             pe AS (
               SELECT doc_id, p,
                 max(p + 3) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_end
               FROM hits),
             isl AS (
               SELECT doc_id, p,
                 CAST(sum(CASE WHEN prev_end IS NULL OR p > prev_end + 1
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS island
               FROM pe)
             SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
               CAST(max(p) + 3 AS BIGINT) AS span_end,
               CAST(max(p) + 3 - min(p) + 1 AS BIGINT) AS span_words,
               count(*) AS n_grams
             FROM isl GROUP BY doc_id, island
             ORDER BY doc_id, span_start""")),

    // ---- contamination-THRESHOLD sweep: before q117 hard-codes the
    //      [[SpanRunGate]] policy, this measures what each candidate
    //      gate would do — per minimum-run threshold t ∈ 1..16 grams,
    //      how many training docs a "longest verbatim run ≥ t" rule
    //      flags, in docs and basis points of the training corpus. The
    //      q78/q123 retention-curve shape pointed at q128's span
    //      statistic: the cumulative count over the per-doc max-run
    //      histogram, so the sweep costs one ≤16-row window more than
    //      q128 itself. ----
    "q139_contamination_threshold_sweep" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val nTrain = docs.filter(col("source") =!= "src0")
          .agg(count(lit(1)).as("n_train"))
        val capped = contaminationSpansCached(s, dir)
          .select(least(col("max_run_grams"), lit(16L)).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("n_at"))
        val wCum = Window.orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        capped
          .withColumn("n_flagged", sum(col("n_at")).over(wCum))
          .crossJoin(broadcast(nTrain))
          .select(col("t").as("min_run_grams"), col("n_flagged"),
            expr("n_flagged * 10000 div n_train").as("flagged_bp"))
          .orderBy(col("min_run_grams"))
      },
      Some(s"""WITH $posGramDuckCtes,
             ev AS (
               SELECT DISTINCT pg.s FROM pg
               JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
             hits AS (
               SELECT pg.doc_id, pg.i FROM pg
               JOIN documents d USING (doc_id)
               JOIN ev USING (s)
               WHERE d.source <> 'src0'),
             runs AS (
               SELECT doc_id,
                 i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
                   AS grp
               FROM hits),
             perdoc AS (
               SELECT doc_id, least(max(run_len), 16) AS t FROM (
                 SELECT doc_id, grp, count(*) AS run_len
                 FROM runs GROUP BY doc_id, grp)
               GROUP BY doc_id),
             hist AS (
               SELECT t, count(*) AS n_at FROM perdoc GROUP BY t),
             nt AS (
               SELECT count(*) AS n_train FROM documents
               WHERE source <> 'src0')
             SELECT t AS min_run_grams,
               CAST(sum(n_at) OVER (ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_flagged,
               CAST(sum(n_at) OVER (ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) * 10000 // (SELECT n_train FROM nt)
                 AS flagged_bp
             FROM hist
             ORDER BY min_run_grams""")),

    // ---- RANKED RETRIEVAL: integer-surrogate BM25 top-k over the
    //      corpus for a fixed query workload — the IR primitive behind
    //      RAG indexing and retrieval-based dedup that the TF-IDF term
    //      report (q51) does not provide. BM25 with k1=1, b=1/2 is an
    //      exact rational: score = idf · 2·tf / (tf + 1/2 + dl·N/2A);
    //      multiplying through by 2A gives 4A·tf / (2A·tf + A + dl·N)
    //      with A = Σdl — pure int64, so the engine-side work is one
    //      floor division per (query-term, doc) pair and an
    //      order-independent integer sum. idf is add-one-smoothed
    //      whole-bit: 1 + floor(log2(N/df)) = length(bin(N div df))
    //      (the q89 trick) — the +1 keeps ubiquitous terms at weight 1
    //      instead of 0, so on a small-vocabulary corpus the tf and
    //      length normalization still rank, while rare terms still
    //      dominate log-proportionally. Scale shape: ONE token explode
    //      feeds tf/dl/df; the
    //      ≤18-row query-term relation broadcasts onto the tf equi-join;
    //      dl joins doc-keyed; the 1-row (N, A) stats frame rides a
    //      broadcast crossJoin; top-k is a per-query window over the
    //      matched docs only. At 100 TB A and N are per-shard manifest
    //      numbers (q91) — scores stay int64 for A·tf·idf·1000 up to
    //      ~10^18, i.e. shard token masses in the billions. ----
    "q144_bm25_retrieval" -> QueryDef(
      (s, dir) => bm25TopK(Tables.load(s, dir, "documents"), BmQueries),
      Some(s"""WITH $bmDuckChain
             SELECT qid, query, rank, doc_id, score_milli FROM (
               SELECT qid, query, doc_id, score_milli,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
               FROM scored)
             WHERE rank <= $BmTopK
             ORDER BY qid, rank""")),

    // ---- HYBRID retrieval: reciprocal-rank fusion of the two q144-
    //      family kernels (BM25 and saturation-free TF-IDF) from the
    //      SAME scored-candidates pass — the production answer when two
    //      rankers disagree (RRF, Cormack/Clarke/Büttcher 2009). A doc
    //      in either top-20 earns 1e6 div (60 + rank) micro-units per
    //      list; fused top-5 per query, doc_id tie-breaks everywhere.
    //      Integer floor division keeps the fused score on an exact
    //      grid, so the hash gate certifies BOTH rankings and the
    //      fusion arithmetic at once. ----
    "q145_rrf_fusion" -> QueryDef(
      (s, dir) => rrfFuseTopK(Tables.load(s, dir, "documents"), BmQueries),
      Some(s"""WITH $bmDuckChain,
             ranked AS (
               SELECT qid, query, doc_id, score_milli, lex_milli,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY score_milli DESC, doc_id) AS BIGINT) AS r_bm25,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY lex_milli DESC, doc_id) AS BIGINT) AS r_lex
               FROM scored),
             fused AS (
               SELECT qid, query, doc_id, r_bm25, r_lex,
                 CAST(CASE WHEN r_bm25 <= $FuseDepth
                        THEN 1000000 // ($RrfK + r_bm25) ELSE 0 END
                    + CASE WHEN r_lex <= $FuseDepth
                        THEN 1000000 // ($RrfK + r_lex) ELSE 0 END
                   AS BIGINT) AS rrf_micro
               FROM ranked)
             SELECT qid, query, rank, doc_id, rrf_micro, r_bm25, r_lex
             FROM (
               SELECT qid, query, doc_id, rrf_micro, r_bm25, r_lex,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
               FROM fused WHERE rrf_micro > 0)
             WHERE rank <= $BmTopK
             ORDER BY qid, rank""")),
  )

  /** The shared q144/q145 oracle CTE chain — one token explode feeding
    * tf/dl/corpus stats, the fixed query-term relation, per-term df, and
    * a `scored` CTE carrying BOTH kernels ([[bmScoredCandidates]]'s
    * exact integer arithmetic: `score_milli` = BM25, `lex_milli` =
    * saturation-free TF-IDF). */
  private def bmDuckChain: String = {
    val valuesList = BmQueries.flatMap { case (qid, q) =>
      q.split(" ").distinct.map(t => s"($qid, '$q', '$t')")
    }.mkString(", ")
    s"""toks AS (
           SELECT doc_id,
             unnest(string_split_regex(lower(text), ' +')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf
                FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(dl) AS BIGINT) AS a_total FROM dl),
         qt AS (SELECT * FROM (VALUES $valuesList)
                AS v(qid, query, term)),
         dfx AS (
           SELECT t.term, count(DISTINCT t.doc_id) AS df
           FROM tf t
           JOIN (SELECT DISTINCT term FROM qt) q ON q.term = t.term
           GROUP BY t.term),
         contrib AS (
           SELECT q.qid, q.query, t.doc_id,
             (1000 * length(bin(st.n_docs // d.df))
                * 4 * st.a_total * t.tf)
               // (2 * st.a_total * t.tf + st.a_total
                  + l.dl * st.n_docs) AS sc,
             (1000 * length(bin(st.n_docs // d.df))
                * t.tf * st.a_total)
               // (l.dl * st.n_docs) AS lx
           FROM qt q
           JOIN dfx d ON d.term = q.term
           JOIN tf t ON t.term = q.term
           JOIN dl l ON l.doc_id = t.doc_id
           CROSS JOIN st),
         scored AS (
           SELECT qid, query, doc_id,
             CAST(sum(sc) AS BIGINT) AS score_milli,
             CAST(sum(lx) AS BIGINT) AS lex_milli
           FROM contrib GROUP BY 1, 2, 3)"""
  }
}
