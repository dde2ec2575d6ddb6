package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Content-scrubbing and filter-calibration operators for a training-data
  * pipeline: PII-style regex redaction (emails / digit runs / a term
  * blocklist) with exact per-source hit accounting, and a quality-filter
  * threshold sweep — the retention curve a curation run consults before
  * choosing a cutoff.
  *
  * Scale shape: redaction is a pure per-row projection (regexp codegen'd,
  * no shuffle until the final per-source rollup on a 20-value key); the
  * sweep aggregates the corpus once into a ≤11-bucket histogram and runs
  * its cumulative window on that histogram, never on the raw rows — the
  * unpartitioned window is over the bucket count, not the corpus.
  *
  * Parity: hit counts are `regexp_extract_all` lengths (exact ints) in
  * both engines; redacted-text agreement is checked via
  * `count(DISTINCT md5(redacted))` + total redacted length, exact int64;
  * the only float math is one rounded IEEE division per output row.
  * DuckDB's `regexp_replace` needs the `'g'` flag to match Spark's
  * replace-all default.
  */
object Scrub {

  /** PII patterns: email and digit-run are the real-world shapes (the
    * synthetic corpus contains neither — they exercise the plumbing and
    * must report exact zeros); the term blocklist stands in for a
    * sensitive-term list and does real work here. All three are
    * RE2-and-Java-regex-compatible (no backrefs, no lookaround). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val DigitRe = "\\d+"
  val TermRe = "\\b(customer|spark)\\b"

  /** q80: documents kept per source — the per-source contribution cap. */
  val QuotaPerSource = 10

  /** q107: documents kept per source by the weighted priority rule. */
  val WeightedSampleK = 10

  /** q129's categorized deny list — corpus words standing in for a real
    * policy list; the operator treats it as data (broadcast join), so a
    * production list swaps in without code changes. */
  val Blocklist: Seq[(String, String)] = Seq(
    "slow" -> "latency", "big" -> "latency", "spill" -> "latency",
    "scan" -> "scanheavy", "sort" -> "scanheavy")

  /** Per-category hits at or above this count flag the document. Tuned
    * so the flag marks a small minority of the synthetic corpus (~3 % at
    * sf0.01) — a deny list that eats double-digit percentages of a
    * corpus is a broken list, and a degenerate all-flagged column would
    * weaken the q117 ledger's keep conjunction. */
  val BlocklistThreshold = 10

  private def BlocklistDuckValues: String =
    Blocklist.map { case (t, c) => s"('$t', '$c')" }.mkString(", ")

  /** DuckDB CTEs `bl` + `blocked` (distinct flagged doc_id at
    * [[BlocklistThreshold]]) — the shared oracle mirror of
    * [[blocklistDocVerdicts]]'s verdict, spliced by q117 and q134. */
  private[ops] def blockedDuckCtes: String =
    s"""bl(term, category) AS (VALUES $BlocklistDuckValues),
             blocked AS (
               SELECT DISTINCT doc_id FROM (
                 SELECT t.doc_id, blc.category, count(*) AS n
                 FROM (SELECT doc_id,
                         unnest(string_split_regex(lower(text), ' +')) AS term
                       FROM documents) t
                 JOIN bl blc USING (term)
                 GROUP BY t.doc_id, blc.category)
               WHERE n >= $BlocklistThreshold)"""

  /** q107's operator over a (doc_id, source, text) frame — deterministic
    * QUALITY-WEIGHTED sampling, the biased upgrade of q80's uniform
    * quota: weight w = 1 + floor(10·quality) (the shared [[Quality]]
    * score), priority = h div w over the 56-bit md5 grid, keep the k
    * smallest priorities per source. This is an integer surrogate of the
    * Efraimidis-Spirakis reservoir key u^(1/w) (the float pow is outside
    * the cross-engine-exact function set): dividing the uniform hash by
    * w preserves the monotone weight→priority bias — a weight-6 doc's
    * priority distribution sits 6× lower than a weight-1 doc's — and
    * keeps every property the q53/q65/q80 family guarantees
    * (reproducible across engines, cluster layouts and re-runs; adding
    * docs never evicts a doc whose priority still clears the cut).
    * Scale shape: one per-row projection, then ONE window shuffle keyed
    * on source; per-source groups stream through their sort. */
  def weightedSample(docs: DataFrame,
      k: Int = WeightedSampleK): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
    weightedPriorities(docs)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("source"), col("doc_id"), col("weight"),
        col("priority"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** The per-row half of [[weightedSample]] — (source, doc_id, weight,
    * priority), a pure projection with no shuffle. Factored out so the
    * streaming reservoir ([[graft.streaming.EventStreams
    * .streamingWeightedReservoir]]) computes bit-identical priorities
    * and only maintains the top-k under state. */
  def weightedPriorities(docs: DataFrame): DataFrame = docs
    .select(col("source"), col("doc_id"),
      (lit(1L) + floor(Quality.score(col("text")) * 10).cast("long"))
        .as("weight"))
    .withColumn("priority", expr(
      """cast(conv(substring(md5(concat('wsamp:',
           cast(doc_id as string))), 1, 14), 16, 10) as long)
         div weight"""))

  /** Chained redaction; replacement tokens are uppercase and digit-free
    * so later patterns in the chain cannot re-match earlier output. */
  def redact(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        DigitRe, "<NUM>"),
      TermRe, "<TERM>")

  /** q148's marker table: (column-name suffix, lowercase substring the
    * detector matches). The copyright class plants BOTH the copyright
    * line and the rights claim, so multi-marker documents exist by
    * construction. (Declared before `defs` — the oracle string is built
    * eagerly.) */
  val LicenseMarkers: Seq[(String, String)] = Seq(
    "copyright" -> "copyright (c)",
    "rights_reserved" -> "all rights reserved",
    "apache" -> "licensed under the apache license",
    "creative_commons" -> "creative commons")

  /** The planted license header per document (q114 fixture discipline —
    * both engines synthesize the identical text): every 7th doc gets a
    * notice, class cycling through copyright / Apache / CC-BY. */
  private val licenseHeaders = Seq(
    "copyright (c) 2024 acme corp. all rights reserved.",
    "licensed under the apache license, version 2.0.",
    "this work is licensed under a creative commons attribution 4.0 license.")

  private[ops] val licenseSynthSpark: String =
    s"""CASE WHEN doc_id % 7 = 0 THEN concat(
          CASE ${licenseHeaders.zipWithIndex.map { case (h, i) =>
            s"WHEN doc_id % 3 = $i THEN '$h'" }.mkString(" ")} END,
          ' ', text)
        ELSE text END"""

  private val licenseSynthDuck: String =
    s"""CASE WHEN doc_id % 7 = 0 THEN
          CASE ${licenseHeaders.zipWithIndex.map { case (h, i) =>
            s"WHEN doc_id % 3 = $i THEN '$h'" }.mkString(" ")} END
          || ' ' || text
        ELSE text END"""

  // ---- q156 code-vs-prose constants (declared before `defs`) ----

  /** Symbol class and keyword alternation the q156 detector counts.
    * Both patterns stay inside the Java∩RE2 common syntax and are passed
    * as raw strings on the Spark side (lit()), literally in the oracle —
    * no escaping dialect can diverge (the q119 rule). */
  val CodeSymbolRe = "[{}();=\\[\\]:]"
  val CodeKeywordRe = "\\b(def|return|import|int|void|function|var)\\b"

  /** A document is code when symbols reach this density per 1000 chars… */
  val CodeSymPerKchar = 15L
  /** …or it carries at least this many language keywords. */
  val CodeMinKeywords = 2L

  /** Planted code bodies (doc_id % 9 == 2, class = doc_id % 3): python
    * (keywords, no braces), C (braces+semicolons), JSON (symbols, no
    * keywords) — each repeated so the synthetic doc IS code, not prose
    * with a code tail. Quote- and apostrophe-free for SQL literals. */
  private val codeBodies = Seq(
    "def compute(x): return x + 1 import os def main(): return compute(2)",
    "int main() { int x = 0; x = x + 1; print(x); return x; }",
    "{ key: [1, 2, 3], flag: [4, 5], nested: { a: 1, b: 2 } }")

  private[ops] val codeSynthSpark: String =
    s"""CASE WHEN doc_id % 9 = 2 THEN
          CASE ${codeBodies.zipWithIndex.map { case (b, i) =>
            s"WHEN doc_id % 3 = $i THEN repeat('$b ', 4)" }.mkString(" ")} END
        ELSE text END"""

  private val codeSynthDuck: String =
    s"""CASE WHEN doc_id % 9 = 2 THEN
          CASE ${codeBodies.zipWithIndex.map { case (b, i) =>
            s"WHEN doc_id % 3 = $i THEN repeat('$b ', 4)" }.mkString(" ")} END
        ELSE text END"""

  /** q226's k grid — the disclosure-risk thresholds a release review
    * actually quotes (k≥2 "not unique", k≥5/10/20 common publication
    * bars). ONE constant feeds the Spark conditional aggregate and the
    * generated oracle SQL (the q195/q223 discipline: grid drift between
    * engines impossible by construction). Declared before `defs`, whose
    * oracle string interpolates it eagerly at object init. */
  val KAnonymityGrid: Seq[Long] = Seq(2L, 5L, 10L, 20L)

  /** q226's account-balance generalization width: balances are binned
    * to 2000-wide buckets before joining the quasi-identifier tuple —
    * k-anonymity is always measured on GENERALIZED attributes (raw
    * doubles would make every record its own class). The +1000 offset
    * keeps the dividend non-negative over the TPC-H acctbal domain
    * [-999.99, 9999.99] (the DESIGN.md non-negative-division rule), and
    * floor() precedes the BIGINT cast because Spark truncates
    * double→long while DuckDB ROUNDS — floor is the cross-engine-exact
    * spelling. */
  val KAnonBalBucket = 2000L

  /** q226: k-anonymity audit over the customer microdata. The
    * quasi-identifier tuple is (nation, market segment, generalized
    * balance bucket) — attributes an adversary could plausibly know
    * from the outside; rows sharing a tuple form an equivalence class,
    * and a class smaller than k re-identifies its members at 1/size.
    * For each k in [[KAnonymityGrid]]: how many classes are below k,
    * how many ROWS sit in those classes, and their share in basis
    * points — the release-gate readout (q77 scrubs PII PATTERNS; this
    * measures STRUCTURAL re-identification risk, which survives
    * pattern scrubbing untouched).
    *
    * Scale shape: ONE map-side-combinable groupBy on the QI tuple
    * (cardinality = |nations|·|segments|·|buckets|, corpus-independent)
    * then ONE one-row conditional aggregate carrying the whole k grid
    * (the q223 shape — no per-k rescan), stack-unpivoted to |grid|
    * rows. No window, no join; at any corpus size the shuffle is the
    * class histogram. Pure int64 arithmetic; risk share is
    * `rows·10⁴ div n_rows` on non-negative operands. */
  def kAnonymityAudit(customers: DataFrame): DataFrame = {
    val grid = KAnonymityGrid
    val classes = customers.groupBy(
        col("c_nationkey"), col("c_mktsegment"),
        expr(s"(cast(floor(c_acctbal) as bigint) + 1000) div $KAnonBalBucket")
          .as("bal_bucket"))
      .agg(count(lit(1)).as("class_size"))
    val gridAggs = Seq(
      sum(col("class_size")).as("n_rows"),
      min(col("class_size")).as("min_class")) ++
      grid.flatMap { k => Seq(
        sum(when(col("class_size") < k, 1L).otherwise(0L)).as(s"c_$k"),
        sum(when(col("class_size") < k, col("class_size"))
          .otherwise(0L)).as(s"r_$k"))
      }
    val one = classes.agg(count(lit(1)).as("n_classes"), gridAggs: _*)
    one.select(
        expr(s"stack(${grid.size}, ${grid.map(k => s"${k}L, c_$k, r_$k")
          .mkString(", ")}) as (k, small_classes, at_risk_rows)"),
        col("n_classes"), col("n_rows"), col("min_class"))
      .select(col("k"), col("n_classes"), col("small_classes"),
        col("at_risk_rows"),
        expr("at_risk_rows * 10000L div n_rows").as("at_risk_bp"),
        col("min_class").as("min_class_size"))
      .orderBy(col("k"))
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- k-anonymity release audit (see [[kAnonymityAudit]]): the
    //      privacy-risk modality q77's pattern scrub cannot see —
    //      structural re-identification via quasi-identifier classes. ----
    "q226_k_anonymity" -> QueryDef(
      (s, dir) => kAnonymityAudit(Tables.load(s, dir, "customer")),
      Some(s"""WITH classes AS (
               SELECT c_nationkey, c_mktsegment,
                 (CAST(floor(c_acctbal) AS BIGINT) + 1000) // $KAnonBalBucket
                   AS bal_bucket,
                 CAST(count(*) AS BIGINT) AS class_size
               FROM customer GROUP BY 1, 2, 3),
             agg AS (
               SELECT CAST(count(*) AS BIGINT) AS n_classes,
                 CAST(sum(class_size) AS BIGINT) AS n_rows,
                 CAST(min(class_size) AS BIGINT) AS min_class,
                 ${KAnonymityGrid.map(k =>
                   s"""CAST(sum(CASE WHEN class_size < $k THEN 1 ELSE 0 END) AS BIGINT) AS c_$k,
                 CAST(sum(CASE WHEN class_size < $k THEN class_size ELSE 0 END) AS BIGINT) AS r_$k""")
                   .mkString(",\n                 ")}
               FROM classes)
             ${KAnonymityGrid.map(k =>
               s"""SELECT CAST($k AS BIGINT) AS k, n_classes,
                 c_$k AS small_classes, r_$k AS at_risk_rows,
                 r_$k * 10000 // n_rows AS at_risk_bp,
                 min_class AS min_class_size FROM agg""")
               .mkString("\n             UNION ALL\n             ")}
             ORDER BY k""")),

    // ---- PII-style scrub report: per source, how many documents and
    //      occurrences each pattern hit, plus two exact checksums of the
    //      redacted text itself (distinct-hash count and total length)
    //      so the oracle verifies the REDACTION, not just the counts. ----
    "q77_pii_scrub" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("source"),
            size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
              .as("h_email"),
            size(regexp_extract_all(col("text"), lit(DigitRe), lit(0)))
              .as("h_num"),
            size(regexp_extract_all(col("text"), lit(TermRe), lit(0)))
              .as("h_term"),
            redact(col("text")).as("redacted"))
        d.groupBy(col("source")).agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("h_email") + col("h_num") + col("h_term") > 0, 1L)
              .otherwise(0L)).as("docs_hit"),
            sum(col("h_email").cast("long")).as("hits_email"),
            sum(col("h_num").cast("long")).as("hits_num"),
            sum(col("h_term").cast("long")).as("hits_term"),
            countDistinct(md5(col("redacted"))).as("n_distinct_redacted"),
            sum(length(col("redacted")).cast("long")).as("chars_redacted"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
               SELECT source,
                 len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS h_email,
                 len(regexp_extract_all(text, '\d+')) AS h_num,
                 len(regexp_extract_all(text, '\b(customer|spark)\b')) AS h_term,
                 regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\d+', '<NUM>', 'g'),
                   '\b(customer|spark)\b', '<TERM>', 'g') AS redacted
               FROM documents)
             SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN h_email + h_num + h_term > 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
               CAST(sum(h_email) AS BIGINT) AS hits_email,
               CAST(sum(h_num) AS BIGINT) AS hits_num,
               CAST(sum(h_term) AS BIGINT) AS hits_term,
               count(DISTINCT md5(redacted)) AS n_distinct_redacted,
               CAST(sum(length(redacted)) AS BIGINT) AS chars_redacted
             FROM d GROUP BY source ORDER BY source""")),

    // ---- quality-filter threshold sweep: the q38 quality score binned
    //      into tenths, then a descending cumulative histogram — row
    //      `min_bucket = b` reads "docs/tokens retained if the cutoff
    //      were b/10". The bucket boundary is floor(score*10) on the
    //      ALREADY-ROUNDED score: identical double in, identical scalar
    //      ops, identical bucket out in both engines (the parity hazard
    //      is float aggregation ORDER, never deterministic per-row
    //      scalar math — DESIGN.md). ----
    "q78_filter_sweep" -> QueryDef(
      (s, dir) => {
        val t = col("text")
        val scored = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            Quality.nWords(t).as("n_words"),
            Quality.nStop(t).as("n_stop"))
          .withColumn("quality_score",
            round(Quality.scoreFrom(col("n_words"), col("n_stop")), 4))
          .withColumn("bucket", floor(col("quality_score") * 10).cast("int"))
        val hist = scored.groupBy(col("bucket")).agg(
          count(lit(1)).as("docs_in_bucket"),
          sum(col("n_words").cast("long")).as("tokens_in_bucket"))
        // cumulative windows run on the ≤11-row histogram, not the corpus
        val wCum = Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wTot = Window.partitionBy()
        hist
          .withColumn("docs_retained", sum(col("docs_in_bucket")).over(wCum))
          .withColumn("tokens_retained", sum(col("tokens_in_bucket")).over(wCum))
          .withColumn("total_docs", sum(col("docs_in_bucket")).over(wTot))
          .select(col("bucket").as("min_bucket"),
            col("docs_retained"), col("tokens_retained"),
            round(col("docs_retained") * lit(1.0) / col("total_docs"), 4)
              .as("pct_docs"))
          .orderBy(col("min_bucket"))
      },
      Some(s"""WITH perdoc AS (
               SELECT doc_id,
                 ${Quality.duckNWords("text")} AS n_words,
                 ${Quality.duckNStop("text")} AS n_stop
               FROM documents),
             scored AS (
               SELECT *,
                 round(${Quality.duckScoreFrom("n_words", "n_stop")}, 4)
                   AS quality_score
               FROM perdoc),
             hist AS (
               SELECT CAST(floor(quality_score * 10) AS INT) AS bucket,
                 count(*) AS docs_in_bucket,
                 CAST(sum(n_words) AS BIGINT) AS tokens_in_bucket
               FROM scored GROUP BY 1)
             SELECT bucket AS min_bucket,
               CAST(sum(docs_in_bucket) OVER w AS BIGINT) AS docs_retained,
               CAST(sum(tokens_in_bucket) OVER w AS BIGINT) AS tokens_retained,
               round(CAST(sum(docs_in_bucket) OVER w AS BIGINT) * 1.0
                 / CAST(sum(docs_in_bucket) OVER () AS BIGINT), 4) AS pct_docs
             FROM hist
             WINDOW w AS (ORDER BY bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             ORDER BY min_bucket""")),

    // ---- per-source quota sampling: cap every source's contribution at
    //      a fixed document budget, chosen deterministically by a salted
    //      hash rank (not rand() — adding new docs never reshuffles which
    //      of the old ones were picked below the last rank, and both
    //      engines pick the identical set). One window shuffle keyed on
    //      `source`; per-source groups stream through their sort, so a
    //      billion-doc source never materializes in one task's memory. ----
    "q80_source_quota_sample" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(concat(lit("quota:"), col("doc_id").cast("string"))),
            col("doc_id"))
        Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= QuotaPerSource)
          .orderBy(col("source"), col("rk"))
      },
      Some(s"""SELECT source, doc_id, rk FROM (
               SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                   ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id)
                   AS rk
               FROM documents)
             WHERE rk <= $QuotaPerSource
             ORDER BY source, rk""")),

    // ---- deterministic quality-weighted sampling ([[weightedSample]]):
    //      the priority rule, weight derivation and scale shape live on
    //      the helper's Scaladoc; the oracle recomputes the identical
    //      weight, hash, floor division and window. ----
    "q107_weighted_sample" -> QueryDef(
      (s, dir) => weightedSample(Tables.load(s, dir, "documents")),
      Some(s"""WITH d AS (
               SELECT source, doc_id,
                 1 + CAST(floor((${Quality.duckScore("text")}) * 10)
                   AS BIGINT) AS weight,
                 CAST(('0x' || substr(md5('wsamp:' ||
                   CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) AS h
               FROM documents)
             SELECT source, doc_id, weight, priority, rk FROM (
               SELECT source, doc_id, weight, h // weight AS priority,
                 row_number() OVER (PARTITION BY source
                   ORDER BY h // weight, doc_id) AS rk
               FROM d)
             WHERE rk <= $WeightedSampleK
             ORDER BY source, rk""")),

    // ---- Gopher-style rule-based quality filter report: the named
    //      boolean heuristics a Gopher/C4-class curation run applies
    //      BEFORE any learned scoring, with per-rule pass/fail counts and
    //      the conjunction ('all_rules' = docs surviving the whole
    //      filter). One projection computes every per-doc flag (all
    //      codegen'd string/array ops, no shuffle), one aggregate
    //      collapses the corpus to a single row of int64 counts, and
    //      stack() unpivots that ROW — the unpivot runs on 1 row, never
    //      the corpus. Thresholds are tuned to this corpus's synthetic
    //      stats (words 10-99, mean word length 3.7-5.3) so every rule
    //      does real discriminating work rather than vacuously passing;
    //      the rule SET is the operator, the constants are config.
    //      Parity: each flag compares exact ints or one IEEE division of
    //      exact ints — deterministic per-row scalar math, then int64
    //      sums (DESIGN.md). ----
    "q86_gopher_rules" -> QueryDef(
      (s, dir) => {
        val t = col("text")
        // DSL columns, not selectExpr: the stopword regex rides a lit()
        // so no SQL-literal escape layer ever touches its backslashes
        val perdoc = Tables.load(s, dir, "documents").select(
          Quality.nWords(t).as("nw"),
          Quality.nStop(t).as("ns"),
          length(regexp_replace(t, " +", "")).as("nchars"),
          size(array_distinct(split(lower(t), " +"))).as("nd"),
          expr("array_max(transform(split(text, ' +'), w -> length(w)))")
            .as("maxw"))
        val mwl = col("nchars") * lit(1.0) / col("nw")
        val flags = perdoc.select(
          (col("nw") >= 20 && col("nw") <= 90).cast("long").as("p_wc"),
          (mwl >= 4.0 && mwl <= 5.0).cast("long").as("p_mwl"),
          (col("ns") >= 2).cast("long").as("p_stop"),
          (col("nd") * lit(1.0) / col("nw") >= 0.4).cast("long").as("p_dr"),
          (col("maxw") <= 7).cast("long").as("p_maxw"))
          .withColumn("p_all",
            col("p_wc") * col("p_mwl") * col("p_stop") * col("p_dr") * col("p_maxw"))
        flags.agg(
            count(lit(1)).as("n"),
            sum(col("p_wc")).as("s_wc"), sum(col("p_mwl")).as("s_mwl"),
            sum(col("p_stop")).as("s_stop"), sum(col("p_dr")).as("s_dr"),
            sum(col("p_maxw")).as("s_maxw"), sum(col("p_all")).as("s_all"))
          .selectExpr("""stack(6,
              'all_rules',      s_all,  n - s_all,
              'distinct_ratio', s_dr,   n - s_dr,
              'max_word_len',   s_maxw, n - s_maxw,
              'mean_word_len',  s_mwl,  n - s_mwl,
              'stopword_count', s_stop, n - s_stop,
              'word_count',     s_wc,   n - s_wc) AS (rule, n_pass, n_fail)""")
          .withColumn("pass_rate",
            round(col("n_pass") * lit(1.0) / (col("n_pass") + col("n_fail")), 4))
          .orderBy(col("rule"))
      },
      Some(s"""WITH perdoc AS (
               SELECT len(string_split_regex(lower(text), ' +')) AS nw,
                 ${Quality.duckNStop("text")} AS ns,
                 length(regexp_replace(text, ' +', '', 'g')) AS nchars,
                 len(list_distinct(string_split_regex(lower(text), ' +'))) AS nd,
                 list_max(list_transform(string_split_regex(text, ' +'),
                   w -> length(w))) AS maxw
               FROM documents),
             flags AS (
               SELECT
                 CASE WHEN nw BETWEEN 20 AND 90 THEN 1 ELSE 0 END AS p_wc,
                 CASE WHEN nchars * 1.0 / nw >= 4.0
                       AND nchars * 1.0 / nw <= 5.0 THEN 1 ELSE 0 END AS p_mwl,
                 CASE WHEN ns >= 2 THEN 1 ELSE 0 END AS p_stop,
                 CASE WHEN nd * 1.0 / nw >= 0.4 THEN 1 ELSE 0 END AS p_dr,
                 CASE WHEN maxw <= 7 THEN 1 ELSE 0 END AS p_maxw
               FROM perdoc),
             agg AS (
               SELECT count(*) AS n,
                 CAST(sum(p_wc) AS BIGINT) AS s_wc,
                 CAST(sum(p_mwl) AS BIGINT) AS s_mwl,
                 CAST(sum(p_stop) AS BIGINT) AS s_stop,
                 CAST(sum(p_dr) AS BIGINT) AS s_dr,
                 CAST(sum(p_maxw) AS BIGINT) AS s_maxw,
                 CAST(sum(p_wc * p_mwl * p_stop * p_dr * p_maxw) AS BIGINT)
                   AS s_all
               FROM flags),
             rows AS (
               SELECT 'all_rules' AS rule, s_all AS n_pass, n - s_all AS n_fail FROM agg
               UNION ALL
               SELECT 'distinct_ratio', s_dr, n - s_dr FROM agg
               UNION ALL
               SELECT 'max_word_len', s_maxw, n - s_maxw FROM agg
               UNION ALL
               SELECT 'mean_word_len', s_mwl, n - s_mwl FROM agg
               UNION ALL
               SELECT 'stopword_count', s_stop, n - s_stop FROM agg
               UNION ALL
               SELECT 'word_count', s_wc, n - s_wc FROM agg)
             SELECT rule, n_pass, n_fail,
               round(n_pass * 1.0 / (n_pass + n_fail), 4) AS pass_rate
             FROM rows ORDER BY rule""")),

    // ---- per-document curation ledger: the materialized decision table
    //      a real curation run ships alongside the corpus — for every
    //      document, each independent verdict (quality score, exact-dup,
    //      semantic near-dup, benchmark contamination) and the final
    //      keep/drop conjunction, each verdict THE canonical definition
    //      reused from its owning operator (Quality.score = q38,
    //      md5-window keeper = q31, Clustering.semanticDedup = q85,
    //      4-gram overlap vs src0 = q58 — the oracle reuses the same
    //      shared CTE text, so no definition exists twice). vec_id
    //      indexes the same corpus as doc_id (one embedding per document
    //      in TESTDATA). Scale shape: the dup window shuffles the 32-byte
    //      md5 key; the semantic-drop and contamination sides produce
    //      bounded doc-id lists joined back by equi-key (planner/AQE
    //      picks broadcast when they are small — their size is
    //      data-dependent, so no hard-coded hint); everything else is
    //      per-row projection. ----
    "q90_curation_ledger" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val wDup = Window.partitionBy(col("h")).orderBy(col("doc_id"))
        val base = docs
          .withColumn("h", md5(col("text")))
          .withColumn("quality_score", round(Quality.score(col("text")), 4))
          .withColumn("dup_rank", row_number().over(wDup))
          .select(col("doc_id"), col("source"), col("quality_score"),
            when(col("dup_rank") > 1, 1).otherwise(0).as("is_exact_dup"))
        val semDropped = Clustering.semanticDedupCached(s, dir)
          .select(col("dropped_id").as("doc_id"), lit(1).as("sem_hit"))
        // the cached q58 verdict IS the contaminated doc-id set (one
        // row per contaminated training doc by construction)
        val contaminated = TextOps.decontamCountsCached(s, dir)
          .select(col("doc_id")).withColumn("cont_hit", lit(1))
        base
          .join(semDropped, Seq("doc_id"), "left")
          .join(contaminated, Seq("doc_id"), "left")
          .withColumn("is_sem_dropped", coalesce(col("sem_hit"), lit(0)))
          .withColumn("is_contaminated", coalesce(col("cont_hit"), lit(0)))
          .withColumn("keep",
            when(col("is_exact_dup") === 0 && col("is_sem_dropped") === 0 &&
              col("is_contaminated") === 0 && col("quality_score") >= 0.5, 1)
              .otherwise(0))
          .select(col("doc_id"), col("source"), col("quality_score"),
            col("is_exact_dup"), col("is_sem_dropped"),
            col("is_contaminated"), col("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${Clustering.semanticDedupDuckCtes()},
             sem AS (SELECT DISTINCT vb AS doc_id FROM hits),
             ${TextOps.fourGramDuckCtes},
             ev AS (
               SELECT DISTINCT g.s FROM g
               JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
             cont AS (
               SELECT DISTINCT g.doc_id FROM g
               JOIN documents d USING (doc_id)
               JOIN ev USING (s)
               WHERE d.source <> 'src0'),
             base AS (
               SELECT doc_id, source,
                 round(${Quality.duckScore("text")}, 4) AS quality_score,
                 CASE WHEN row_number() OVER (PARTITION BY md5(text)
                     ORDER BY doc_id) > 1 THEN 1 ELSE 0 END AS is_exact_dup
               FROM documents)
             SELECT b.doc_id, b.source, b.quality_score, b.is_exact_dup,
               CASE WHEN sem.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_sem_dropped,
               CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_contaminated,
               CASE WHEN b.is_exact_dup = 0 AND sem.doc_id IS NULL
                     AND cont.doc_id IS NULL AND b.quality_score >= 0.5
                 THEN 1 ELSE 0 END AS keep
             FROM base b
             LEFT JOIN sem ON b.doc_id = sem.doc_id
             LEFT JOIN cont ON b.doc_id = cont.doc_id
             ORDER BY b.doc_id""")),

    // ---- FULL curation ledger (VERDICT r8 item 5): q90 extended with
    //      the round-8 verdict columns — image near-dup (q104's pHash
    //      pipeline, REAL PNG decode path), semantic benchmark
    //      decontamination (q110), CDC chunk-level duplication
    //      (q111, flagged when shared chunks carry ≥ half the doc's
    //      tokens), span contamination (q128, a ≥ SpanRunGate-gram
    //      verbatim run against the eval set), the categorized
    //      blocklist (q129), the rare-token-run secret risk (q181 —
    //      round-13 fold), and the winnowing train→eval leak (q182,
    //      same fold). Every verdict reuses its owning operator's canonical
    //      definition on BOTH sides: the Spark plan calls the operator's
    //      own function ([[graft.ops.Multimodal.phashPairs]],
    //      [[graft.ops.Similarity.semanticDecontam]],
    //      [[graft.ops.TextOps.cdcChunks]]) and the oracle splices the
    //      operator's own factored CTE chain (`im_`/`sdc_`/`cdc_`
    //      prefixes keep the merged WITH block collision-free), so no
    //      definition exists twice. The image-dup flag marks the
    //      NON-KEEPER (higher doc_id) side of every verified pair —
    //      q81's canonical-keeper rule applied to image identity.
    //      Scale shape: each verdict branch produces a bounded
    //      doc-id list equi-joined back on doc_id (AQE broadcasts the
    //      small sides); the expensive branch — the per-image PNG
    //      decode, inherently per-row work — is served from the
    //      fingerprint-keyed parquet cache shared with q104/q140
    //      ([[graft.ops.Multimodal.thumbFeaturesCached]]), so the
    //      session decodes each corpus ONCE however many consumers run;
    //      everything else is per-row projection plus hash-keyed
    //      groupBys. The export a real run ships is exactly this frame
    //      written partitioned by source. ----
    "q117_curation_ledger_full" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val wDup = Window.partitionBy(col("h")).orderBy(col("doc_id"))
        val base = docs
          .withColumn("h", md5(col("text")))
          .withColumn("quality_score", round(Quality.score(col("text")), 4))
          .withColumn("dup_rank", row_number().over(wDup))
          .select(col("doc_id"), col("source"), col("quality_score"),
            when(col("dup_rank") > 1, 1).otherwise(0).as("is_exact_dup"))
        val semDropped = Clustering.semanticDedupCached(s, dir)
          .select(col("dropped_id").as("doc_id"))
        val contaminated = TextOps.decontamCountsCached(s, dir)
          .select(col("doc_id"))
        // the whole image pair list is shared with q104/q140 through
        // the fingerprint-keyed parquet cache — the ledger re-runs
        // neither the codec pass nor the banded signature join
        val imgDup = Multimodal.phashPairsCached(s, dir)
          .select(col("db").as("doc_id")).distinct()
        val decontam = Similarity.semanticDecontamCached(s, dir)
          .select(col("vec_id").as("doc_id"))
        // the cached per-doc CDC rollup (shared with q111) carries
        // tot_tokens, so the >= half-the-doc gate is a filter on it
        val chunkDup = TextOps.cdcDocRollupCached(s, dir)
          .filter(col("dup_tokens") * 2 >= col("tot_tokens"))
          .select(col("doc_id"))
        val spanContam = TextOps.contaminationSpansCached(s, dir)
          .filter(col("max_run_grams") >= TextOps.SpanRunGate)
          .select(col("doc_id"))
        val blocked = blocklistDocVerdicts(docs)
          .filter(col("latency_hits") >= BlocklistThreshold or
            col("scanheavy_hits") >= BlocklistThreshold)
          .select(col("doc_id"))
        // both verdicts serve from the fingerprint-keyed caches shared
        // with their standalone queries (q181/q182) — the ledger's two
        // most expensive branches (1.01 + 0.79 s of its 3.6 s) no
        // longer re-run the token/fingerprint pipelines per consumer
        val secretRisk = TextOps.rareTokenRunsCached(s, dir)
          .filter(col("n_runs") > 0)
          .select(col("doc_id"))
        val winnowLeak = TextOps.winnowDecontamCached(s, dir)
          .select(col("doc_id"))
        // ONE flag frame instead of nine per-verdict left joins: each
        // branch emits (doc_id, verdict-kind), the union aggregates to
        // one row per flagged doc, and the spine pays a single join —
        // the nine separate joins each built their own broadcast
        // exchange (guide §2.4). Each branch emits distinct doc_ids by
        // construction; the max() makes the fold insensitive to that.
        val verdicts = Seq(
          semDropped -> "sem", contaminated -> "cont", imgDup -> "img",
          decontam -> "dec", chunkDup -> "chunk", spanContam -> "span",
          blocked -> "bl", secretRisk -> "sr", winnowLeak -> "wl")
        val flags = verdicts
          .map { case (df, k) => df.select(col("doc_id"), lit(k).as("k")) }
          .reduce(_ unionByName _)
          .groupBy(col("doc_id"))
          .agg(verdicts.map { case (_, k) =>
            max(when(col("k") === k, 1).otherwise(0)).as(s"${k}_hit")
          }.head, verdicts.tail.map { case (_, k) =>
            max(when(col("k") === k, 1).otherwise(0)).as(s"${k}_hit")
          }: _*)
        base
          .join(flags, Seq("doc_id"), "left")
          .withColumn("is_sem_dropped", coalesce(col("sem_hit"), lit(0)))
          .withColumn("is_contaminated", coalesce(col("cont_hit"), lit(0)))
          .withColumn("is_image_dup", coalesce(col("img_hit"), lit(0)))
          .withColumn("is_decontam_hit", coalesce(col("dec_hit"), lit(0)))
          .withColumn("is_chunk_dup", coalesce(col("chunk_hit"), lit(0)))
          .withColumn("is_span_contam", coalesce(col("span_hit"), lit(0)))
          .withColumn("is_blocklisted", coalesce(col("bl_hit"), lit(0)))
          .withColumn("is_secret_risk", coalesce(col("sr_hit"), lit(0)))
          .withColumn("is_winnow_leak", coalesce(col("wl_hit"), lit(0)))
          .withColumn("keep",
            when(col("is_exact_dup") === 0 && col("is_sem_dropped") === 0 &&
              col("is_contaminated") === 0 && col("is_image_dup") === 0 &&
              col("is_decontam_hit") === 0 && col("is_chunk_dup") === 0 &&
              col("is_span_contam") === 0 && col("is_blocklisted") === 0 &&
              col("is_secret_risk") === 0 && col("is_winnow_leak") === 0 &&
              col("quality_score") >= 0.5, 1)
              .otherwise(0))
          .select(col("doc_id"), col("source"), col("quality_score"),
            col("is_exact_dup"), col("is_sem_dropped"),
            col("is_contaminated"), col("is_image_dup"),
            col("is_decontam_hit"), col("is_chunk_dup"),
            col("is_span_contam"), col("is_blocklisted"),
            col("is_secret_risk"), col("is_winnow_leak"), col("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${Clustering.semanticDedupDuckCtes()},
             sem AS (SELECT DISTINCT vb AS doc_id FROM hits),
             ${TextOps.fourGramDuckCtes},
             ev AS (
               SELECT DISTINCT g.s FROM g
               JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
             cont AS (
               SELECT DISTINCT g.doc_id FROM g
               JOIN documents d USING (doc_id)
               JOIN ev USING (s)
               WHERE d.source <> 'src0'),
             ${Multimodal.phashDuckCtes},
             img AS (SELECT DISTINCT db AS doc_id FROM im_pairs),
             ${Similarity.semanticDecontamDuckCtes},
             dec AS (SELECT DISTINCT vec_id AS doc_id FROM sdc_flagged),
             ${TextOps.cdcDuckCtes},
             chunk AS (
               SELECT doc_id FROM (
                 SELECT doc_id, sum(chunk_tokens) AS tot,
                   sum(CASE WHEN nd >= 2 THEN chunk_tokens ELSE 0 END) AS dup
                 FROM cdc_h JOIN cdc_cnt USING (chunk_hash)
                 GROUP BY doc_id)
               WHERE dup * 2 >= tot),
             ${TextOps.posGramDuckCtes},
             spanruns AS (
               SELECT pg.doc_id,
                 pg.i - row_number() OVER (PARTITION BY pg.doc_id
                   ORDER BY pg.i) AS grp
               FROM pg
               JOIN documents d USING (doc_id)
               JOIN ev USING (s)
               WHERE d.source <> 'src0'),
             spanc AS (
               SELECT DISTINCT doc_id FROM (
                 SELECT doc_id, grp, count(*) AS c FROM spanruns
                 GROUP BY doc_id, grp)
               WHERE c >= ${TextOps.SpanRunGate}),
             $blockedDuckCtes,
             ${TextOps.rareRunDuckCtes},
             ${TextOps.winnowLeakDuckCtes},
             base AS (
               SELECT doc_id, source,
                 round(${Quality.duckScore("text")}, 4) AS quality_score,
                 CASE WHEN row_number() OVER (PARTITION BY md5(text)
                     ORDER BY doc_id) > 1 THEN 1 ELSE 0 END AS is_exact_dup
               FROM documents)
             SELECT b.doc_id, b.source, b.quality_score, b.is_exact_dup,
               CASE WHEN sem.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_sem_dropped,
               CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_contaminated,
               CASE WHEN img.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_image_dup,
               CASE WHEN dec.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_decontam_hit,
               CASE WHEN chunk.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_chunk_dup,
               CASE WHEN spanc.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_span_contam,
               CASE WHEN blocked.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_blocklisted,
               CASE WHEN rrf.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_secret_risk,
               CASE WHEN wlf.doc_id IS NOT NULL THEN 1 ELSE 0 END
                 AS is_winnow_leak,
               CASE WHEN b.is_exact_dup = 0 AND sem.doc_id IS NULL
                     AND cont.doc_id IS NULL AND img.doc_id IS NULL
                     AND dec.doc_id IS NULL AND chunk.doc_id IS NULL
                     AND spanc.doc_id IS NULL AND blocked.doc_id IS NULL
                     AND rrf.doc_id IS NULL AND wlf.doc_id IS NULL
                     AND b.quality_score >= 0.5
                 THEN 1 ELSE 0 END AS keep
             FROM base b
             LEFT JOIN sem ON b.doc_id = sem.doc_id
             LEFT JOIN cont ON b.doc_id = cont.doc_id
             LEFT JOIN img ON b.doc_id = img.doc_id
             LEFT JOIN dec ON b.doc_id = dec.doc_id
             LEFT JOIN chunk ON b.doc_id = chunk.doc_id
             LEFT JOIN spanc ON b.doc_id = spanc.doc_id
             LEFT JOIN blocked ON b.doc_id = blocked.doc_id
             LEFT JOIN rr_flagged rrf ON b.doc_id = rrf.doc_id
             LEFT JOIN wl_flagged wlf ON b.doc_id = wlf.doc_id
             ORDER BY b.doc_id""")),

    // ---- dictionary blocklist filter (the C4 "badwords" stage): a
    //      categorized term list is broadcast; per-document hits roll up
    //      per category and the doc is flagged when any category reaches
    //      its threshold. Differs from q77 (regex PII projections) in
    //      exactly the way production safety filters differ from PII
    //      scrubbing: the list is DATA (thousands of terms, maintained
    //      per policy/language), not a pattern — so the operator is a
    //      token-explode + broadcast equi-join, updatable without
    //      recompiling, and the same shape carries a 10k-term list at
    //      100 TB (the corpus streams map-side; only (doc_id, category)
    //      hit rows shuffle). Terms here are corpus words standing in
    //      for a real deny list. ----
    "q129_blocklist_filter" -> QueryDef(
      (s, dir) => blocklistFilter(Tables.load(s, dir, "documents")),
      Some(s"""WITH bl(term, category) AS (VALUES $BlocklistDuckValues),
             hits AS (
               SELECT t.doc_id, bl.category, count(*) AS n
               FROM (SELECT doc_id,
                       unnest(string_split_regex(lower(text), ' +')) AS term
                     FROM documents) t
               JOIN bl USING (term)
               GROUP BY t.doc_id, bl.category),
             per_doc AS (
               SELECT d.doc_id, d.source,
                 coalesce(max(CASE WHEN h.category = 'latency' THEN h.n END), 0)
                   AS latency_hits,
                 coalesce(max(CASE WHEN h.category = 'scanheavy' THEN h.n END), 0)
                   AS scanheavy_hits
               FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
               GROUP BY d.doc_id, d.source)
             SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN latency_hits >= $BlocklistThreshold
                 OR scanheavy_hits >= $BlocklistThreshold
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               CAST(sum(latency_hits) AS BIGINT) AS latency_hits,
               CAST(sum(scanheavy_hits) AS BIGINT) AS scanheavy_hits
             FROM per_doc
             GROUP BY source
             ORDER BY source""")),

    // ---- quality-score CALIBRATION: per quality decile, the realized
    //      exact-dup and blocklist rates — the cross-signal sanity
    //      check run before anyone trusts a score threshold (a quality
    //      score worth filtering on should anti-correlate with spam
    //      signals; a flat curve means the score is noise). Integer
    //      surrogate deciles (the q134 trick) so bucketing never
    //      touches float comparison; two groupBys + the broadcast
    //      blocklist verdict. ----
    "q137_quality_calibration" -> QueryDef(
      (s, dir) => qualityCalibration(Tables.load(s, dir, "documents")),
      Some(s"""WITH base AS (
               SELECT doc_id,
                 least(CAST(round(round(${Quality.duckScore("text")}, 4)
                   * 10000, 0) AS BIGINT) // 1000, 9) AS decile,
                 CASE WHEN row_number() OVER (PARTITION BY md5(text)
                     ORDER BY doc_id) > 1 THEN 1 ELSE 0 END AS is_dup
               FROM documents),
             $blockedDuckCtes
             SELECT decile, count(*) AS n_docs,
               CAST(sum(is_dup) AS BIGINT) * 10000 // count(*) AS dup_bp,
               CAST(sum(CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000 // count(*) AS blocked_bp
             FROM base
             LEFT JOIN blocked b USING (doc_id)
             GROUP BY decile
             ORDER BY decile""")),

    // ---- SAMPLE REPRESENTATIVENESS audit: the q107 weighted sample's
    //      token-length distribution against the full corpus's, per
    //      source — L1 and max gaps over power-of-two length buckets in
    //      basis points (the discrete total-variation readout ×2). A
    //      QUALITY-weighted sample is SUPPOSED to tilt (toward whatever
    //      the score likes — with q219's caveat that may mean length);
    //      this measures how far, per source, before anyone treats the
    //      sample as a corpus stand-in for eval or calibration. Scale:
    //      the corpus side is one map-side (source, bucket) rollup; the
    //      sample side joins the K·|sources|-row sample back on doc_id;
    //      shares window over per-source bucket frames (≤22 rows each).
    //      Pure int64. ----
    "q220_sample_representativeness" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val bucketCase = "CASE " + (0 to 20).map(1L << _)
          .map(b => s"WHEN c < ${b * 2}L THEN CAST(${b}L AS BIGINT)")
          .mkString(" ") + s" ELSE CAST(${1L << 21}L AS BIGINT) END"
        val lens = docs.select(col("source"), col("doc_id"),
            expr("cast(size(split(lower(text), ' +')) as long)").as("c"))
          .withColumn("bucket_lo", expr(bucketCase))
          .transform(TransientCache.scopedDF)
        def dist(df: DataFrame, share: String) = df
          .groupBy(col("source"), col("bucket_lo"))
          .agg(count(lit(1)).as("n"))
          .select(col("source"), col("bucket_lo"),
            expr("n * 10000L div sum(n) OVER (PARTITION BY source)")
              .as(share))
        val corp = dist(lens, "corp_bp")
        val samp = dist(weightedSample(docs).select(col("doc_id"))
          .join(lens, "doc_id"), "samp_bp")
        corp.join(samp, Seq("source", "bucket_lo"), "full_outer")
          .select(col("source"),
            coalesce(col("corp_bp"), lit(0L)).as("cb"),
            coalesce(col("samp_bp"), lit(0L)).as("sb"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_buckets"),
            sum(abs(col("cb") - col("sb"))).as("l1_gap_bp"),
            max(abs(col("cb") - col("sb"))).as("max_gap_bp"))
          .orderBy(col("source"))
      },
      Some {
        val kase = "CASE " + (0 to 20).map(1L << _)
          .map(b => s"WHEN c < ${b * 2} THEN CAST($b AS BIGINT)")
          .mkString(" ") + s" ELSE CAST(${1L << 21} AS BIGINT) END"
        s"""WITH lens AS (
             SELECT source, doc_id, $kase AS bucket_lo FROM (
               SELECT source, doc_id,
                 len(string_split_regex(lower(text), ' +')) AS c
               FROM documents)),
           corp AS (
             SELECT source, bucket_lo,
               CAST(count(*) AS BIGINT) * 10000
                 // CAST(sum(count(*)) OVER (PARTITION BY source)
                      AS BIGINT) AS corp_bp
             FROM lens GROUP BY source, bucket_lo),
           wsd AS (
             SELECT source, doc_id,
               1 + CAST(floor((${Quality.duckScore("text")}) * 10)
                 AS BIGINT) AS weight,
               CAST(('0x' || substr(md5('wsamp:' ||
                 CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) AS h
             FROM documents),
           ws AS (
             SELECT doc_id FROM (
               SELECT doc_id, row_number() OVER (PARTITION BY source
                 ORDER BY h // weight, doc_id) AS rk
               FROM wsd)
             WHERE rk <= $WeightedSampleK),
           samp AS (
             SELECT l.source, l.bucket_lo,
               CAST(count(*) AS BIGINT) * 10000
                 // CAST(sum(count(*)) OVER (PARTITION BY l.source)
                      AS BIGINT) AS samp_bp
             FROM lens l JOIN ws USING (doc_id)
             GROUP BY l.source, l.bucket_lo),
           f AS (
             SELECT coalesce(c.source, sa.source) AS source,
               coalesce(c.corp_bp, 0) AS cb,
               coalesce(sa.samp_bp, 0) AS sb
             FROM corp c FULL OUTER JOIN samp sa
               ON c.source = sa.source AND c.bucket_lo = sa.bucket_lo)
           SELECT source, CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(abs(cb - sb)) AS BIGINT) AS l1_gap_bp,
             CAST(max(abs(cb - sb)) AS BIGINT) AS max_gap_bp
           FROM f GROUP BY source ORDER BY source"""
      }),

    // ---- QUALITY–LENGTH BIAS audit: per source, the OLS slope and
    //      Pearson correlation of the quality score (1e-4-unit integer
    //      surrogate, the q137 idiom) against whole-bit log₂ token
    //      count — the "is the score just measuring length?" check run
    //      before a length-correlated score silently starves every
    //      long-form source through q78/q123-style thresholds. All five
    //      sums are exact int64 (per-row terms bounded: x ≤ ~40 bits,
    //      y ≤ 10⁴); the OLS closed form combines them in ONE fixed
    //      double expression tree (the q215 discipline — identical
    //      int64 inputs give identical doubles in both engines), NOT in
    //      int64: the closed form's n·Σxy products grow as n², which
    //      overflows int64 near 10⁷ docs per source, while the double
    //      combination holds to Σ bounds of ~9·10¹³ docs. Zero-variance
    //      degenerate sources report 0.0 by convention. One map-side
    //      rollup per source; no joins at all. ----
    "q219_quality_length_bias" -> QueryDef(
      (s, dir) => {
        val pts = Tables.load(s, dir, "documents")
          .select(col("source"),
            expr("""cast(length(bin(greatest(
                    size(split(lower(text), ' +')), 1))) - 1 as bigint)""")
              .as("x"),
            round(round(Quality.score(col("text")), 4) * 10000, 0)
              .cast("long").as("y"))
        val den =
          """(cast(n_docs as double) * cast(sxx as double)
              - cast(sx as double) * cast(sx as double))"""
        val deny =
          """(cast(n_docs as double) * cast(syy as double)
              - cast(sy as double) * cast(sy as double))"""
        val num =
          """(cast(n_docs as double) * cast(sxy as double)
              - cast(sx as double) * cast(sy as double))"""
        pts.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
            sum(expr("y * y")).as("syy"))
          .select(col("source"), col("n_docs"),
            expr(s"""CASE WHEN $den = 0.0D THEN 0.0D
                     ELSE round($num / $den, 4) END""").as("slope_e4_per_bit"),
            expr(s"""CASE WHEN $den = 0.0D OR $deny = 0.0D THEN 0.0D
                     ELSE round($num / (sqrt($den) * sqrt($deny)), 4) END""")
              .as("pearson_r"))
          .orderBy(col("source"))
      },
      Some {
        val den = """(CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""
        val deny = """(CAST(n_docs AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"""
        val num = """(CAST(n_docs AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"""
        s"""WITH pts AS (
             SELECT source,
               CAST(length(bin(greatest(
                 len(string_split_regex(lower(text), ' +')), 1))) - 1
                 AS BIGINT) AS x,
               CAST(round(round(${Quality.duckScore("text")}, 4)
                 * 10000, 0) AS BIGINT) AS y
             FROM documents),
           f AS (
             SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
             FROM pts GROUP BY source)
           SELECT source, n_docs,
             CASE WHEN $den = 0.0 THEN 0.0
               ELSE round($num / $den, 4) END AS slope_e4_per_bit,
             CASE WHEN $den = 0.0 OR $deny = 0.0 THEN 0.0
               ELSE round($num / (sqrt($den) * sqrt($deny)), 4)
               END AS pearson_r
           FROM f ORDER BY source"""
      }),

    // ---- LICENSE / COPYRIGHT notice detection — the provenance-
    //      compliance stage every permissively-licensed-data pipeline
    //      runs (The Stack's license filter, C4's boilerplate notices):
    //      per source, how many documents carry a copyright line, an
    //      "all rights reserved" claim, an Apache-style grant or a
    //      Creative Commons mark. The corpus is plain synthetic text, so
    //      the notices are PLANTED deterministically by both engines
    //      (the q114/q119 fixture discipline: doc_id % 7 == 0 gets a
    //      header, class = doc_id % 3) and the detector runs substring
    //      containment (`instr`/`position` — no regex dialect risk).
    //      Scale shape: pure per-row projections; the one shuffle is the
    //      per-source rollup on a 20-value key. A real deployment swaps
    //      the synthesized column for the raw text and extends the
    //      marker table — the operator shape is unchanged. ----
    "q148_license_notices" -> QueryDef(
      (s, dir) => licenseNotices(Tables.load(s, dir, "documents")
        .withColumn("ltext", expr(licenseSynthSpark))),
      Some(s"""WITH lt AS (
               SELECT doc_id, source, $licenseSynthDuck AS ltext
               FROM documents),
             v AS (
               SELECT source,
                 ${LicenseMarkers.map { case (name, m) =>
                   s"CASE WHEN position('$m' IN lower(ltext)) > 0 THEN 1 ELSE 0 END AS f_$name"
                 }.mkString(",\n                 ")}
               FROM lt)
             SELECT source, count(*) AS n_docs,
               ${LicenseMarkers.map { case (name, _) =>
                 s"CAST(sum(f_$name) AS BIGINT) AS n_$name"
               }.mkString(",\n               ")},
               CAST(sum(CASE WHEN ${LicenseMarkers.map(m => s"f_${m._1} = 1")
                 .mkString(" OR ")} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_flagged,
               CAST(sum(CASE WHEN ${LicenseMarkers.map(m => s"f_${m._1} = 1")
                 .mkString(" OR ")} THEN 1 ELSE 0 END) AS BIGINT)
                 * 10000 // count(*) AS flagged_bp
             FROM v
             GROUP BY source
             ORDER BY source""")),

    // ---- CODE-vs-PROSE detection: the routing classifier every mixed
    //      crawl runs before language-specific processing (code goes to
    //      a code pipeline with its own dedup/quality rules; prose goes
    //      here). Detector = two integer signals — symbol density per
    //      1000 chars ([[CodeSymbolRe]]) and a keyword count
    //      ([[CodeKeywordRe]]) — with an OR verdict, so brace-free
    //      python and keyword-free JSON both land (spec pins each class
    //      fires exactly one side). The corpus is prose, so code bodies
    //      are PLANTED on the doc_id % 9 == 2 grid (q148 discipline).
    //      Scale: per-row codegen'd regex counts; one 20-value rollup
    //      shuffle. ----
    "q156_code_detection" -> QueryDef(
      (s, dir) => codeDetection(Tables.load(s, dir, "documents")
        .withColumn("ctext", expr(codeSynthSpark))),
      Some(s"""WITH ct AS (
               SELECT doc_id, source, $codeSynthDuck AS ctext
               FROM documents),
             d AS (
               SELECT source,
                 len(regexp_extract_all(ctext, '$CodeSymbolRe')) AS n_sym,
                 len(regexp_extract_all(ctext, '$CodeKeywordRe')) AS n_kw,
                 length(ctext) AS n_chars
               FROM ct),
             v AS (
               SELECT source, n_sym, n_kw,
                 CASE WHEN n_sym * 1000 // n_chars >= $CodeSymPerKchar
                        OR n_kw >= $CodeMinKeywords
                   THEN 1 ELSE 0 END AS is_code
               FROM d)
             SELECT source, count(*) AS n_docs,
               CAST(sum(is_code) AS BIGINT) AS n_code,
               CAST(sum(is_code) AS BIGINT) * 10000 // count(*) AS code_bp,
               CAST(sum(n_sym) AS BIGINT) AS total_sym,
               CAST(sum(n_kw) AS BIGINT) AS total_kw
             FROM v GROUP BY source ORDER BY source""")),
  )

  /** The q156 detector over a (doc_id, source, ctext) frame — exposed
    * for per-class specs (python trips only the keyword rule, JSON only
    * the symbol rule, C both, prose neither). */
  def codeDetection(docs: DataFrame): DataFrame = docs
    .select(col("source"),
      size(regexp_extract_all(col("ctext"), lit(CodeSymbolRe), lit(0)))
        .cast("long").as("n_sym"),
      size(regexp_extract_all(col("ctext"), lit(CodeKeywordRe), lit(0)))
        .cast("long").as("n_kw"),
      length(col("ctext")).cast("long").as("n_chars"))
    .withColumn("is_code", when(
      expr(s"n_sym * 1000 div n_chars") >= CodeSymPerKchar ||
        col("n_kw") >= CodeMinKeywords, 1L).otherwise(0L))
    .groupBy(col("source"))
    .agg(count(lit(1)).as("n_docs"), sum(col("is_code")).as("n_code"),
      sum(col("n_sym")).as("total_sym"), sum(col("n_kw")).as("total_kw"))
    .select(col("source"), col("n_docs"), col("n_code"),
      expr("n_code * 10000 div n_docs").as("code_bp"),
      col("total_sym"), col("total_kw"))
    .orderBy(col("source"))

  /** The q148 detector over a (doc_id, source, ltext) frame — exposed
    * for planted-notice specs. One flag column per [[LicenseMarkers]]
    * entry via substring containment, rolled up per source. */
  def licenseNotices(docs: DataFrame): DataFrame = {
    val flagged = LicenseMarkers.foldLeft(
      docs.select(col("source"), lower(col("ltext")).as("lt"))) {
      case (df, (name, m)) =>
        df.withColumn(s"f_$name",
          when(instr(col("lt"), m) > 0, 1L).otherwise(0L))
    }
    val anyFlag = LicenseMarkers.map(m => col(s"f_${m._1}") === 1L)
      .reduce(_ or _)
    flagged
      .withColumn("f_any", when(anyFlag, 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        LicenseMarkers.map(m => sum(col(s"f_${m._1}")).as(s"n_${m._1}")) :+
          sum(col("f_any")).as("n_flagged"): _*)
      .select(Seq(col("source"), col("n_docs")) ++
        LicenseMarkers.map(m => col(s"n_${m._1}")) ++ Seq(
          col("n_flagged"),
          expr("n_flagged * 10000 div n_docs").as("flagged_bp")): _*)
      .orderBy(col("source"))
  }

  /** q137's decile calibration over a (doc_id, source, text) frame:
    * quality deciles (integer surrogate score, 1e-4 units, bucket 1000
    * wide, top bucket capped at 9) against realized exact-dup and
    * blocklist rates. Exposed for planted-correlation specs. */
  def qualityCalibration(docs: DataFrame): DataFrame = {
    val wDup = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val base = docs
      .withColumn("h", md5(col("text")))
      .withColumn("qint",
        round(round(Quality.score(col("text")), 4) * 10000, 0).cast("long"))
      .withColumn("decile", least(expr("qint div 1000"), lit(9L)))
      .withColumn("is_dup",
        when(row_number().over(wDup) > 1, 1L).otherwise(0L))
    val blocked = blocklistDocVerdicts(docs)
      .filter(col("latency_hits") >= BlocklistThreshold or
        col("scanheavy_hits") >= BlocklistThreshold)
      .select(col("doc_id")).withColumn("bl_hit", lit(1L))
    base.join(blocked, Seq("doc_id"), "left_outer")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_dup")).as("n_dup"),
        sum(coalesce(col("bl_hit"), lit(0L))).as("n_blocked"))
      .select(col("decile"), col("n_docs"),
        expr("n_dup * 10000 div n_docs").as("dup_bp"),
        expr("n_blocked * 10000 div n_docs").as("blocked_bp"))
      .orderBy(col("decile"))
  }

  /** Per-document blocklist verdict frame (doc_id, source, latency_hits,
    * scanheavy_hits) — the q129 building block the q117 ledger also
    * consumes. */
  def blocklistDocVerdicts(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bl = Blocklist.toDF("term", "category")
    val hits = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " +")).as("term"))
      .join(broadcast(bl), "term")
      .groupBy(col("doc_id"), col("category"))
      .agg(count(lit(1)).as("n"))
    docs.select(col("doc_id"), col("source"))
      .join(hits, Seq("doc_id"), "left_outer")
      .groupBy(col("doc_id"), col("source"))
      .agg(
        coalesce(max(when(col("category") === "latency", col("n"))), lit(0L))
          .as("latency_hits"),
        coalesce(max(when(col("category") === "scanheavy", col("n"))), lit(0L))
          .as("scanheavy_hits"))
  }

  /** q129's pipeline over a (doc_id, source, text) frame: token explode,
    * broadcast join against the categorized deny list, per-doc per-
    * category hit counts, flag when any category reaches
    * [[BlocklistThreshold]], per-source rollup. Exposed for planted-term
    * specs. */
  def blocklistFilter(docs: DataFrame): DataFrame = {
    blocklistDocVerdicts(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("latency_hits") >= BlocklistThreshold or
          col("scanheavy_hits") >= BlocklistThreshold, 1L).otherwise(0L))
          .as("n_flagged"),
        sum(col("latency_hits")).as("latency_hits"),
        sum(col("scanheavy_hits")).as("scanheavy_hits"))
      .orderBy(col("source"))
  }
}
