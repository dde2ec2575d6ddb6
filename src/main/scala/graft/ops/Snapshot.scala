package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Corpus snapshot management — the incremental-curation primitives a
  * recurring 100 TB pipeline runs between crawls.
  *
  * A production corpus is not rebuilt from scratch: each ingest produces a
  * new snapshot, and every downstream stage (dedup, decontam, sharding)
  * wants to touch ONLY the delta. The primitive underneath is a content
  * diff between two snapshots: which documents appeared, disappeared, or
  * changed text (same id, different content hash). q125 is that diff.
  *
  * The sandbox has one `documents` table, so the two snapshots are
  * synthesized deterministically from it (previous = drops one doc-id
  * residue class and carries a truncated "stale" text for another;
  * current = drops a different residue class) — both engines synthesize
  * identically, and the diff itself is the generic machinery: md5 each
  * side map-side, full-outer-join on the id, compare hashes. The hash
  * gate certifies the join+classify logic, not the synthesis.
  *
  * Scale shape: the md5 is computed BEFORE the join, so the shuffle
  * carries (doc_id, hash, source, n_chars) and never text; the join is a
  * plain int64 equi-join (sort-merge at corpus scale, AQE-splittable);
  * the rollup is one map-side-combinable groupBy. No driver state, no
  * broadcast of anything corpus-sized.
  */
object Snapshot {

  /** Residue classes (mod [[SnapMod]]) defining the synthesized
    * snapshots: `RemovedRes` exists only in the previous snapshot,
    * `AddedRes` only in the current one, `ChangedRes` in both but with
    * the previous text truncated by its last word. */
  val SnapMod = 11
  val RemovedRes = 5
  val AddedRes = 7
  val ChangedRes = 3

  /** Previous snapshot: (doc_id, source, h = md5(text'), n_chars') where
    * text' drops the last word for the changed class. */
  def previousSnapshot(docs: DataFrame): DataFrame = docs
    .filter(col("doc_id") % SnapMod =!= AddedRes)
    .withColumn("old_text",
      when(col("doc_id") % SnapMod === ChangedRes,
        expr("array_join(slice(split(text, ' +'), 1, " +
          "greatest(size(split(text, ' +')) - 1, 1)), ' ')"))
        .otherwise(col("text")))
    .select(col("doc_id"), col("source"),
      md5(col("old_text")).as("h"),
      length(col("old_text")).cast("long").as("n_chars"))

  /** Current snapshot: (doc_id, source, h, n_chars) over the live text. */
  def currentSnapshot(docs: DataFrame): DataFrame = docs
    .filter(col("doc_id") % SnapMod =!= RemovedRes)
    .select(col("doc_id"), col("source"),
      md5(col("text")).as("h"),
      length(col("text")).cast("long").as("n_chars"))

  /** The generic snapshot diff: full-outer-join two (doc_id, source, h,
    * n_chars) snapshots on doc_id and classify each document as
    * added / removed / changed / unchanged by hash compare. Returns one
    * row per document with the verdict and the CURRENT side's byte mass
    * (previous side's for removals) — the work-list an incremental run
    * feeds to its delta stages. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame): DataFrame = {
    val p = prev.select(col("doc_id"), col("source").as("p_source"),
      col("h").as("p_h"), col("n_chars").as("p_chars"))
    val c = cur.select(col("doc_id"), col("source").as("c_source"),
      col("h").as("c_h"), col("n_chars").as("c_chars"))
    p.join(c, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("c_source"), col("p_source")).as("source"),
        when(col("p_h").isNull, "added")
          .when(col("c_h").isNull, "removed")
          .when(col("p_h") =!= col("c_h"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("c_chars"), col("p_chars")).as("n_chars"))
  }

  /** DuckDB CTEs mirroring [[previousSnapshot]]/[[currentSnapshot]]/
    * [[snapshotDiff]]: `diff` has (doc_id, source, status, n_chars). */
  private val diffDuckCtes: String =
    s"""prev AS (
         SELECT doc_id, source, md5(t) AS h, length(t) AS n_chars FROM (
           SELECT doc_id, source,
             CASE WHEN doc_id % $SnapMod = $ChangedRes THEN
               array_to_string(
                 (string_split_regex(text, ' +'))[1:greatest(
                   len(string_split_regex(text, ' +')) - 1, 1)], ' ')
             ELSE text END AS t
           FROM documents
           WHERE doc_id % $SnapMod <> $AddedRes)),
       cur AS (
         SELECT doc_id, source, md5(text) AS h, length(text) AS n_chars
         FROM documents
         WHERE doc_id % $SnapMod <> $RemovedRes),
       diff AS (
         SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
           coalesce(c.source, p.source) AS source,
           CASE WHEN p.h IS NULL THEN 'added'
                WHEN c.h IS NULL THEN 'removed'
                WHEN p.h <> c.h THEN 'changed'
                ELSE 'unchanged' END AS status,
           coalesce(c.n_chars, p.n_chars) AS n_chars
         FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id)"""

  /** Previous snapshot's raw TEXT (doc_id, text) — the textual side of
    * [[previousSnapshot]] for phrase-level delta analysis (q218). */
  def previousSnapshotText(docs: DataFrame): DataFrame = docs
    .filter(col("doc_id") % SnapMod =!= AddedRes)
    .select(col("doc_id"),
      when(col("doc_id") % SnapMod === ChangedRes,
        expr("""array_join(slice(split(text, ' +'), 1,
                greatest(size(split(text, ' +')) - 1, 1)), ' ')"""))
        .otherwise(col("text")).as("text"))

  val defs: Map[String, QueryDef] = Map(
    // ---- corpus snapshot diff rollup: per (source, status) the doc
    //      count and byte mass, plus the re-process mass (added+changed
    //      is exactly the delta the downstream incremental stages touch;
    //      q74/the streaming dedup mirror consume that delta). ----
    // ---- QUALITY DRIFT between snapshots: per source the integer-
    //      surrogate mean quality (the q134 1e-4-unit idiom — no
    //      order-sensitive float sums) of the previous vs current
    //      snapshot and their signed delta — the ops alarm for a source
    //      whose crawl degraded between ingests (template change,
    //      spam flood, encoding break) BEFORE the per-doc filters eat
    //      the damage silently. Same synthesized snapshots as q125, so
    //      the changed-doc class genuinely moves scores. Two groupBys
    //      on the 20-value source key + one equi-join. ----
    "q162_quality_drift" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        def qint(c: org.apache.spark.sql.Column) =
          round(round(Quality.score(c), 4) * 10000, 0).cast("long")
        val prev = docs.filter(col("doc_id") % SnapMod =!= AddedRes)
          .withColumn("t",
            when(col("doc_id") % SnapMod === ChangedRes,
              expr("array_join(slice(split(text, ' +'), 1, " +
                "greatest(size(split(text, ' +')) - 1, 1)), ' ')"))
              .otherwise(col("text")))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("prev_docs"), sum(qint(col("t"))).as("pq"))
        val cur = docs.filter(col("doc_id") % SnapMod =!= RemovedRes)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("cur_docs"), sum(qint(col("text"))).as("cq"))
        prev.join(cur, "source")
          .select(col("source"), col("prev_docs"), col("cur_docs"),
            expr("pq div prev_docs").as("prev_q_e4"),
            expr("cq div cur_docs").as("cur_q_e4"),
            expr("cq div cur_docs - pq div prev_docs").as("drift_e4"))
          .orderBy(col("source"))
      },
      Some(s"""WITH pv AS (
               SELECT source,
                 CAST(round(round(${Quality.duckScore("t")}, 4) * 10000, 0)
                   AS BIGINT) AS qi
               FROM (
                 SELECT source,
                   CASE WHEN doc_id % $SnapMod = $ChangedRes THEN
                     array_to_string(
                       (string_split_regex(text, ' +'))[1:greatest(
                         len(string_split_regex(text, ' +')) - 1, 1)], ' ')
                   ELSE text END AS t
                 FROM documents
                 WHERE doc_id % $SnapMod <> $AddedRes)),
             cu AS (
               SELECT source,
                 CAST(round(round(${Quality.duckScore("text")}, 4) * 10000, 0)
                   AS BIGINT) AS qi
               FROM documents
               WHERE doc_id % $SnapMod <> $RemovedRes),
             pa AS (
               SELECT source, count(*) AS prev_docs,
                 CAST(sum(qi) AS BIGINT) AS pq
               FROM pv GROUP BY source),
             ca AS (
               SELECT source, count(*) AS cur_docs,
                 CAST(sum(qi) AS BIGINT) AS cq
               FROM cu GROUP BY source)
             SELECT pa.source, prev_docs, cur_docs,
               pq // prev_docs AS prev_q_e4,
               cq // cur_docs AS cur_q_e4,
               cq // cur_docs - pq // prev_docs AS drift_e4
             FROM pa JOIN ca ON pa.source = ca.source
             ORDER BY pa.source""")),

    // ---- EMBEDDING-CENTROID DRIFT between snapshots: the semantic-axis
    //      companion to q162 — per label, the L1 distance (micro units)
    //      between the previous and current snapshots' int64 centroids,
    //      plus the worst single dimension. Catches an embedding-model
    //      change or a membership shift the moment it moves the space,
    //      before any cosine-thresholded downstream stage quietly
    //      degrades. All integer: floor-micro quantization (q143 idiom)
    //      + a +1e6 offset so Spark `div`/DuckDB `//` agree (offset
    //      cancels in the difference). Scale: two (label × dim)-keyed
    //      combinable groupBys + one equi-join; output ≤ labels rows. ----
    "q185_embedding_drift" -> QueryDef(
      (s, dir) => embeddingDrift(Tables.load(s, dir, "embeddings")),
      Some(s"""WITH pe0 AS (
               SELECT CAST(label AS BIGINT) AS label,
                 unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS dim
               FROM embeddings WHERE vec_id % $SnapMod <> $AddedRes),
             pe AS (
               SELECT label, dim,
                 CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                   + 1000000 AS so
               FROM pe0),
             ce0 AS (
               SELECT CAST(label AS BIGINT) AS label,
                 unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS dim
               FROM embeddings WHERE vec_id % $SnapMod <> $RemovedRes),
             ce AS (
               SELECT label, dim,
                 CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                   + 1000000 AS so
               FROM ce0),
             pc AS (
               SELECT label, dim,
                 CAST(sum(so) AS BIGINT) // count(*) AS c,
                 count(*) AS n
               FROM pe GROUP BY label, dim),
             cc AS (
               SELECT label, dim,
                 CAST(sum(so) AS BIGINT) // count(*) AS c,
                 count(*) AS n
               FROM ce GROUP BY label, dim)
             SELECT pc.label, max(pc.n) AS n_prev, max(cc.n) AS n_cur,
               CAST(sum(abs(pc.c - cc.c)) AS BIGINT) AS l1_micro,
               CAST(max(abs(pc.c - cc.c)) AS BIGINT) AS max_dim_micro
             FROM pc JOIN cc ON pc.label = cc.label AND pc.dim = cc.dim
             GROUP BY pc.label
             ORDER BY pc.label""")),

    "q125_snapshot_diff" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        snapshotDiff(previousSnapshot(docs), currentSnapshot(docs))
          .groupBy(col("source"), col("status"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"))
          .orderBy(col("source"), col("status"))
      },
      Some(s"""WITH $diffDuckCtes
             SELECT source, status, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
             FROM diff
             GROUP BY source, status
             ORDER BY source, status""")),

    // ---- DELTA-ONLY dedup: the q125 diff feeding q74's incremental
    //      dedup — exactly the composition a recurring pipeline runs
    //      (never re-dedup the world; dedup the added+changed docs
    //      against the previous snapshot's content keys). Per source:
    //      delta size, within-delta unique keepers, and truly novel
    //      content (absent from the previous snapshot). The changed-doc
    //      class makes this strictly richer than q74's modulo batch: a
    //      changed doc's OLD hash sits in the base key set, so only a
    //      real text change survives the anti-join. Scale: hash keys
    //      computed map-side, one groupBy + one left-anti equi-join on
    //      the 32-char key — the delta, not the corpus, is the join's
    //      probe side. ----
    "q136_delta_dedup" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val prev = previousSnapshot(docs)
        val cur = currentSnapshot(docs)
        val deltaIds = snapshotDiff(prev, cur)
          .filter(col("status").isin("added", "changed"))
          .select(col("doc_id"))
        val delta = cur.join(deltaIds, "doc_id")
        val baseKeys = prev.select(col("h")).distinct()
        val keepers = delta.groupBy(col("h"))
          .agg(min(col("doc_id")).as("keeper_id"),
            expr("min_by(source, doc_id)").as("source"))
        val novel = keepers.join(baseKeys, Seq("h"), "left_anti")
        val nDelta = delta.groupBy(col("source"))
          .agg(count(lit(1)).as("n_delta"))
        val nUnique = keepers.groupBy(col("source"))
          .agg(count(lit(1)).as("n_unique"))
        val nNovel = novel.groupBy(col("source"))
          .agg(count(lit(1)).as("n_novel"))
        nDelta
          .join(nUnique, Seq("source"), "left_outer")
          .join(nNovel, Seq("source"), "left_outer")
          .select(col("source"), col("n_delta"),
            coalesce(col("n_unique"), lit(0L)).as("n_unique"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .orderBy(col("source"))
      },
      Some(s"""WITH $diffDuckCtes,
             delta AS (
               SELECT c.doc_id, c.source, c.h FROM cur c
               JOIN diff ON c.doc_id = diff.doc_id
               WHERE diff.status IN ('added', 'changed')),
             basekeys AS (SELECT DISTINCT h FROM prev),
             keepers AS (
               SELECT h, min(doc_id) AS keeper_id,
                 min_by(source, doc_id) AS source
               FROM delta GROUP BY h),
             novel AS (
               SELECT k.* FROM keepers k ANTI JOIN basekeys b USING (h)),
             nd AS (SELECT source, count(*) AS n_delta FROM delta
                    GROUP BY source),
             nu AS (SELECT source, count(*) AS n_unique FROM keepers
                    GROUP BY source),
             nn AS (SELECT source, count(*) AS n_novel FROM novel
                    GROUP BY source)
             SELECT nd.source, nd.n_delta,
               CAST(coalesce(nu.n_unique, 0) AS BIGINT) AS n_unique,
               CAST(coalesce(nn.n_novel, 0) AS BIGINT) AS n_novel
             FROM nd
             LEFT JOIN nu USING (source)
             LEFT JOIN nn USING (source)
             ORDER BY nd.source""")),

    // ---- INCREMENTAL data-card maintenance: the per-source card of the
    //      CURRENT snapshot computed from the PREVIOUS snapshot's card
    //      plus the q125 delta ONLY — the maintenance a recurring run
    //      performs instead of re-scanning the corpus. q108 proved the
    //      card's statistics merge across shards; this proves they also
    //      support REMOVAL, which restricts the card to invertible
    //      statistics: counts and sums subtract, and the bit_xor content
    //      signature is its own inverse (xor a removed doc's key back
    //      out and it is gone; a changed doc xors out its old key and in
    //      its new one). Extremes (min/max) are deliberately absent —
    //      they cannot be decremented, which is exactly the design rule
    //      this gate documents. The oracle computes the current card
    //      DIRECTLY, so the hash match is a machine-checked proof of the
    //      whole maintenance algebra. Scale: the base card is
    //      |sources|-sized (read from the previous run's artifact in
    //      production — synthesized here); the only corpus-shaped work
    //      is the diff join, and the delta aggregation touches delta
    //      rows only. ----
    "q150_incremental_datacard" -> QueryDef(
      (s, dir) => incrementalDataCard(Tables.load(s, dir, "documents")),
      Some(s"""WITH $diffDuckCtes
             SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               bit_xor(CAST(('0x' || substr(md5('snap:' ||
                 CAST(doc_id AS VARCHAR) || ':' || h), 1, 14)) AS BIGINT))
                 AS sig
             FROM cur
             GROUP BY source
             ORDER BY source""")),

    // ---- PHRASE-level snapshot novelty: of the current snapshot's
    //      distinct per-doc 8-grams, how many exist NOWHERE in the
    //      previous snapshot — per source, the q212 novelty idea on the
    //      crawl-refresh axis. q125 counts changed DOCUMENTS; this
    //      measures how much genuinely new CONTENT the refresh bought
    //      (a crawl can churn thousands of doc ids while adding zero
    //      new phrases — template rotations, date stamps — and its
    //      sources should not earn mixture weight for that). Scale:
    //      both sides explode once; the only join is gram-keyed
    //      (left + seen flag, one pass); rollup is per source. ----
    "q218_snapshot_gram_novelty" -> QueryDef(
      (s, dir) => {
        val w = TextOps.NoveltyWords
        val docs = Tables.load(s, dir, "documents")
        def grams(df: DataFrame, keep: Seq[String]): DataFrame = df
          .withColumn("words", split(lower(col("text")), " +"))
          .filter(size(col("words")) >= w)
          .select(keep.map(col) :+ explode(expr(
            s"""array_distinct(transform(sequence(0, size(words) - $w),
                i -> md5(concat_ws(' ', slice(words, i + 1, $w)))))"""))
            .as("wkey"): _*)
        val prevG = grams(previousSnapshotText(docs), Seq())
          .distinct().withColumn("seen", lit(1L))
        // keep only `source` past the explode: doc_id would otherwise
        // ride the gram-keyed join exchange unused (guide §2.3 —
        // project before the exchange); the per-doc array_distinct
        // upstream already happened on the un-exploded row
        val currG = grams(
          docs.filter(col("doc_id") % SnapMod =!= RemovedRes)
            .select(col("doc_id"), col("source"), col("text")),
          Seq("source"))
        currG.join(prevG, Seq("wkey"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_gram_instances"),
            sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_new"))
          .withColumn("new_bp", expr("n_new * 10000L div n_gram_instances"))
          .orderBy(col("source"))
      },
      Some {
        val w = TextOps.NoveltyWords
        s"""WITH pt AS (
             SELECT doc_id,
               CASE WHEN doc_id % $SnapMod = $ChangedRes THEN
                 array_to_string(
                   (string_split_regex(text, ' +'))[1:greatest(
                     len(string_split_regex(text, ' +')) - 1, 1)], ' ')
               ELSE text END AS text
             FROM documents
             WHERE doc_id % $SnapMod <> $AddedRes),
           pw AS (SELECT doc_id,
                    string_split_regex(lower(text), ' +') AS ws FROM pt),
           pg AS (
             SELECT DISTINCT
               md5(array_to_string(ws[pos + 1 : pos + $w], ' ')) AS wkey
             FROM (SELECT doc_id,
                     unnest(generate_series(0, len(ws) - $w)) AS pos, ws
                   FROM pw WHERE len(ws) >= $w)),
           cw AS (SELECT doc_id, source,
                    string_split_regex(lower(text), ' +') AS ws
                  FROM documents WHERE doc_id % $SnapMod <> $RemovedRes),
           cg AS (
             SELECT DISTINCT doc_id, source,
               md5(array_to_string(ws[pos + 1 : pos + $w], ' ')) AS wkey
             FROM (SELECT doc_id, source,
                     unnest(generate_series(0, len(ws) - $w)) AS pos, ws
                   FROM cw WHERE len(ws) >= $w))
           SELECT source, CAST(count(*) AS BIGINT) AS n_gram_instances,
             CAST(sum(CASE WHEN p.wkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN p.wkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) * 10000
               // CAST(count(*) AS BIGINT) AS new_bp
           FROM cg c LEFT JOIN pg p ON c.wkey = p.wkey
           GROUP BY source
           ORDER BY source"""
      }),
  )

  /** 56-bit per-document content key for the q150 signature: doc id and
    * content hash together, so a changed doc changes its key. */
  private def snapKey(idCol: String, hCol: String) =
    expr(s"""cast(conv(substring(md5(concat('snap:',
      cast($idCol as string), ':', $hCol)), 1, 14), 16, 10) as long)""")

  /** The q150 operator: current-snapshot card = previous card ⊕ delta.
    * See the defs entry for the invertibility story. */
  def incrementalDataCard(docs: DataFrame): DataFrame = {
    val prev = previousSnapshot(docs)
    val cur = currentSnapshot(docs)
    // the previous run's artifact (per-source, |sources| rows)
    val base = prev.withColumn("k", snapKey("doc_id", "h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("b_docs"), sum(col("n_chars")).as("b_chars"),
        expr("bit_xor(k)").as("b_sig"))
    // the delta: both sides of the diff, unchanged rows dropped EARLY so
    // everything downstream is delta-sized
    val p = prev.select(col("doc_id"), col("source").as("p_source"),
      col("h").as("p_h"), col("n_chars").as("p_chars"))
    val c = cur.select(col("doc_id"), col("source").as("c_source"),
      col("h").as("c_h"), col("n_chars").as("c_chars"))
    val delta = p.join(c, Seq("doc_id"), "full_outer")
      .filter(col("p_h").isNull or col("c_h").isNull or
        col("p_h") =!= col("c_h"))
      .select(
        coalesce(col("c_source"), col("p_source")).as("source"),
        when(col("p_h").isNull, 1L).when(col("c_h").isNull, -1L)
          .otherwise(0L).as("d_docs"),
        (coalesce(col("c_chars"), lit(0L)) -
          coalesce(col("p_chars"), lit(0L))).as("d_chars"),
        (when(col("p_h").isNull, lit(0L))
          .otherwise(snapKey("doc_id", "p_h")) bitwiseXOR
         when(col("c_h").isNull, lit(0L))
          .otherwise(snapKey("doc_id", "c_h"))).as("d_sig"))
      .groupBy(col("source"))
      .agg(sum(col("d_docs")).as("d_docs"), sum(col("d_chars")).as("d_chars"),
        expr("bit_xor(d_sig)").as("d_sig"))
    base.join(delta, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("b_docs"), lit(0L)) + coalesce(col("d_docs"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("b_chars"), lit(0L)) + coalesce(col("d_chars"), lit(0L)))
          .as("total_chars"),
        (coalesce(col("b_sig"), lit(0L)) bitwiseXOR
          coalesce(col("d_sig"), lit(0L))).as("sig"))
      .filter(col("n_docs") > 0L)
      .orderBy(col("source"))
  }

  /** q185 over a (vec_id, embedding, label) frame: per-label centroid
    * drift between the previous and current embedding snapshots (the
    * SnapMod membership convention on vec_id — previous lacks the
    * added residue, current lacks the removed one). Centroids are
    * computed entirely in int64: each coordinate is floor-micro-
    * quantized (the q143 idiom) and OFFSET by +1,000,000 so every
    * later division sees non-negative operands (measured: `div` and
    * `//` both truncate on BIGINT — DESIGN.md round-14 — but
    * non-negativity keeps parity engine-detail-free); the offset cancels
    * in the drift difference. Drift = Σ_dims |c_prev − c_cur| in micro
    * units, plus the worst single dimension — the semantic-axis
    * companion to q162's quality drift (an embedding-model change or a
    * membership shift moves centroids before any downstream filter
    * notices). Scale: two (label × dim)-keyed combinable groupBys +
    * one (label, dim) equi-join + a ≤labels-row rollup; no vector ever
    * reaches the driver. */
  def embeddingDrift(emb: DataFrame): DataFrame = {
    def snap(excludeRes: Int) = emb
      .filter(col("vec_id") % SnapMod =!= excludeRes)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        (floor(col("x").cast("double") * 1000000L).cast("long") +
          1000000L).as("so"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("so")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"), expr("s div n").as("c"), col("n"))
    val p = snap(AddedRes).select(col("label"), col("dim"),
      col("c").as("cp"), col("n").as("np"))
    val c = snap(RemovedRes).select(col("label"), col("dim"),
      col("c").as("cc"), col("n").as("nc"))
    p.join(c, Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(max(col("np")).as("n_prev"), max(col("nc")).as("n_cur"),
        sum(abs(col("cp") - col("cc"))).as("l1_micro"),
        max(abs(col("cp") - col("cc"))).as("max_dim_micro"))
      .orderBy(col("label"))
  }
}
