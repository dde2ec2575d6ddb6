package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * The dot product / norm is an exact sequential fold (`functions.zip_with`
  * + `functions.aggregate` in Spark ≡ `list_zip` + 0-prepended
  * `list_reduce` in DuckDB): both engines execute the identical IEEE
  * operation sequence, so cosines agree BITWISE and ranking/thresholding
  * cannot diverge — no tolerance games.
  *
  * Scale shape:
  *   - brute-force top-k broadcasts the (small) query set and scans the
  *     corpus once — the right baseline when k·|Q| is small;
  *   - the LSH variant buckets both sides by sign-comparison bits
  *     (deterministic hyperplane surrogates) and joins on the bucket, so
  *     the comparison count drops from |Q|·N to the bucket collision rate;
  *     at 100 TB the bucket join is the only shuffle;
  *   - near-dup pairs (q41) go through banded sign-LSH candidates first —
  *     a (band_idx, band_val) equi self-join — then exact cosine verify;
  *   - the exact all-pairs baseline (q50) stays first-class but is
  *     block-distributed: a tiny block-pair relation drives two equi-joins
  *     so the O(N²) compute shuffle-partitions evenly instead of riding a
  *     broadcast nested loop.
  */
object Similarity {

  /** Sequential dot product of two double-array columns via the native
    * codegen'd [[graft.expr.DotProduct]] expression (registered per
    * session in [[normed]]). The float→double cast happens ONCE per
    * vector (`de` column), not once per candidate pair. Fold order is the
    * same left-to-right sum as DuckDB's 0-prepended list_reduce, so
    * results stay bitwise identical to the oracle. */
  private def dotExpr(a: String, b: String) = s"graft_dot($a, $b)"

  private val toDouble = "transform(embedding, x -> cast(x as double))"

  private def duckDot(a: String, b: String) =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(list_zip($a, $b),
            s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))),
          (acc, v) -> acc + v)"""

  private def duckNorm(a: String) = s"sqrt(${duckDot(a, a)})"

  /** Sign-comparison LSH: 4 bits, bit i = (e[p] > e[q]) for fixed index
    * pairs — a deterministic, data-independent hyperplane surrogate that
    * both engines evaluate identically on floats. */
  private val lshPairs = Seq((1, 2), (5, 9), (11, 17), (23, 31))

  /** Banded sign-LSH for the near-dup pair search: 32 bands × 16 bits.
    * Bit t compares coordinates (p, q) drawn without repetition from the
    * 2016 unordered coordinate pairs by a fixed stride walk (997 is
    * coprime to 2016, so the first 512 draws are distinct), so every bit
    * is a distinct deterministic hyperplane surrogate. Candidates = pairs
    * agreeing on ALL 16 bits of at least one band.
    *
    * 16 bits per band means 65,536 possible band values, so band-group
    * sizes are governed by how many vectors genuinely point the same way
    * — NOT by corpus size. (8-bit bands have only 256 possible values;
    * groups then grow as N/256 regardless of content, and past ~cap·256
    * vectors an absolute cap drops EVERY group — silent zero recall. The
    * wider domain is the scale fix; the cap below remains as a guard
    * against degenerate same-direction clusters only.) Halving the
    * per-band agreement probability per extra bit costs recall, so the
    * band count doubles to 32 to compensate: for a cos ≈ 0.9 pair
    * (per-bit agreement ≈ 0.86) recall is 1-(1-0.86^16)^32 ≈ 0.94.
    * Groups larger than [[NeardupBandCap]] are dropped before the
    * self-join (mirrored in the oracle), exactly like
    * [[Dedup.HotBandCap]] on the MinHash path — giant sign-LSH groups
    * are near-identical-direction clusters, exact-dup territory that q31
    * catches in one shuffle. */
  private val NeardupBands = 32
  private val NeardupRowsPerBand = 16

  /** Absolute cap on a (band_idx, band_val) group in the q41 self-join —
    * a group of k vectors contributes k·(k-1)/2 candidate pairs, so join
    * cost is bounded by group size, not corpus size. With 16-bit bands a
    * random group holds ≈ N/65,536 vectors, so the cap never fires on
    * hash-collision noise; only genuine same-direction clusters (exact-dup
    * territory) can exceed it, and those are the groups it exists to
    * bound. Excludes nothing at the test scales. */
  val NeardupBandCap = 200
  private val neardupBits: IndexedSeq[(Int, Int)] = {
    val all = for { p <- 0 until 64; q <- p + 1 until 64 } yield (p, q)
    (0 until NeardupBands * NeardupRowsPerBand).map(i => all((i * 997) % all.size))
  }

  /** Register the q41 band projection as `graft_sign_bands` with the
    * 32×16 geometry baked in (see [[graft.expr.SignBands]] — the unrolled
    * 512-CASE SQL form blew Janino's 64 KB method limit and fell back to
    * interpreted evaluation; the expression codegens a compact loop). */
  private def registerNeardupBands(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sign_bands",
      { exprs =>
        require(exprs.length == 1, "graft_sign_bands takes exactly 1 argument")
        graft.expr.SignBands(exprs.head, NeardupBands, NeardupRowsPerBand,
          neardupBits.flatMap { case (p, q) => Seq(p, q) })
      },
      "built-in")
  private def neardupBandDuck(c: String, b: Int): String =
    (0 until NeardupRowsPerBand).map { j =>
      val (p, q) = neardupBits(b * NeardupRowsPerBand + j)
      s"(CASE WHEN $c[${p + 1}] > $c[${q + 1}] THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  /** Oracle mirror of the full pre-cap band explode — one SELECT per
    * band, UNION ALL'd; shared by the q41 oracle, q82's cap report and
    * (over a subset relation) q164's incremental base chain. */
  private[ops] def neardupBandDuckUnion: String = neardupBandDuckUnionFrom()

  private[ops] def neardupBandDuckUnionFrom(src: String = "embeddings"): String =
    (0 until NeardupBands)
      .map(b => s"SELECT vec_id, $b AS band_idx, ${neardupBandDuck("embedding", b)} AS band_val FROM $src")
      .mkString(" UNION ALL ")

  /** Pre-cap (vec_id, band_idx, band_val) sign-LSH band rows — the frame
    * [[Dedup.coldBands]] filters inside [[embeddingNeardupPairs]];
    * exposed for the q82 cap report. */
  private[ops] def neardupBandRows(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    registerNeardupBands(s)
    emb.repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"),
        posexplode(expr("graft_sign_bands(embedding)"))
          .as(Seq("band_idx", "band_val")))
  }

  private def bucketExprSpark(c: String) =
    lshPairs.zipWithIndex.map { case ((p, q), i) =>
      s"(CASE WHEN element_at($c, $p) > element_at($c, $q) THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  private def bucketExprDuck(c: String) =
    lshPairs.zipWithIndex.map { case ((p, q), i) =>
      s"(CASE WHEN $c[$p] > $c[$q] THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  /** Embeddings with the cast-to-double array and its norm materialized,
    * spread across all cores: the testdata parquet is a single row group,
    * so without the repartition every brute-force or nested-loop join
    * below would run on ONE task regardless of cluster size. */
  private def normedFrom(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    graft.expr.VectorExpressions.register(s)
    df.repartition(s.sparkContext.defaultParallelism)
      .withColumn("de", expr(toDouble))
      .withColumn("nrm", expr(s"sqrt(${dotExpr("de", "de")})"))
  }

  private def normed(s: SparkSession, dir: String): DataFrame =
    normedFrom(Tables.load(s, dir, "embeddings"))

  /** The q41 pipeline over a raw (vec_id, embedding) frame, exposed for
    * spec-level recall tests (planting high-cosine near-dups and
    * asserting the banding finds them). `minCos` is the exact-verify
    * display threshold; recall at a given cosine is governed by the
    * banding (see [[NeardupBands]]): ≈94 % at cos 0.9, a few percent for
    * borderline cos ≈ 0.5 pairs — wide bands deliberately trade the
    * borderline tail for bounded group sizes at corpus scale. */
  def embeddingNeardupPairs(emb: DataFrame, minCos: Double): DataFrame = {
    registerNeardupBands(emb.sparkSession)
    val n = normedFrom(emb)
      .withColumn("band_vals", expr("graft_sign_bands(embedding)"))
      .transform(TransientCache.scopedDF)
    val bands = Dedup.coldBands(
      n.select(col("vec_id"),
        posexplode(col("band_vals")).as(Seq("band_idx", "band_val"))),
      NeardupBandCap)
    val cands = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
    val a = n.select(col("vec_id").as("va"), col("de").as("ea"),
      col("nrm").as("na"))
    val b = n.select(col("vec_id").as("vb"), col("de").as("eb"),
      col("nrm").as("nb"))
    cands.join(a, "va").join(b, "vb")
      .withColumn("cos", expr(dotExpr("ea", "eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("va"), col("vb"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("va"), col("vb"))
  }

  /** [[embeddingNeardupPairs]] served from the fingerprint-keyed
    * parquet cache: the banded self-join + exact verify is
    * deterministic per (corpus, threshold) and was re-run inline by
    * each of its three consumers (q41, q161, q176). The threshold is
    * folded into the cache name so a different-threshold caller can
    * never read this frame; consumers re-apply their own ORDER BY. */
  def embeddingNeardupPairsCached(s: SparkSession, dir: String,
      minCos: Double): DataFrame =
    FrameCache.serve(s, FrameCache.path(
        s"ndpairs${math.round(minCos * 100)}", NeardupPairsCacheV,
        corpusFingerprint(s, dir))) {
      embeddingNeardupPairs(Tables.load(s, dir, "embeddings"), minCos)
    }

  private val NeardupPairsCacheV = 1

  /** q159 hard-negative band: exact ranks [[HardNegFrom]]..[[HardNegTo]]
    * per query after the near-dup ceiling drop — the slice just below
    * q35's top-3 positives. */
  val HardNegFrom = 4
  val HardNegTo = 11

  /** Candidates at or above this cosine are treated as unlabeled
    * POSITIVES and excluded from the q159 negative band (the
    * dense-retrieval denoising rule). */
  val HardNegDupCos = 0.95

  /** Neighbors kept per node in the q151 kNN graph. Small by design: the
    * graph consumers (SemDeDup-style pruning, graph clustering, diversity
    * walks) want a sparse graph, and per-node output is k rows whatever
    * the corpus size. */
  val KnnGraphK = 4

  /** Approximate k-nearest-neighbor GRAPH over the corpus: for every
    * vector, its top-k most-cosine-similar neighbors among the sign-LSH
    * candidates — the q41 banding with the threshold removed and a
    * per-node rank window on top. This is the substrate structure behind
    * SemDeDup-style semantic pruning, kNN-graph clustering and
    * diversity-aware sampling: unlike q41 (a global near-dup pair list)
    * every node gets neighbors, however far, as long as the banding
    * surfaces a candidate.
    *
    * Scale shape: candidates come from the capped (band_idx, band_val)
    * equi self-join — never all pairs — and are SYMMETRIZED (each
    * unordered candidate feeds both endpoints' neighbor lists) before
    * exact cosine verification via two vec_id equi-joins. The rank
    * window partitions by node over its own candidate list, whose size
    * is bounded by bands × cap, not corpus size. Parity: cosines are
    * sequential-fold bitwise-identical in both engines, so ordering by
    * raw (cos DESC, neighbor) cannot diverge; output rounds to the 4-dp
    * display grid only after ranking. */
  /** [[knnGraph]] over a data dir's embeddings table, served from the
    * fingerprint-keyed parquet cache ([[FrameCache]]): the banded
    * cosine + rank-window build is the dominant substrate cost of
    * q151, q157 and q179 — computed once per corpus per k, the three
    * consumers read (vec_id, rank, neighbor, cos_sim) back with full
    * pushdown instead of re-running the pipeline. Order is NOT
    * preserved by the parquet roundtrip; order-sensitive consumers
    * re-sort (q151's def does). */
  def knnGraphCached(s: SparkSession, dir: String,
      k: Int = KnnGraphK): DataFrame =
    FrameCache.serve(s,
        FrameCache.path(s"knn$k", KnnCacheV, corpusFingerprint(s, dir))) {
      knnGraph(Tables.load(s, dir, "embeddings"), k)
    }

  /** Cache-format versions ([[FrameCache.path]]): bump with any
    * semantic change to the owning builder (sign-band constants,
    * [[NeardupBandCap]], rank tie-breaks, rounding grids, eval-window
    * ids, thresholds, IVF build params). */
  private val KnnCacheV = 1
  private val IvfCacheV = 1
  private val SemDeconCacheV = 1
  private val GroundTruthCacheV = 1
  private val PqTopkCacheV = 1

  def knnGraph(emb: DataFrame, k: Int = KnnGraphK): DataFrame = {
    registerNeardupBands(emb.sparkSession)
    val n = normedFrom(emb)
      .withColumn("band_vals", expr("graft_sign_bands(embedding)"))
      .transform(TransientCache.scopedDF)
    val bands = Dedup.coldBands(
      n.select(col("vec_id"),
        posexplode(col("band_vals")).as(Seq("band_idx", "band_val"))),
      NeardupBandCap)
    val cands = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
    val sym = cands.union(cands.select(col("vb").as("va"), col("va").as("vb")))
    val a = n.select(col("vec_id").as("va"), col("de").as("ea"),
      col("nrm").as("na"))
    val b = n.select(col("vec_id").as("vb"), col("de").as("eb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy(col("va"))
      .orderBy(col("cos").desc, col("vb"))
    sym.join(a, "va").join(b, "vb")
      .withColumn("cos", expr(dotExpr("ea", "eb")) / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("va").as("vec_id"), col("rank").cast("long").as("rank"),
        col("vb").as("neighbor"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** q179 over a (vec_id, embedding, label) frame: hold-out kNN label
    * vote — the label-quality / pseudo-labeling audit (the evaluation
    * half of Zhu & Ghahramani 2002-style label propagation, cut to one
    * synchronous round so the oracle stays a plain join). A
    * deterministic 20% of vectors (md5('lp:'||vec_id) % 5 = 0) hide
    * their label; each predicts the plurality label among its
    * [[KnnGraphK]] q151-graph neighbors that kept theirs (ties → the
    * smallest label; no labeled neighbor → −1). Output is the
    * (true_label, pred_label) confusion matrix — the diagonal mass is
    * the embedding-space label-consistency score that decides whether
    * labels are trustworthy enough to train a filter on.
    *
    * Scale shape: rides the q151 banded kNN graph (N·k edges); the
    * vote is two equi-joins plus a map-side-combinable count and a
    * per-vector ≤K-row rank window; confusion rollup is ≤ labels²
    * rows. No work beyond the graph build is corpus-quadratic. */
  def knnLabelEval(emb: DataFrame,
      graph: Option[DataFrame] = None): DataFrame = {
    val lbl = emb.select(col("vec_id"), col("label").cast("long").as("label"),
      expr("""cast(conv(substring(md5(concat('lp:',
           cast(vec_id as string))), 1, 14), 16, 10) as long) % 5""")
        .as("hb"))
    val seeds = lbl.filter(col("hb") =!= 0)
      .select(col("vec_id").as("neighbor"), col("label").as("n_label"))
    val held = lbl.filter(col("hb") === 0)
      .select(col("vec_id"), col("label").as("true_label"))
    val g = graph.getOrElse(knnGraph(emb))
      .select(col("vec_id"), col("neighbor"))
    val votes = held.join(g, "vec_id").join(seeds, Seq("neighbor"))
      .groupBy(col("vec_id"), col("true_label"), col("n_label"))
      .agg(count(lit(1)).as("nv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("nv").desc, col("n_label"))
    val pred = votes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("n_label").as("pred_label"))
    held.join(pred, Seq("vec_id"), "left")
      .na.fill(-1L, Seq("pred_label"))
      .groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("true_label"), col("pred_label"))
  }

  /** q167's sweep over a (vec_id, embedding) frame — exposed for spec
    * use and spliced by q171's operating-point pick. Per 500-bp cosine
    * bucket over the capped sign-LSH candidate set: pairs at the bucket,
    * docs whose best pair sits there, cumulative ≥-threshold mass. */
  /** [[cosineSweep]] over a data dir's embeddings table, served from
    * the fingerprint-keyed parquet cache ([[FrameCache]]): the banded
    * candidate join + exact cosine pass behind the histogram is the
    * dominant cost of q167 and q171 — built once per corpus, both
    * consumers read the ≤~40-row bucket frame back. Order is NOT
    * preserved by the roundtrip; q167 re-sorts. */
  def cosineSweepCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s,
        FrameCache.path("sweep", SweepCacheV, corpusFingerprint(s, dir))) {
      cosineSweep(Tables.load(s, dir, "embeddings"))
    }

  /** Cache-format version ([[FrameCache.path]]): bump with any semantic
    * change to the sweep (bucket width, band constants, cap, the
    * best-pair doc convention). */
  private val SweepCacheV = 1

  def cosineSweep(emb: DataFrame): DataFrame = {
    registerNeardupBands(emb.sparkSession)
    val n = normedFrom(emb)
      .withColumn("band_vals", expr("graft_sign_bands(embedding)"))
      .transform(TransientCache.scopedDF)
    val bands = Dedup.coldBands(
      n.select(col("vec_id"),
        posexplode(col("band_vals")).as(Seq("band_idx", "band_val"))),
      NeardupBandCap)
    val cands = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
    val a = n.select(col("vec_id").as("va"), col("de").as("ea"),
      col("nrm").as("na"))
    val b = n.select(col("vec_id").as("vb"), col("de").as("eb"),
      col("nrm").as("nb"))
    // persisted: both histograms fold the same scored pair frame —
    // unpersisted, the candidate+verify pipeline ran twice per cache
    // build (the q141 lesson)
    val pj = cands.join(a, "va").join(b, "vb")
      .withColumn("cos",
        expr(dotExpr("ea", "eb")) / (col("na") * col("nb")))
      .withColumn("c_bp", expr(
        "CAST(floor(cos * 10000) AS BIGINT) div 500 * 500"))
      .transform(TransientCache.scopedDF)
    val pairHist = pj.groupBy(col("c_bp"))
      .agg(count(lit(1)).as("n_pairs_at"))
    val docHist = pj.groupBy(col("vb"))
      .agg(max(col("c_bp")).as("c_bp"))
      .groupBy(col("c_bp")).agg(count(lit(1)).as("n_docs_at"))
    val tot = emb.agg(count(lit(1)).cast("long").as("n_total"))
    val wDesc = Window.orderBy(col("c_bp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pairHist.join(docHist, Seq("c_bp"), "full_outer")
      .na.fill(0L, Seq("n_pairs_at", "n_docs_at"))
      .withColumn("pairs_ge",
        sum(col("n_pairs_at")).over(wDesc).cast("long"))
      .withColumn("docs_ge",
        sum(col("n_docs_at")).over(wDesc).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("c_bp"), col("n_pairs_at"), col("n_docs_at"),
        col("pairs_ge"), col("docs_ge"),
        expr("docs_ge * 10000L div n_total").as("docs_ge_bp"))
      .orderBy(col("c_bp"))
  }

  /** q167's oracle chain ending at `sweep(c_bp, n_pairs_at, n_docs_at,
    * pairs_ge, docs_ge, docs_ge_bp)` — spliced by q167 and q171. */
  private def cosineSweepDuckCtes: String =
    s"""${knnGraphDuckCtesFrom()},
           ps AS (
             SELECT c.va, c.vb,
               ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
                 AS cos
             FROM cands c JOIN n a ON c.va = a.vec_id
                          JOIN n b ON c.vb = b.vec_id),
           pj AS (
             SELECT va, vb,
               CAST(floor(cos * 10000) AS BIGINT) // 500 * 500 AS c_bp
             FROM ps),
           ph AS (SELECT c_bp, count(*) AS n_pairs_at FROM pj GROUP BY c_bp),
           dh AS (
             SELECT c_bp, count(*) AS n_docs_at FROM (
               SELECT vb, max(c_bp) AS c_bp FROM pj GROUP BY vb)
             GROUP BY c_bp),
           tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total
                   FROM embeddings),
           m AS (
             SELECT coalesce(ph.c_bp, dh.c_bp) AS c_bp,
               coalesce(ph.n_pairs_at, 0) AS n_pairs_at,
               coalesce(dh.n_docs_at, 0) AS n_docs_at
             FROM ph FULL OUTER JOIN dh ON ph.c_bp = dh.c_bp),
           sweep AS (
             SELECT c_bp, n_pairs_at, n_docs_at,
               CAST(sum(n_pairs_at) OVER (ORDER BY c_bp DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS pairs_ge,
               CAST(sum(n_docs_at) OVER (ORDER BY c_bp DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS docs_ge,
               CAST(sum(n_docs_at) OVER (ORDER BY c_bp DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 * 10000 // (SELECT n_total FROM tot) AS docs_ge_bp
             FROM m)"""

  /** q171 loss budgets (basis points of docs a dedup drop may affect). */
  val OperatingBudgetsBp: Seq[Long] = Seq(100L, 250L, 500L, 1000L)

  /** q164: incremental kNN-graph maintenance under the q98 delta
    * convention (base = vec_id % 5 ≠ 4, delta = vec_id % 5 = 4). The
    * stored artifact is the base graph's PAIR LIST (scores recomputed
    * bitwise at merge time, so ranking never depends on a rounded
    * stored float); the update scopes candidate generation to pairs
    * TOUCHING the delta and re-ranks each node over (its stored top-k ∪
    * its delta candidates). That merge is EXACT for monotone candidate
    * growth: a base candidate outside the stored top-k was worse than
    * the k-th base neighbor and adding candidates only raises the k-th
    * bar, so it can never re-enter — KnnIncrSpec pins incremental ≡
    * full-rebuild whenever no band crosses the hot cap between runs.
    * When the delta DOES push a band over the cap, previously-emitted
    * base pairs are not retracted (the q33 streaming non-retraction
    * contract, same trade, documented not hidden). Scale: the only new
    * work per ingest is the delta's band rows, the delta-touching
    * band join and a per-affected-node window over ≤ k + delta-cand
    * rows — never a full-graph rebuild. */
  def knnGraphIncremental(emb: DataFrame, k: Int = KnnGraphK): DataFrame = {
    val (nAll, bandRows) = incrPrep(emb)
    mergeDelta(nAll, bandRows, incrBasePairs(nAll, bandRows, k), k)
  }

  /** [[knnGraphIncremental]] over a data dir with the STORED base graph
    * served from the fingerprint cache ([[FrameCache]]) — the q164
    * serve path. With the base pair list read back from parquet, the
    * per-run cost is exactly what a real ingest pays: the delta band
    * rows joined against the full band table (delta-sized build side,
    * never the all-pairs self-join) plus the affected-node merge
    * windows. Bit-identical to the inline build (cosines are
    * recomputed at merge time from the raw doubles, never read from a
    * stored rounded float). */
  def knnGraphIncrementalCached(s: SparkSession, dir: String,
      k: Int = KnnGraphK): DataFrame = {
    val (nAll, bandRows) = incrPrep(Tables.load(s, dir, "embeddings"))
    val g0 = FrameCache.serve(s,
        FrameCache.path(s"knnbase$k", KnnCacheV, corpusFingerprint(s, dir))) {
      incrBasePairs(nAll, bandRows, k)
    }
    mergeDelta(nAll, bandRows, g0, k)
  }

  // band values depend only on the vector itself, so ONE banding pass
  // serves both sides: the base chain filters its rows out (and
  // re-caps on base counts), the delta chain caps on full counts —
  // the bench caught the first cut computing graft_sign_bands twice
  private def incrPrep(emb: DataFrame): (DataFrame, DataFrame) = {
    registerNeardupBands(emb.sparkSession)
    val nAll = normedFrom(emb)
      .withColumn("band_vals", expr("graft_sign_bands(embedding)"))
      .transform(TransientCache.scopedDF)
    val bandRows = nAll.select(col("vec_id"),
        posexplode(col("band_vals")).as(Seq("band_idx", "band_val")))
      .transform(TransientCache.scopedDF)
    (nAll, bandRows)
  }

  /** The stored artifact: the base graph's top-k PAIR LIST (base =
    * vec_id % 5 ≠ 4, base-only candidates, base-only caps). */
  private def incrBasePairs(nAll: DataFrame, bandRows: DataFrame,
      k: Int): DataFrame = {
    val baseBands = Dedup.coldBands(
      bandRows.filter(pmod(col("vec_id"), lit(5)) =!= 4), NeardupBandCap)
    val baseCands = baseBands.as("x")
      .join(baseBands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
    val baseSym = baseCands
      .union(baseCands.select(col("vb").as("va"), col("va").as("vb")))
    val a = nAll.select(col("vec_id").as("va"), col("de").as("ea"),
      col("nrm").as("na"))
    val b = nAll.select(col("vec_id").as("vb"), col("de").as("eb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy(col("va"))
      .orderBy(col("cos").desc, col("vb"))
    baseSym.join(a, "va").join(b, "vb")
      .withColumn("cos", expr(dotExpr("ea", "eb")) / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("va"), col("vb"))
  }

  /** The per-ingest update: delta-touching candidates from a
    * DELTA-ROWS × ALL-ROWS band equi-join (the delta is the build
    * side — at scale this is the whole point: candidate generation
    * costs |delta bands| × matches, never the full self-join; the
    * normalized (min, max) pair set is identical to filtering the full
    * candidate list for delta-touching pairs), then every affected
    * node re-ranks over (stored top-k ∪ delta candidates). */
  private def mergeDelta(nAll: DataFrame, bandRows: DataFrame,
      g0: DataFrame, k: Int): DataFrame = {
    val allCold = Dedup.coldBands(bandRows, NeardupBandCap)
      .transform(TransientCache.scopedDF)
    val deltaRows = allCold.filter(pmod(col("vec_id"), lit(5)) === 4)
    val dcands = deltaRows.as("x")
      .join(allCold.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(least(col("x.vec_id"), col("y.vec_id")).as("va"),
        greatest(col("x.vec_id"), col("y.vec_id")).as("vb"))
      .distinct()
    val a = nAll.select(col("vec_id").as("va"), col("de").as("ea"),
      col("nrm").as("na"))
    val b = nAll.select(col("vec_id").as("vb"), col("de").as("eb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy(col("va"))
      .orderBy(col("cos").desc, col("vb"))
    val pool = g0
      .union(dcands)
      .union(dcands.select(col("vb").as("va"), col("va").as("vb")))
    pool.join(a, "va").join(b, "vb")
      .withColumn("cos", expr(dotExpr("ea", "eb")) / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("va").as("vec_id"), col("rank").cast("long").as("rank"),
        col("vb").as("neighbor"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** Shared oracle CTE chain for the q151 kNN graph (ends at
    * `${p}ranked(va, vb, cos, rank)` — pre-filter, so consumers pick
    * their own rank cut): band rows → hot-cap filter → candidate pairs
    * → symmetrize → exact cosine → per-node rank window. Spliced by
    * q151 and q157 (defaults) and twice by q164 (base subset + full). */
  private def knnGraphDuckCtes: String = knnGraphDuckCtesFrom()

  private def knnGraphDuckCtesFrom(src: String = "embeddings",
      p: String = ""): String =
    s"""${p}n AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
                    FROM $src),
           ${p}bands0 AS (${neardupBandDuckUnionFrom(src)}),
           ${p}hot AS (
             SELECT band_idx, band_val FROM ${p}bands0
             GROUP BY band_idx, band_val HAVING count(*) > $NeardupBandCap),
           ${p}bands AS (
             SELECT b.* FROM ${p}bands0 b
             ANTI JOIN ${p}hot h USING (band_idx, band_val)),
           ${p}cands AS (
             SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
             FROM ${p}bands x JOIN ${p}bands y
               ON x.band_idx = y.band_idx AND x.band_val = y.band_val
              AND x.vec_id < y.vec_id),
           ${p}sym AS (SELECT va, vb FROM ${p}cands
                   UNION ALL SELECT vb AS va, va AS vb FROM ${p}cands),
           ${p}scored AS (
             SELECT s.va, s.vb,
               ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
                 AS cos
             FROM ${p}sym s JOIN ${p}n a ON s.va = a.vec_id
                      JOIN ${p}n b ON s.vb = b.vec_id),
           ${p}ranked AS (
             SELECT va, vb, cos,
               row_number() OVER (PARTITION BY va
                 ORDER BY cos DESC, vb) AS rank
             FROM ${p}scored)"""

  /** q157: connected components over the MUTUAL subset of the q151
    * graph (edges where each endpoint ranks the other in its top-k —
    * the symmetrization that strips one-way hub fans). Output one row
    * per vector that has at least one mutual neighbor. */
  def semanticComponents(emb: DataFrame, k: Int = KnnGraphK,
      graph: Option[DataFrame] = None): DataFrame = {
    // the N·k edge list feeds BOTH sides of the mutual self-join —
    // without a materialized edge list each side re-runs the whole
    // banded kNN pipeline (bands, cap, cosine, window), measured 6×
    // slower at sf0.1. When the parquet-cached graph is supplied
    // ([[knnGraphCached]], the q157 path) both sides are cheap cached
    // reads; the emb path persists the tiny two-long edge frame
    // (consumed entirely before the CC loop's first checkpoint, whose
    // completion then auto-releases it via TransientCache).
    val g = graph match {
      case Some(cached) =>
        cached.select(col("vec_id").as("a"), col("neighbor").as("b"))
      case None => knnGraph(emb, k)
        .select(col("vec_id").as("a"), col("neighbor").as("b"))
        .transform(TransientCache.scopedDF)
    }
    Dedup.connectedComponents(mutualEdges(g))
      .select(col("doc_id").as("vec_id"), col("cluster_id"),
        col("cluster_size"))
      .orderBy(col("vec_id"))
  }

  /** q157's symmetrization, exposed as THE definition of a mutual edge
    * (each endpoint ranks the other in its top-k, deduped by a < b):
    * both the semantic-components query and the `graft.GraphStats`
    * endgame-crossover diagnostic go through here, so the diagnostic
    * can never drift onto a different graph than the pillar it probes.
    * Input: a directed (a, b) neighbor-edge frame; output: undirected
    * (da, db) mutual pairs. */
  def mutualEdges(g: DataFrame): DataFrame =
    g.as("x")
      .join(g.as("y"),
        col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
          col("x.a") < col("x.b"))
      .select(col("x.a").as("da"), col("x.b").as("db"))

  /** Number of IVF cells for q43/q97 (deterministic centroids = the 16
    * smallest-id vectors, the q43 convention). */
  private val IvfCells = 16

  /** Build and persist the q43 IVF structure: `centroids.parquet` (16
    * rows: cid, cde, cnrm) and `cells.parquet` — the inverted file
    * (vec_id, de, nrm) PARTITIONED BY cell, so a probe of 2 cells reads
    * 2/16ths of the corpus from disk (partition pruning / dynamic
    * partition pruning does the skipping at scale). A real ANN service
    * builds once and serves many queries; q43 rebuilt this per run.
    * Doubles round-trip parquet bitwise, so the persisted path returns
    * BYTE-IDENTICAL results to the inline computation (spec-pinned). */
  private[graft] def writeIvfIndex(emb: DataFrame, outDir: String,
      fingerprint: Option[String] = None): Unit = {
    val n = normedFrom(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = n.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cid"), col("de").as("cde"),
        col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val corpusCells = n.join(broadcast(cents))
      .withColumn("ccos", expr(dotExpr("de", "cde")) / (col("nrm") * col("cnrm")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("de"), col("nrm"), col("cid").as("cell"))
    // cells FIRST, then the manifest, centroids LAST: q97/q98 gate the
    // "index exists" check on centroids.parquet, so a build killed
    // mid-way leaves no completion marker and the next run rebuilds
    // instead of trusting a half-written inverted file
    corpusCells.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/cells.parquet")
    fingerprint.foreach(writeIvfManifest(emb.sparkSession, outDir, _))
    cents.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/centroids.parquet")
    n.unpersist()
  }

  /** Write `manifest.json` carrying the corpus fingerprint an index dir
    * is validated against before serving (shared by the one-shot build
    * and q132's compaction). */
  private def writeIvfManifest(s: SparkSession, dir: String,
      fp: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/manifest.json")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"corpus":"$fp"}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Content fingerprint of a data dir's embeddings table, resolved
    * through the HADOOP FileSystem (so it works identically for local
    * paths and cluster-visible HDFS/S3 URIs). embeddings.parquet may be
    * a single file OR a Spark-written DIRECTORY whose own length/mtime
    * are content-independent — the key folds in every entry's (name,
    * length, mtime) so a rewritten part file changes the fingerprint.
    * This string is both the temp-dir cache key AND the manifest value
    * a persisted index is validated against before serving. */
  private[graft] def corpusFingerprint(s: SparkSession, dir: String,
      table: String = "embeddings"): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val entries =
      if (st.isDirectory)
        fs.listStatus(p).filter(_.isFile).sortBy(_.getPath.getName)
      else Array(st)
    val key = s"$dir/$table" + entries
      .map(e => s"${e.getPath.getName}:${e.getLen}:${e.getModificationTime}")
      .mkString("#")
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The explicit `spark.graft.ivfIndexDir` session conf, if set. */
  private def ivfIndexConf(s: SparkSession): Option[String] =
    s.conf.getOption("spark.graft.ivfIndexDir").filter(_.nonEmpty)

  /** Where q97 finds (or builds) the persisted index for a given data
    * dir: the `spark.graft.ivfIndexDir` session conf when set, else a
    * deterministic temp-dir cache keyed by [[corpusFingerprint]] — so a
    * rewritten corpus gets a fresh index instead of silently serving a
    * stale one (an explicit `graft.BuildIndex` run is the production
    * path; the on-demand build keeps the query self-contained). */
  private def ivfIndexDirFor(s: SparkSession, dir: String): String =
    ivfIndexConf(s).getOrElse(
      FrameCache.path("ivf", IvfCacheV, corpusFingerprint(s, dir)))

  /** Ensure a valid persisted index at `idx`, building (or rebuilding)
    * if needed. Three production hazards are closed here:
    *
    *   - existence is resolved via the HADOOP FileSystem of the index
    *     path, so a cluster-visible `spark.graft.ivfIndexDir` (HDFS/S3)
    *     gets real build-once behavior — `java.io.File.exists` was
    *     always false there and silently rebuilt every run;
    *   - an existing index must carry a `manifest.json` whose corpus
    *     fingerprint matches the CURRENT corpus — a stale or mismatched
    *     index dir is rebuilt, never silently served as wrong neighbors.
    *     A MANIFEST-LESS dir is trusted only when the path came from the
    *     fingerprint-keyed temp cache (`fromConf = false` — the path
    *     itself encodes the corpus content, so a pre-manifest cache
    *     entry is provably for this corpus); an explicit
    *     `spark.graft.ivfIndexDir` pointing at a non-empty manifest-less
    *     dir could be a HAND-BUILT index over a different corpus — it is
    *     neither served unvalidated nor destroyed-and-rebuilt in place:
    *     the call FAILS FAST and tells the operator how to resolve it
    *     (documented in DESIGN.md alongside the conf knob);
    *   - the build lands in a process-unique temp dir and is RENAMED
    *     into place: two drivers racing the same cache dir (parallel
    *     Verify/Bench against one data dir) cannot interleave part
    *     files into one torn index — rename is atomic per FS, and the
    *     loser adopts the winner's completed index (the manifest is
    *     re-checked against the CURRENT dir contents immediately before
    *     the delete, so a fresh index installed by a racing builder
    *     while ours was building is adopted, not torn down). */
  private def ensureIvfIndex(s: SparkSession, idx: String,
      fingerprint: String, fromConf: Boolean)(build: String => Unit): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val fs = idxPath.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(s"$idx/centroids.parquet")
    val manifest = new org.apache.hadoop.fs.Path(s"$idx/manifest.json")
    // An explicit spark.graft.ivfIndexDir pointing at a POPULATED dir
    // with no manifest.json could be a hand-built external index (any
    // layout, not just ours) — destroying and rebuilding it in place
    // would eat the user's artifact, and serving it unvalidated could
    // answer from the wrong corpus. Refuse both, fail fast, and make
    // the operator decide: delete the dir, add a manifest.json carrying
    // the corpus fingerprint, or unset the conf to use the
    // fingerprint-keyed cache (whose path itself vouches for content).
    if (fromConf && fs.exists(idxPath) && !fs.exists(manifest)
        && fs.listStatus(idxPath).nonEmpty)
      throw new IllegalStateException(s"[ivf] $idx (explicit " +
        "spark.graft.ivfIndexDir) is non-empty but has no manifest.json " +
        "— refusing to serve it unvalidated AND refusing to rebuild " +
        "over it (it may be a hand-built index this engine did not " +
        "produce). Delete the directory, add a manifest.json containing " +
        "the corpus fingerprint, or unset spark.graft.ivfIndexDir to " +
        "use the fingerprint-keyed cache.")
    def manifestOk: Boolean =
      if (!fs.exists(manifest)) {
        if (fromConf) false // unreachable serve-side (guard above); a
          // manifest-less dir appearing MID-RACE is treated as stale
        else {
          System.err.println(s"[ivf] $idx has no manifest.json (pre-manifest " +
            "cache entry) — the fingerprint-keyed path vouches for it")
          true
        }
      } else
        try {
          val in = fs.open(manifest)
          val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
          txt.contains(fingerprint)
        } catch {
          // an unreadable/corrupt manifest (e.g. checksum mismatch after
          // an out-of-band edit) is indistinguishable from stale: rebuild
          case _: java.io.IOException => false
        }
    val present = fs.exists(marker)
    val stale = present && !manifestOk
    if (!present || stale) {
      val tmp = new org.apache.hadoop.fs.Path(
        idx + ".build-" + java.util.UUID.randomUUID().toString.take(8))
      build(tmp.toString)
      // rename ONLY into a non-existent destination (renaming onto an
      // existing directory has move-INTO semantics on some filesystems):
      // clear an empty/partial/stale target first. The manifest is
      // RE-EVALUATED here, not reused from the pre-build check: a racing
      // builder may have installed a completed fresh index while ours
      // was building (including over a dir we judged stale), and that
      // winner must be adopted — deleting it would open a no-index
      // window for cross-driver readers and waste the winning build.
      if (fs.exists(idxPath)) {
        if (fs.exists(marker) && manifestOk) { fs.delete(tmp, true); return }
        fs.delete(idxPath, true)
      }
      Option(idxPath.getParent).foreach(fs.mkdirs)
      if (!fs.rename(tmp, idxPath)) {
        if (fs.exists(marker)) fs.delete(tmp, true)
        else throw new IllegalStateException(
          s"could not install IVF index at $idx (tmp build at $tmp)")
      }
    }
  }

  /** Probe-and-serve tail shared by q97/q98: queries score against the
    * (persisted) centroids, probe their 2 nearest cells, exact top-3
    * within the probed cells' members. One definition per engine —
    * the oracle counterpart is [[ivfDuckSql]]. */
  private def ivfServe(cents: DataFrame, cells: DataFrame,
      queries: DataFrame): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = queries.join(broadcast(cents))
      .withColumn("ccos", expr(dotExpr("qe", "cde")) / (col("qn") * col("cnrm")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= 2)
      .select(col("query_id"), col("qe"), col("qn"), col("cid").as("cell"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(dotExpr("qe", "de")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Shared q43/q97/q98 oracle: DuckDB replays the IVF math inline —
    * for q97/q98 this doubles as the proof that the PERSISTED (and
    * incrementally appended) index serves the same answers as the
    * inline computation. `centsWhere` selects the seed set (q98
    * restricts it to the base corpus). */
  private def ivfDuckSql(centsWhere: String = s"vec_id < $IvfCells"): String =
    s"""WITH n AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
                        FROM embeddings),
             cents AS (SELECT vec_id AS cid, embedding AS cde, nrm AS cnrm
                       FROM n WHERE $centsWhere),
             assigned AS (
               SELECT n.vec_id, n.embedding, n.nrm, cents.cid,
                 row_number() OVER (PARTITION BY n.vec_id ORDER BY
                   ${duckDot("n.embedding", "cents.cde")} / (n.nrm * cents.cnrm) DESC,
                   cents.cid) AS crank
               FROM n CROSS JOIN cents),
             corpus_cells AS (
               SELECT vec_id, embedding, nrm, cid AS cell
               FROM assigned WHERE crank = 1),
             query_probes AS (
               SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, cid AS cell
               FROM assigned WHERE vec_id < 10 AND crank <= 2),
             cands AS (
               SELECT q.query_id, c.vec_id,
                 ${duckDot("q.qe", "c.embedding")} / (q.qn * c.nrm) AS cos
               FROM corpus_cells c JOIN query_probes q ON c.cell = q.cell
               WHERE c.vec_id <> q.query_id),
             ranked AS (
               SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rank
               FROM cands)
             SELECT query_id, vec_id AS neighbor_id, rank,
               round(cos, 4) AS cos_sim
             FROM ranked WHERE rank <= 3
             ORDER BY query_id, rank"""

  /** Query-set size shared by the top-k family (q35/q36/q43/q97/q98/
    * q102 spell the `vec_id < 10` literal; q109 references this). */
  val NumQueries = 10

  /** The q116 sweep's probe counts — nprobe=2 is the q43/q97 serve
    * configuration, bracketed by one cheaper and two wider points so
    * the reported curve shows where recall saturates. */
  val IvfSweepProbes: Seq[Int] = Seq(1, 2, 4, 8)

  /** The q121 truncation sweep's prefix lengths — halving steps down
    * from the full 64-dim embedding; the last entry IS the ground
    * truth, pinning its recall row at 10000 bp. */
  val MatryoshkaDims: Seq[Int] = Seq(8, 16, 32, 64)

  /** q146's power-iteration geometry: embedding dimensionality, round
    * count, and the post-projection shift. After each round v is
    * renormalized to ~µ-scale (|v| ≤ ~2·10⁶), so a projection is at most
    * 64·|x|ₘₐₓ·2·10⁶ ≈ 7·10¹³; shifting it down 2²⁶ caps the per-term
    * outer product at ~5·10¹¹ and its corpus sum stays in int64 through
    * ~10⁷ vectors — raise the shift one bit per corpus doubling past
    * that. (Declared before `defs` — the oracle string is built
    * eagerly.) */
  val EmbDim = 64
  val PowerIterRounds = 8
  val PowerShift = 26

  /** q110's stand-in benchmark eval set: the vec_id slab [lo, hi) just
    * past the ANN query set — 32 vectors, fixed-size regardless of SF
    * (benchmarks don't grow with the training corpus), so the eval side
    * is an O(1) broadcast build everywhere. */
  val EvalSetLo = 10
  val EvalSetHi = 42

  /** q110's contamination cosine threshold. Calibrated to the synthetic
    * corpus (max corpus-vs-eval cosine ≈ 0.46 — the data has no planted
    * eval copies, so the report exercises the near-miss tail); flags a
    * handful of vectors at every SF. */
  val SemContamMinCos = 0.42

  /** [[semanticDecontam]] over a data dir's embeddings table, served
    * from the fingerprint cache ([[FrameCache]]): the corpus-vs-eval
    * broadcast scan is consumed by q110 AND the q117 ledger's decontam
    * verdict — built once per corpus. Order is NOT preserved; q110
    * re-sorts. v-bump with any change to the eval-window ids or the
    * threshold. */
  def semanticDecontamCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("semdecon", SemDeconCacheV,
        corpusFingerprint(s, dir))) {
      semanticDecontam(Tables.load(s, dir, "embeddings"))
    }

  /** The q110 operator over a raw (vec_id, embedding) frame, exposed so
    * SimilaritySpec can plant an eval near-copy and assert it is
    * flagged. See the q110 entry for the scale/parity story. */
  def semanticDecontam(emb: DataFrame): DataFrame = {
    val n = normedFrom(emb)
    val ev = n.filter(col("vec_id") >= EvalSetLo && col("vec_id") < EvalSetHi)
      .select(col("vec_id").as("eval_id"), col("de").as("ee"),
        col("nrm").as("en"))
    val wBest = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("eval_id"))
    val wCnt = Window.partitionBy(col("vec_id"))
    n.filter(col("vec_id") < EvalSetLo || col("vec_id") >= EvalSetHi)
      .join(broadcast(ev))
      .withColumn("cos", expr(dotExpr("de", "ee")) / (col("nrm") * col("en")))
      .filter(col("cos") >= SemContamMinCos)
      .withColumn("rk", row_number().over(wBest))
      .withColumn("n_eval_hits", count(lit(1)).over(wCnt))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("eval_id"),
        round(col("cos"), 4).as("cos_sim"), col("n_eval_hits"))
      .orderBy(col("vec_id"))
  }

  /** The q110 oracle's CTE chain, factored out (`sdc_`-prefixed names,
    * collision-free inside larger WITH blocks) so the extended curation
    * ledger (q117) reuses the decontamination definition verbatim. Ends
    * at `sdc_flagged(vec_id, eval_id, cos, rk, n_eval_hits)`: every
    * corpus-vs-eval cosine at or above [[SemContamMinCos]], ranked per
    * corpus vector. */
  private[ops] val semanticDecontamDuckCtes: String =
    s"""sdc_n AS (
             SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
             FROM embeddings),
           sdc_ev AS (
             SELECT vec_id AS eval_id, embedding AS ee, nrm AS en
             FROM sdc_n WHERE vec_id >= $EvalSetLo AND vec_id < $EvalSetHi),
           sdc_co AS (
             SELECT vec_id, embedding, nrm FROM sdc_n
             WHERE vec_id < $EvalSetLo OR vec_id >= $EvalSetHi),
           sdc_hits AS (
             SELECT sdc_co.vec_id, sdc_ev.eval_id,
               ${duckDot("sdc_co.embedding", "sdc_ev.ee")}
                 / (sdc_co.nrm * sdc_ev.en) AS cos
             FROM sdc_co CROSS JOIN sdc_ev),
           sdc_flagged AS (
             SELECT vec_id, eval_id, cos,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, eval_id) AS rk,
               count(*) OVER (PARTITION BY vec_id) AS n_eval_hits
             FROM sdc_hits WHERE cos >= $SemContamMinCos)"""

  /** q109's PQ top-3 by asymmetric distance, factored out so q102's
    * recall report can measure the PQ index like the others. Returns
    * (query_id, rank, neighbor_id, adc) with adc UNROUNDED — the q109
    * entry rounds for display. See the q109 entry for the parity and
    * scale story. */
  private[ops] def pqTopk(s: SparkSession, dir: String): DataFrame = {
    import Clustering.{PqSubspaces, PqSubDim}
    val emb = Tables.load(s, dir, "embeddings")
    val (codes, books) = Clustering.pqEncode(emb)
    val pivots = (0 until PqSubspaces).map(i =>
      max(when(col("s") === i, col("code"))).as(s"c$i"))
    val wide = codes.groupBy(col("vec_id"))
      .agg(pivots.head, pivots.tail: _*)
    val queries = emb
      .withColumn("de", expr("transform(embedding, x -> cast(x as double))"))
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("de").as("qe"))
    val luts = (0 until PqSubspaces).map { i =>
      queries.crossJoin(broadcast(books.filter(col("s") === i)))
        .select(col("query_id"), col("cid").as(s"c$i"),
          expr(Clustering.l1SparkExpr(
            s"slice(qe, ${i * PqSubDim + 1}, $PqSubDim)", "cde"))
            .as(s"d$i"))
    }
    val joined = (1 until PqSubspaces).foldLeft(
      wide.join(broadcast(luts(0)), Seq("c0"))) { (acc, i) =>
      acc.join(broadcast(luts(i)), Seq("query_id", s"c$i"))
    }
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("vec_id"))
    joined
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", col("d0") + col("d1") + col("d2") + col("d3"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adc"))
  }

  /** Exact L1 top-3 — the ground truth for the PQ recall row: PQ's ADC
    * approximates L1 distance (its codebooks are k-MEDIANS cells), so
    * its recall must be measured against the exact top-3 under the SAME
    * metric, not the cosine ground truth the dot-product methods use.
    * Same shape as [[bruteTopk]]: queries broadcast, corpus scanned
    * once, sequential L1 folds. */
  private[ops] def bruteL1Topk(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.load(s, dir, "embeddings")
      .withColumn("de", expr("transform(embedding, x -> cast(x as double))"))
      .select(col("vec_id"), col("de"))
    val queries = corpus
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("de").as("qe"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("vec_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("dist", expr(Clustering.l1SparkExpr("qe", "de")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** [[bruteTopk]] served from the fingerprint cache ([[FrameCache]]):
    * the exact cosine ground truth is a 30-row frame whose build is a
    * full corpus scan, and FOUR queries consume it (q35, q102's
    * ivf/lsh truth, q116's sweep truth, q188's sq truth) — built once
    * per corpus, read back in milliseconds. Order is NOT preserved by
    * the roundtrip; q35 re-sorts. */
  private[graft] def bruteTopkCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s,
        FrameCache.path("brutetop3", GroundTruthCacheV, corpusFingerprint(s, dir))) {
      bruteTopk(s, dir)
    }

  /** [[bruteL1Topk]] from the same cache (q102's pq truth). */
  private[graft] def bruteL1TopkCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s,
        FrameCache.path("brutel1top3", GroundTruthCacheV, corpusFingerprint(s, dir))) {
      bruteL1Topk(s, dir)
    }

  /** [[pqTopk]] served from the fingerprint cache: the PQ top-3 is a
    * [[NumQueries]]×3-row frame whose build retrains all four k-medians
    * codebooks and re-encodes the corpus — deterministic per corpus
    * (seed = first-K subvectors, lower-median update, fixed-order ADC
    * fold) and rebuilt identically by BOTH consumers (q109's display
    * rows, q102's pq recall row). Doubles roundtrip parquet bitwise;
    * q109 re-sorts, q102 joins. v-bump with any change to
    * [[Clustering.PqSubspaces]]/[[Clustering.PqSubDim]]/[[Clustering.K]],
    * the median rule, the L1 fold or the ADC tie-break. */
  private[graft] def pqTopkCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s,
        FrameCache.path("pqtop3", PqTopkCacheV, corpusFingerprint(s, dir))) {
      pqTopk(s, dir)
    }

  /** [[lshTopk]] / [[ivfTopk]] served from the fingerprint cache — the
    * [[pqTopkCached]] pattern extended to the other two ANN method
    * results: each is a ≤30-row deterministic frame (exact folds +
    * total tie-breaks) rebuilt identically by BOTH its consumers (q36 +
    * q102's lsh row; q43 + q102's ivf row). Consumers re-sort. */
  private[graft] def lshTopkCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s,
        FrameCache.path("lshtop3", AnnTopkCacheV, corpusFingerprint(s, dir))) {
      lshTopk(s, dir)
    }

  private[graft] def ivfTopkCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s,
        FrameCache.path("ivftop3", AnnTopkCacheV, corpusFingerprint(s, dir))) {
      ivfTopk(s, dir)
    }

  /** v-bump with any change to the sign-bucket/IVF probe math
    * (bucket pairs, [[IvfCells]], probe count, tie-breaks). */
  private val AnnTopkCacheV = 1

  /** Exact brute-force cosine top-3 for queries vec_id < 10 — the q35
    * operator, factored out so q102's recall report can reuse it as the
    * ground-truth side. The query side is the broadcast (small) side;
    * the corpus is scanned exactly once. */
  private[ops] def bruteTopk(s: SparkSession, dir: String): DataFrame = {
    val corpus = normed(s, dir)
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("de").as("qe"),
        col("nrm").as("qn"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(dotExpr("qe", "de")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Sign-bucket LSH approximate top-3 — the q36 operator, factored out
    * for q102. Candidates share the 4-bit sign bucket; exact cosine
    * within candidates. */
  private[graft] def lshTopk(s: SparkSession, dir: String): DataFrame = {
    val bucketed = normed(s, dir)
      .withColumn("bucket", expr(bucketExprSpark("embedding")))
    val queries = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("de").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val cands = bucketed.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(dotExpr("qe", "de")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF (2-of-16-cell probe) approximate top-3 — the q43 operator,
    * factored out for q102. Same math the persisted q97 index serves. */
  private[graft] def ivfTopk(s: SparkSession, dir: String): DataFrame = {
    val n = normed(s, dir)
    val cents = n.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cid"), col("de").as("cde"),
        col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    // persisted at crank ≤ 2 (2 rows/vector): corpus cells and query
    // probes BOTH filter this frame — unpersisted, the 16-centroid
    // broadcast join + assignment window ran once per consumer
    val assigned = n.join(broadcast(cents))
      .withColumn("ccos",
        expr(dotExpr("de", "cde")) / (col("nrm") * col("cnrm")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") <= 2)
      .select(col("vec_id"), col("de"), col("nrm"), col("cid"), col("crank"))
      .transform(TransientCache.scopedDF)
    val corpusCells = assigned.filter(col("crank") === 1)
      .select(col("vec_id"), col("de"), col("nrm"), col("cid").as("cell"))
    val queryProbes = assigned.filter(col("vec_id") < 10 && col("crank") <= 2)
      .select(col("vec_id").as("query_id"), col("de").as("qe"),
        col("nrm").as("qn"), col("cid").as("cell"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    corpusCells.join(broadcast(queryProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(dotExpr("qe", "de")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-cluster member cap for [[clusterMedoids]]: medoid scoring is an
    * all-pairs within the cluster, so a degenerate giant cluster (the
    * q126 "one cluster ate the corpus" failure) must not turn the query
    * quadratic — only the cap smallest doc_ids of each cluster are
    * scored (deterministic, mirrored in the oracle), bounding per-
    * cluster work at cap² whatever the corpus does. 256² = 64k cosine
    * evaluations per degenerate cluster — a bounded constant. */
  val MedoidMemberCap = 256

  /** Embedding MEDOID per near-dup cluster: among a cluster's members
    * (doc_id ≡ vec_id), the one maximizing total cosine to the others —
    * the semantic "most representative member", the third canonical-
    * selection signal next to q81's quality keeper and q106's graph
    * centrality (those read TEXT quality and GRAPH position; this reads
    * the embedding geometry, robust to one member having drifted text).
    *
    * Determinism: each pairwise cosine is the bitwise-identical
    * sequential fold (graft_dot ≡ DuckDB's 0-prepended list_reduce),
    * quantized to int64 by floor(cos·10⁴) BEFORE summation, so the
    * per-member totals are exact integers in both engines. Sums carry a
    * +10⁴ per-pair offset keeping them non-negative (cosines can be
    * negative; the house int64-division discipline keeps `div`/`//`
    * operands non-negative so parity never rests on either engine's
    * negative-division convention (measured: both truncate on BIGINT —
    * DESIGN.md round-14) — the q185 offset trick, cancelled in the
    * reported mean). Every member
    * scores the same pair count, so the offset never flips the argmax;
    * ties break to the min doc_id. The quantized cosine is clamped to
    * ≥ −10⁴ before the offset (both engines): float cosine of
    * near-antipodal vectors can evaluate 1 ulp below −1, where
    * floor(cos·10⁴) = −10001 would leave cos_off = −1 — violating the
    * non-negativity invariant this pipeline documents (the engines
    * happen to agree on negative BIGINT division — both truncate,
    * DESIGN.md round-14 — but the invariant, not that engine detail,
    * is what parity rests on).
    *
    * Scale shape: members cap at [[MedoidMemberCap]] per cluster (rank
    * by doc_id — deterministic), so the cluster-keyed self-join fans
    * out ≤ cap² rows per cluster and the argmax window runs per
    * cluster — no all-pairs against the corpus anywhere; embeddings
    * join members by doc_id equi-key. */
  def clusterMedoids(clusters: DataFrame, emb: DataFrame): DataFrame = {
    val s = clusters.sparkSession
    graft.expr.VectorExpressions.register(s)
    val e = emb.select(col("vec_id").as("doc_id"), expr(toDouble).as("de"))
      .withColumn("nrm", expr(s"sqrt(${dotExpr("de", "de")})"))
    val rkw = Window.partitionBy(col("cluster_id")).orderBy(col("doc_id"))
    val m = clusters.join(e, "doc_id")
      .withColumn("rk", row_number().over(rkw))
      .filter(col("rk") <= MedoidMemberCap)
      .select(col("cluster_id"), col("doc_id"), col("de"), col("nrm"))
      .transform(TransientCache.scopedDF)
    val scored = m.as("a")
      .join(m.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.cluster_id").as("cluster_id"),
        col("a.doc_id").as("doc_id"),
        (expr(s"""greatest(cast(floor(${dotExpr("a.de", "b.de")}
                / (a.nrm * b.nrm) * 10000) as bigint),
                cast(-10000 as bigint))""") + lit(10000L))
          .as("cos_off"))
      .groupBy(col("cluster_id"), col("doc_id"))
      .agg(sum(col("cos_off")).as("s_off"),
        count(lit(1)).as("n_scored_others"))
    // medoid = (s_off DESC, doc_id ASC) argmax per cluster as a
    // partially-aggregable struct-max (doc_id unique per cluster), not
    // a rank window — same pick, no sort, map-side collapse before the
    // exchange (guide §2.3)
    scored.groupBy(col("cluster_id"))
      .agg(max(struct(col("s_off"), (-col("doc_id")).as("nd"),
        col("doc_id"), col("n_scored_others"))).as("m"))
      .join(clusters.groupBy(col("cluster_id"))
        .agg(max(col("cluster_size")).as("cluster_size")), "cluster_id")
      .select(col("cluster_id"), col("cluster_size"),
        col("m.doc_id").as("medoid_id"),
        col("m.n_scored_others").as("n_scored_others"),
        expr("m.s_off div m.n_scored_others - 10000L").as("mean_cos_fp"))
      .orderBy(col("cluster_id"))
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- ANN over the PERSISTED IVF index: centroids + cell-partitioned
    //      inverted file from parquet (built by `graft.BuildIndex`, or
    //      on demand if absent), query vectors probe their 2 nearest
    //      persisted centroids, exact top-3 within the probed cells.
    //      Identical math to q43 over parquet-round-tripped doubles →
    //      byte-identical answers (SimilaritySpec pins it); the oracle
    //      is literally q43's, recomputed inline. At scale the win is
    //      the build-once/query-many split plus partition pruning: a
    //      2-cell probe reads 1/8th of the corpus from disk. ----
    "q97_ivf_index_topk" -> QueryDef(
      (s, dir) => {
        val idx = ivfIndexDirFor(s, dir)
        val fp = corpusFingerprint(s, dir)
        ensureIvfIndex(s, idx, fp, ivfIndexConf(s).isDefined)(tmp =>
          writeIvfIndex(Tables.load(s, dir, "embeddings"), tmp, Some(fp)))
        graft.expr.VectorExpressions.register(s)
        val queries = normed(s, dir).filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("de").as("qe"),
            col("nrm").as("qn"))
        ivfServe(s.read.parquet(s"$idx/centroids.parquet"),
          s.read.parquet(s"$idx/cells.parquet"), queries)
      },
      Some(ivfDuckSql())),

    // ---- INCREMENTAL index ingest: the base corpus (vec_id % 5 ≠ 4) is
    //      indexed once on disk; the delta batch (vec_id % 5 = 4) is
    //      APPENDED by assigning it to the EXISTING persisted centroids —
    //      base inverted lists are never touched, the recurring-crawl
    //      ANN shape (a rebuild would reshuffle every list; an append
    //      only shuffles the delta). Fixed centroids make append ≡
    //      one-shot assignment of the union, which is exactly what the
    //      oracle computes inline — the equivalence IS the correctness
    //      statement. Queries probe 2 cells over the merged lists. ----
    "q98_ivf_incremental_topk" -> QueryDef(
      (s, dir) => {
        graft.expr.VectorExpressions.register(s)
        val emb = Tables.load(s, dir, "embeddings")
        val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 4)
        val delta = emb.filter(pmod(col("vec_id"), lit(5)) === 4)
        val idx = ivfIndexDirFor(s, dir) + "_base"
        val fp = corpusFingerprint(s, dir)
        ensureIvfIndex(s, idx, fp, ivfIndexConf(s).isDefined)(tmp =>
          writeIvfIndex(base, tmp, Some(fp)))
        val cents = s.read.parquet(s"$idx/centroids.parquet")
        val baseCells = s.read.parquet(s"$idx/cells.parquet")
          .select(col("vec_id"), col("de"), col("nrm"),
            col("cell").cast("long").as("cell"))
        val wA = Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cid"))
        val deltaCells = normedFrom(delta).join(broadcast(cents))
          .withColumn("ccos", expr(dotExpr("de", "cde")) / (col("nrm") * col("cnrm")))
          .withColumn("crank", row_number().over(wA))
          .filter(col("crank") === 1)
          .select(col("vec_id"), col("de"), col("nrm"), col("cid").as("cell"))
        val cells = baseCells.unionByName(deltaCells)
        val queries = normed(s, dir).filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("de").as("qe"),
            col("nrm").as("qn"))
        ivfServe(cents, cells, queries)
      },
      // one IVF oracle per engine: q98 is ivfDuckSql with the seed set
      // restricted to the base corpus
      Some(ivfDuckSql(s"vec_id < $IvfCells AND vec_id % 5 <> 4"))),

    // ---- index COMPACTION: q98's append leaves the delta outside the
    //      partitioned inverted file — after enough ingest cycles a
    //      probe reads one clean partition plus k delta fragments, and
    //      locality degrades. Compaction is the recurring maintenance
    //      op that folds the delta INTO the lists and reinstalls the
    //      index as a fresh partitioned write (atomic tmp-build+rename,
    //      the same install discipline as the base build). The served
    //      result must be byte-identical to q98's merged-view serve —
    //      the oracle IS q98's, so the hash gate certifies compaction
    //      changes the LAYOUT and nothing else. Scale: the rewrite
    //      shuffles each vector once on its cell key; centroids are
    //      copied untouched. ----
    "q132_ivf_compact_topk" -> QueryDef(
      (s, dir) => {
        graft.expr.VectorExpressions.register(s)
        val emb = Tables.load(s, dir, "embeddings")
        val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 4)
        val delta = emb.filter(pmod(col("vec_id"), lit(5)) === 4)
        val fp = corpusFingerprint(s, dir)
        val baseIdx = ivfIndexDirFor(s, dir) + "_base"
        ensureIvfIndex(s, baseIdx, fp, ivfIndexConf(s).isDefined)(tmp =>
          writeIvfIndex(base, tmp, Some(fp)))
        val compIdx = ivfIndexDirFor(s, dir) + "_compact"
        ensureIvfIndex(s, compIdx, fp, ivfIndexConf(s).isDefined) { tmp =>
          val cents = s.read.parquet(s"$baseIdx/centroids.parquet")
          val baseCells = s.read.parquet(s"$baseIdx/cells.parquet")
            .select(col("vec_id"), col("de"), col("nrm"),
              col("cell").cast("long").as("cell"))
          val wA = Window.partitionBy(col("vec_id"))
            .orderBy(col("ccos").desc, col("cid"))
          val deltaCells = normedFrom(delta).join(broadcast(cents))
            .withColumn("ccos",
              expr(dotExpr("de", "cde")) / (col("nrm") * col("cnrm")))
            .withColumn("crank", row_number().over(wA))
            .filter(col("crank") === 1)
            .select(col("vec_id"), col("de"), col("nrm"),
              col("cid").as("cell"))
          baseCells.unionByName(deltaCells)
            .write.mode("overwrite").partitionBy("cell")
            .parquet(s"$tmp/cells.parquet")
          writeIvfManifest(s, tmp, fp)
          cents.coalesce(1).write.mode("overwrite")
            .parquet(s"$tmp/centroids.parquet")
        }
        val queries = normed(s, dir).filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("de").as("qe"),
            col("nrm").as("qn"))
        ivfServe(s.read.parquet(s"$compIdx/centroids.parquet"),
          s.read.parquet(s"$compIdx/cells.parquet")
            .select(col("vec_id"), col("de"), col("nrm"),
              col("cell").cast("long").as("cell")),
          queries)
      },
      // compaction must not change answers: the oracle is exactly q98's
      Some(ivfDuckSql(s"vec_id < $IvfCells AND vec_id % 5 <> 4"))),

    // ---- brute-force cosine top-3 for queries vec_id < 10 ----
    "q35_cosine_topk" -> QueryDef(
      (s, dir) => bruteTopkCached(s, dir)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH n AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
                        FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
                   FROM n WHERE vec_id < 10),
             scored AS (
               SELECT q.query_id, n.vec_id,
                 ${duckDot("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cos
               FROM n JOIN q ON n.vec_id <> q.query_id),
             ranked AS (
               SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rank
               FROM scored)
             SELECT query_id, vec_id AS neighbor_id, rank,
               round(cos, 4) AS cos_sim
             FROM ranked WHERE rank <= 3
             ORDER BY query_id, rank""")),

    // ---- LSH-bucketed approximate NN: candidates share the 4-bit sign
    //      bucket; top-3 by exact cosine within candidates ----
    "q36_ann_lsh_topk" -> QueryDef(
      (s, dir) => lshTopkCached(s, dir)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH n AS (SELECT vec_id, embedding,
                        ${duckNorm("embedding")} AS nrm,
                        ${bucketExprDuck("embedding")} AS bucket
                      FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, bucket
                   FROM n WHERE vec_id < 10),
             cands AS (
               SELECT q.query_id, n.vec_id,
                 ${duckDot("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cos
               FROM n JOIN q ON n.bucket = q.bucket AND n.vec_id <> q.query_id),
             ranked AS (
               SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rank
               FROM cands)
             SELECT query_id, vec_id AS neighbor_id, rank,
               round(cos, 4) AS cos_sim
             FROM ranked WHERE rank <= 3
             ORDER BY query_id, rank""")),

    // ---- IVF-style ANN: deterministic "centroids" (the first 16
    //      vectors), corpus assigned to its nearest centroid, queries
    //      probe their 2 nearest centroid cells, exact top-3 among the
    //      probed cells' members. The inverted-file scale path: the
    //      centroid pass is a broadcast nested loop over 16 rows, the
    //      candidate join is an equi-join on the cell id — comparisons
    //      drop from |Q|·N to |Q|·(2/16)·N on average. Deterministic
    //      end-to-end, so DuckDB replicates it exactly. ----
    "q43_ivf_ann_topk" -> QueryDef(
      (s, dir) => ivfTopkCached(s, dir)
        .orderBy(col("query_id"), col("rank")),
      // one IVF definition per engine: q43 and q97 share [[ivfDuckSql]]
      Some(ivfDuckSql())),

    // ---- embedding-cosine near-dup pairs, LSH candidate path ----
    //      Candidates from 32 sign-LSH bands of 16 bits (equi self-join on
    //      (band_idx, band_val) — never all pairs, hot band groups dropped
    //      by NeardupBandCap first), then exact cosine verification with
    //      graft_dot. The oracle mirrors the banding and the cap
    //      bit-for-bit, so both engines enumerate the identical candidate
    //      set; recall vs the exact baseline (q50) is measured in
    //      SparkOpsSpec. The 512 band bits come from the codegen'd
    //      graft_sign_bands expression (a compact loop — the unrolled CASE
    //      form broke whole-stage codegen) and are materialized ONCE into
    //      the persisted frame (a 32-element array column), so neither
    //      join side re-evaluates them.
    "q41_embedding_neardup" -> QueryDef(
      (s, dir) => embeddingNeardupPairsCached(s, dir, 0.45)
        .orderBy(col("va"), col("vb")),
      Some {
        s"""WITH n AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
                    FROM embeddings),
           bands0 AS ($neardupBandDuckUnion),
           hot AS (
             SELECT band_idx, band_val FROM bands0
             GROUP BY band_idx, band_val HAVING count(*) > $NeardupBandCap),
           bands AS (
             SELECT b.* FROM bands0 b
             ANTI JOIN hot h USING (band_idx, band_val)),
           cands AS (
             SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
             FROM bands x JOIN bands y
               ON x.band_idx = y.band_idx AND x.band_val = y.band_val
              AND x.vec_id < y.vec_id)
           SELECT va, vb,
             round(${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 4)
               AS cos_sim
           FROM cands JOIN n a ON va = a.vec_id JOIN n b ON vb = b.vec_id
           WHERE ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.45
           ORDER BY va, vb"""
      }),

    // ---- exact all-pairs near-dup, block-distributed ----
    //      The exact baseline kept as a first-class operator: all-pairs
    //      cosine is inherently O(N²) compute, but the PLAN must not be a
    //      broadcast nested loop (one side fully replicated — dies when it
    //      outgrows the broadcast limit). Instead each vector gets a block
    //      id (vec_id % 16) and a tiny block-pair relation drives two
    //      equi-joins, so the N² work is shuffle-partitioned evenly across
    //      executors — the standard distributed block-matrix shape. Each
    //      unordered pair is compared exactly once: cross-block pairs ride
    //      the (ba < bb) orientation, within-block pairs the va < vb
    //      filter. ----
    "q50_neardup_exact" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val K = 16
        val n = normed(s, dir)
          .withColumn("blk", pmod(col("vec_id"), lit(K)))
          .transform(TransientCache.scopedDF)
        val blockPairs = (for { i <- 0 until K; j <- i until K } yield (i, j))
          .toDF("pa", "pb")
        val a = n.select(col("vec_id").as("ia"), col("de").as("ea"),
          col("nrm").as("na"), col("blk").as("ba"))
        val b = n.select(col("vec_id").as("ib"), col("de").as("eb"),
          col("nrm").as("nb"), col("blk").as("bb"))
        a.join(broadcast(blockPairs), col("ba") === col("pa"))
          .join(b, col("pb") === col("bb"))
          .filter(col("ba") < col("bb") ||
            (col("ba") === col("bb") && col("ia") < col("ib")))
          .withColumn("cos", expr(dotExpr("ea", "eb")) / (col("na") * col("nb")))
          .filter(col("cos") >= 0.45)
          .select(least(col("ia"), col("ib")).as("va"),
            greatest(col("ia"), col("ib")).as("vb"),
            round(col("cos"), 4).as("cos_sim"))
          .orderBy(col("va"), col("vb"))
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
                        FROM embeddings)
             SELECT a.vec_id AS va, b.vec_id AS vb,
               round(${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 4)
                 AS cos_sim
             FROM n a JOIN n b ON a.vec_id < b.vec_id
             WHERE ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.45
             ORDER BY va, vb""")),

    // ---- int8 embedding quantization: per-vector min/max affine scale
    //      to [0,255] — the storage-compression step before shipping
    //      embeddings to an ANN index. Pure per-row expression work (no
    //      shuffle until the final sort). Every arithmetic step is the
    //      same IEEE double op in the same order in both engines, so
    //      floor() sees bit-identical inputs; min/max are
    //      order-independent, and the byte checksum is an integer sum.
    //      Constant vectors (mx = mn) quantize to 0. ----
    "q68_embedding_quantize" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "embeddings")
          .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
          .withColumn("mn", array_min(col("v")))
          .withColumn("mx", array_max(col("v")))
          .withColumn("q", expr(
            """transform(v, x -> if(mx = mn, 0,
                 least(255, cast(floor((x - mn) * 255.0D / (mx - mn)) as int))))"""))
          .select(col("vec_id"), col("mn"), col("mx"),
            expr("aggregate(q, 0L, (a, x) -> a + x)").as("q_sum"),
            expr("""substring(md5(concat_ws(',',
                      transform(q, x -> cast(x as string)))), 1, 16)""")
              .as("q_hash"))
          .orderBy(col("vec_id")),
      Some("""WITH t AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
             m AS (
               SELECT vec_id, v,
                 list_aggregate(v, 'min') AS mn,
                 list_aggregate(v, 'max') AS mx
               FROM t),
             qz AS (
               SELECT vec_id, mn, mx,
                 list_transform(v, x -> CASE WHEN mx = mn THEN 0
                   ELSE least(255, CAST(floor((x - mn) * 255.0 / (mx - mn)) AS INT))
                   END) AS q
               FROM m)
             SELECT vec_id, mn, mx,
               CAST(list_sum(q) AS BIGINT) AS q_sum,
               substr(md5(array_to_string(
                 list_transform(q, x -> CAST(x AS VARCHAR)), ',')), 1, 16) AS q_hash
             FROM qz
             ORDER BY vec_id""")),

    // ---- the plain-SQL entry path: the same engine surface through
    //      spark.sql() text, with the custom graft_dot Catalyst
    //      expression invoked BY NAME in SQL — proving the
    //      SparkSessionExtensions registration serves SQL users, not
    //      just the DataFrame API. Self-dot is a sequential fold in
    //      both engines → bitwise equality before the display rounding. ----
    "q69_sql_surface" -> QueryDef(
      (s, dir) => {
        Tables.load(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
        s.sql("""SELECT vec_id,
                   round(graft_dot(cast(embedding AS array<double>),
                                   cast(embedding AS array<double>)), 4)
                     AS self_dot
                 FROM embeddings_v
                 ORDER BY vec_id""")
      },
      Some(s"""SELECT vec_id,
               round(${duckDot("embedding", "embedding")}, 4) AS self_dot
             FROM embeddings
             ORDER BY vec_id""")),

    // ---- ANN RECALL OBSERVABILITY: how much of the exact answer do the
    //      approximate indexes actually return? Per query vector the
    //      IVF (2-of-16-cell probe, the q43/q97 math) and sign-bucket
    //      LSH (q36) top-3 sets are intersected with the brute-force
    //      exact top-3 (q35), then aggregated to recall@3 per method —
    //      the number a curation pipeline checks BEFORE trusting
    //      approximate dedup at 100 TB ("the index is built right" vs
    //      "the index is good enough to serve"). The PQ index (q109)
    //      gets the same row, measured against the exact L1 top-3
    //      ([[bruteL1Topk]]) — PQ's ADC approximates L1 distance, so
    //      recall under the cosine ground truth would conflate metric
    //      mismatch with quantization loss. All sides are deterministic
    //      (exact folds + total tie-breaks), so the report itself sits
    //      under the DuckDB hash gate. recall_bp is basis points via
    //      int64 floor division — no float division crosses the gate.
    //      Scale shape: four reuses of the existing top-k operators
    //      (each already broadcast/cell-pruned), three 30-row joins,
    //      and a 1-row totals cross join. ----
    "q102_ann_recall" -> QueryDef(
      (s, dir) => {
        // the cached ground truth is a 30-row parquet read — cheaper
        // re-read than persist churn
        val exact = bruteTopkCached(s, dir)
          .select(col("query_id"), col("neighbor_id"))
        val nq = exact.agg(countDistinct(col("query_id")).as("n_queries"))
        def methodRow(method: String, approx: DataFrame,
            truth: DataFrame = exact): DataFrame =
          approx.select(col("query_id"), col("neighbor_id"))
            .join(truth, Seq("query_id", "neighbor_id"))
            .agg(count(lit(1)).as("hits_at_3"))
            .crossJoin(nq)
            .select(lit(method).as("method"), col("n_queries"),
              col("hits_at_3"),
              expr("hits_at_3 * 10000L div (3 * n_queries)").as("recall_bp"))
        methodRow("ivf", ivfTopkCached(s, dir))
          .unionByName(methodRow("lsh", lshTopkCached(s, dir)))
          // pq approximates L1, so its ground truth is the exact L1
          // top-3 — recall measured under the method's own metric
          .unionByName(methodRow("pq", pqTopkCached(s, dir), bruteL1TopkCached(s, dir)))
          .orderBy(col("method"))
      },
      Some {
        def rankTop(src: String) =
          s"""SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id, row_number() OVER (
                  PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
                FROM $src) WHERE rank <= 3"""
        s"""WITH n AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm,
                    ${bucketExprDuck("embedding")} AS bucket
                  FROM embeddings),
           q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, bucket
                 FROM n WHERE vec_id < 10),
           ex_scored AS (
             SELECT q.query_id, n.vec_id,
               ${duckDot("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cos
             FROM n JOIN q ON n.vec_id <> q.query_id),
           ex_top AS (${rankTop("ex_scored")}),
           lsh_scored AS (
             SELECT q.query_id, n.vec_id,
               ${duckDot("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cos
             FROM n JOIN q ON n.bucket = q.bucket AND n.vec_id <> q.query_id),
           lsh_top AS (${rankTop("lsh_scored")}),
           cents AS (SELECT vec_id AS cid, embedding AS cde, nrm AS cnrm
                     FROM n WHERE vec_id < $IvfCells),
           assigned AS (
             SELECT n.vec_id, n.embedding, n.nrm, cents.cid,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 ${duckDot("n.embedding", "cents.cde")} / (n.nrm * cents.cnrm) DESC,
                 cents.cid) AS crank
             FROM n CROSS JOIN cents),
           corpus_cells AS (
             SELECT vec_id, embedding, nrm, cid AS cell
             FROM assigned WHERE crank = 1),
           query_probes AS (
             SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, cid AS cell
             FROM assigned WHERE vec_id < 10 AND crank <= 2),
           ivf_scored AS (
             SELECT p.query_id, c.vec_id,
               ${duckDot("p.qe", "c.embedding")} / (p.qn * c.nrm) AS cos
             FROM corpus_cells c JOIN query_probes p ON c.cell = p.cell
             WHERE c.vec_id <> p.query_id),
           ivf_top AS (${rankTop("ivf_scored")}),
           $pqDuckChain,
           pq_top AS (
             SELECT query_id, vec_id FROM (
               SELECT query_id, vec_id, row_number() OVER (
                 PARTITION BY query_id ORDER BY adc, vec_id) AS rank
               FROM adc) WHERE rank <= 3),
           exl1_scored AS (
             SELECT q2.query_id, n2.vec_id,
               ${Clustering.l1DuckExpr("q2.qe", "n2.de")} AS dist
             FROM pn n2 JOIN pq q2 ON n2.vec_id <> q2.query_id),
           exl1_top AS (
             SELECT query_id, vec_id FROM (
               SELECT query_id, vec_id, row_number() OVER (
                 PARTITION BY query_id ORDER BY dist, vec_id) AS rank
               FROM exl1_scored) WHERE rank <= 3),
           nq AS (SELECT count(DISTINCT query_id) AS n_queries FROM ex_top),
           hits AS (
             SELECT 'ivf' AS method, count(*) AS hits_at_3
             FROM ivf_top JOIN ex_top USING (query_id, vec_id)
             UNION ALL
             SELECT 'lsh' AS method, count(*) AS hits_at_3
             FROM lsh_top JOIN ex_top USING (query_id, vec_id)
             UNION ALL
             SELECT 'pq' AS method, count(*) AS hits_at_3
             FROM pq_top JOIN exl1_top USING (query_id, vec_id))
           SELECT method, n_queries, hits_at_3,
             (hits_at_3 * 10000) // (3 * n_queries) AS recall_bp
           FROM hits CROSS JOIN nq
           ORDER BY method"""
      }),

    // ---- SCALAR-QUANTIZED ANN + per-query recall: the q68
    //      compression step actually SERVING. Per-vector symmetric
    //      int8 (floor(x·127/amax), clipped to ±127 — symmetric
    //      rather than q68's affine [0,255] so the quantized dot needs
    //      no offset correction), top-3 per q35 query by quantized
    //      cosine, then each query's hit count against the exact
    //      float top-3 — the per-query read of what 4 bytes/dim → 1
    //      byte/dim costs in ranking fidelity (q102's aggregate recall
    //      row, refined to the query axis for the sq method). All
    //      quantized components are integer-valued doubles, so the
    //      dot folds are EXACT in both engines and ranking ties break
    //      identically; recall_bp is int64 floor division. Scale
    //      shape: one per-row quantization projection, the q35
    //      inequality-broadcast (10-query O(1) build side), two
    //      30-row joins. ----
    "q188_sq_ann_recall" -> QueryDef(
      (s, dir) => {
        val qz = Tables.load(s, dir, "embeddings")
          .withColumn("v", expr(toDouble))
          .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
          .withColumn("qv", expr(
            """transform(v, x -> if(amax = 0.0D, 0.0D,
                 greatest(-127.0D, least(127.0D,
                   floor(x * 127.0D / amax)))))"""))
          .withColumn("qn", expr(s"sqrt(${dotExpr("qv", "qv")})"))
          .filter(col("qn") > 0)
          .select(col("vec_id"), col("qv"), col("qn"))
          .transform(TransientCache.scopedDF)
        val queries = qz.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("qv").as("qe"),
            col("qn").as("qqn"))
        val scored = qz
          .join(broadcast(queries), col("vec_id") =!= col("query_id"))
          .withColumn("qcos",
            expr(dotExpr("qe", "qv")) / (col("qqn") * col("qn")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("qcos").desc, col("vec_id"))
        val sq3 = scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("rank"), round(col("qcos"), 4).as("qcos_sim"))
          .transform(TransientCache.scopedDF)
        val exact = bruteTopkCached(s, dir)
          .select(col("query_id"), col("neighbor_id"))
        // 30 rows by construction (10 queries × top-3): broadcast it —
        // the bare semi-join planned a sort-merge (2 exchanges + sorts)
        // off the cache's unhelpful size estimate
        val hits = sq3
          .join(broadcast(exact), Seq("query_id", "neighbor_id"),
            "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
        sq3.filter(col("rank") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_id"),
            col("qcos_sim").as("top1_qcos"))
          .join(hits, Seq("query_id"), "left")
          .na.fill(0L, Seq("n_hits"))
          .select(col("query_id"), col("n_hits"),
            expr("n_hits * 10000 div 3").as("recall_bp"),
            col("top1_id"), col("top1_qcos"))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH t AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
             m AS (
               SELECT vec_id, v,
                 list_aggregate(list_transform(v, x -> abs(x)), 'max')
                   AS amax
               FROM t),
             qz0 AS (
               SELECT vec_id,
                 list_transform(v, x -> CASE WHEN amax = 0.0 THEN 0.0
                   ELSE greatest(-127.0, least(127.0,
                     floor(x * 127.0 / amax))) END) AS qv
               FROM m),
             qz1 AS (
               SELECT vec_id, qv, sqrt(${duckDot("qv", "qv")}) AS qn
               FROM qz0),
             qz AS (SELECT * FROM qz1 WHERE qn > 0),
             q AS (SELECT vec_id AS query_id, qv AS qe, qn AS qqn
                   FROM qz WHERE vec_id < 10),
             scored AS (
               SELECT q.query_id, z.vec_id,
                 ${duckDot("q.qe", "z.qv")} / (q.qqn * z.qn) AS qcos
               FROM qz z JOIN q ON z.vec_id <> q.query_id),
             ranked AS (
               SELECT query_id, vec_id, qcos,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY qcos DESC, vec_id) AS rank
               FROM scored),
             sq3 AS (
               SELECT query_id, vec_id AS neighbor_id, rank,
                 round(qcos, 4) AS qcos_sim
               FROM ranked WHERE rank <= 3),
             n AS (SELECT vec_id, embedding,
                     ${duckNorm("embedding")} AS nrm
                   FROM embeddings),
             eq AS (SELECT vec_id AS query_id, embedding AS qe2,
                      nrm AS qn2
                    FROM n WHERE vec_id < 10),
             escored AS (
               SELECT eq.query_id, n.vec_id,
                 ${duckDot("eq.qe2", "n.embedding")} / (eq.qn2 * n.nrm)
                   AS cos
               FROM n JOIN eq ON n.vec_id <> eq.query_id),
             eranked AS (
               SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rank
               FROM escored),
             e3 AS (SELECT query_id, vec_id AS neighbor_id
                    FROM eranked WHERE rank <= 3),
             hits AS (
               SELECT s3.query_id, count(*) AS n_hits
               FROM sq3 s3 JOIN e3
                 ON e3.query_id = s3.query_id
                AND e3.neighbor_id = s3.neighbor_id
               GROUP BY s3.query_id)
           SELECT t1.query_id,
             COALESCE(h.n_hits, 0) AS n_hits,
             COALESCE(h.n_hits, 0) * 10000 // 3 AS recall_bp,
             t1.neighbor_id AS top1_id, t1.qcos_sim AS top1_qcos
           FROM sq3 t1 LEFT JOIN hits h ON h.query_id = t1.query_id
           WHERE t1.rank = 1
           ORDER BY t1.query_id""")),

    // ---- product-quantization ANN ([[Clustering.pqEncode]]): per-query
    //      top-3 by ASYMMETRIC DISTANCE — the query's exact subvectors
    //      against each corpus vector's 4-byte code through the
    //      per-subspace lookup tables. The LUT joins are broadcast hash
    //      equi-joins on (query_id, code); the 4 subspace distances add
    //      in ONE fixed-order expression (never a float SUM aggregate —
    //      the q87 ordering discipline), so adc is bit-identical in both
    //      engines and the rank/tie-break agrees exactly. The oracle
    //      replays all four codebook trainings (the q70 CTE chain on
    //      sliced lists), the encoding, the LUTs and the ADC ranking —
    //      a wrong slice boundary, seed, median, code or lookup flips
    //      the hash compare. K = 8 centroids per subspace is the
    //      gate-replayable operating point (the oracle retrains all four
    //      codebooks in SQL); production PQ runs 256 per subspace for
    //      recall — the code path is K-agnostic ([[Clustering.K]]), and
    //      q102's pq row MEASURES what this configuration recalls
    //      instead of asserting it. ----
    "q109_pq_ann_topk" -> QueryDef(
      (s, dir) => pqTopkCached(s, dir)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adc"), 4).as("adc"))
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH $pqDuckChain
           SELECT query_id, rank, vec_id AS neighbor_id,
             round(adc, 4) AS adc
           FROM (
             SELECT query_id, vec_id, adc,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY adc, vec_id) AS rank
             FROM adc)
           WHERE rank <= 3
           ORDER BY query_id, rank""")),

    // ---- SEMANTIC decontamination: the embedding-space complement of
    //      q58's 4-gram overlap check. A paraphrased benchmark item
    //      shares no exact 4-gram with its source, but its embedding
    //      still sits next to the eval vector — this query flags every
    //      corpus vector whose cosine against ANY held-out eval vector
    //      reaches [[SemContamMinCos]], reporting the best-matching eval
    //      item and how many eval items it collides with. The eval set
    //      is FIXED SIZE by nature (benchmarks don't grow with the
    //      training corpus): here the [[EvalSetLo]]..[[EvalSetHi]]
    //      vec_id slab — 32 vectors, an O(1) broadcast build side, so
    //      the corpus streams through map-side exactly once and the
    //      only shuffle is the per-vector window over the ≤|eval| hit
    //      rows. Cosines are the same graft_dot / sequential-fold
    //      sequence as q35 — bit-identical in both engines, so the
    //      threshold cut and the tie-broken argmax agree exactly. The
    //      0.42 threshold is calibrated to this synthetic corpus (max
    //      corpus-vs-eval cosine ≈ 0.46); a production run sets it from
    //      the q102-style recall/precision trade-off, not from here. ----
    "q110_semantic_decontam" -> QueryDef(
      (s, dir) => semanticDecontamCached(s, dir).orderBy(col("vec_id")),
      Some(s"""WITH $semanticDecontamDuckCtes
           SELECT vec_id, eval_id, round(cos, 4) AS cos_sim, n_eval_hits
           FROM sdc_flagged WHERE rk = 1
           ORDER BY vec_id""")),

    // ---- IVF nprobe/recall trade-off sweep (VERDICT r8 item 4): q102
    //      reports recall at the FIXED 2-of-16 probe the q43/q97 serve
    //      path uses; a real operator picks nprobe from a measured
    //      recall/cost curve. One row per nprobe ∈ {1,2,4,8}: hits@3
    //      against the exact cosine top-3 and recall in basis points
    //      (the q102 int64 floor-division discipline). The centroid
    //      assignment is computed ONCE (the same broadcast-centroids
    //      join + per-vector window q43 runs); each candidate carries
    //      the probe rank of its cell, so the four sweep points fold
    //      into ONE window pass over ONE candidate frame (since r16:
    //      per-np subset ranks are running conditional counts sharing a
    //      single (cos DESC, vec_id) sort, and the four hit/cost pairs
    //      are one conditional aggregate) — the sweep costs one
    //      assignment pass plus the widest (nprobe=8) candidate join,
    //      not four independent IVF runs. cand_rows is reported per
    //      sweep point (the COST axis of the curve: candidates scored
    //      per query grows with nprobe while recall saturates — exactly
    //      the knee a production config reads off this table). At 100 TB
    //      the shape is unchanged: centroids stay broadcast, the
    //      candidate join is cell-keyed, and the one sweep window
    //      partitions by query_id. ----
    "q116_ivf_nprobe_sweep" -> QueryDef(
      (s, dir) => {
        // cached 30-row ground truth (re-read beats persist churn)
        val exact = bruteTopkCached(s, dir)
          .select(col("query_id"), col("neighbor_id"))
        val nq = exact.agg(countDistinct(col("query_id")).as("n_queries"))
        val n = normed(s, dir)
        val cents = n.filter(col("vec_id") < IvfCells)
          .select(col("vec_id").as("cid"), col("de").as("cde"),
            col("nrm").as("cnrm"))
        val wAssign = Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cid"))
        val assigned = n.join(broadcast(cents))
          .withColumn("ccos",
            expr(dotExpr("de", "cde")) / (col("nrm") * col("cnrm")))
          .withColumn("crank", row_number().over(wAssign))
        val corpusCells = assigned.filter(col("crank") === 1)
          .select(col("vec_id"), col("de"), col("nrm"), col("cid").as("cell"))
        val maxProbe = IvfSweepProbes.max
        val probes = assigned
          .filter(col("vec_id") < NumQueries && col("crank") <= maxProbe)
          .select(col("vec_id").as("query_id"), col("de").as("qe"),
            col("nrm").as("qn"), col("cid").as("cell"),
            col("crank").as("probe_rank"))
        val cands = corpusCells.join(broadcast(probes), Seq("cell"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cos",
            expr(dotExpr("qe", "de")) / (col("qn") * col("nrm")))
          .select(col("query_id"), col("vec_id"), col("cos"),
            col("probe_rank"))
        // r16 optimization (guide §2.4): the per-nprobe branches used to
        // be four independent (filter → row_number window → exact join →
        // aggregate) pipelines unioned — four query_id exchanges + sorts
        // over the SAME candidate frame. A row's rank within the
        // probe_rank ≤ np subset equals the running conditional count
        // over ONE (cos DESC, vec_id) ordering, so all four sweep points
        // fold into ONE window pass (4 running sums share a single sort)
        // feeding ONE conditional aggregate; the exact-top-3 membership
        // becomes a broadcast left join ahead of the window. Same rows,
        // one exchange where there were four (plus no candidate-frame
        // re-scan, so the scoped persist is gone too).
        val hit = exact
          .withColumnRenamed("neighbor_id", "vec_id")
          .withColumn("is_hit", lit(1L))
        val wRun = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val runCols = IvfSweepProbes.map { np =>
          sum(when(col("probe_rank") <= np, 1L).otherwise(0L)).over(wRun)
            .as(s"rk$np")
        }
        val ranked = cands.join(broadcast(hit), Seq("query_id", "vec_id"),
            "left")
          .select(col("*") +: runCols: _*)
        val sweepAggs = IvfSweepProbes.flatMap { np => Seq(
          count(when(col("probe_rank") <= np, 1)).as(s"cand$np"),
          count(when(col("probe_rank") <= np && col(s"rk$np") <= 3 &&
            col("is_hit") === 1L, 1)).as(s"hit$np"))
        }
        val stacked = IvfSweepProbes
          .map(np => s"cast($np as int), cand$np, hit$np").mkString(", ")
        ranked.agg(sweepAggs.head, sweepAggs.tail: _*)
          .select(expr(s"stack(${IvfSweepProbes.size}, $stacked) " +
            "as (nprobe, cand_rows, hits_at_3)"))
          .crossJoin(broadcast(nq))
          .select(lit("ivf").as("method"), col("nprobe"),
            col("n_queries"), col("cand_rows"), col("hits_at_3"),
            expr("hits_at_3 * 10000L div (3 * n_queries)").as("recall_bp"))
          .orderBy(col("nprobe"))
      },
      Some {
        val maxProbe = IvfSweepProbes.max
        val perProbe = IvfSweepProbes.map { np =>
          s"""SELECT $np AS nprobe,
                (SELECT count(*) FROM cands WHERE probe_rank <= $np)
                  AS cand_rows,
                (SELECT count(*) FROM (
                   SELECT query_id, vec_id FROM (
                     SELECT query_id, vec_id, row_number() OVER (
                       PARTITION BY query_id ORDER BY cos DESC, vec_id)
                       AS rank
                     FROM cands WHERE probe_rank <= $np)
                   WHERE rank <= 3) t
                 JOIN ex_top USING (query_id, vec_id)) AS hits_at_3"""
        }.mkString(" UNION ALL ")
        s"""WITH n AS (SELECT vec_id, embedding,
                    ${duckNorm("embedding")} AS nrm
                  FROM embeddings),
           q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
                 FROM n WHERE vec_id < $NumQueries),
           ex_scored AS (
             SELECT q.query_id, n.vec_id,
               ${duckDot("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cos
             FROM n JOIN q ON n.vec_id <> q.query_id),
           ex_top AS (
             SELECT query_id, vec_id FROM (
               SELECT query_id, vec_id, row_number() OVER (
                 PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
               FROM ex_scored) WHERE rank <= 3),
           cents AS (SELECT vec_id AS cid, embedding AS cde, nrm AS cnrm
                     FROM n WHERE vec_id < $IvfCells),
           assigned AS (
             SELECT n.vec_id, n.embedding, n.nrm, cents.cid,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 ${duckDot("n.embedding", "cents.cde")} / (n.nrm * cents.cnrm) DESC,
                 cents.cid) AS crank
             FROM n CROSS JOIN cents),
           corpus_cells AS (
             SELECT vec_id, embedding, nrm, cid AS cell
             FROM assigned WHERE crank = 1),
           probes AS (
             SELECT vec_id AS query_id, embedding AS qe, nrm AS qn,
               cid AS cell, crank AS probe_rank
             FROM assigned WHERE vec_id < $NumQueries
               AND crank <= $maxProbe),
           cands AS (
             SELECT p.query_id, c.vec_id,
               ${duckDot("p.qe", "c.embedding")} / (p.qn * c.nrm) AS cos,
               p.probe_rank
             FROM corpus_cells c JOIN probes p ON c.cell = p.cell
             WHERE c.vec_id <> p.query_id),
           nq AS (SELECT count(DISTINCT query_id) AS n_queries FROM ex_top),
           sweep AS ($perProbe)
           SELECT 'ivf' AS method, nprobe, n_queries, cand_rows, hits_at_3,
             (hits_at_3 * 10000) // (3 * n_queries) AS recall_bp
           FROM sweep CROSS JOIN nq
           ORDER BY nprobe"""
      }),

    // ---- MATRYOSHKA truncation-recall report: top-3 cosine recall vs
    //      the full-dimension exact top-3 when the embedding is cut to
    //      its first d ∈ {8,16,32,64} coordinates — the measured curve
    //      behind MRL-style dimension truncation (Kusupati et al.,
    //      "Matryoshka Representation Learning", NeurIPS 2022): at
    //      100 TB, serving ANN on a d/8 prefix cuts index memory and
    //      dot-product cost 8× IF recall holds, and this report is the
    //      gate that says whether it does (the q102/q116 observability
    //      discipline applied to the dimension axis; the synthetic
    //      corpus has no MRL training, so the curve here exercises the
    //      machinery — a production run reads its own curve). d=64 is
    //      the ground truth itself, pinning recall_bp=10000 as a
    //      built-in sanity row. Scale shape: one corpus scan per d over
    //      the broadcast 10-query side (the q35 argument), prefix
    //      slicing and norms computed once per (vector, d); all
    //      reported fields are int64 (floor-division basis points). ----
    "q121_matryoshka_recall" -> QueryDef(
      (s, dir) => {
        // ONE candidate×query pass for the whole dim sweep (the q116
        // fold, guide §2.4): every prefix-dim cosine is computed on the
        // same joined row — the per-dim expressions (slice, sequential
        // dot fold, norm) are verbatim the old per-pass ones, so each
        // cosine is bit-identical — and the four rank windows share one
        // query_id exchange. Truth (top-3 at the full dim) is the last
        // dim's rank on the SAME frame, so the per-dim truth join
        // becomes a rank conjunction: hits@3(d) = #(rk_d ≤ 3 ∧
        // rk_last ≤ 3) — set-identical to joining the two top-3 lists.
        val n = normed(s, dir)
        val q = n.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("de").as("qe"))
        def cosAt(d: Int) = {
          val dd = s"slice(de, 1, $d)"
          val qd = s"slice(qe, 1, $d)"
          expr(s"${dotExpr(qd, dd)} / (sqrt(${dotExpr(qd, qd)}) " +
            s"* sqrt(${dotExpr(dd, dd)}))")
        }
        val scored = n.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .select(Seq(col("query_id"), col("vec_id")) ++
            MatryoshkaDims.map(d => cosAt(d).as(s"cos_$d")): _*)
        val ranked = MatryoshkaDims.foldLeft(scored) { (df, d) =>
          df.withColumn(s"rk_$d", row_number().over(
            Window.partitionBy(col("query_id"))
              .orderBy(col(s"cos_$d").desc, col("vec_id"))))
        }
        val last = MatryoshkaDims.last
        val hitAggs = MatryoshkaDims.map { d =>
          sum(when(col(s"rk_$d") <= 3 && col(s"rk_$last") <= 3, 1L)
            .otherwise(0L)).as(s"hits_$d")
        }
        ranked.agg(hitAggs.head, hitAggs.tail: _*)
          .select(explode(expr(s"array(${MatryoshkaDims.map(d =>
            s"struct(${d}L AS dim, hits_$d AS hits_at_3)").mkString(", ")})"))
            .as("r"))
          .select(col("r.dim").as("dim"),
            lit(NumQueries.toLong).as("n_queries"),
            col("r.hits_at_3").as("hits_at_3"),
            expr(s"r.hits_at_3 * 10000L div ${3L * NumQueries}")
              .as("recall_bp"))
          .orderBy(col("dim"))
      },
      Some {
        val perDim = MatryoshkaDims.map { d =>
          s"""md${d}_n AS (
               SELECT vec_id, embedding[1:$d] AS dd FROM embeddings),
             md${d}_m AS (
               SELECT vec_id, dd, ${duckNorm("dd")} AS nr FROM md${d}_n),
             md${d}_q AS (
               SELECT vec_id AS query_id, dd AS qe, nr AS qn
               FROM md${d}_m WHERE vec_id < $NumQueries),
             md${d}_t AS (
               SELECT query_id, vec_id FROM (
                 SELECT q.query_id, m.vec_id,
                   row_number() OVER (PARTITION BY q.query_id
                     ORDER BY ${duckDot("q.qe", "m.dd")} / (q.qn * m.nr)
                       DESC, m.vec_id) AS rk
                 FROM md${d}_m m JOIN md${d}_q q
                   ON m.vec_id <> q.query_id)
               WHERE rk <= 3)"""
        }.mkString(",\n             ")
        val truthName = s"md${MatryoshkaDims.last}_t"
        val rows = MatryoshkaDims.map { d =>
          s"""SELECT CAST($d AS BIGINT) AS dim,
               CAST($NumQueries AS BIGINT) AS n_queries,
               CAST(count(*) AS BIGINT) AS hits_at_3,
               (count(*) * 10000) // ${3 * NumQueries} AS recall_bp
             FROM md${d}_t t JOIN $truthName u
               USING (query_id, vec_id)"""
        }.mkString(" UNION ALL ")
        s"""WITH $perDim
           SELECT * FROM ($rows) ORDER BY dim"""
      }),

    // ---- EMBEDDING-SPACE health card: per dimension, the count, mean,
    //      extremes, zero mass and a variance surrogate over the whole
    //      corpus — the dead/degenerate-dimension detector a pipeline
    //      reads BEFORE trusting any distance-based operator (a constant
    //      dimension contributes nothing to q35/q43 cosine but still
    //      costs 4 bytes/vector in every index; a near-dead one wrecks
    //      q109's per-subspace codebooks). All statistics are int64
    //      fixed-point surrogates of floor(x·1e6)/floor-div derivations —
    //      sums of int64 are order-independent, so no float summation
    //      order can flip the hash. Scale shape: ONE posexplode and ONE
    //      64-group map-side-combinable aggregation; no joins, no
    //      windows, no driver state. At 100 TB the same two-level
    //      partial/merge tree q108 proves applies verbatim (every
    //      statistic here is decomposable: +, min, max). ----
    // ---- dominant principal component by POWER ITERATION — the
    //      spectral read-out behind embedding whitening / OPQ-style
    //      rotation and "is one direction eating the variance?" health
    //      checks (a single dominant direction usually means an uncentered
    //      or collapsed embedding space). 8 rounds of vₜ₊₁ ∝ Gram·vₜ in
    //      int64 fixed point: coords quantize to µ-units (q143's grid),
    //      each round computes per-vector projections s = ⟨q, v⟩, shifts
    //      them down 2²⁶ (keeping every outer-product term and its
    //      corpus-sized sum inside int64 — headroom to ~10⁷ vectors at
    //      the observed |x| ≤ 0.53; the shift is the knob that buys more),
    //      accumulates u_d = Σ s·q_d as ONE 64-column map-side-combinable
    //      aggregation (no explode — the shuffle carries 64 longs per
    //      partition), then renormalizes to ~µ-scale by truncating
    //      division (Spark `div` ≡ DuckDB `//` toward zero, signed).
    //      The per-round 1-row v frame rides a broadcast crossJoin (the
    //      O(1)-build-side pattern); the matrix is quantized once and
    //      persisted, so 8 rounds = 8 corpus passes, which IS the
    //      algorithm. The oracle replays all 8 rounds unrolled
    //      bit-for-bit. ----
    "q146_principal_component" -> QueryDef(
      (s, dir) => principalComponent(Tables.load(s, dir, "embeddings")),
      Some(powerIterDuck(PowerIterRounds))),

    "q143_embedding_dim_stats" -> QueryDef(
      (s, dir) => embeddingDimStats(Tables.load(s, dir, "embeddings")),
      Some("""WITH e AS (
               SELECT unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS sub
               FROM embeddings),
             v AS (
               SELECT CAST(sub - 1 AS BIGINT) AS dim,
                 CAST(x AS DOUBLE) AS xd,
                 CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS sv
               FROM e),
             v2 AS (SELECT dim, xd, sv, sv // 1000 AS sq FROM v),
             a AS (
               SELECT dim, count(*) AS n_vecs,
                 CAST(sum(sv) AS BIGINT) AS sum_micro,
                 min(sv) AS min_micro, max(sv) AS max_micro,
                 CAST(sum(CASE WHEN xd = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero,
                 CAST(sum(sq * sq) AS BIGINT) AS ssq,
                 CAST(sum(sq) AS BIGINT) AS sm
               FROM v2 GROUP BY dim)
             SELECT dim, n_vecs, sum_micro // n_vecs AS mean_micro,
               min_micro, max_micro, n_zero,
               ssq // n_vecs - (sm // n_vecs) * (sm // n_vecs) AS var_milli2,
               min_micro = max_micro AS dead
             FROM a ORDER BY dim""")),

    // ---- approximate kNN GRAPH: q41's capped sign-LSH banding with the
    //      threshold removed, symmetrized so each unordered candidate
    //      feeds both endpoints, then a per-node (cos DESC, neighbor)
    //      rank window keeping the top [[KnnGraphK]]. The substrate for
    //      SemDeDup pruning / graph clustering / diversity walks. The
    //      oracle mirrors banding, cap, symmetrization and window
    //      bit-for-bit (cosines are sequential folds — identical IEEE
    //      sequences in both engines, so the rank cannot diverge). ----
    "q151_knn_graph" -> QueryDef(
      (s, dir) => knnGraphCached(s, dir)
        .orderBy(col("vec_id"), col("rank")),
      Some(s"""WITH $knnGraphDuckCtes
           SELECT va AS vec_id, CAST(rank AS BIGINT) AS rank,
             vb AS neighbor, round(cos, 4) AS cos_sim
           FROM ranked WHERE rank <= $KnnGraphK
           ORDER BY vec_id, rank""")),

    // ---- HOLD-OUT kNN LABEL VOTE: a deterministic 20% of vectors hide
    //      their label and predict the plurality among their q151-graph
    //      neighbors that kept theirs — the (true, predicted) confusion
    //      matrix whose diagonal mass says whether the label column is
    //      consistent enough in embedding space to train a filter on
    //      (the evaluation half of label propagation, one synchronous
    //      round). −1 = no labeled neighbor survived the band cap.
    //      Scale: rides the q151 banded graph; everything downstream is
    //      equi-joins + combinable counts + a ≤K-row-per-vector rank
    //      window; output ≤ (labels+1)² rows. ----
    "q179_knn_label_eval" -> QueryDef(
      (s, dir) => knnLabelEval(Tables.load(s, dir, "embeddings"),
        Some(knnGraphCached(s, dir))),
      Some(s"""WITH $knnGraphDuckCtes,
             g AS (SELECT va AS vec_id, vb AS neighbor
                   FROM ranked WHERE rank <= $KnnGraphK),
             lbl AS (
               SELECT vec_id, CAST(label AS BIGINT) AS label,
                 CAST(('0x' || substr(md5('lp:' ||
                   CAST(vec_id AS VARCHAR)), 1, 14)) AS BIGINT) % 5 AS hb
               FROM embeddings),
             seeds AS (SELECT vec_id AS neighbor, label AS n_label
                       FROM lbl WHERE hb <> 0),
             held AS (SELECT vec_id, label AS true_label
                      FROM lbl WHERE hb = 0),
             votes AS (
               SELECT h.vec_id, h.true_label, s.n_label, count(*) AS nv
               FROM held h JOIN g USING (vec_id) JOIN seeds s
                 USING (neighbor)
               GROUP BY h.vec_id, h.true_label, s.n_label),
             pred AS (
               SELECT vec_id, n_label AS pred_label FROM (
                 SELECT vec_id, n_label,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY nv DESC, n_label) AS rk
                 FROM votes) WHERE rk = 1)
             SELECT h.true_label,
               coalesce(p.pred_label, -1) AS pred_label,
               count(*) AS n_vecs
             FROM held h LEFT JOIN pred p ON h.vec_id = p.vec_id
             GROUP BY h.true_label, coalesce(p.pred_label, -1)
             ORDER BY true_label, pred_label""")),

    // ---- HARD-NEGATIVE MINING for retrieval/contrastive training: per
    //      query vector, the exact-ranked neighbors at ranks
    //      [[HardNegFrom]]..[[HardNegTo]] AFTER dropping candidates
    //      above the near-dup ceiling (cos ≥ 0.95 — likely unlabeled
    //      POSITIVES; feeding them as negatives poisons the loss, the
    //      standard denoising rule in dense-retrieval training). The
    //      top-3 stay q35's positives; this emits the band just below —
    //      similar enough to be hard, dissimilar enough to be safely
    //      negative. Same scale shape as q35: the 10-query set is the
    //      broadcast side, the corpus streams once; the rank window
    //      partitions per query. ----
    "q159_hard_negatives" -> QueryDef(
      (s, dir) => {
        val corpus = normed(s, dir)
        val queries = corpus.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("de").as("qe"),
            col("nrm").as("qn"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
          .withColumn("cos", expr(dotExpr("qe", "de")) / (col("qn") * col("nrm")))
          .filter(col("cos") < HardNegDupCos)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank").between(HardNegFrom, HardNegTo))
          .select(col("query_id"), col("rank").cast("long").as("rank"),
            col("vec_id").as("neighbor_id"),
            round(col("cos"), 4).as("cos_sim"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
                        FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
                   FROM n WHERE vec_id < 10),
             scored AS (
               SELECT q.query_id, n.vec_id,
                 ${duckDot("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cos
               FROM n JOIN q ON n.vec_id <> q.query_id),
             ranked AS (
               SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, vec_id) AS rank
               FROM scored WHERE cos < $HardNegDupCos)
             SELECT query_id, CAST(rank AS BIGINT) AS rank,
               vec_id AS neighbor_id, round(cos, 4) AS cos_sim
             FROM ranked WHERE rank BETWEEN $HardNegFrom AND $HardNegTo
             ORDER BY query_id, rank""")),

    // ---- COSINE-threshold retention sweep: q141's curve pointed at the
    //      SEMANTIC pair generator — per 500-bp cosine bucket over the
    //      q41 candidate set, pairs at that similarity, docs whose BEST
    //      pair sits there (the q141 db-endpoint convention), and the
    //      cumulative pairs/docs a "drop at cos ≥ t" rule would affect.
    //      Buckets come from floor(cos·10000) on the bitwise-identical
    //      raw double — never the rounded display value. Read before
    //      q85/q41 hard-code a threshold, exactly as q141 is read
    //      before q32's. ----
    "q167_cosine_threshold_sweep" -> QueryDef(
      (s, dir) => cosineSweepCached(s, dir).orderBy(col("c_bp")),
      Some(s"""WITH $cosineSweepDuckCtes
           SELECT * FROM sweep ORDER BY c_bp""")),

    // ---- DEDUP OPERATING-POINT pick: for each loss budget in
    //      [[OperatingBudgetsBp]] (the docs a "drop at cos ≥ t" rule may
    //      affect, in basis points), the MOST AGGRESSIVE threshold —
    //      the lowest sweep bucket — whose cumulative affected-doc mass
    //      stays within budget, with the realized stats at that point.
    //      The config-committing step downstream of q167, exactly as a
    //      production run picks nprobe from q116's measured curve
    //      instead of guessing. One broadcast of 4 budget rows over the
    //      ≤~40-row sweep frame. ----
    "q171_dedup_operating_point" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // the cached sweep is a ≤~40-row parquet read — referenced
        // twice below, but re-reading it is cheaper than persist churn
        val sweep = cosineSweepCached(s, dir)
        val budgets = OperatingBudgetsBp.toDF("budget_bp")
        val feasible = budgets.crossJoin(broadcast(sweep))
          .filter(col("docs_ge_bp") <= col("budget_bp"))
        val pick = feasible.groupBy(col("budget_bp"))
          .agg(min(col("c_bp")).as("c_bp"))
        pick.join(sweep, "c_bp")
          .select(col("budget_bp"), col("c_bp").as("threshold_bp"),
            col("pairs_ge"), col("docs_ge"), col("docs_ge_bp"))
          .orderBy(col("budget_bp"))
      },
      Some(s"""WITH $cosineSweepDuckCtes,
           budgets AS (SELECT unnest(ARRAY[${OperatingBudgetsBp
             .mkString(", ")}]) AS budget_bp),
           pick AS (
             SELECT b.budget_bp, min(s.c_bp) AS c_bp
             FROM budgets b JOIN sweep s ON s.docs_ge_bp <= b.budget_bp
             GROUP BY b.budget_bp)
           SELECT p.budget_bp, p.c_bp AS threshold_bp,
             s.pairs_ge, s.docs_ge, s.docs_ge_bp
           FROM pick p JOIN sweep s ON p.c_bp = s.c_bp
           ORDER BY p.budget_bp""")),

    // ---- INCREMENTAL kNN-graph maintenance (q98's delta convention):
    //      the stored base graph's pair list merged with delta-touching
    //      band candidates only, each affected node re-ranked over
    //      (stored top-k ∪ delta candidates) — exact under monotone
    //      candidate growth (see [[knnGraphIncremental]]; KnnIncrSpec
    //      pins incremental ≡ full rebuild while no band crosses the
    //      cap). The graph-pillar completion of the incremental story
    //      q98/q132/q136/q150 tell for indexes, dedup and cards. ----
    "q164_knn_graph_incremental" -> QueryDef(
      (s, dir) => knnGraphIncrementalCached(s, dir),
      Some(s"""WITH baseemb AS (
               SELECT * FROM embeddings WHERE vec_id % 5 <> 4),
           ${knnGraphDuckCtesFrom("baseemb", "b")},
           ${knnGraphDuckCtesFrom("embeddings", "a")},
           g0 AS (SELECT va, vb FROM branked WHERE rank <= $KnnGraphK),
           dc AS (SELECT va, vb FROM acands
                  WHERE va % 5 = 4 OR vb % 5 = 4),
           pool AS (SELECT va, vb FROM g0
                    UNION ALL SELECT va, vb FROM dc
                    UNION ALL SELECT vb AS va, va AS vb FROM dc),
           pscored AS (
             SELECT p.va, p.vb,
               ${duckDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm)
                 AS cos
             FROM pool p JOIN an x ON p.va = x.vec_id
                         JOIN an y ON p.vb = y.vec_id),
           pranked AS (
             SELECT va, vb, cos,
               row_number() OVER (PARTITION BY va
                 ORDER BY cos DESC, vb) AS rank
             FROM pscored)
           SELECT va AS vec_id, CAST(rank AS BIGINT) AS rank,
             vb AS neighbor, round(cos, 4) AS cos_sim
           FROM pranked WHERE rank <= $KnnGraphK
           ORDER BY vec_id, rank""")),

    // ---- CONTRASTIVE-PAIR export: embedding-training data prep — the
    //      verified near-dup pairs (q41's cos ≥ 0.45 — the corpus's
    //      attested positive definition; a tighter bar at this SF would
    //      export an empty set) become (anchor, positive)
    //      training examples, split-assigned train/validation/test by
    //      an md5 over the PAIR key (both endpoints — q65's stability
    //      discipline: adding pairs never reassigns existing ones, and
    //      a pair's split never depends on orientation). The export a
    //      retriever-training run consumes together with q159's hard
    //      negatives. ----
    "q176_contrastive_pairs" -> QueryDef(
      (s, dir) => {
        val pairs = embeddingNeardupPairsCached(s, dir, 0.45)
        pairs
          .withColumn("b", expr(
            """cast(conv(substring(md5(concat('cp:', cast(va as string),
                 ':', cast(vb as string))), 1, 14), 16, 10) as long) % 10"""))
          .withColumn("split",
            when(col("b") < 8, "train").when(col("b") === 8, "validation")
              .otherwise("test"))
          .select(col("va").as("anchor_id"), col("vb").as("positive_id"),
            col("cos_sim"), col("split"))
          .orderBy(col("anchor_id"), col("positive_id"))
      },
      Some {
        s"""WITH n AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
                    FROM embeddings),
           bands0 AS ($neardupBandDuckUnion),
           hot AS (
             SELECT band_idx, band_val FROM bands0
             GROUP BY band_idx, band_val HAVING count(*) > $NeardupBandCap),
           bands AS (
             SELECT b.* FROM bands0 b
             ANTI JOIN hot h USING (band_idx, band_val)),
           cands AS (
             SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
             FROM bands x JOIN bands y
               ON x.band_idx = y.band_idx AND x.band_val = y.band_val
              AND x.vec_id < y.vec_id),
           vp AS (
             SELECT va, vb,
               round(${duckDot("a.embedding", "b.embedding")}
                 / (a.nrm * b.nrm), 4) AS cos_sim
             FROM cands JOIN n a ON va = a.vec_id JOIN n b ON vb = b.vec_id
             WHERE ${duckDot("a.embedding", "b.embedding")}
               / (a.nrm * b.nrm) >= 0.45),
           sp AS (
             SELECT va, vb, cos_sim,
               CAST(('0x' || substr(md5('cp:' || CAST(va AS VARCHAR) || ':'
                 || CAST(vb AS VARCHAR)), 1, 14)) AS BIGINT) % 10 AS b
             FROM vp)
           SELECT va AS anchor_id, vb AS positive_id, cos_sim,
             CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'validation'
               ELSE 'test' END AS split
           FROM sp
           ORDER BY anchor_id, positive_id"""
      }),

    // ---- DUP-SIGNAL AGREEMENT audit: the lexical near-dup pair set
    //      (q33 MinHash candidates) against the semantic one (q41
    //      cos ≥ 0.45 verified pairs), under the doc_id ≡ vec_id
    //      convention the q117 ledger already rides. Lexical-only pairs
    //      are surface copies with drifted embeddings; semantic-only
    //      pairs are paraphrases exact-shingle dedup misses — the
    //      one-row report that tells a pipeline whether running BOTH
    //      dedup passes still pays. One full-outer join of two bounded
    //      pair lists + one fold; agreement is the int64-bp Jaccard of
    //      the two sets. ----
    "q161_dup_signal_agreement" -> QueryDef(
      (s, dir) => {
        val lex = Dedup.lshCandidatePairsCached(s, dir)
          .select(col("da"), col("db")).withColumn("in_lex", lit(1L))
        val sem = embeddingNeardupPairsCached(s, dir, 0.45)
          .select(col("va").as("da"), col("vb").as("db"))
          .withColumn("in_sem", lit(1L))
        // coalesce: an EMPTY pair set on either side (sf0.001 has no
        // cos ≥ 0.45 semantic pairs) must yield 0 like the oracle's
        // per-row-coalesced sums, not a NULL that the hash compare
        // reads as NaN (the q178 empty-target-set guard)
        lex.join(sem, Seq("da", "db"), "full_outer")
          .agg(coalesce(sum(col("in_lex")), lit(0L)).as("n_lexical"),
            coalesce(sum(col("in_sem")), lit(0L)).as("n_semantic"),
            coalesce(sum(when(col("in_lex").isNotNull &&
                col("in_sem").isNotNull, 1L)
              .otherwise(0L)), lit(0L)).as("n_both"))
          .select(col("n_lexical"), col("n_semantic"), col("n_both"),
            (col("n_lexical") - col("n_both")).as("lexical_only"),
            (col("n_semantic") - col("n_both")).as("semantic_only"),
            expr("""n_both * 10000 div
                    greatest(n_lexical + n_semantic - n_both, 1L)""")
              .as("agreement_bp"))
      },
      Some {
        s"""WITH ${Dedup.duckCandPairsBody("documents", "lx")},
           n AS (SELECT vec_id, embedding, ${duckNorm("embedding")} AS nrm
                 FROM embeddings),
           bands0 AS ($neardupBandDuckUnion),
           hot AS (
             SELECT band_idx, band_val FROM bands0
             GROUP BY band_idx, band_val HAVING count(*) > $NeardupBandCap),
           bands AS (
             SELECT b.* FROM bands0 b
             ANTI JOIN hot h USING (band_idx, band_val)),
           scands AS (
             SELECT DISTINCT x.vec_id AS da, y.vec_id AS db
             FROM bands x JOIN bands y
               ON x.band_idx = y.band_idx AND x.band_val = y.band_val
              AND x.vec_id < y.vec_id),
           sem AS (
             SELECT c.da, c.db FROM scands c
             JOIN n a ON c.da = a.vec_id JOIN n b ON c.db = b.vec_id
             WHERE ${duckDot("a.embedding", "b.embedding")}
               / (a.nrm * b.nrm) >= 0.45),
           lx AS (SELECT da, db, 1 AS in_lex FROM lxcand_pairs),
           sm AS (SELECT da, db, 1 AS in_sem FROM sem),
           j AS (
             SELECT coalesce(lx.in_lex, 0) AS il, coalesce(sm.in_sem, 0) AS
               isem
             FROM lx FULL OUTER JOIN sm
               ON lx.da = sm.da AND lx.db = sm.db)
           SELECT COALESCE(CAST(sum(il) AS BIGINT), 0) AS n_lexical,
             COALESCE(CAST(sum(isem) AS BIGINT), 0) AS n_semantic,
             COALESCE(CAST(sum(il * isem) AS BIGINT), 0) AS n_both,
             COALESCE(CAST(sum(il) - sum(il * isem) AS BIGINT), 0)
               AS lexical_only,
             COALESCE(CAST(sum(isem) - sum(il * isem) AS BIGINT), 0)
               AS semantic_only,
             COALESCE(CAST(sum(il * isem) AS BIGINT), 0) * 10000
               // greatest(COALESCE(CAST(sum(il) + sum(isem)
                 - sum(il * isem) AS BIGINT), 0), 1) AS agreement_bp
           FROM j"""
      }),

    // ---- SEMANTIC COMPONENTS over the MUTUAL kNN graph: keep only
    //      edges both endpoints agree on (b in topk(a) AND a in
    //      topk(b)) — the standard symmetrization that strips hub
    //      nodes' one-way fans — then connected components. This is the
    //      SemDeDup-style cluster structure derived from q151 alone: no
    //      centroids, no K choice. The oracle recomputes components via
    //      a recursive reachability CTE — an independent algorithm, so
    //      the iterative min-propagation and the transitive closure
    //      must agree (the q54 discipline). Scale: the mutual filter is
    //      an (a,b)=(b,a) equi self-join on the N·k edge list; CC is
    //      the checkpointed O(rounds) loop. ----
    "q157_semantic_components" -> QueryDef(
      (s, dir) => semanticComponents(Tables.load(s, dir, "embeddings"),
        graph = Some(knnGraphCached(s, dir))),
      Some(s"""WITH RECURSIVE $knnGraphDuckCtes,
           topk AS (SELECT va, vb FROM ranked WHERE rank <= $KnnGraphK),
           mutual AS (
             SELECT x.va AS da, x.vb AS db
             FROM topk x JOIN topk y ON x.va = y.vb AND x.vb = y.va
             WHERE x.va < x.vb),
           edges AS (SELECT da AS src, db AS dst FROM mutual
                     UNION ALL
                     SELECT db AS src, da AS dst FROM mutual),
           reach(vid, r) AS (
             SELECT DISTINCT src AS vid, src AS r FROM edges
             UNION
             SELECT e.dst AS vid, reach.r
             FROM reach JOIN edges e ON e.src = reach.vid),
           labels AS (
             SELECT vid, min(r) AS cluster_id FROM reach GROUP BY vid),
           sizes AS (
             SELECT cluster_id, count(*) AS cluster_size
             FROM labels GROUP BY cluster_id)
           SELECT l.vid AS vec_id, l.cluster_id, s.cluster_size
           FROM labels l JOIN sizes s USING (cluster_id)
           ORDER BY vec_id""")),

    // ---- per-dup-cluster embedding MEDOID: the semantic canonical-
    //      selection signal (see [[clusterMedoids]]) next to q81's
    //      quality keeper and q106's graph centrality — three
    //      independent answers to "which member represents the
    //      cluster". Oracle re-derives the q54 components via the
    //      recursive reachability CTE, then replays the capped
    //      all-pairs fixed-point cosine argmax. ----
    "q209_cluster_medoids" -> QueryDef(
      (s, dir) => clusterMedoids(
        Dedup.connectedComponents(Dedup.lshCandidatePairsCached(s, dir)),
        Tables.load(s, dir, "embeddings")),
      Some(s"""WITH RECURSIVE ${Dedup.duckCandPairsBody()},
           edges AS (SELECT da AS src, db AS dst FROM cand_pairs
                     UNION ALL
                     SELECT db AS src, da AS dst FROM cand_pairs),
           reach(doc_id, r) AS (
             SELECT DISTINCT src AS doc_id, src AS r FROM edges
             UNION
             SELECT e.dst AS doc_id, reach.r
             FROM reach JOIN edges e ON e.src = reach.doc_id),
           labels AS (
             SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
           sizes AS (
             SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
             FROM labels GROUP BY cluster_id),
           en AS (
             SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS de
             FROM embeddings),
           en2 AS (SELECT vec_id, de, ${duckNorm("de")} AS nrm FROM en),
           memb0 AS (
             SELECT l.doc_id, l.cluster_id, e.de, e.nrm,
               row_number() OVER (PARTITION BY l.cluster_id
                 ORDER BY l.doc_id) AS rk
             FROM labels l JOIN en2 e ON e.vec_id = l.doc_id),
           memb AS (SELECT * FROM memb0 WHERE rk <= $MedoidMemberCap),
           p AS (
             SELECT a.cluster_id, a.doc_id,
               greatest(CAST(floor(${duckDot("a.de", "b.de")}
                 / (a.nrm * b.nrm) * 10000) AS BIGINT), -10000) + 10000
                 AS cos_off
             FROM memb a JOIN memb b
               ON a.cluster_id = b.cluster_id AND a.doc_id <> b.doc_id),
           sums AS (
             SELECT cluster_id, doc_id, CAST(sum(cos_off) AS BIGINT) AS s_off,
               CAST(count(*) AS BIGINT) AS n_scored_others
             FROM p GROUP BY 1, 2),
           med AS (
             SELECT *, row_number() OVER (PARTITION BY cluster_id
               ORDER BY s_off DESC, doc_id) AS mrk
             FROM sums)
           SELECT m.cluster_id, z.cluster_size, m.doc_id AS medoid_id,
             m.n_scored_others,
             m.s_off // m.n_scored_others - 10000 AS mean_cos_fp
           FROM med m JOIN sizes z USING (cluster_id)
           WHERE m.mrk = 1
           ORDER BY cluster_id""")),
  )

  /** q143's per-dimension health card over a (vec_id, embedding) frame —
    * exposed for planted-vector specs. All statistics are int64
    * fixed-point surrogates (micro-units for mean/extremes, milli-unit
    * squares for the variance surrogate); `dead` flags dimensions whose
    * fixed-point min equals their max. */
  def embeddingDimStats(emb: DataFrame): DataFrame = emb
    .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
    .select(col("dim").cast("long").as("dim"),
      col("x").cast("double").as("xd"))
    .withColumn("sv", expr("cast(floor(xd * 1000000D) as bigint)"))
    .withColumn("sq", expr("sv div 1000"))
    .groupBy(col("dim"))
    .agg(count(lit(1)).as("n_vecs"),
      sum(col("sv")).as("sum_micro"),
      min(col("sv")).as("min_micro"),
      max(col("sv")).as("max_micro"),
      sum(when(col("xd") === 0.0d, 1L).otherwise(0L)).as("n_zero"),
      sum(expr("sq * sq")).as("ssq"),
      sum(col("sq")).as("sm"))
    .select(col("dim"), col("n_vecs"),
      expr("sum_micro div n_vecs").as("mean_micro"),
      col("min_micro"), col("max_micro"), col("n_zero"),
      expr("ssq div n_vecs - (sm div n_vecs) * (sm div n_vecs)")
        .as("var_milli2"),
      (col("min_micro") === col("max_micro")).as("dead"))
    .orderBy(col("dim"))

  /** The q146 operator over a (vec_id, embedding) frame — exposed for
    * planted-direction specs. Returns one row per dimension with the
    * dominant eigendirection's fixed-point loading. See the q146 defs
    * entry for the full scale/parity story. */
  def principalComponent(emb: DataFrame,
      rounds: Int = PowerIterRounds): DataFrame = {
    val spark = emb.sparkSession
    // Examined r17 and deliberately KEPT the single nested-plan shape:
    // the q103-style rewrite (per-round bounded 1-row collect + driver-
    // local renormalize, both with inline-literal and array-literal v)
    // measured 1.50 → ~2.1 s isolated steady — 8 separately planned and
    // scheduled executions cost more than one 30-node plan whose rounds
    // AQE sequences internally, and the per-round corpus aggregate (the
    // div nonlinearity makes it irreducible) dominates at scale either
    // way. vec_id is projected out of the persisted matrix (the one
    // keeper from the attempt — 8 bytes/vector off every round's scan).
    val mat = emb.select(
      expr("transform(embedding, x -> " +
        "cast(floor(cast(x as double) * 1000000D) as bigint))").as("q"))
      .transform(TransientCache.scopedDF)
    val v0 = spark.range(1)
      .select(array((0 until EmbDim).map(_ => lit(1000000L)): _*).as("v"))
    val vFinal = (1 to rounds).foldLeft(v0) { (v, _) =>
      val s = mat.crossJoin(broadcast(v))
        .withColumn("t", expr(
          "aggregate(zip_with(q, v, (a, b) -> a * b), 0L, " +
            s"(acc, x) -> acc + x) div ${1L << PowerShift}L"))
      val sums = (0 until EmbDim).map(d =>
        sum(expr(s"t * q[$d]")).cast("long").as(s"u$d"))
      s.agg(sums.head, sums.tail: _*)
        .select(array((0 until EmbDim).map(d => col(s"u$d")): _*).as("u"))
        .withColumn("m",
          expr("greatest(array_max(transform(u, y -> abs(y))) div 1000000L, 1L)"))
        .select(expr("transform(u, x -> x div m)").as("v"))
    }
    vFinal
      .select(posexplode(col("v")).as(Seq("dim", "loading_micro")))
      .select(col("dim").cast("long").as("dim"), col("loading_micro"))
      .orderBy(col("dim"))
  }

  /** The q146 oracle: the identical fixed-point power iteration unrolled
    * `rounds` times — per round a projection/shift CTE, a per-dimension
    * outer-product sum, list assembly, and the truncating renormalize.
    * Every intermediate is CAST to BIGINT so DuckDB's HUGEINT promotion
    * never reaches a comparison or output. */
  private def powerIterDuck(rounds: Int): String = {
    val shift = 1L << PowerShift
    val d1 = EmbDim + 1
    val roundCtes = (1 to rounds).map { r =>
      s"""s$r AS (
           SELECT m.vec_id, m.q,
             CAST(list_sum(list_transform(range(1, $d1),
               d -> m.q[d] * vv.v[d])) // $shift AS BIGINT) AS t
           FROM mat m CROSS JOIN v${r - 1} vv),
         u$r AS (
           SELECT ds.d, CAST(sum(s.t * s.q[ds.d]) AS BIGINT) AS u
           FROM s$r s
           CROSS JOIN (SELECT unnest(range(1, $d1)) AS d) ds
           GROUP BY ds.d),
         w$r AS (SELECT list(u ORDER BY d) AS u FROM u$r),
         m$r AS (
           SELECT greatest(CAST(list_max(list_transform(u, y -> abs(y)))
             AS BIGINT) // 1000000, 1) AS m
           FROM w$r),
         v$r AS (
           SELECT list_transform(w.u, x -> CAST(x // mm.m AS BIGINT)) AS v
           FROM w$r w CROSS JOIN m$r mm)"""
    }.mkString(",\n")
    s"""WITH mat AS (
           SELECT vec_id, list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
           FROM embeddings),
         v0 AS (SELECT list_transform(range(1, $d1),
                  d -> CAST(1000000 AS BIGINT)) AS v),
         $roundCtes
         SELECT CAST(d - 1 AS BIGINT) AS dim, loading_micro
         FROM (SELECT unnest(v) AS loading_micro,
                 generate_subscripts(v, 1) AS d
               FROM v$rounds)
         ORDER BY dim"""
  }

  /** The q109 oracle's full CTE chain — `pn` (double-cast corpus), `pq`
    * (the query set), four per-subspace codebook trainings (the q70 CTE
    * shape on sliced lists), `wide` (the 4-byte codes) and `adc` (the
    * LUT-joined asymmetric distances). Shared by the q109 oracle and
    * q102's pq recall row. */
  private def pqDuckChain: String = {
    import Clustering.{PqSubspaces, PqSubDim, K}
    def l1 = Clustering.l1DuckExpr _
    val subCtes = (0 until PqSubspaces).map { i =>
      val (lo, hi) = (i * PqSubDim + 1, (i + 1) * PqSubDim)
      s"""s${i}n AS (SELECT vec_id, de[$lo:$hi] AS de FROM pn),
         s${i}c0 AS (SELECT vec_id AS cid, de AS cde FROM s${i}n
                     WHERE vec_id < $K),
         s${i}a1 AS (
           SELECT vec_id, de, cid AS cluster_id FROM (
             SELECT n.vec_id, n.de, c0.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY ${l1("n.de", "c0.cde")}, c0.cid) AS crank
             FROM s${i}n n CROSS JOIN s${i}c0 c0) WHERE crank = 1),
         s${i}dims AS (
           SELECT cluster_id, generate_subscripts(de, 1) AS dim,
             unnest(de) AS v
           FROM s${i}a1),
         s${i}med AS (
           SELECT cluster_id, dim, quantile_disc(v, 0.5) AS med
           FROM s${i}dims GROUP BY cluster_id, dim),
         s${i}c1 AS (
           SELECT cluster_id AS cid, list(med ORDER BY dim) AS cde
           FROM s${i}med GROUP BY cluster_id),
         s${i}code AS (
           SELECT vec_id, cid AS code FROM (
             SELECT n.vec_id, c1.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY ${l1("n.de", "c1.cde")}, c1.cid) AS crank
             FROM s${i}n n CROSS JOIN s${i}c1 c1) WHERE crank = 1),
         s${i}lut AS (
           SELECT q.query_id, c1.cid,
             ${l1(s"q.qe[$lo:$hi]", "c1.cde")} AS d$i
           FROM pq q CROSS JOIN s${i}c1 c1)"""
    }.mkString(",\n")
    s"""pn AS (
         SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS de
         FROM embeddings),
       pq AS (SELECT vec_id AS query_id, de AS qe FROM pn
              WHERE vec_id < $NumQueries),
       $subCtes,
       wide AS (
         SELECT a.vec_id, a.code AS c0, b.code AS c1, c.code AS c2,
           d.code AS c3
         FROM s0code a JOIN s1code b USING (vec_id)
         JOIN s2code c USING (vec_id) JOIN s3code d USING (vec_id)),
       adc AS (
         SELECT l0.query_id, w.vec_id,
           l0.d0 + l1.d1 + l2.d2 + l3.d3 AS adc
         FROM wide w
         JOIN s0lut l0 ON l0.cid = w.c0
         JOIN s1lut l1 ON l1.cid = w.c1 AND l1.query_id = l0.query_id
         JOIN s2lut l2 ON l2.cid = w.c2 AND l2.query_id = l0.query_id
         JOIN s3lut l3 ON l3.cid = w.c3 AND l3.query_id = l0.query_id
         WHERE w.vec_id <> l0.query_id)"""
  }
}
