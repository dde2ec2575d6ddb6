package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Embedding clustering for corpus bucketing: k-medians (Lloyd iterations
  * with per-dimension LOWER medians and L1 distance), the clustering step
  * a training-data pipeline uses for diversity sampling / data-mixing
  * buckets over document embeddings.
  *
  * Why k-MEDIANS and not k-means here: the centroid update is a
  * per-dimension median instead of a mean. A mean is a float SUM whose
  * order differs between engines and partitionings (the classic parity
  * hazard, DESIGN.md), while the LOWER median — the element at rank
  * `(n+1) div 2` of the sorted dimension values — is an ACTUAL ELEMENT
  * VALUE, bitwise identical everywhere, no interpolation, no rounding
  * grid. Distances are sequential folds (zip_with + aggregate ≡ DuckDB's
  * 0-prepended list_reduce), so assignments agree exactly and the whole
  * iterative pipeline hash-matches the oracle with no tolerance games.
  *
  * Scale shape per iteration: centroids are K tiny rows — always a
  * BROADCAST join against the corpus (never a shuffle of the vectors);
  * the median update shuffles (cluster, dim) keyed rows into K·dim
  * groups, each computed by a partitioned window (no per-group arrays
  * collected, so a billion-vector cluster streams through its sort
  * rather than materializing). Iteration count is fixed and small — the
  * standard practice for corpus bucketing, where convergence-to-epsilon
  * buys nothing.
  */
object Clustering {

  /** Cluster count for the fixed-K profiles (q70 k-medians, where the
    * bucket count is the user's choice): the first K vectors seed the
    * centroids (deterministic init, mirrored in the oracle — same
    * pattern as the IVF centroids in q43). The SCALE-DRIVEN paths
    * (q85/q94 via [[assignClusters]]) do NOT use this constant — their K
    * grows with the corpus, see [[clusterCount]]. */
  val K = 8

  /** Intended members per cluster for the scale-driven assignment:
    * [[clusterCount]] grows K as N/TargetClusterSize so per-cluster work
    * stays bounded as the corpus grows. */
  val TargetClusterSize = 64

  /** Ceiling on the derived K: centroids are BROADCAST to every
    * executor (4096 × 64-dim doubles ≈ 2 MB — always broadcastable).
    * Past MaxCentroids·TargetClusterSize vectors (~256 k) clusters grow
    * beyond target size again; that overflow is what
    * [[MaxClusterMembers]] bounds (and q82's `semantic_cluster` row
    * measures). */
  val MaxCentroids = 4096

  /** Above this K the assignment goes HIERARCHICAL (coarse-then-fine):
    * a flat scan against K centroids is O(N·K) dot products — at
    * K = 4096 that is 4096 broadcast comparisons per vector, the
    * single-level wall. Two levels cost O(N·K/64) coarse + O(N·64)
    * fine comparisons instead; 64 also keeps the per-vector fine
    * candidate set one window wide. Below the threshold (every test
    * SF: K = 8 at sf0.01, 32 at sf0.1) the flat path runs and the
    * DuckDB oracles replay it verbatim; the hierarchical path is
    * pinned by a brute-force spec on a synthetic 6k-vector corpus. */
  val TwoLevelThreshold = 64

  /** Fine seeds per coarse cluster on the hierarchical path. */
  val FinePerCoarse = 64

  /** Threshold/fan-out overrides for q101, the DRIVER-GATED probe of the
    * hierarchical path: with the production [[TwoLevelThreshold]] every
    * shipped SF derives K ≤ 64 and the DuckDB gate only ever replays the
    * flat branch — the hierarchical branch stayed spec-only trust. q101
    * runs the SAME [[twoLevelAssign]] code with the switch lowered to 4
    * and the fine fan-out lowered to 4, so at sf0.01 (K = 8) BOTH levels
    * make non-trivial choices (2 coarse seeds, 4 fine seeds each) and
    * the oracle's `hasg` branch — not `fasg` — is what the hash compare
    * certifies. Production queries (q85/q90/q94) are untouched. */
  val HierProbeThreshold = 4
  val HierProbeFinePerCoarse = 4

  /** Hard per-cluster participation cap for the q85 within-cluster pair
    * join: only the MaxClusterMembers smallest vec_ids of each cluster
    * enter the self-join, so one degenerate cluster of size m costs
    * min(m, cap)²/2 pairs instead of m²/2 — the semantic-path analog of
    * [[Dedup.HotBandCap]], ENFORCED here and REPORTED via q82's
    * `semantic_cluster` row (dropped_rows = excess members, which are
    * conservatively KEPT in the corpus — they just can't be flagged as
    * duplicates). 4× the target cluster size, so the cap only engages
    * on genuinely skewed clusters. */
  val MaxClusterMembers = 256

  /** K for a corpus of `n` vectors: n/TargetClusterSize rounded up,
    * clamped to [[[K]], [[MaxCentroids]]] — pure int64 arithmetic so the
    * oracle's `least(greatest((count(*) + 63) // 64, 8), 4096)` computes
    * the identical value. */
  def clusterCount(n: Long): Int =
    math.min(MaxCentroids.toLong,
      math.max(K.toLong, (n + TargetClusterSize - 1) / TargetClusterSize)).toInt

  private val toDouble = "transform(embedding, x -> cast(x as double))"

  /** L1 distance as a sequential left fold — bitwise identical in both
    * engines for identical inputs. */
  private def l1Spark(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> abs(x - y)), 0D, (acc, v) -> acc + v)"

  private def l1Duck(a: String, b: String) =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(list_zip($a, $b), s -> abs(s[1] - s[2]))),
        (acc, v) -> acc + v)"""

  private def dotDuck(a: String, b: String) =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(list_zip($a, $b),
            s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))),
          (acc, v) -> acc + v)"""

  /** Nearest-centroid assignment: broadcast the K centroids, argmin L1
    * with the centroid id as the deterministic tie-break. */
  private def assign(n: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    n.join(broadcast(cents))
      .withColumn("dist", expr(l1Spark("de", "cde")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("de"), col("cid").as("cluster_id"), col("dist"))
  }

  /** Per-dimension LOWER median of each cluster's members, reassembled
    * into centroid arrays. The median element is found by a partitioned
    * window (rank (n+1) div 2 of the sorted dimension values) — K·dim
    * groups of parallelism, no collected per-group state; only the
    * 64-element centroid assembly collects, bounded by the DIMENSION
    * count, not the cluster size. */
  private def updateCentroids(assigned: DataFrame): DataFrame = {
    val wSort = Window.partitionBy(col("cluster_id"), col("dim")).orderBy(col("v"))
    val wCnt = Window.partitionBy(col("cluster_id"), col("dim"))
    assigned
      .select(col("cluster_id"), posexplode(col("de")).as(Seq("dim", "v")))
      .withColumn("rn", row_number().over(wSort))
      .withColumn("cnt", count(lit(1)).over(wCnt))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .groupBy(col("cluster_id"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, v))), s -> s.v)")
        .as("cde"))
      .select(col("cluster_id").as("cid"), col("cde"))
  }

  /** The full pipeline over a raw (vec_id, embedding) frame: seed →
    * assign → median update → assign, reporting per-cluster size and the
    * lower-median member distance (a dispersion read-out that is itself
    * an exact element value). `preAssign` substitutes the trained
    * assignment ([[kmedAssignCached]] — identical values, so the
    * readout is bitwise unchanged); the default path trains inline
    * (specs, raw frames). */
  def kmediansProfile(emb: DataFrame,
      preAssign: Option[DataFrame] = None): DataFrame = {
    val a2 = preAssign.getOrElse {
      val n = kmedInput(emb).transform(TransientCache.scopedDF)
      assign(n, kmedTrain(n))
    }
    val wSort = Window.partitionBy(col("cluster_id"))
      .orderBy(col("dist"), col("vec_id"))
    val wCnt = Window.partitionBy(col("cluster_id"))
    a2.withColumn("rn", row_number().over(wSort))
      .withColumn("cnt", count(lit(1)).over(wCnt))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("cluster_id"), col("cnt").as("n_members"),
        round(col("dist"), 4).as("med_l1"))
      .orderBy(col("cluster_id"))
  }

  /** The q113 operator over a raw (vec_id, embedding) frame: per-cluster
    * lower-median cohesion (L1 to the own centroid) vs separation
    * (distance to the nearest OTHER centroid) and their ratio, over the
    * same seed→assign→median-update training as [[kmediansProfile]].
    * Exposed so CorpusOpsSpec can assert that planted well-separated
    * clusters score high and overlapping ones score near 1. */
  def clusterQuality(emb: DataFrame,
      preCentroids: Option[DataFrame] = None): DataFrame = {
    val n = kmedInput(emb).transform(TransientCache.scopedDF)
    val cents1 = preCentroids.getOrElse(kmedTrain(n))
    val wAll = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist"), col("cid"))
    val per = n.join(broadcast(cents1))
      .withColumn("dist", expr(l1Spark("de", "cde")))
      .withColumn("crank", row_number().over(wAll))
      .groupBy(col("vec_id"))
      .agg(max(when(col("crank") === 1, col("cid"))).as("cluster_id"),
        max(when(col("crank") === 1, col("dist"))).as("own"),
        min(when(col("crank") > 1, col("dist"))).as("sep"))
    def med(c: String) = {
      val wS = Window.partitionBy(col("cluster_id"))
        .orderBy(col(c), col("vec_id"))
      val wC = Window.partitionBy(col("cluster_id"))
      per.withColumn("rn", row_number().over(wS))
        .withColumn("cnt", count(lit(1)).over(wC))
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("cluster_id"), col("cnt"), col(c).as(s"med_$c"))
    }
    med("own").join(med("sep").drop("cnt"), "cluster_id")
      .select(col("cluster_id"), col("cnt").as("n_members"),
        round(col("med_own"), 4).as("med_cohesion"),
        round(col("med_sep"), 4).as("med_separation"),
        round(col("med_sep") / col("med_own"), 4).as("sep_ratio"))
      .orderBy(col("cluster_id"))
  }

  /** Product-quantization geometry: the 64-dim embedding splits into
    * [[PqSubspaces]] contiguous subvectors of [[PqSubDim]] dims; each
    * subspace gets its own [[K]]-centroid k-medians codebook. A vector's
    * code is 4 bytes instead of 64 doubles — 128× smaller — and
    * asymmetric-distance (ADC) scoring needs only 4 table lookups + 3
    * additions per corpus vector, the memory/compute shape that lets a
    * 100 TB corpus keep its WHOLE index in executor memory (Jégou et
    * al. 2011, "Product Quantization for Nearest Neighbor Search"). */
  val PqSubspaces = 4
  val PqSubDim = 16

  /** PQ training + encoding over a (vec_id, embedding) frame: per
    * subspace, the q70 k-medians machinery runs verbatim on the SLICED
    * subvectors (seed = first [[K]] vectors' subvectors, one
    * lower-median Lloyd update, L1 metric — every parity property q70
    * established carries over unchanged), and the final assignment IS
    * the code. Returns (codes = one (vec_id, s, code) row per vector
    * per subspace, books = the 4×[[K]] codebook rows (s, cid, cde)).
    * Scale shape: per subspace one broadcast assign (K tiny rows), one
    * K·dim-group median window, one more broadcast assign — all corpus
    * scans are subvector-width, and the codebooks are 32 rows total. */
  def pqEncode(emb: DataFrame): (DataFrame, DataFrame) = {
    val n = emb
      .withColumn("de", expr(toDouble))
      .select(col("vec_id"), col("de"))
      .transform(TransientCache.scopedDF)
    val subs = (0 until PqSubspaces).map { s =>
      val sub = n.select(col("vec_id"),
        expr(s"slice(de, ${s * PqSubDim + 1}, $PqSubDim)").as("de"))
      val c0 = sub.filter(col("vec_id") < K)
        .select(col("vec_id").as("cid"), col("de").as("cde"))
      val c1 = updateCentroids(assign(sub, c0))
      val a2 = assign(sub, c1)
      (a2.select(col("vec_id"), lit(s).as("s"), col("cluster_id").as("code")),
        c1.select(lit(s).as("s"), col("cid"), col("cde")))
    }
    (subs.map(_._1).reduce(_ unionByName _),
      subs.map(_._2).reduce(_ unionByName _))
  }

  /** L1 fold mirrors for the q109 oracle (same text the q70 oracle
    * uses), exposed to [[Similarity]]. */
  private[ops] def l1SparkExpr(a: String, b: String): String = l1Spark(a, b)
  private[ops] def l1DuckExpr(a: String, b: String): String = l1Duck(a, b)

  /** Exact-verify cosine threshold for a q85 semantic near-dup: same
    * display threshold as q41's sign-LSH path, so the two
    * candidate-generation strategies (banding vs cluster scoping) are
    * directly comparable on the same corpus. */
  val SemDedupMinCos = 0.45

  /** q94: vectors kept per cluster — the per-cluster contribution cap
    * (the embedding-space analog of [[Scrub.QuotaPerSource]]). */
  val ClusterQuota = 20

  /** SemDeDup-style semantic deduplication: cluster-scoped cosine
    * near-dup with greedy keep-first selection — the embedding-space
    * curation pass (Abbas et al. 2023, "SemDeDup") that removes the
    * semantically redundant documents exact text dedup (q31) and
    * token-level near-dup (q33/q62) both miss.
    *
    * Candidate generation is the CLUSTER, not an LSH band: vectors are
    * assigned to their nearest seed centroid by cosine (broadcast over K
    * tiny rows, the q43/q70 shape), and only within-cluster pairs are
    * compared — an equi-join on `cluster_id`, never an all-pairs join.
    * Two scale bounds, both enforced: K GROWS with the corpus
    * ([[clusterCount]] ≈ N / [[TargetClusterSize]], exactly how SemDeDup
    * runs its production sweeps) so expected cluster size stays
    * constant, and [[MaxClusterMembers]] truncates the join membership
    * of any cluster skew still produces — the same role
    * [[Dedup.HotBandCap]] plays on the LSH paths, with the excess
    * surfaced through q82's `semantic_cluster` row.
    *
    * Keeper rule: a vector is DROPPED iff some SMALLER vec_id in its
    * cluster sits within `minCos`; its keeper is the smallest such id
    * (greedy keep-first by id — deterministic, no connected components
    * needed, chains collapse toward the lowest id exactly like q31's
    * first-occurrence keeper). Cosines are [[graft.expr.DotProduct]]
    * folds — identical IEEE sequences in both engines, so the threshold
    * compare and the report agree bitwise. */
  /** Cosine assignment of every vector to its nearest seed centroid —
    * the cluster-scoping step shared by q85 (semantic dedup) and q94
    * (cluster-balanced sampling). K is DERIVED from the corpus size
    * ([[clusterCount]] — one count() over the already-persisted frame,
    * the same bounded-metadata job class as the sharding offsets), and
    * the seeds are the K SMALLEST vec_ids (TakeOrderedAndProject — a
    * distributed top-k, no global sort; also means an id-offset corpus
    * gets real centroids instead of an empty seed set, which `vec_id <
    * K` silently produced). Above [[TwoLevelThreshold]] the assignment
    * goes hierarchical ([[twoLevelAssign]]): per-vector work drops from
    * k to k/64 + 64 comparisons. Returns (vec_id, de, nrm, cluster_id),
    * persisted: callers feed it to multiple consumers, and without the
    * persist the centroid BNLJ + assignment window run once per
    * consumer (visible as duplicated BroadcastNestedLoopJoin subtrees
    * in the physical plan). */
  def assignClusters(emb: DataFrame,
      twoLevelThreshold: Int = TwoLevelThreshold,
      finePerCoarse: Int = FinePerCoarse): DataFrame = {
    val s = emb.sparkSession
    graft.expr.VectorExpressions.register(s)
    val n = emb.repartition(s.sparkContext.defaultParallelism)
      .withColumn("de", expr(toDouble))
      .withColumn("nrm", expr("sqrt(graft_dot(de, de))"))
      .select(col("vec_id"), col("de"), col("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // K derives from the row COUNT, which repartition+projection cannot
    // change — count the SOURCE frame, not `n`: counting n forced a
    // full compute+persist pass as a separate construction-time job,
    // while a plain-scan count is answered from parquet footers
    // (guide §2.4: don't pay a pass for metadata); n still materializes
    // lazily inside the caller's first real action.
    val k = clusterCount(emb.count())
    val assigned =
      if (k <= twoLevelThreshold) flatAssign(n, k)
      else twoLevelAssign(n, k, finePerCoarse)
    // queued at the END of the builder (not scoped at the persist):
    // the n.count() above is a construction-time action and would
    // drain a scoped `n` before `assigned` ever materialized — both
    // frames release together after the caller's first action
    TransientCache.releaseAfterNextAction(n)
    TransientCache.releaseAfterNextAction(
      assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** [[assignClusters]] (default regime) over a data dir's embeddings
    * table, served from the fingerprint-keyed parquet cache
    * ([[FrameCache]]): the centroid-broadcast assignment is the common
    * substrate of q85/q90/q94/q117/q163 and the q82 cluster-cap row —
    * built once per corpus, every consumer reads (vec_id, de, nrm,
    * cluster_id) back with full pushdown. Doubles roundtrip parquet
    * exactly, so downstream cosines stay bitwise-identical to the
    * inline build; row order is NOT preserved — consumers re-sort
    * (every consumer ranks or aggregates with id tie-breaks).
    * Non-default regimes (q101's hierarchical probe) keep the inline
    * path: their params would otherwise need folding into the key for
    * a query that exists precisely to exercise the other branch. */
  def assignClustersCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("clusters", ClustersCacheV,
        Similarity.corpusFingerprint(s, dir))) {
      assignClusters(Tables.load(s, dir, "embeddings"))
    }

  /** Cache-format version ([[FrameCache.path]]): bump with any semantic
    * change to the assignment (K derivation, seed choice, regime
    * threshold, tie-breaks). */
  private val ClustersCacheV = 1

  /** Cache-format version for the q70-family k-medians substrates
    * ([[FrameCache.path]]): the codebook and assignment caches version
    * TOGETHER — bump with any change to the training (seed rule,
    * lower-median update, the L1 fold, [[K]], tie-breaks). */
  private val KMedCacheV = 1

  /** The q70-family input normalization: (vec_id, de). */
  private def kmedInput(emb: DataFrame): DataFrame =
    emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .withColumn("de", expr(toDouble))
      .select(col("vec_id"), col("de"))

  /** The q70-family codebook off a normalized (vec_id, de) frame:
    * seed = vec_id < [[K]] → assign → one lower-median Lloyd update.
    * THE single spelling of the training — the cached builder and
    * every inline fallback (q70/q113/q133 spec paths) call this, so a
    * change to the seed or update rule has one home (plus the
    * [[KMedCacheV]] bump it requires). */
  private def kmedTrain(n: DataFrame): DataFrame =
    updateCentroids(assign(n, n.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("de").as("cde"))))

  /** The trained K=[[K]] k-medians codebook (cid, cde) over a data
    * dir's embeddings, served from the fingerprint cache
    * ([[FrameCache]]): q70 (profile), q113 (quality) and q133
    * (outliers) all train this IDENTICAL codebook — seed = the
    * vec_id < K subvectors, one lower-median Lloyd update — before
    * their own readouts, so a session retrained it three times.
    * [[K]] rows; doubles roundtrip parquet bitwise. */
  def kmedCentroidsCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("kmed8", KMedCacheV,
        Similarity.corpusFingerprint(s, dir))) {
      kmedTrain(kmedInput(Tables.load(s, dir, "embeddings"))
        .transform(TransientCache.scopedDF))
    }

  /** The final nearest-centroid assignment (vec_id, cluster_id, dist)
    * under [[kmedCentroidsCached]] — q70's profile base and q133's
    * outlier base. Built FROM the codebook cache, so a cold session
    * pays exactly one training however many consumers run. Row order
    * is not preserved; both consumers rank/aggregate with (dist,
    * vec_id) tie-breaks and re-sort their output. */
  def kmedAssignCached(s: SparkSession, dir: String): DataFrame =
    FrameCache.serve(s, FrameCache.path("kmedassign", KMedCacheV,
        Similarity.corpusFingerprint(s, dir))) {
      assign(kmedInput(Tables.load(s, dir, "embeddings")),
          kmedCentroidsCached(s, dir))
        .select(col("vec_id"), col("cluster_id"), col("dist"))
    }

  /** Flat assignment: every vector scored against all `k` broadcast
    * seed centroids (the K smallest vec_ids) — O(N·k), fine while k is
    * small; the oracle path. */
  private def flatAssign(n: DataFrame, k: Int): DataFrame = {
    val cents = n.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("de").as("cde"),
        col("nrm").as("cnrm"))
    n.join(broadcast(cents))
      .withColumn("ccos", expr("graft_dot(de, cde)") / (col("nrm") * col("cnrm")))
      .transform(nearestSeed("cid"))
  }

  /** Per-vector argmax over the exploded (vector × candidate-seed)
    * frame: highest cosine, smallest seed id on ties — as ONE
    * partially-aggregable groupBy instead of a row_number window
    * (guide §2.3): the window shuffled k rows per vector and sorted
    * them; the aggregate's map-side combine collapses the k candidates
    * of a vector (emitted together by the broadcast join) to one row
    * BEFORE the exchange, and no sort happens at all. The struct max
    * orders by (cos, -seed): Spark's struct ordering is
    * lexicographic and seed ids are unique within a vector's
    * candidates, so the pick — including NaN-cosine behavior, NaN
    * sorting greatest in both the window and the aggregate ordering —
    * is identical to the window's (cos DESC, seed ASC) rank-1 row. */
  private def nearestSeed(seedCol: String, cosCol: String = "ccos")(
      cands: DataFrame): DataFrame =
    cands.groupBy(col("vec_id"))
      .agg(max(struct(col(cosCol), (-col(seedCol)).as("nseed"),
        col(seedCol).as("seed"), col("de"), col("nrm"))).as("m"))
      .select(col("vec_id"), col("m.de").as("de"), col("m.nrm").as("nrm"),
        col("m.seed").as("cluster_id"))

  /** Hierarchical assignment for large K: (1) assign every vector to
    * one of ceil(k/[[FinePerCoarse]]) COARSE seeds (broadcast, O(N·k/64));
    * (2) within each coarse cluster the [[FinePerCoarse]] smallest
    * member ids become FINE seeds, and members re-assign among their
    * OWN coarse cluster's fine seeds — an equi-join on `coarse_id`
    * (hash join, ≤64-row fan-out per vector, O(N·64)), never a second
    * full broadcast scan. cluster_id = fine seed vec_id; every rank and
    * argmax tie-breaks by id, so the whole path is deterministic and
    * the brute-force spec replays it bitwise. */
  private def twoLevelAssign(n: DataFrame, k: Int,
      finePerCoarse: Int = FinePerCoarse): DataFrame = {
    val k1 = (k + finePerCoarse - 1) / finePerCoarse
    val coarse = n.orderBy(col("vec_id")).limit(k1)
      .select(col("vec_id").as("ccid"), col("de").as("cde"),
        col("nrm").as("cnrm"))
    val atCoarse = n.join(broadcast(coarse))
      .withColumn("ccos", expr("graft_dot(de, cde)") / (col("nrm") * col("cnrm")))
      .transform(nearestSeed("ccid"))
      .withColumnRenamed("cluster_id", "coarse_id")
      .transform(TransientCache.scopedDF)
    val wSeed = Window.partitionBy(col("coarse_id")).orderBy(col("vec_id"))
    val fine = atCoarse.withColumn("srank", row_number().over(wSeed))
      .filter(col("srank") <= finePerCoarse)
      .select(col("coarse_id"), col("vec_id").as("cid"),
        col("de").as("fde"), col("nrm").as("fnrm"))
    atCoarse.join(broadcast(fine), "coarse_id")
      .withColumn("fcos", expr("graft_dot(de, fde)") / (col("nrm") * col("fnrm")))
      .transform(nearestSeed("cid", "fcos"))
  }

  /** Per-cluster (cnt, hot, drop_cnt) under the [[MaxClusterMembers]]
    * participation cap — the `semantic_cluster` feed for q82's cap
    * report. Unlike the band paths (whole hot group excluded),
    * the semantic cap TRUNCATES: the cap keeps the first
    * MaxClusterMembers members, so drop_cnt is the excess, not the
    * whole group. */
  private[graft] def clusterGroupCounts(emb: DataFrame): DataFrame =
    clusterGroupCountsFrom(assignClusters(emb))

  /** [[clusterGroupCounts]] riding the fingerprint-cached assignment. */
  private[graft] def clusterGroupCountsCached(s: SparkSession,
      dir: String): DataFrame =
    clusterGroupCountsFrom(assignClustersCached(s, dir))

  private def clusterGroupCountsFrom(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), (col("cnt") > MaxClusterMembers).as("hot"),
        when(col("cnt") > MaxClusterMembers, col("cnt") - MaxClusterMembers)
          .otherwise(lit(0L)).as("drop_cnt"))

  def semanticDedup(emb: DataFrame, minCos: Double = SemDedupMinCos,
      twoLevelThreshold: Int = TwoLevelThreshold,
      finePerCoarse: Int = FinePerCoarse): DataFrame =
    semanticDedupFrom(assignClusters(emb, twoLevelThreshold, finePerCoarse),
      minCos)

  /** [[semanticDedup]] (default assignment regime) served from the
    * fingerprint-keyed parquet cache — the q85/q90/q117 serve path.
    * r17: the RESULT frame is cached, not just the assignment — the
    * member-cap window + within-cluster pair join + keeper aggregate
    * ran inline per consumer (~0.5 s each at sf0.1, pair-join-sized at
    * scale) though the report is deterministic per corpus. The minCos
    * threshold is folded into the cache name so a non-default caller
    * can never read a default-threshold frame. Bitwise-identical to
    * the inline computation (doubles roundtrip parquet exactly; every
    * pick tie-breaks by id); consumers re-apply their own ORDER BY. */
  def semanticDedupCached(s: SparkSession, dir: String,
      minCos: Double = SemDedupMinCos): DataFrame =
    FrameCache.serve(s, FrameCache.path(
        s"semdedup${math.round(minCos * 100)}",
        SemDedupResCacheV * 100 + ClustersCacheV,
        Similarity.corpusFingerprint(s, dir))) {
      semanticDedupFrom(assignClustersCached(s, dir), minCos)
    }

  /** Cache-format version for the cached [[semanticDedupCached]] result
    * ([[FrameCache.path]]): bump with any change to the dedup pick
    * (member cap, keeper rule, rounding). [[ClustersCacheV]] is folded
    * into the effective version so an assignment-semantics bump rotates
    * this dir too — the result is a pure function of the assignment. */
  private val SemDedupResCacheV = 1

  private def semanticDedupFrom(assigned0: DataFrame,
      minCos: Double): DataFrame = {
    // only the MaxClusterMembers smallest vec_ids of each cluster enter
    // the self-join: a skewed cluster of size m costs min(m, cap)²/2
    // pairs, never m²/2 — what the cap excludes is measurable through
    // q82's semantic_cluster row (see [[clusterGroupCounts]])
    val wMem = Window.partitionBy(col("cluster_id")).orderBy(col("vec_id"))
    val assigned = assigned0
      .withColumn("mrank", row_number().over(wMem))
      .filter(col("mrank") <= MaxClusterMembers)
    val a = assigned.select(col("cluster_id"), col("vec_id").as("va"),
      col("de").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("cluster_id"), col("vec_id").as("vb"),
      col("de").as("eb"), col("nrm").as("nb"))
    val pairs = a.join(b, "cluster_id")
      .filter(col("va") < col("vb"))
      .withColumn("cos", expr("graft_dot(ea, eb)") / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
    // keeper = smallest near-dup va per vb: a partially-aggregable
    // struct-min (va is unique within a vb group, and cluster_id is
    // constant over it), not a per-vb rank window — same pick, no
    // sort, k-to-1 map-side collapse before the exchange (guide §2.3)
    pairs.groupBy(col("vb"))
      .agg(min(struct(col("va"), col("cluster_id"), col("cos"))).as("m"))
      .select(col("m.cluster_id").as("cluster_id"), col("vb").as("dropped_id"),
        col("m.va").as("keeper_id"), round(col("m.cos"), 4).as("cos_sim"))
      .orderBy(col("cluster_id"), col("dropped_id"))
  }

  /** DuckDB CTE chain mirroring [[semanticDedup]] up to the thresholded
    * within-cluster near-dup pairs (`hits`: cluster_id, va, vb, cos) —
    * shared by the q85 oracle and the q90 curation-ledger oracle so the
    * semantic-dedup definition exists once per engine. BOTH assignment
    * regimes are replayed — `fasg` (flat) and `hasg` (hierarchical,
    * mirroring [[twoLevelAssign]]) — and `asg` selects by the same
    * derived-K threshold the Spark side switches on, so the oracle
    * stays exact at ANY corpus size, not just below the threshold
    * (validated against a bitwise brute-force mirror at 6k vectors;
    * the unselected branch's constant-false predicate costs nothing at
    * oracle scales). */
  private[ops] def semanticDedupDuckCtes(
      threshold: Int = TwoLevelThreshold,
      fpc: Int = FinePerCoarse): String =
    s"""n AS (
               SELECT vec_id, embedding,
                 sqrt(${dotDuck("embedding", "embedding")}) AS nrm
               FROM embeddings),
             kv AS (
               SELECT k, (k + ${fpc - 1}) // $fpc AS k1
               FROM (SELECT least(greatest((count(*) + ${TargetClusterSize - 1})
                 // $TargetClusterSize, $K), $MaxCentroids) AS k FROM n)),
             c AS (SELECT vec_id AS cid, embedding AS cde, nrm AS cnrm
                   FROM (SELECT *, row_number() OVER (ORDER BY vec_id)
                           AS srank FROM n)
                   WHERE srank <= (SELECT k FROM kv)),
             ap AS (
               SELECT n.vec_id, n.embedding, n.nrm, c.cid,
                 ${dotDuck("n.embedding", "c.cde")} / (n.nrm * c.cnrm) AS ccos
               FROM n CROSS JOIN c),
             fasg AS (
               SELECT vec_id, embedding, nrm, cid AS cluster_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cid) AS crank
                 FROM ap) WHERE crank = 1),
             cc AS (SELECT vec_id AS ccid, embedding AS cde, nrm AS cnrm
                    FROM (SELECT *, row_number() OVER (ORDER BY vec_id)
                            AS srank FROM n)
                    WHERE srank <= (SELECT k1 FROM kv)),
             cga AS (
               SELECT vec_id, embedding, nrm, ccid AS coarse_id FROM (
                 SELECT n.vec_id, n.embedding, n.nrm, cc.ccid,
                   row_number() OVER (PARTITION BY n.vec_id ORDER BY
                     ${dotDuck("n.embedding", "cc.cde")} / (n.nrm * cc.cnrm)
                       DESC, cc.ccid) AS crank
                 FROM n CROSS JOIN cc) WHERE crank = 1),
             fs AS (
               SELECT coarse_id, vec_id AS cid, embedding AS fde,
                 nrm AS fnrm
               FROM (SELECT *, row_number() OVER (PARTITION BY coarse_id
                       ORDER BY vec_id) AS srank
                     FROM cga) WHERE srank <= $fpc),
             hasg AS (
               SELECT vec_id, embedding, nrm, cid AS cluster_id FROM (
                 SELECT g.vec_id, g.embedding, g.nrm, f.cid,
                   row_number() OVER (PARTITION BY g.vec_id ORDER BY
                     ${dotDuck("g.embedding", "f.fde")} / (g.nrm * f.fnrm)
                       DESC, f.cid) AS frank
                 FROM cga g JOIN fs f USING (coarse_id)) WHERE frank = 1),
             asg AS (
               SELECT vec_id, embedding, nrm, cluster_id FROM fasg
               WHERE (SELECT k FROM kv) <= $threshold
               UNION ALL
               SELECT vec_id, embedding, nrm, cluster_id FROM hasg
               WHERE (SELECT k FROM kv) > $threshold),
             capped AS (
               SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY cluster_id
                   ORDER BY vec_id) AS mrank
                 FROM asg) WHERE mrank <= $MaxClusterMembers),
             pairs AS (
               SELECT x.cluster_id, x.vec_id AS va, y.vec_id AS vb,
                 ${dotDuck("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos
               FROM capped x JOIN capped y
                 ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id),
             hits AS (SELECT * FROM pairs WHERE cos >= $SemDedupMinCos)"""

  val defs: Map[String, QueryDef] = Map(

    // ---- k-medians corpus bucketing: 2 Lloyd rounds, deterministic
    //      seed = first K vectors, lower-median centroid update. The
    //      oracle unrolls the same two rounds with quantile_disc(0.5)
    //      (provably the same (n+1) div 2 sorted element as the window
    //      formulation — an independent spelling of the same median). ----
    "q70_kmedians_clusters" -> QueryDef(
      (s, dir) => kmediansProfile(Tables.load(s, dir, "embeddings"),
        Some(kmedAssignCached(s, dir))),
      Some(s"""WITH n AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS de
               FROM embeddings),
             c0 AS (SELECT vec_id AS cid, de AS cde FROM n WHERE vec_id < $K),
             a1p AS (
               SELECT n.vec_id, n.de, c0.cid, ${l1Duck("n.de", "c0.cde")} AS dist
               FROM n CROSS JOIN c0),
             a1 AS (
               SELECT vec_id, de, cid AS cluster_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist, cid) AS crank
                 FROM a1p) WHERE crank = 1),
             dims1 AS (
               SELECT cluster_id, generate_subscripts(de, 1) AS dim,
                 unnest(de) AS v
               FROM a1),
             med1 AS (
               SELECT cluster_id, dim, quantile_disc(v, 0.5) AS med
               FROM dims1 GROUP BY cluster_id, dim),
             c1 AS (
               SELECT cluster_id AS cid, list(med ORDER BY dim) AS cde
               FROM med1 GROUP BY cluster_id),
             a2p AS (
               SELECT n.vec_id, c1.cid, ${l1Duck("n.de", "c1.cde")} AS dist
               FROM n CROSS JOIN c1),
             a2 AS (
               SELECT vec_id, cid AS cluster_id, dist FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist, cid) AS crank
                 FROM a2p) WHERE crank = 1)
             SELECT cluster_id, count(*) AS n_members,
               round(quantile_disc(dist, 0.5), 4) AS med_l1
             FROM a2
             GROUP BY cluster_id
             ORDER BY cluster_id""")),

    // ---- label-affinity matrix: per-label per-dimension LOWER-median
    //      "centroid" (an actual element value — no float-sum parity
    //      hazard), then pairwise cosine between the K(K-1)/2 label
    //      pairs, the matrix a data-mixing run consults to see which
    //      buckets are near-duplicates of each other. Cosine is a
    //      sequential fold over the 64-dim centroids (zip_with +
    //      aggregate ≡ DuckDB's 0-prepended list_reduce) with dot and
    //      the two norms folded in the SAME order in both engines.
    //      Scale shape: the median shuffle is K·dim groups each
    //      streaming through a partitioned-window sort; the pairwise
    //      join is K tiny rows — broadcast, never a corpus shuffle. ----
    "q79_label_affinity" -> QueryDef(
      (s, dir) => {
        val wSort = Window.partitionBy(col("label"), col("dim")).orderBy(col("v"))
        val wCnt = Window.partitionBy(col("label"), col("dim"))
        val cents = Tables.load(s, dir, "embeddings")
          .select(col("label"), posexplode(expr(toDouble)).as(Seq("dim", "v")))
          .withColumn("rn", row_number().over(wSort))
          .withColumn("cnt", count(lit(1)).over(wCnt))
          .filter(col("rn") === expr("(cnt + 1) div 2"))
          .groupBy(col("label"))
          .agg(expr("transform(array_sort(collect_list(struct(dim, v))), s -> s.v)")
            .as("cde"))
        val a = cents.select(col("label").as("label_a"), col("cde").as("ca"))
        val b = cents.select(col("label").as("label_b"), col("cde").as("cb"))
        a.join(broadcast(b), col("label_a") < col("label_b"))
          .withColumn("cos", expr(
            """round(
                 aggregate(zip_with(ca, cb, (x, y) -> x * y), 0D,
                   (acc, v) -> acc + v)
                 / (sqrt(aggregate(ca, 0D, (acc, x) -> acc + x * x))
                    * sqrt(aggregate(cb, 0D, (acc, x) -> acc + x * x))), 4)"""))
          .select(col("label_a"), col("label_b"), col("cos"))
          .orderBy(col("label_a"), col("label_b"))
      },
      Some(s"""WITH n AS (
               SELECT label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS de
               FROM embeddings),
             dims AS (
               SELECT label, generate_subscripts(de, 1) AS dim, unnest(de) AS v
               FROM n),
             med AS (
               SELECT label, dim, quantile_disc(v, 0.5) AS med
               FROM dims GROUP BY label, dim),
             c AS (
               SELECT label, list(med ORDER BY dim) AS cde
               FROM med GROUP BY label)
             SELECT a.label AS label_a, b.label AS label_b,
               round(
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(list_zip(a.cde, b.cde), s -> s[1] * s[2])),
                   (acc, v) -> acc + v)
                 / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_transform(a.cde, x -> x * x)), (acc, x) -> acc + x))
                    * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_transform(b.cde, x -> x * x)), (acc, x) -> acc + x))),
                 4) AS cos
             FROM c a JOIN c b ON a.label < b.label
             ORDER BY label_a, label_b""")),

    // ---- SemDeDup: cluster-scoped cosine near-dup, greedy keep-first.
    //      The oracle replays the identical pipeline: cosine assignment
    //      to the first-K seed centroids, within-cluster pairs, keeper =
    //      smallest near-dup id (see [[semanticDedup]]). ----
    "q85_semantic_dedup" -> QueryDef(
      (s, dir) => semanticDedupCached(s, dir)
        .orderBy(col("cluster_id"), col("dropped_id")),
      Some(s"""WITH ${semanticDedupDuckCtes()}
             SELECT cluster_id, vb AS dropped_id, va AS keeper_id,
               round(cos, 4) AS cos_sim
             FROM (SELECT *, row_number() OVER (PARTITION BY vb
                     ORDER BY va) AS krank
                   FROM hits)
             WHERE krank = 1
             ORDER BY cluster_id, dropped_id""")),

    // ---- q101: the HIERARCHICAL assignment under the driver's gate.
    //      Identical operator and oracle text to q85 — the only change
    //      is the regime switch ([[HierProbeThreshold]] = 4, fine
    //      fan-out 4), so the derived K = 8 at every SF crosses the
    //      threshold and [[twoLevelAssign]] (Spark) / `hasg` (DuckDB)
    //      are the branches the hash compare actually certifies: 2
    //      coarse seeds, 4 fine seeds per coarse cluster, both levels
    //      making real choices. ClusteringSpec additionally pins that
    //      this query's plan contains the coarse assignment stage and
    //      q85's does not. ----
    "q101_semantic_dedup_hier" -> QueryDef(
      (s, dir) => semanticDedup(Tables.load(s, dir, "embeddings"),
        SemDedupMinCos, HierProbeThreshold, HierProbeFinePerCoarse),
      Some(s"""WITH ${semanticDedupDuckCtes(HierProbeThreshold, HierProbeFinePerCoarse)}
             SELECT cluster_id, vb AS dropped_id, va AS keeper_id,
               round(cos, 4) AS cos_sim
             FROM (SELECT *, row_number() OVER (PARTITION BY vb
                     ORDER BY va) AS krank
                   FROM hits)
             WHERE krank = 1
             ORDER BY cluster_id, dropped_id""")),

    // ---- cluster-balanced diversity sampling: equal per-cluster quotas
    //      over the q85 cluster assignment — the SemDeDup-companion
    //      pruning move that flattens the cluster-size distribution so
    //      over-represented semantic neighborhoods can't dominate the
    //      sample. Membership is the q80 salted-hash rank (not rand():
    //      adding vectors never reassigns existing picks, and both
    //      engines pick the identical set); the window shuffles only
    //      (cluster_id, vec_id) pairs. The oracle rides the SAME shared
    //      assignment CTEs as q85 (unused downstream CTEs cost nothing —
    //      DuckDB only evaluates referenced ones). ----
    "q94_cluster_balanced_sample" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(md5(concat(lit("cquota:"), col("vec_id").cast("string"))),
            col("vec_id"))
        assignClustersCached(s, dir)
          .select(col("cluster_id"), col("vec_id"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= ClusterQuota)
          .orderBy(col("cluster_id"), col("rk"))
      },
      Some(s"""WITH ${semanticDedupDuckCtes()},
             ranked AS (
               SELECT cluster_id, vec_id,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY md5('cquota:' || CAST(vec_id AS VARCHAR)),
                     vec_id) AS rk
               FROM asg)
             SELECT cluster_id, vec_id, rk
             FROM ranked WHERE rk <= $ClusterQuota
             ORDER BY cluster_id, rk""")),

    // ---- cluster-quality report: per-cluster COHESION (lower-median
    //      L1 distance to the own centroid) vs SEPARATION (lower-median
    //      distance to the nearest OTHER centroid) and their ratio — the
    //      Davies-Bouldin-style read-out that answers "is K right, are
    //      these clusters real?" BEFORE q85/q94 trust the assignment for
    //      semantic dedup, the same way q102 gates the ANN indexes on
    //      measured recall. A sep_ratio near 1 means the cluster barely
    //      separates from its neighbor (semantic dedup inside it is
    //      arbitrary); large means tight and well-isolated. Medians are
    //      exact ELEMENT values (the q70 window-rank trick, no float-sum
    //      ordering hazard) and every distance is the same sequential L1
    //      fold in both engines, so even the ratio divides identical
    //      bits. Scale shape: one broadcast-K distance join (the q70
    //      assign shape), per-vector aggregation, then K·2 median
    //      windows over K groups — no corpus-sized shuffle beyond the
    //      vec_id window. ----
    "q113_cluster_quality" -> QueryDef(
      (s, dir) => clusterQuality(Tables.load(s, dir, "embeddings"),
        Some(kmedCentroidsCached(s, dir))),
      Some(s"""WITH n AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS de
               FROM embeddings),
             c0 AS (SELECT vec_id AS cid, de AS cde FROM n WHERE vec_id < $K),
             a1p AS (
               SELECT n.vec_id, n.de, c0.cid, ${l1Duck("n.de", "c0.cde")} AS dist
               FROM n CROSS JOIN c0),
             a1 AS (
               SELECT vec_id, de, cid AS cluster_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist, cid) AS crank
                 FROM a1p) WHERE crank = 1),
             dims1 AS (
               SELECT cluster_id, generate_subscripts(de, 1) AS dim,
                 unnest(de) AS v
               FROM a1),
             med1 AS (
               SELECT cluster_id, dim, quantile_disc(v, 0.5) AS med
               FROM dims1 GROUP BY cluster_id, dim),
             c1 AS (
               SELECT cluster_id AS cid, list(med ORDER BY dim) AS cde
               FROM med1 GROUP BY cluster_id),
             ranked AS (
               SELECT n.vec_id, c1.cid, ${l1Duck("n.de", "c1.cde")} AS dist,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY ${l1Duck("n.de", "c1.cde")}, c1.cid) AS crank
               FROM n CROSS JOIN c1),
             per AS (
               SELECT vec_id,
                 max(CASE WHEN crank = 1 THEN cid END) AS cluster_id,
                 max(CASE WHEN crank = 1 THEN dist END) AS own,
                 min(CASE WHEN crank > 1 THEN dist END) AS sep
               FROM ranked GROUP BY vec_id)
             SELECT cluster_id, count(*) AS n_members,
               round(quantile_disc(own, 0.5), 4) AS med_cohesion,
               round(quantile_disc(sep, 0.5), 4) AS med_separation,
               round(quantile_disc(sep, 0.5) / quantile_disc(own, 0.5), 4)
                 AS sep_ratio
             FROM per GROUP BY cluster_id
             ORDER BY cluster_id""")),

    // ---- embedding OUTLIER report: per cluster, members whose L1
    //      distance to their own centroid exceeds twice the cluster's
    //      lower-median distance — the mislabeled/noise/poisoned-vector
    //      detector that runs before q85/q94 trust an assignment (the
    //      NN-distance filter of the SemDeDup family, pointed at the
    //      far tail instead of the near one). The 2×median gate
    //      compares EXACT doubles (the sequential-fold distance against
    //      an exact element value), so the flag set is bitwise
    //      reproducible in both engines; only the two displayed
    //      distances round. One broadcast assign + two cluster-keyed
    //      windows — the q70 scale shape unchanged. ----
    "q133_embedding_outliers" -> QueryDef(
      (s, dir) => embeddingOutliers(Tables.load(s, dir, "embeddings"),
        Some(kmedAssignCached(s, dir))),
      Some(s"""WITH n AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS de
               FROM embeddings),
             c0 AS (SELECT vec_id AS cid, de AS cde FROM n WHERE vec_id < $K),
             a1p AS (
               SELECT n.vec_id, n.de, c0.cid, ${l1Duck("n.de", "c0.cde")} AS dist
               FROM n CROSS JOIN c0),
             a1 AS (
               SELECT vec_id, de, cid AS cluster_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist, cid) AS crank
                 FROM a1p) WHERE crank = 1),
             dims1 AS (
               SELECT cluster_id, generate_subscripts(de, 1) AS dim,
                 unnest(de) AS v
               FROM a1),
             med1 AS (
               SELECT cluster_id, dim, quantile_disc(v, 0.5) AS med
               FROM dims1 GROUP BY cluster_id, dim),
             c1 AS (
               SELECT cluster_id AS cid, list(med ORDER BY dim) AS cde
               FROM med1 GROUP BY cluster_id),
             a2p AS (
               SELECT n.vec_id, c1.cid, ${l1Duck("n.de", "c1.cde")} AS dist
               FROM n CROSS JOIN c1),
             a2 AS (
               SELECT vec_id, cid AS cluster_id, dist FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist, cid) AS crank
                 FROM a2p) WHERE crank = 1),
             prof AS (
               SELECT cluster_id, count(*) AS n_members,
                 quantile_disc(dist, 0.5) AS med
               FROM a2 GROUP BY cluster_id),
             flagged AS (
               SELECT a2.cluster_id, a2.vec_id, a2.dist
               FROM a2 JOIN prof USING (cluster_id)
               WHERE a2.dist > 2 * prof.med),
             oc AS (
               SELECT cluster_id, count(*) AS n_outliers FROM flagged
               GROUP BY cluster_id),
             top AS (
               SELECT cluster_id, vec_id AS top_outlier_id,
                 round(dist, 4) AS top_dist
               FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                       ORDER BY dist DESC, vec_id) AS orank
                     FROM flagged)
               WHERE orank = 1)
             SELECT p.cluster_id, p.n_members, round(p.med, 4) AS med_l1,
               coalesce(oc.n_outliers, 0) AS n_outliers,
               coalesce(top.top_outlier_id, -1) AS top_outlier_id,
               coalesce(top.top_dist, 0.0) AS top_dist
             FROM prof p
             LEFT JOIN oc USING (cluster_id)
             LEFT JOIN top USING (cluster_id)
             ORDER BY p.cluster_id""")),

    // ---- CLUSTER × SOURCE composition: per semantic cluster (the
    //      shared q85 assignment, vec_id ≡ doc_id) how many sources
    //      contribute, the dominant source's share and a whole-bit mix
    //      entropy — the topic-vs-provenance balance read. A cluster
    //      owned 100% by one source is a provenance artifact (one
    //      site's template), not a topic; diversity sampling (q94) and
    //      mixture tuning (q112) want that distinction. Entropy is the
    //      q153/q89 int64 whole-bit surrogate. Scale: the assignment's
    //      broadcast-centroid pass + two groupBys keyed by (cluster,
    //      source) and cluster. ----
    "q163_cluster_source_mix" -> QueryDef(
      (s, dir) => {
        val asg = assignClustersCached(s, dir)
          .select(col("vec_id").as("doc_id"), col("cluster_id"))
        val src = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
        // n_members rides a cluster-keyed window instead of a per-frame
        // self-join: the window's exchange hash-partitions cell by
        // cluster_id, the groupBy right after reuses that partitioning,
        // and the old persist + two join exchanges disappear (same
        // int64 arithmetic, bit-identical output; r11 — with the
        // assignment served from FrameCache this post-processing WAS
        // the query)
        val cell = asg.join(src, "doc_id")
          .groupBy(col("cluster_id"), col("source"))
          .agg(count(lit(1)).as("cnt"))
        val wTot = Window.partitionBy(col("cluster_id"))
        cell.withColumn("n_members", sum(col("cnt")).over(wTot))
          .withColumn("wb",
            col("cnt") * (length(bin(expr("n_members div cnt"))) - 1)
              .cast("long"))
          .groupBy(col("cluster_id"))
          .agg(max(col("n_members")).as("n_members"),
            count(lit(1)).as("n_sources"), max(col("cnt")).as("top_cnt"),
            sum(col("wb")).as("ent_units"))
          .select(col("cluster_id"), col("n_members"), col("n_sources"),
            expr("top_cnt * 10000 div n_members").as("top_source_bp"),
            expr("ent_units * 1000 div n_members").as("mix_bits_milli"))
          .orderBy(col("cluster_id"))
      },
      Some(s"""WITH ${semanticDedupDuckCtes()},
             cell AS (
               SELECT a.cluster_id, d.source, count(*) AS cnt
               FROM asg a JOIN documents d ON a.vec_id = d.doc_id
               GROUP BY a.cluster_id, d.source),
             per AS (
               SELECT cluster_id, CAST(sum(cnt) AS BIGINT) AS n_members,
                 count(*) AS n_sources, max(cnt) AS top_cnt
               FROM cell GROUP BY cluster_id),
             ent AS (
               SELECT c.cluster_id,
                 CAST(sum(c.cnt * (length(bin(p.n_members // c.cnt)) - 1))
                   AS BIGINT) AS ent_units
               FROM cell c JOIN per p USING (cluster_id)
               GROUP BY c.cluster_id)
             SELECT p.cluster_id, p.n_members, p.n_sources,
               p.top_cnt * 10000 // p.n_members AS top_source_bp,
               e.ent_units * 1000 // p.n_members AS mix_bits_milli
             FROM per p JOIN ent e USING (cluster_id)
             ORDER BY p.cluster_id""")),
  )

  /** q133's pipeline over a raw (vec_id, embedding) frame, exposed for
    * planted-outlier specs: train exactly as q70, then flag members
    * whose distance exceeds twice their cluster's lower-median. */
  def embeddingOutliers(emb: DataFrame,
      preAssign: Option[DataFrame] = None): DataFrame = {
    // a2 feeds THREE consumers (profile, flag filter, top-outlier rank);
    // unpinned, the whole two-assign training recomputes per consumer
    // (measured 4.2 s steady vs 1.26 s for single-consumer q70) —
    // session hygiene evicts it (Verify/Bench clearCache between
    // queries). The cached substrate ([[kmedAssignCached]]) replaces
    // the training entirely; its parquet re-read per consumer is the
    // cheap case, but the scope keeps the plan shape identical.
    val a2 = preAssign.getOrElse {
      val n = kmedInput(emb).transform(TransientCache.scopedDF)
      assign(n, kmedTrain(n))
        .select(col("vec_id"), col("cluster_id"), col("dist"))
    }.transform(TransientCache.scopedDF)
    val wSort = Window.partitionBy(col("cluster_id"))
      .orderBy(col("dist"), col("vec_id"))
    val wCnt = Window.partitionBy(col("cluster_id"))
    val prof = a2
      .withColumn("rn", row_number().over(wSort))
      .withColumn("cnt", count(lit(1)).over(wCnt))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("cluster_id"), col("cnt").as("n_members"),
        col("dist").as("med"))
    val flagged = a2.select(col("cluster_id"), col("vec_id"), col("dist"))
      .join(prof.select(col("cluster_id"), col("med")), "cluster_id")
      .filter(col("dist") > lit(2d) * col("med"))
    val oc = flagged.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_outliers"))
    val wTop = Window.partitionBy(col("cluster_id"))
      .orderBy(col("dist").desc, col("vec_id"))
    val top = flagged.withColumn("orank", row_number().over(wTop))
      .filter(col("orank") === 1)
      .select(col("cluster_id"), col("vec_id").as("top_outlier_id"),
        round(col("dist"), 4).as("top_dist"))
    prof
      .join(oc, Seq("cluster_id"), "left_outer")
      .join(top, Seq("cluster_id"), "left_outer")
      .select(col("cluster_id"), col("n_members"),
        round(col("med"), 4).as("med_l1"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"),
        coalesce(col("top_outlier_id"), lit(-1L)).as("top_outlier_id"),
        coalesce(col("top_dist"), lit(0d)).as("top_dist"))
      .orderBy(col("cluster_id"))
  }
}
