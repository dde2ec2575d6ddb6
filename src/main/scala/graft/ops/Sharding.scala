package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{QueryDef, Tables}

/** Token-budget contiguous sharding: order the corpus by a deterministic
  * shuffle key and cut it into shards of ~`budget` tokens each — the step
  * that turns a curated corpus into equal-sized training shards, with the
  * md5 key doubling as the global deterministic shuffle every training run
  * needs (no rand(), so the layout is reproducible).
  *
  * The natural spelling — `sum(tokens) OVER (ORDER BY k)` — is a global
  * window: Spark plans it as ONE partition holding the whole corpus, the
  * same single-reducer trap as the built-in exact percentile (DESIGN.md).
  * Instead the running total is two passes over a range-partitioned sort
  * (Spark's ordinary parallel sort):
  *
  *   pass 1 — per-partition token sums; the driver folds them into
  *            per-partition starting offsets (bounded state: one long per
  *            partition, the `_num` / Percentiles pattern);
  *   pass 2 — each partition streams its sorted rows once, adding its
  *            broadcast offset; `shard = cum_before / budget`.
  *
  * Shard boundaries depend only on the total order of `k`, not on where
  * the range partitioner happened to cut, so the result is deterministic
  * across partitionings and cluster layouts.
  */
object Sharding {

  /** Tokens per shard. Sized so even sf0.001 fills at least one shard;
    * a production corpus would use ~100M-token shards. */
  val ShardBudget = 4096L

  /** (doc_id, n_tokens, shard_id, k) for a frame with columns
    * `k` (unique sort key), `doc_id`, `n_tokens` — `k` rides along so
    * downstream in-shard ordering ([[packWindows]]) uses the SAME total
    * order that cut the shards. */
  def assignShards(docs: DataFrame, budget: Long, parts: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sortedBase = docs
      .select(col("k").cast("string"), col("doc_id").cast("long"),
        col("n_tokens").cast("long"))
      .as[(String, Long, Long)]
      .repartitionByRange(parts, col("k"))
      .sortWithinPartitions(col("k"))
    // Both passes MUST see identical partitions: repartitionByRange
    // samples its boundaries at execution time, so a partition lost
    // between pass 1 and pass 2 could recompute under different cuts
    // and shift rows against the collected offsets. Checkpoints.pin:
    // MEMORY_AND_DISK persist locally (spills instead of evicting, which
    // closes that window short of executor loss); with
    // spark.graft.checkpointDir set, a reliable checkpoint closes the
    // executor-loss window too (see [[Checkpoints]]).
    val sorted = Checkpoints.pin(sortedBase)
    val perPartition = sorted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L; it.foreach(s += _._3); Iterator((pid, s))
      }
      .collect().sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      perPartition.map { case (pid, s) =>
        val o = acc; acc += s; (pid, o)
      }.toMap
    }
    val bOff = spark.sparkContext.broadcast(offsets)
    val out = sorted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var cum = bOff.value(pid)
        it.map { case (kk, id, t) =>
          val before = cum; cum += t; (id, t, before / budget, kk)
        }
      }
      .toDF("doc_id", "n_tokens", "shard_id", "k")
    // release the pin after the caller's action: pass 1's collect is a
    // raw RDD action (no listener fire), so the pin survives through
    // pass 2's materialization; a later re-materialization recomputes
    // the SAME RDD DAG (fixed lineage, deterministic sources) so the
    // broadcast offsets stay consistent. Under spark.graft.checkpointDir
    // the pin is a reliable checkpoint and the release is a no-op.
    TransientCache.releaseAfterNextAction(sorted)
    out
  }

  /** Candidate context lengths for q194's pad-vs-pack forecast —
    * brackets q84's deployed [[PackCapacity]] both ways. */
  private val PackForecastLengths = Seq(256L, 512L, 1024L, 2048L)

  /** Context-window capacity (tokens) for q84's sequence packing. */
  val PackCapacity = 512L

  /** Greedy FIRST-FIT sequence packing within each token shard — the step
    * between chunking (q59) and sharding (q66) in a training-data run:
    * chunks are walked in the shard's deterministic md5 order and each is
    * placed into the LOWEST-indexed open window with room, else opens a
    * new window. A chunk larger than `capacity` opens (and overflows) its
    * own window rather than being dropped.
    *
    * Scale shape: packing state is inherently sequential, so the
    * parallelism unit is the SHARD — `flatMapGroups` per shard_id, and
    * the per-group buffer is bounded by construction (a shard holds
    * ≤ ShardBudget tokens, so ≤ ShardBudget chunk rows and
    * ≤ ShardBudget/capacity + 1 open windows). Shards come from the
    * two-pass range-partitioned running total ([[assignShards]]), so the
    * result is deterministic across partitionings — pinned by
    * ShardingSpec's invariance test. First-fit beats next-fit on fill
    * and its open-window list stays bounded, which is what makes the
    * exact oracle mirror (a recursive CTE carrying the fills list)
    * possible. */
  def packWindows(assigned: DataFrame, capacity: Long): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned
      .select(col("shard_id").cast("long"), col("k").cast("string"),
        col("doc_id").cast("long"), col("n_tokens").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val sorted = it.toArray.sortBy(_._2)
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.iterator.map { case (_, _, docId, n) =>
          val j = fills.indexWhere(_ + n <= capacity)
          val w =
            if (j >= 0) { fills(j) += n; j }
            else { fills += n; fills.size - 1 }
          (sid, w.toLong, docId, n)
        }
      }
      .toDF("shard_id", "window_id", "doc_id", "n_tokens")
  }

  /** The q84 first-fit packing oracle chain ending at
    * `pack(shard_id, rn, doc_id, n_tokens, window_id, fills)` — the
    * recursive CTE replaying [[packWindows]]'s walk with the open-window
    * fills list as its state. Shared by q84 and q149 so the oracle-side
    * packing definition exists once. (Declared before `defs` — the
    * oracle strings are built eagerly.) */
  private def packDuckCtes: String =
    s"""t AS (
         SELECT doc_id, md5('shard:' || CAST(doc_id AS VARCHAR)) AS k,
           CAST(len(string_split_regex(lower(text), ' +')) AS BIGINT)
             AS n_tokens
         FROM documents),
       c AS (
         SELECT doc_id, k, n_tokens,
           COALESCE(CAST(sum(n_tokens) OVER (ORDER BY k
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS BIGINT), 0) AS cum_before
         FROM t),
       ordered AS (
         SELECT CAST(cum_before // $ShardBudget AS BIGINT) AS shard_id,
           doc_id, n_tokens,
           row_number() OVER (PARTITION BY cum_before // $ShardBudget
             ORDER BY k) AS rn
         FROM c),
       pack AS (
         SELECT shard_id, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT) AS window_id,
           [n_tokens] AS fills
         FROM ordered WHERE rn = 1
         UNION ALL
         SELECT o.shard_id, o.rn, o.doc_id, o.n_tokens,
           CAST(CASE WHEN l.ff IS NULL THEN len(p.fills)
                     ELSE l.ff - 1 END AS BIGINT),
           CASE WHEN l.ff IS NULL THEN list_append(p.fills, o.n_tokens)
                ELSE list_transform(range(1, len(p.fills) + 1),
                       i -> CASE WHEN i = l.ff
                                 THEN p.fills[i] + o.n_tokens
                                 ELSE p.fills[i] END)
           END
         FROM pack p
         JOIN ordered o ON o.shard_id = p.shard_id AND o.rn = p.rn + 1,
         LATERAL (SELECT list_filter(range(1, len(p.fills) + 1),
                    i -> p.fills[i] + o.n_tokens <= $PackCapacity)[1]
                    AS ff) l)"""

  val defs: Map[String, QueryDef] = Map(

    // ---- per-shard manifest: contiguous md5-ordered shards of
    //      ~ShardBudget tokens. Every shard except the last lands within
    //      one document of the budget by construction. ----
    "q66_token_sharding" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("k",
            md5(concat(lit("shard:"), col("doc_id").cast("string"))))
          .withColumn("n_tokens", size(split(lower(col("text")), " +")))
        assignShards(docs, ShardBudget, 32)
          .groupBy(col("shard_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
          .orderBy(col("shard_id"))
      },
      Some(s"""WITH t AS (
               SELECT md5('shard:' || CAST(doc_id AS VARCHAR)) AS k,
                 len(string_split_regex(lower(text), ' +')) AS n_tokens
               FROM documents),
             c AS (
               SELECT k, n_tokens,
                 COALESCE(CAST(sum(n_tokens) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS cum_before
               FROM t)
             SELECT CAST(cum_before // $ShardBudget AS BIGINT) AS shard_id,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
             FROM c
             GROUP BY shard_id
             ORDER BY shard_id""")),

    // ---- SHARD-CHURN audit under a snapshot delta: of the docs present
    //      in BOTH snapshots, how many land in a different q66 shard
    //      after the refresh. Contiguous running-total sharding is
    //      deliberately NOT delta-stable — any token added or removed
    //      upstream in the md5 order shifts every later cumulative sum —
    //      and this query MEASURES that recomputation cost instead of
    //      assuming it: moved_bp near 10⁴ past first_moved_shard says a
    //      recurring pipeline should either re-shard from the first
    //      touched shard (everything before it is byte-stable, which the
    //      q91 manifests can certify cheaply) or accept ragged shards
    //      from a stable doc_id-hash assignment. Scale: two q66 runs
    //      (each the two-pass range-partitioned running total) + one
    //      doc_id equi-join + a one-row rollup. ----
    "q221_shard_churn" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        def keyed(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("k",
            md5(concat(lit("shard:"), col("doc_id").cast("string"))))
          .withColumn("n_tokens", size(split(lower(col("text")), " +")))
        val prev = assignShards(keyed(Snapshot.previousSnapshotText(docs)),
            ShardBudget, 32)
          .select(col("doc_id"), col("shard_id").as("prev_shard"))
        val cur = assignShards(keyed(docs
            .filter(col("doc_id") % Snapshot.SnapMod
              =!= Snapshot.RemovedRes)
            .select(col("doc_id"), col("text"))), ShardBudget, 32)
          .select(col("doc_id"), col("shard_id").as("cur_shard"))
        prev.join(cur, "doc_id")
          .select(when(col("prev_shard") === col("cur_shard"), 0L)
            .otherwise(1L).as("moved"), col("prev_shard"))
          .agg(count(lit(1)).as("n_common"), sum(col("moved")).as("n_moved"),
            coalesce(min(when(col("moved") === 1L, col("prev_shard"))),
              lit(-1L)).as("first_moved_shard"))
          .select(col("n_common"), col("n_moved"),
            expr("n_moved * 10000L div n_common").as("moved_bp"),
            col("first_moved_shard"))
      },
      Some(s"""WITH pt AS (
             SELECT doc_id,
               CASE WHEN doc_id % ${Snapshot.SnapMod}
                   = ${Snapshot.ChangedRes} THEN
                 array_to_string(
                   (string_split_regex(text, ' +'))[1:greatest(
                     len(string_split_regex(text, ' +')) - 1, 1)], ' ')
               ELSE text END AS text
             FROM documents
             WHERE doc_id % ${Snapshot.SnapMod} <> ${Snapshot.AddedRes}),
           p1 AS (
             SELECT doc_id, md5('shard:' || CAST(doc_id AS VARCHAR)) AS k,
               len(string_split_regex(lower(text), ' +')) AS n_tokens
             FROM pt),
           p2 AS (
             SELECT doc_id,
               COALESCE(CAST(sum(n_tokens) OVER (ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) // $ShardBudget AS prev_shard
             FROM p1),
           c1 AS (
             SELECT doc_id, md5('shard:' || CAST(doc_id AS VARCHAR)) AS k,
               len(string_split_regex(lower(text), ' +')) AS n_tokens
             FROM documents
             WHERE doc_id % ${Snapshot.SnapMod} <> ${Snapshot.RemovedRes}),
           c2 AS (
             SELECT doc_id,
               COALESCE(CAST(sum(n_tokens) OVER (ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) // $ShardBudget AS cur_shard
             FROM c1),
           j AS (
             SELECT CASE WHEN prev_shard = cur_shard THEN 0 ELSE 1 END
               AS moved, prev_shard
             FROM p2 JOIN c2 USING (doc_id))
           SELECT CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(moved) AS BIGINT) AS n_moved,
             CAST(sum(moved) AS BIGINT) * 10000
               // CAST(count(*) AS BIGINT) AS moved_bp,
             coalesce(min(CASE WHEN moved = 1 THEN prev_shard END),
               CAST(-1 AS BIGINT)) AS first_moved_shard
           FROM j""")),

    // ---- per-window fill manifest of the first-fit packing: how many
    //      chunks and tokens each fixed 512-token context window holds.
    //      The oracle replays the identical first-fit walk with a
    //      recursive CTE whose state is the open-window fills LIST —
    //      recursion depth = max chunks per shard, advancing every shard
    //      in lockstep. ----
    "q84_sequence_packing" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("k",
            md5(concat(lit("shard:"), col("doc_id").cast("string"))))
          .withColumn("n_tokens", size(split(lower(col("text")), " +")))
        packWindows(assignShards(docs, ShardBudget, 32), PackCapacity)
          .groupBy(col("shard_id"), col("window_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(col("n_tokens")).as("window_tokens"))
          .withColumn("fill_pct",
            round(col("window_tokens") * lit(1.0) / PackCapacity, 4))
          .orderBy(col("shard_id"), col("window_id"))
      },
      Some(s"""WITH RECURSIVE $packDuckCtes
             SELECT shard_id, window_id, count(*) AS n_chunks,
               CAST(sum(n_tokens) AS BIGINT) AS window_tokens,
               round(CAST(sum(n_tokens) AS BIGINT) * 1.0 / $PackCapacity, 4)
                 AS fill_pct
             FROM pack
             GROUP BY shard_id, window_id
             ORDER BY shard_id, window_id""")),

    // ---- packing-EFFICIENCY report: the per-shard roll-up a training
    //      run reads off q84's first-fit packing before paying for the
    //      epoch — window count, chunk count, token mass, padding waste
    //      (the tokens each under-filled window burns as pad), oversize
    //      windows (single chunks past capacity), and realized fill in
    //      basis points. Padding waste IS the compute bill a packer
    //      exists to minimize; without this roll-up q84's per-window
    //      rows don't answer "how much of the budget is pad?" at a
    //      glance. Scale: two map-side-combinable aggregations over the
    //      q84 frame — per (shard, window), then per shard; nothing new
    //      shuffles beyond q84's own machinery. ----
    "q149_packing_efficiency" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("k",
            md5(concat(lit("shard:"), col("doc_id").cast("string"))))
          .withColumn("n_tokens", size(split(lower(col("text")), " +")))
        packWindows(assignShards(docs, ShardBudget, 32), PackCapacity)
          .groupBy(col("shard_id"), col("window_id"))
          .agg(count(lit(1)).as("wc"), sum(col("n_tokens")).as("wt"))
          .groupBy(col("shard_id"))
          .agg(count(lit(1)).as("n_windows"),
            sum(col("wc")).as("n_chunks"),
            sum(col("wt")).as("tokens"),
            sum(greatest(lit(PackCapacity) - col("wt"), lit(0L)))
              .as("padding_tokens"),
            sum(when(col("wt") > PackCapacity, 1L).otherwise(0L))
              .as("oversize_windows"))
          .select(col("shard_id"), col("n_windows"), col("n_chunks"),
            col("tokens"), col("padding_tokens"), col("oversize_windows"),
            expr(s"tokens * 10000 div (n_windows * $PackCapacity)")
              .as("fill_bp"))
          .orderBy(col("shard_id"))
      },
      Some(s"""WITH RECURSIVE $packDuckCtes,
             wins AS (
               SELECT shard_id, window_id, count(*) AS wc,
                 CAST(sum(n_tokens) AS BIGINT) AS wt
               FROM pack GROUP BY 1, 2)
             SELECT shard_id, count(*) AS n_windows,
               CAST(sum(wc) AS BIGINT) AS n_chunks,
               CAST(sum(wt) AS BIGINT) AS tokens,
               CAST(sum(CASE WHEN wt < $PackCapacity
                 THEN $PackCapacity - wt ELSE 0 END) AS BIGINT)
                 AS padding_tokens,
               CAST(sum(CASE WHEN wt > $PackCapacity THEN 1 ELSE 0 END)
                 AS BIGINT) AS oversize_windows,
               CAST(sum(wt) AS BIGINT) * 10000
                 // (count(*) * $PackCapacity) AS fill_bp
             FROM wins
             GROUP BY shard_id
             ORDER BY shard_id""")),

    // ---- context-length forecast: the pad-vs-pack readout a run
    //      consults BEFORE committing to a context length — q149 audits
    //      the realized 512-token packing; this forecasts the whole
    //      grid. Per candidate length L: the sequence count under
    //      pad-to-L (every doc independently split, final fragments
    //      padded — ceil(tokens/L) per doc), the padding share of the
    //      compute bill that implies (integer basis points), and the
    //      perfect-concatenation lower bound ceil(total/L) a packer is
    //      judged against. All integer ceil-division, so both engines
    //      agree exactly. Scale shape: ONE corpus scan — the per-doc
    //      token count explodes onto the 4-length grid map-side and
    //      everything after is a 4-group combinable rollup. ----
    "q194_packing_length_forecast" -> QueryDef(
      (s, dir) => {
        val ls = PackForecastLengths
        Tables.load(s, dir, "documents")
          .filter(col("text").isNotNull)
          .withColumn("n_tokens",
            expr("cast(size(split(lower(text), ' +')) as bigint)"))
          .select(col("n_tokens"),
            explode(array(ls.map(lit): _*)).as("context_len"))
          .groupBy(col("context_len"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(expr("(n_tokens + context_len - 1) div context_len"))
              .as("n_seqs_padded"))
          .withColumn("pad_waste_bp", expr(
            """((n_seqs_padded * context_len - total_tokens) * 10000)
               div (n_seqs_padded * context_len)"""))
          .withColumn("n_seqs_packed_lb",
            expr("(total_tokens + context_len - 1) div context_len"))
          .select(col("context_len"), col("n_docs"), col("total_tokens"),
            col("n_seqs_padded"), col("pad_waste_bp"),
            col("n_seqs_packed_lb"))
          .orderBy(col("context_len"))
      },
      Some(s"""WITH d AS (
               SELECT CAST(len(string_split_regex(lower(text), ' +'))
                 AS BIGINT) AS n_tokens
               FROM documents WHERE text IS NOT NULL),
             ls AS (
               SELECT CAST(unnest([${PackForecastLengths.mkString(", ")}])
                 AS BIGINT) AS context_len),
             ag AS (
               SELECT context_len, count(*) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(sum((n_tokens + context_len - 1) // context_len)
                   AS BIGINT) AS n_seqs_padded
               FROM d, ls GROUP BY 1)
             SELECT context_len, n_docs, total_tokens, n_seqs_padded,
               ((n_seqs_padded * context_len - total_tokens) * 10000)
                 // (n_seqs_padded * context_len) AS pad_waste_bp,
               (total_tokens + context_len - 1) // context_len
                 AS n_seqs_packed_lb
             FROM ag
             ORDER BY context_len""")),

    // ---- per-shard integrity manifest: the reproducibility artifact a
    //      real training-data run writes alongside each shard — doc and
    //      token counts plus an md5 over the shard's doc-id list IN SHARD
    //      ORDER, so a re-run (or a consumer) can verify both membership
    //      AND order without re-reading the data. The per-shard list is
    //      bounded by the token budget by construction (≈ budget /
    //      mean-doc-tokens docs), so the collect_list is shard-sized,
    //      never corpus-sized — the same bounded-group rule as the
    //      centroid assembly (q70) and packing buffers (q84). ----
    "q91_shard_manifest" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("k",
            md5(concat(lit("shard:"), col("doc_id").cast("string"))))
          .withColumn("n_tokens", size(split(lower(col("text")), " +")))
        assignShards(docs, ShardBudget, 32)
          .groupBy(col("shard_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tokens"),
            expr("""md5(array_join(transform(
                      array_sort(collect_list(struct(k, doc_id))),
                      s -> cast(s.doc_id as string)), ','))""")
              .as("manifest_md5"))
          .orderBy(col("shard_id"))
      },
      Some(s"""WITH t AS (
               SELECT doc_id,
                 md5('shard:' || CAST(doc_id AS VARCHAR)) AS k,
                 len(string_split_regex(lower(text), ' +')) AS n_tokens
               FROM documents),
             c AS (
               SELECT doc_id, k, n_tokens,
                 COALESCE(CAST(sum(n_tokens) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS cum_before
               FROM t)
             SELECT CAST(cum_before // $ShardBudget AS BIGINT) AS shard_id,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens,
               md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY k))
                 AS manifest_md5
             FROM c
             GROUP BY shard_id
             ORDER BY shard_id""")),

    // ---- training-order interleaving audit: docs take their epoch
    //      order from a seeded hash (the deterministic "shuffle" a
    //      reproducible training run uses instead of rand()); the audit
    //      measures how well sources interleave by collapsing the order
    //      into maximal same-source runs. Long runs = consecutive
    //      gradient steps from one source = the correlation a shuffle
    //      exists to kill. Runs are scoped to 256 hash-prefix BLOCKS of
    //      the order (a run cannot cross a block boundary — documented,
    //      deterministic, and exactly what makes the audit
    //      embarrassingly parallel: one window per block, never a
    //      global single-partition sort; block membership is a
    //      substring of the same hash that orders the docs, so blocks
    //      ARE contiguous ranges of the training order). Output: per
    //      source, docs / runs / longest run / interleave quality in
    //      basis points (10000 = every doc its own run). ----
    "q130_interleave_audit" -> QueryDef(
      (s, dir) => interleaveAudit(Tables.load(s, dir, "documents")),
      Some("""WITH ord AS (
               SELECT source,
                 md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS h, doc_id
               FROM documents),
             pos AS (
               SELECT source, substr(h, 1, 2) AS block,
                 row_number() OVER (PARTITION BY substr(h, 1, 2)
                   ORDER BY h, doc_id) AS rn1,
                 row_number() OVER (PARTITION BY substr(h, 1, 2), source
                   ORDER BY h, doc_id) AS rn2
               FROM ord),
             runs AS (
               SELECT source, block, rn1 - rn2 AS grp,
                 count(*) AS run_len
               FROM pos GROUP BY source, block, grp)
             SELECT source,
               CAST(sum(run_len) AS BIGINT) AS n_docs,
               count(*) AS n_runs,
               max(run_len) AS max_run,
               count(*) * 10000 // CAST(sum(run_len) AS BIGINT)
                 AS interleave_bp
             FROM runs
             GROUP BY source
             ORDER BY source""")),
  )

  /** q130's pipeline over a (doc_id, source) frame — exposed for specs
    * that plant clumped vs interleaved orders. */
  def interleaveAudit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = docs.select(col("source"),
      md5(concat(lit("shuffle:"), col("doc_id").cast("string"))).as("h"),
      col("doc_id"))
      .withColumn("block", substring(col("h"), 1, 2))
    val w1 = Window.partitionBy(col("block")).orderBy(col("h"), col("doc_id"))
    val w2 = Window.partitionBy(col("block"), col("source"))
      .orderBy(col("h"), col("doc_id"))
    ord
      .withColumn("grp", row_number().over(w1) - row_number().over(w2))
      .groupBy(col("source"), col("block"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("source"))
      .agg(sum(col("run_len")).as("n_docs"),
        count(lit(1)).as("n_runs"),
        max(col("run_len")).as("max_run"))
      .withColumn("interleave_bp",
        expr("n_runs * 10000 div n_docs"))
      .orderBy(col("source"))
  }
}
