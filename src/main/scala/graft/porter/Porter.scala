package graft.porter

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.kernel.{DType, Flatten, Route}

/** Export configuration mirroring the reference CLI
  * (`/root/reference/src/cli.php:24-26`):
  *   - `limit` caps rows per collection (pushed into the scan,
  *     Porter.php:141-144);
  *   - `skip` drops routed tables before any processing (Porter.php:156);
  *   - `dataOnly` never touches DDL: missing destinations are skipped and
  *     remembered, existing ones truncated exactly once (Porter.php:158-179);
  *   - `strictTypes` keeps the fail-fast unknown-type contract
  *     (Porter.php:388-395).
  */
final case class PorterConfig(
    skip: Set[String] = Set.empty,
    limit: Option[Int] = None,
    dataOnly: Boolean = false,
    strictTypes: Boolean = true)

/** The document→relational export pipeline, re-architected for Spark.
  *
  * Where the reference loops one row at a time (route → flatten → child
  * insert → guard → `_num` → per-row DDL → per-row REPLACE,
  * `Porter.php:150-226`), this pipeline expresses each step as a
  * DataFrame transform, so at 100 TB:
  *   - routing and flattening run inside the scan stage (codegen'd
  *     projections, zero shuffle);
  *   - child extraction is a `posexplode` in the same stage;
  *   - schema inference is ONE distributed aggregation per table
  *     ([[SchemaInfer]]) instead of 8M `getTableDef` round-trips;
  *   - `_num` is the only step that needs a global order — a range
  *     sort + `zipWithIndex` (two passes, no single-reducer bottleneck);
  *   - the sink writes set-oriented batches per partition.
  *
  * Ordering subtleties preserved from the reference (SURVEY.md §3): the
  * skip-list fires before child export, so children of skipped tables are
  * skipped; child export fires before the wide-row guard, so a parent row
  * dropped for width still exports its children; `_num` is assigned only
  * to surviving rows.
  *
  * `_num` determinism note: the reference's `_num` is Mongo cursor order —
  * nondeterministic. We define it as the order of `_id` (parents) or
  * `(_parentid, _index)` (children), which is stable across runs and
  * partitionings; the divergence is documented rather than hidden.
  */
final class Porter(
    spark: SparkSession,
    sink: Sink,
    config: PorterConfig = PorterConfig()) {

  private val truncated = mutable.Set.empty[String]
  private val missing = mutable.Set.empty[String]
  private val keyTallyAcc = mutable.Map.empty[String, Long]

  /** The `$allKeys` tally (Porter.php:328-332): occurrences per normalized
    * `_key` family across every exported collection, counted BEFORE the
    * skip-list and before the numeric/empty fallback — including the
    * empty-string family an all-digit key normalizes to. True occurrence
    * counts: the reference initializes a family to 0 on first sight and
    * increments afterwards (so its numbers are occurrences−1); we record
    * the intent, like the other documented warts. */
  def keyTally: Map[String, Long] = keyTallyAcc.toMap

  /** Export every collection; returns rows written per destination table. */
  def exportCollections(collections: Seq[(String, DataFrame)]): Map[String, Long] =
    collections.flatMap { case (name, df) => exportCollection(name, df) }.toMap

  /** Export one collection (`exportCollection`, Porter.php:131-235) in the
    * reference's single-cursor-pass shape: the source is scanned and
    * routed ONCE (cached), children and parents are each numbered and
    * written across ALL destination tables in one job via
    * [[Sink.writeMany]] — no per-table rescan of the collection. */
  def exportCollection(collection: String, df: DataFrame): Map[String, Long] = {
    val limited = config.limit.fold(df)(df.limit)
    val hasKey = limited.columns.contains("_key")
    val routed =
      if (hasKey)
        limited.withColumn("_table", Route.routeTableCol(col("_key"), collection))
      else limited.withColumn("_table", lit(collection))
    // one source scan + route, shared by every destination table and by
    // the tally (the reference reads the cursor once too)
    routed.persist()
    try {
      // $allKeys is tallied for every routed row, before the skip check
      // (Porter.php:150-157): one tiny distributed aggregation
      if (hasKey)
        routed.filter(col("_key").isNotNull)
          .groupBy(Route.normalizeKeyCol(col("_key")).as("family")).count()
          .collect()
          .foreach { r =>
            val fam = r.getString(0)
            keyTallyAcc(fam) = keyTallyAcc.getOrElse(fam, 0L) + r.getLong(1)
          }
      // skip-list check precedes child export (Porter.php:156-157)
      val kept =
        if (config.skip.isEmpty) routed
        else routed.filter(!col("_table").isin(config.skip.toSeq: _*))
      // upfront count feeds the ETA, like the reference's cursor count
      // (Porter.php:138-140); cheap here because the scan is cached
      val total = kept.count()
      val progress = new Progress(total)
      val tables = kept.select(col("_table")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      val (flatAll, childSpecs) = FlattenDF.flatten(kept)
      val counts = mutable.Map.empty[String, Long]

      // Children export first — before the wide-row guard (Porter.php:
      // 182-194). One pass per child spec (specs are schema-derived and
      // few), each writing EVERY parent table's child in a single job.
      val parentId =
        if (kept.columns.contains("_id")) col("_id")
        else lit(null).cast("string")
      childSpecs.foreach { spec =>
        val nameOf = tables.map(t => t -> FlattenDF.childName(t, spec)).toMap
        val child = FlattenDF
          .extractChild(kept, parentId, spec, passthrough = Seq("_table"))
          .withColumn("_table", element_at(typedLit(nameOf), col("_table")))
        val (numbered, rawCounts) =
          withNumByTable(child, Seq("_parentid", "_index"))
        val childCounts = tables
          .map(t => nameOf(t) -> rawCounts.getOrElse(nameOf(t), 0L)).toMap
        counts ++= writeTables(numbered, childCounts)
      }

      // Wide-row guard: >500 present (non-null) columns → drop
      // (Porter.php:190-194). `_table` is bookkeeping, not a document
      // column — it never counts toward the width.
      val dataCols = flatAll.columns.filterNot(_ == "_table").toSeq
      val guarded =
        if (dataCols.length <= Flatten.WideRowColumnLimit) flatAll
        else {
          // one flat array node, not a 500-deep Add chain (which overflows
          // the Column-tree conversion stack at exactly the schema widths
          // this guard exists for)
          val present = size(filter(
            array(dataCols.map(c => col(c).isNotNull): _*),
            x => x))
          flatAll.filter(present <= Flatten.WideRowColumnLimit)
        }
      val orderCols =
        if (dataCols.contains("_id")) Seq("_id")
        else dataCols.sorted
      val (numberedParents, rawParentCounts) = withNumByTable(guarded, orderCols)
      val parentCounts = tables.map(t => t -> rawParentCounts.getOrElse(t, 0L)).toMap
      val w = writeTables(numberedParents, parentCounts)
      counts ++= w
      // progress (like the reference's row loop) tracks source documents:
      // parent rows written, not child fan-out
      val written = w.values.sum
      progress.report(written)
      System.err.println(s"[porter] $collection:${progress.doneLine(written)}")
      counts.toMap
    } finally routed.unpersist()
  }

  /** Per-table 1-based insertion counter `_num` (Porter.php:196-201,
    * README.md:45-46) for ALL destination tables in one pass: a single
    * range sort on (`_table`, order columns) + `zipWithIndex`, then each
    * row's global index minus its table's offset (cumulative counts,
    * broadcast). The scalable global-sequence form — no data funnels
    * through one node, and no per-table job fan-out. Also returns the
    * per-table row counts (free by-product of the offsets). */
  private def withNumByTable(
      df: DataFrame, orderCols: Seq[String]): (DataFrame, Map[String, Long]) = {
    val sorted = df.orderBy((col("_table") +: orderCols.map(col)): _*)
    val tableCounts = df.groupBy(col("_table")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var acc = 0L
    // offsets must follow the SAME table order Spark's sort produced:
    // Spark compares strings by UTF-8 bytes, while Scala's default String
    // ordering compares UTF-16 code units — they disagree for names mixing
    // supplementary-plane chars with U+E000–U+FFFF, which would skew every
    // offset after the disagreement (negative `_num`s downstream).
    val offsets = tableCounts.toSeq
      .sortWith((p, q) => utf8Compare(p._1, q._1) < 0)
      .map { case (t, n) => val o = acc; acc += n; t -> o }
      .toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val tIdx = sorted.columns.indexOf("_table")
    val withIdx = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1 - bc.value(row.getString(tIdx))))
    }
    (spark.createDataFrame(withIdx,
      sorted.schema.add("_num", LongType, nullable = false)), tableCounts)
  }

  /** Lexicographic comparison of the UTF-8 byte sequences — the ordering
    * Spark's `orderBy` uses for string columns (UTF8String binary order). */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** DDL + data write for a batch of destination tables whose rows travel
    * together in `df` under `_table`; returns rows written per table.
    * dataonly semantics preserved (Porter.php:158-179): missing tables are
    * skipped (and remembered), existing ones truncated exactly once. */
  private def writeTables(
      df: DataFrame, tableCounts: Map[String, Long]): Map[String, Long] = {
    val tables = tableCounts.keys.toSeq.sorted
    if (config.dataOnly) {
      val present = tables.filter { t =>
        if (missing.contains(t)) false
        else if (sink.tableExists(t)) true
        else {
          missing += t
          System.err.println(s"[porter] Skipping table $t, not in the database.")
          false
        }
      }
      present.foreach { t =>
        if (!truncated.contains(t)) { sink.truncate(t); truncated += t }
      }
      if (present.nonEmpty)
        sink.writeMany(df.filter(col("_table").isin(present: _*)), "_table",
          present.map(t => t -> TableDef(Seq.empty, Seq.empty)).toMap)
      tables.map(t => t -> (if (present.contains(t)) tableCounts(t) else 0L)).toMap
    } else {
      val inferred = SchemaInfer.inferTypesByTable(
        df, "_table", tables, strict = config.strictTypes)
      val ddls = tables.map { t =>
        val types = inferred(t)
        val pk =
          if (types.exists(_._1 == "_id")) Seq("_id")
          else if (types.exists(_._1 == "_parentid") && types.exists(_._1 == "_index"))
            Seq("_parentid", "_index")
          else Seq.empty
        t -> TableDef(types, pk)
      }.toMap
      ddls.toSeq.sortBy(_._1).foreach { case (t, ddl) => sink.ensureTable(t, ddl) }
      sink.writeMany(df, "_table", ddls)
      tableCounts
    }
  }
}
