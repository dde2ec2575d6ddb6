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

  /** Export every collection; returns rows written per destination table. */
  def exportCollections(collections: Seq[(String, DataFrame)]): Map[String, Long] =
    collections.flatMap { case (name, df) => exportCollection(name, df) }.toMap

  /** Export one collection (`exportCollection`, Porter.php:131-235). */
  def exportCollection(collection: String, df: DataFrame): Map[String, Long] = {
    val limited = config.limit.fold(df)(df.limit)
    val routed =
      if (limited.columns.contains("_key"))
        limited.withColumn("_table", Route.routeTableCol(col("_key"), collection))
      else limited.withColumn("_table", lit(collection))
    // skip-list check precedes child export (Porter.php:156-157)
    val kept =
      if (config.skip.isEmpty) routed
      else routed.filter(!col("_table").isin(config.skip.toSeq: _*))
    // one source scan + route, shared by every destination table (the
    // reference reads the cursor once too; without this each routed table
    // would rescan and re-route the whole collection)
    kept.persist()
    try {
      // upfront count feeds the ETA, like the reference's cursor count
      // (Porter.php:138-140); cheap here because `kept` is cached
      val total = kept.count()
      val progress = new Progress(total)
      val tables = kept.select(col("_table")).distinct()
        .collect().map(_.getString(0)).sorted
      var written = 0L
      val counts = tables.flatMap { t =>
        val res = exportTable(t, kept.filter(col("_table") === t).drop("_table"))
        written += res.getOrElse(t, 0L)
        progress.report(written)
        res
      }.toMap
      System.err.println(s"[porter] $collection:${progress.doneLine(written)}")
      counts
    } finally kept.unpersist()
  }

  private def exportTable(table: String, df: DataFrame): Map[String, Long] = {
    val (flat, childSpecs) = FlattenDF.flatten(df)
    // Children export first — before the wide-row guard (Porter.php:182-194)
    val parentId =
      if (df.columns.contains("_id")) col("_id")
      else lit(null).cast("string")
    val childCounts = childSpecs.map { spec =>
      val childName = FlattenDF.childName(table, spec)
      val child = FlattenDF.extractChild(df, parentId, spec)
      childName -> writeTable(childName,
        withNum(child, Seq("_parentid", "_index")))
    }
    // Wide-row guard: >500 present (non-null) columns → drop (Porter.php:190-194)
    val guarded =
      if (flat.columns.length <= Flatten.WideRowColumnLimit) flat
      else {
        // one flat array node, not a 500-deep Add chain (which overflows
        // the Column-tree conversion stack at exactly the schema widths
        // this guard exists for)
        val present = size(filter(
          array(flat.columns.map(c => col(c).isNotNull): _*),
          x => x))
        flat.filter(present <= Flatten.WideRowColumnLimit)
      }
    val orderCols =
      if (guarded.columns.contains("_id")) Seq("_id")
      else guarded.columns.sorted.toSeq
    val parentCount = table -> writeTable(table, withNum(guarded, orderCols))
    (childCounts :+ parentCount).toMap
  }

  /** Per-table 1-based insertion counter `_num` (Porter.php:196-201,
    * README.md:45-46) in a deterministic order: range-sort + zipWithIndex,
    * the scalable global-sequence form (each partition learns its offset;
    * no data funnels through one node). */
  private def withNum(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val sorted = df.orderBy(orderCols.map(col): _*)
    val withIdx = sorted.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1))
    }
    spark.createDataFrame(withIdx, sorted.schema.add("_num", LongType, nullable = false))
  }

  private def writeTable(table: String, df: DataFrame): Long = {
    if (config.dataOnly) {
      // dataonly: skip (and remember) missing tables; truncate existing
      // ones exactly once before the first insert (Porter.php:158-179)
      if (missing.contains(table)) return 0L
      if (!sink.tableExists(table)) {
        missing += table
        System.err.println(s"[porter] Skipping table $table, not in the database.")
        return 0L
      }
      if (!truncated.contains(table)) { sink.truncate(table); truncated += table }
      df.persist()
      val n = df.count()
      sink.write(table, df, TableDef(Seq.empty, Seq.empty))
      df.unpersist()
      n
    } else {
      val types = SchemaInfer.inferTypes(df, strict = config.strictTypes)
      val pk =
        if (types.exists(_._1 == "_id")) Seq("_id")
        else if (types.exists(_._1 == "_parentid") && types.exists(_._1 == "_index"))
          Seq("_parentid", "_index")
        else Seq.empty
      val ddl = TableDef(types, pk)
      sink.ensureTable(table, ddl)
      df.persist()
      val n = df.count()
      sink.write(table, df, ddl)
      df.unpersist()
      n
    }
  }
}
