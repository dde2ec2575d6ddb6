package graft.porter

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.kernel.DType
import graft.kernel.DType._

/** Distributed schema inference: the reference re-checks (and potentially
  * `ALTER TABLE`s) the destination on *every row* (`ensureRowStructure`,
  * `/root/reference/src/Porter.php:86-123`, acknowledged as its main perf
  * sin at README.md:63-64). We replace that with ONE aggregation pass:
  * each column contributes the tiny set of distinct type observations it
  * produces (≤7 possible codes), collected map-side via `collect_set`, and
  * the driver folds them through the widening lattice ([[DType.widenAll]]).
  * At 100 TB this is a single scan with map-side partial aggregation and a
  * few bytes per column crossing the wire — no per-row driver work, no DDL
  * churn.
  *
  * Observation semantics per value (`guessDbType`, Porter.php:358-396):
  * nulls are treated as absent keys (no observation) rather than the
  * reference's `null → int`, because after `spark.read.json` a missing key
  * and an explicit JSON null are indistinguishable — and the reference
  * never observes missing keys at all. A column with no observations
  * (all null) falls back to `int`, which is what the reference infers the
  * first time it actually sees a null value.
  */
object SchemaInfer {

  /** Static mapping for non-string Spark types. */
  def staticDType(dt: DataType): Option[DType] = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => Some(DInt)
    case FloatType | DoubleType                     => Some(DDouble)
    case TimestampType | TimestampNTZType | DateType => Some(DDatetime)
    case _: DecimalType                             => Some(DDouble)
    case _                                          => None
  }
  // Note: BooleanType maps to DInt (0/1) — the reference throws on PHP
  // booleans (Porter.php:388-395), but Spark schemas surface them typed;
  // failing fast would reject whole collections the reference never sees.

  /** Classification expression for one string column: the rendered DType
    * of each value, null for null values (no observation). Codegen'd
    * when/length/rlike chain — no UDF. */
  private def obsExpr(c: String) = {
    val v = col(c)
    val len = length(v)
    when(v.isNull, lit(null))
      .when(len > MaxVarcharLength, lit(DText.render))
      .when(v.rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d{1,4})?"),
        lit(DDatetime.render))
      // 24-hex strings are BSON ObjectIds rendered to JSON; the reference
      // sees them as MongoId objects → varchar(24) (Porter.php:359-360).
      // Mixing with other strings widens to the larger bucket, exactly as
      // the reference's varchar⊔varchar rule would.
      .when(v.rlike("^[0-9a-f]{24}$"), lit(DVarchar(24).render))
      .when(len < 50, lit(DVarchar(50).render))
      .when(len < 100, lit(DVarchar(100).render))
      .when(len < 255, lit(DVarchar(255).render))
      .otherwise(lit(DVarchar(512).render))
  }

  private def strictCheck(fields: Seq[StructField]): Unit =
    fields.foreach { f =>
      f.dataType match {
        case BooleanType | _: MapType | BinaryType =>
          throw new graft.kernel.DocValue.UnknownTypeException(
            s"Unknown type for: ${f.name} (${f.dataType.simpleString})")
        case _ => ()
      }
    }

  private def resolve(f: StructField, obs: Seq[String]): DType =
    staticDType(f.dataType).getOrElse {
      if (obs.isEmpty) DInt // all-null column: first real observation
                            // would be null→int
      else widenAll(obs.map(DType.parse))
    }

  /** Infer the destination DType of every column in one aggregation pass.
    *
    * @param strict reproduce the reference's fail-fast contract
    *               (Porter.php:388-395): schema types it cannot map —
    *               booleans, maps, binaries — throw with the column name
    *               instead of being coerced. Non-strict callers (the query
    *               surface) get the lenient boolean→int mapping. */
  def inferTypes(df: DataFrame, strict: Boolean = false): Seq[(String, DType)] = {
    if (strict) strictCheck(df.schema.fields.toSeq)
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    val observed: Map[String, Seq[String]] =
      if (stringCols.isEmpty) Map.empty
      else {
        val aggs = stringCols.map(c => collect_set(obsExpr(c)).as(c))
        val row: Row = df.agg(aggs.head, aggs.tail.toSeq: _*).head()
        stringCols.map(c =>
          c -> row.getAs[scala.collection.Seq[String]](c).toSeq).toMap
      }
    df.schema.fields.map { f =>
      f.name -> resolve(f, observed.getOrElse(f.name, Seq.empty))
    }.toSeq
  }

  /** Per-destination-table inference in ONE grouped aggregation: the rows
    * of every routed table travel together (`tableCol` names each row's
    * destination), so instead of one aggregation job per table this is a
    * single `groupBy(tableCol)` pass with map-side partial `collect_set`s.
    * `tables` enumerates the destinations to cover — a table with no rows
    * (or none surviving the wide-row guard) still gets a definition, with
    * every string column on the all-null `int` fallback, exactly as the
    * per-table path inferred from an empty frame. */
  def inferTypesByTable(
      df: DataFrame,
      tableCol: String,
      tables: Seq[String],
      strict: Boolean = false): Map[String, Seq[(String, DType)]] = {
    val fields = df.schema.fields.filterNot(_.name == tableCol).toSeq
    if (strict) strictCheck(fields)
    val stringCols = fields.collect {
      case f if f.dataType == StringType => f.name
    }
    val observed: Map[String, Map[String, Seq[String]]] =
      if (stringCols.isEmpty) Map.empty
      else {
        val aggs = stringCols.map(c => collect_set(obsExpr(c)).as(c))
        df.groupBy(col(tableCol)).agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { row =>
            row.getString(0) -> stringCols.map(c =>
              c -> row.getAs[scala.collection.Seq[String]](c).toSeq).toMap
          }.toMap
      }
    tables.map { t =>
      val obsForTable = observed.getOrElse(t, Map.empty)
      t -> fields.map(f =>
        f.name -> resolve(f, obsForTable.getOrElse(f.name, Seq.empty)))
    }.toMap
  }
}
