package graft.porter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.kernel.Flatten.{WideObjectKeyLimit, childTableName}

/** Spark-side document flattening: the schema-driven reimplementation of
  * the reference's per-row `flattenArray` (`/root/reference/src/Porter.php:
  * 277-298`), operating on `StructType` instead of PHP arrays.
  *
  * Where the reference walks every row, we walk the *schema once* on the
  * driver and emit one `select` of codegen'd column expressions — at 100 TB
  * the flatten costs exactly one projection inside the scan stage, no
  * shuffle and no per-row interpretation.
  *
  * Semantics preserved:
  *   - nested structs with ≤25 fields merge inline as `path_key` columns
  *     (Porter.php:288);
  *   - arrays, and structs wider than 25 keys, are diverted to child
  *     tables keyed `(_parentid, _index)` (Porter.php:281-283) via
  *     [[extractChild]] (posexplode);
  *   - nested arrays inside child elements are dropped — one explode level
  *     only (Porter.php:255);
  *   - the reference's bug of flattening the whole array instead of the
  *     element (Porter.php:254) is deliberately NOT reproduced (intent
  *     semantics, see SURVEY.md §2 row 8).
  */
object FlattenDF {

  /** A nested field diverted to a child table: its underscore-joined path
    * and the Column that reaches it. */
  final case class ChildSpec(path: String, column: Column, dataType: DataType)

  /** Walk one struct level, producing flat output columns and child specs. */
  private def walk(
      parent: Column,
      st: StructType,
      path: String): (Seq[Column], Seq[ChildSpec]) = {
    val results = st.fields.map { f =>
      val c = parent.getField(f.name)
      f.dataType match {
        case a: ArrayType =>
          (Seq.empty[Column], Seq(ChildSpec(path + f.name, c, a)))
        case s: StructType if s.fields.length > WideObjectKeyLimit =>
          (Seq.empty[Column], Seq(ChildSpec(path + f.name, c, s)))
        case s: StructType =>
          walk(c, s, path + f.name + "_")
        case _ =>
          (Seq(c.alias(path + f.name)), Seq.empty[ChildSpec])
      }
    }
    (results.flatMap(_._1).toSeq, results.flatMap(_._2).toSeq)
  }

  /** Flatten all top-level struct columns of `df`; scalar columns pass
    * through. Returns the flat DataFrame plus the diverted child specs. */
  def flatten(df: DataFrame): (DataFrame, Seq[ChildSpec]) = {
    val results = df.schema.fields.map { f =>
      f.dataType match {
        case a: ArrayType =>
          (Seq.empty[Column], Seq(ChildSpec(f.name, col(f.name), a)))
        case s: StructType if s.fields.length > WideObjectKeyLimit =>
          (Seq.empty[Column], Seq(ChildSpec(f.name, col(f.name), s)))
        case s: StructType =>
          walk(col(f.name), s, f.name + "_")
        case _ =>
          (Seq(col(f.name)), Seq.empty[ChildSpec])
      }
    }
    (df.select(results.flatMap(_._1).toSeq: _*), results.flatMap(_._2).toSeq)
  }

  /** Extract one child table for `spec` (Porter.php:245-268): one row per
    * array element, keyed `(_parentid, _index)`. Struct elements flatten
    * one level with nested arrays dropped; scalar elements become a single
    * column named after the path. Runs as posexplode inside the scan
    * stage — the shuffle-free Spark form of the reference's side-channel
    * insert loop.
    *
    * `passthrough` names columns of `df` carried verbatim into the output
    * (the single-pass export keeps `_table` alongside each child row so
    * every routed destination is written in one job). */
  def extractChild(
      df: DataFrame,
      idCol: Column,
      spec: ChildSpec,
      passthrough: Seq[String] = Nil): DataFrame = {
    val extra = passthrough.map(col)
    // rows without the child-bearing field export nothing (the reference
    // only loops over arrays present in the row, Porter.php:182-188);
    // posexplode already drops null arrays, but a wide struct wrapped in
    // array() below would otherwise fabricate all-null child rows
    val exploded = df
      .filter(spec.column.isNotNull)
      .select(idCol.as("_parentid") +: extra :+
        posexplode(spec.dataType match {
          case _: ArrayType => spec.column
          // wide struct: treat its values as an array, keep keys as _field
          case s: StructType =>
            array(s.fields.map(f =>
              struct(lit(f.name).as("_field"),
                spec.column.getField(f.name).as("_value"))).toSeq: _*)
          case _ => array(spec.column)
        }).as(Seq("_index", "_el")): _*)
    exploded.schema("_el").dataType match {
      case s: StructType =>
        val (flatCols, _) = walk(col("_el"), s, "") // nested arrays dropped
        exploded.select(col("_parentid") +: col("_index") +: flatCols ++: extra: _*)
      case _: ArrayType =>
        // array-of-arrays: nested array content is discarded entirely
        // (Porter.php:254-255) — only the (_parentid,_index) key survives
        exploded.select(col("_parentid") +: col("_index") +: extra: _*)
      case _ =>
        // scalar elements: one column named after the full path (:256-258)
        exploded.select(col("_parentid") +: col("_index") +:
          col("_el").as(spec.path) +: extra: _*)
    }
  }

  /** Child table name `parent__column` (Porter.php:246). */
  def childName(parentTable: String, spec: ChildSpec): String =
    childTableName(parentTable, spec.path)
}
