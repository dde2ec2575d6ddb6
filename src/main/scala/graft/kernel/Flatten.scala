package graft.kernel

import scala.collection.immutable.VectorMap

import DocValue._

/** Pure document→relational restructuring: recursive flattening with
  * underscore-joined paths, array / wide-object diversion to child tables,
  * and child-row extraction. Mirrors `flattenArray`
  * (`/root/reference/src/Porter.php:277-298`) and `exportCollectionArray`
  * (`/root/reference/src/Porter.php:245-268`).
  *
  * This is the semantic model the Spark pipeline in [[graft.porter]]
  * reimplements over `StructType` schemas; keeping it pure lets ScalaCheck
  * pin every edge (wide-object trigger, date rendering, nested-array drop)
  * without a SparkSession.
  */
object Flatten {

  /** Sub-objects with more than this many keys are diverted to child
    * tables instead of being flattened inline (Porter.php:281). */
  val WideObjectKeyLimit = 25

  /** Rows flattening to more than this many columns are skipped
    * (Porter.php:190-194). */
  val WideRowColumnLimit = 500

  /** Result of flattening one document: scalar columns in encounter order
    * (later duplicate paths overwrite earlier, like PHP array merge), plus
    * the set-aside arrays/wide objects keyed by their joined path
    * (the `_arr` side channel, Porter.php:281-283). */
  final case class Flattened(
      columns: VectorMap[String, DocValue],
      arrays: VectorMap[String, DocValue])

  /** Is this value diverted to a child table? Numeric-keyed arrays always;
    * associative sub-objects only when wider than 25 keys (Porter.php:281). */
  def isChildBearing(v: DocValue): Boolean = v match {
    case DocArr(_)       => true
    case DocObj(fields)  => fields.size > WideObjectKeyLimit
    case _               => false
  }

  /** Flatten a document into one-dimensional columns (Porter.php:277-298).
    *   - nested objects with ≤25 keys merge as `path_key` columns (:288);
    *   - dates render to ISO-8601 UTC strings (:290-292) — downstream type
    *     inference then re-promotes them to `datetime` via the string
    *     regex (:372-373);
    *   - arrays and >25-key objects are set aside for child export (:281-283).
    */
  def flatten(doc: DocObj, path: String = ""): Flattened =
    doc.fields.foldLeft(Flattened(VectorMap.empty, VectorMap.empty)) {
      case (acc, (k, v)) =>
        v match {
          case child if isChildBearing(child) =>
            acc.copy(arrays = acc.arrays.updated(path + k, child))
          case obj: DocObj =>
            val inner = flatten(obj, path + k + "_")
            Flattened(acc.columns ++ inner.columns, acc.arrays ++ inner.arrays)
          case DocDate(sec) =>
            acc.copy(columns = acc.columns.updated(path + k, DocString(isoUtc(sec))))
          case scalar =>
            acc.copy(columns = acc.columns.updated(path + k, scalar))
        }
    }

  /** One extracted child row: `(_parentid, _index)` key plus payload
    * columns (Porter.php:252-258). `_num` is assigned by the pipeline. */
  final case class ChildRow(
      parentId: DocValue,
      index: Long,
      columns: VectorMap[String, DocValue])

  /** Extract child rows for one set-aside array/wide object under column
    * `colPath` of table `parentTable` (Porter.php:245-268).
    *
    * Child table name is `parent__colPath` (:246). Document elements are
    * flattened with nested arrays dropped (:255 — one explode level only).
    * NOTE the reference has an acknowledged bug at :254: it flattens the
    * whole array `$arr` instead of the element `$row`, so every child row
    * receives all siblings' fields prefixed `0_…`, `1_…`. We implement the
    * documented intent — flatten the element — not the bug (SURVEY.md §2
    * row 8). Scalar elements become a single column named after `colPath`
    * (:256-258); scalar dates are rendered ISO like flattened ones.
    */
  def extractChildren(
      parentId: DocValue,
      colPath: String,
      value: DocValue): Vector[ChildRow] = {
    val elements: Vector[(Long, DocValue)] = value match {
      case DocArr(vs)     => vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      // Wide objects keep their string keys in the reference; we expose the
      // key as `_index` by position to keep the `(Long)` index type uniform,
      // and the original key as a `_field` column.
      case DocObj(fields) => fields.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
      case other          => Vector((0L, other))
    }
    val wideKeys: Option[Vector[String]] = value match {
      case DocObj(fields) => Some(fields.map(_._1))
      case _              => None
    }
    elements.map { case (i, el) =>
      val payload: VectorMap[String, DocValue] = el match {
        case obj: DocObj =>
          flatten(obj).columns // nested arrays dropped: flatten() set them aside and we do not recurse
        case _: DocArr =>
          // an array element that is itself an array: the reference's
          // flatten puts all of its content under _arr, which the child
          // exporter then discards (:254-255) — the row keeps only its
          // (_parentid,_index) key
          VectorMap.empty
        case DocDate(sec) => VectorMap(colPath -> DocString(isoUtc(sec)))
        case scalar       => VectorMap(colPath -> scalar)
      }
      val withKey = wideKeys match {
        case Some(ks) => VectorMap("_field" -> (DocString(ks(i.toInt)): DocValue)) ++ payload
        case None     => payload
      }
      ChildRow(parentId, i, withKey)
    }
  }

  /** Child table naming: `parent__column` (Porter.php:246). */
  def childTableName(parentTable: String, colPath: String): String =
    s"${parentTable}__$colPath"
}
