package graft.kernel

import org.apache.spark.sql.Column

/** Destination-table routing from a row's `_key` value
  * (`getImportTablename`, `/root/reference/src/Porter.php:300-339`).
  *
  * One source collection fans out into many destination tables: a chain of
  * NodeBB-specific kludge regexes, a `settings`/`widgets` family collapse,
  * then digit/`NaN`/`undefined` normalization into `_`-separated names.
  *
  * Provided both as a pure function (unit-testable, used driver-side) and
  * as a [[Column]] expression (codegen'd `regexp_replace`/`when` chain, so
  * routing runs distributed inside the scan stage with no UDF).
  */
object Route {

  /** The six hard-coded kludge rules, applied first-match
    * (Porter.php:304-316). */
  private val kludgeSpecs: Seq[(String, String)] = Seq(
    "^tag:(.+):topics$"                      -> "tag_topics",
    "^group:cid:\\d+:privileges.*:members$"  -> "group_privileges_members",
    "^group:cid:\\d+:privileges"             -> "group_privileges",
    "^group:.*:members$"                     -> "group_members",
    "^group:[^:]*$"                          -> "group",
    "^ip:.*:uid$"                            -> "ip_uid",
  )
  // compiled once — the per-row hot path must not recompile patterns
  private val kludges: Seq[(scala.util.matching.Regex, String)] =
    kludgeSpecs.map { case (re, out) => re.r -> out }
  private val digitsRe = "\\d+".r
  private val sepRe = "[:# ]+".r
  private val trimRe = "^_+|_+$".r
  private val numericRe = "^[0-9]+(\\.[0-9]+)?$".r

  /** Normalize a `_key` into a destination-table name (Porter.php:304-326).
    * Order matters and is preserved exactly: kludges, family collapse,
    * digits→`#`, `:NaN:`/`:undefined:`→`:#:`, `[:# ]+`→`_`, trim `_`. */
  def normalizeKey(key: String): String = {
    val afterKludge = kludges
      .collectFirst { case (re, out) if re.findFirstIn(key).isDefined => out }
      .getOrElse(key)
    val afterFamily = afterKludge.split(":", 2).head match {
      case f @ ("settings" | "widgets") => f
      case _                            => afterKludge
    }
    trimRe.replaceAllIn(
      sepRe.replaceAllIn(
        digitsRe.replaceAllIn(afterFamily, "#")
          .replace(":NaN:", ":#:")
          .replace(":undefined:", ":#:"),
        "_"),
      "")
  }

  /** Route a row to its destination table. Rows without a `_key`, or whose
    * normalized key is numeric, fall back to the collection name
    * (Porter.php:334-338). Because digits are replaced by `#` *before* the
    * numeric check, the numeric fallback is unreachable in practice; an
    * all-digit key like `"123"` normalizes to the empty string instead. The
    * reference would then try to write to a table named `""` and fail at
    * the database layer — we reproduce the intent (fall back to the
    * collection) rather than the crash, mirroring how we treat the
    * flatten-the-wrong-variable bug at Porter.php:254. */
  def routeTable(key: Option[String], collection: String): String =
    key match {
      case None => collection
      case Some(k) =>
        val n = normalizeKey(k)
        if (n.isEmpty || numericRe.findFirstIn(n).isDefined) collection else n
    }

  /** The same routing as a Catalyst expression over a `_key` column,
    * backed by [[graft.expr.RouteKey]] — the native expression evaluates
    * [[routeTable]] directly with precompiled patterns, so the query
    * surface, the Porter pipeline and the pure unit-tested function share
    * ONE semantics source. (The earlier when/regexp_replace chain was
    * semantically equal but its generated code exceeded the whole-stage
    * codegen method limit and re-ran ~10 regex evaluations per row.) */
  def routeTableCol(key: Column, collection: String): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expr.RouteKey(
        org.apache.spark.sql.graft.Bridge.expression(key),
        collection))

  /** [[normalizeKey]] as a Catalyst expression — the `$allKeys` tally
    * family (Porter.php:328-332), i.e. the normalized key BEFORE the
    * numeric/empty fallback. Null for null keys (no observation). */
  def normalizeKeyCol(key: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expr.NormalizeKey(
        org.apache.spark.sql.graft.Bridge.expression(key)))
}
