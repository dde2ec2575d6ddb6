package graft.kernel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  private val kludges: Seq[(String, String)] = Seq(
    "^tag:(.+):topics$"                      -> "tag_topics",
    "^group:cid:\\d+:privileges.*:members$"  -> "group_privileges_members",
    "^group:cid:\\d+:privileges"             -> "group_privileges",
    "^group:.*:members$"                     -> "group_members",
    "^group:[^:]*$"                          -> "group",
    "^ip:.*:uid$"                            -> "ip_uid",
  )

  /** Normalize a `_key` into a destination-table name (Porter.php:304-326).
    * Order matters and is preserved exactly: kludges, family collapse,
    * digits→`#`, `:NaN:`/`:undefined:`→`:#:`, `[:# ]+`→`_`, trim `_`. */
  def normalizeKey(key: String): String = {
    val afterKludge = kludges
      .collectFirst { case (re, out) if re.r.findFirstIn(key).isDefined => out }
      .getOrElse(key)
    val afterFamily = afterKludge.split(":", 2).head match {
      case f @ ("settings" | "widgets") => f
      case _                            => afterKludge
    }
    afterFamily
      .replaceAll("\\d+", "#")
      .replace(":NaN:", ":#:")
      .replace(":undefined:", ":#:")
      .replaceAll("[:# ]+", "_")
      .replaceAll("^_+|_+$", "")
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
        if (n.isEmpty || n.matches("[0-9]+(\\.[0-9]+)?")) collection else n
    }

  /** The same routing as a Catalyst expression over a `_key` column.
    * Stays inside whole-stage codegen (pure `when`/`regexp_replace`
    * chain — no UDF), so at 100 TB routing is free within the scan. */
  def routeTableCol(key: Column, collection: String): Column = {
    val kludged = kludges.foldRight(key) { case ((re, out), acc) =>
      when(key.rlike(re), lit(out)).otherwise(acc)
    }
    val family = when(
      split(kludged, ":").getItem(0).isin("settings", "widgets"),
      split(kludged, ":").getItem(0)
    ).otherwise(kludged)
    // Two sequential passes for :NaN:/:undefined:, like PHP str_replace
    // with an array needle (":NaN:undefined:" → ":#:#:", not ":#:undefined:").
    val normalized = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(family, "\\d+", "#"),
            ":NaN:", ":#:"),
          ":undefined:", ":#:"),
        "[:# ]+", "_"),
      "^_+|_+$", "")
    val routed = when(
      normalized.isNull || normalized === "" ||
        normalized.rlike("^[0-9]+(\\.[0-9]+)?$"),
      lit(collection)
    ).otherwise(normalized)
    when(key.isNull, lit(collection)).otherwise(routed)
  }
}
