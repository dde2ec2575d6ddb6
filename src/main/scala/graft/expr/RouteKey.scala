package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.kernel.Route

/** Native expression for `_key` destination-table routing: evaluates
  * [[graft.kernel.Route.routeTable]] per row with patterns compiled once.
  *
  * This replaces a ~30-node `when`/`regexp_replace` chain whose generated
  * code blew past the whole-stage codegen method limit (Spark fell back to
  * interpreted projection AND re-evaluated ~10 regexes per row).
  * `CodegenFallback` here is deliberate: the expression is a single
  * virtual call into precompiled-regex Scala — already the fast path — and
  * it shares one semantics source with the pure, unit-tested function
  * (the reference behavior from `/root/reference/src/Porter.php:300-339`).
  *
  * Null `_key` routes to the collection name, like a row without a key
  * (Porter.php:334-338), so `eval` handles null itself rather than
  * inheriting null-propagation.
  */
case class RouteKey(child: Expression, collection: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val key = if (v == null) None else Some(v.asInstanceOf[UTF8String].toString)
    UTF8String.fromString(Route.routeTable(key, collection))
  }

  override protected def withNewChildInternal(newChild: Expression): RouteKey =
    copy(child = newChild)
}

/** Native expression for the normalized `_key` FAMILY — the value the
  * reference tallies into `$allKeys` (Porter.php:328-332) *before* the
  * numeric/empty fallback to the collection name. Null keys produce null
  * (a row without `_key` contributes no tally observation). */
case class NormalizeKey(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Route.normalizeKey(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): NormalizeKey =
    copy(child = newChild)
}
