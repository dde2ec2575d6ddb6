package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions at session build time, so any session created with
  * `.withExtensions(new GraftExtensions)` — or with
  * `spark.sql.extensions=graft.expr.GraftExtensions` — gets the full SQL
  * function surface without per-session registry calls. (The query surface
  * also registers defensively via [[VectorExpressions.register]] because
  * the driver harness builds plain sessions.)
  *
  * Registered functions:
  *  - `graft_dot(a, b)` — float-array dot product ([[DotProduct]])
  *  - `graft_route(key, 'collection')` — `_key` destination-table routing
  *    ([[RouteKey]]; the collection must be a string literal because the
  *    reference routes per collection scan, Porter.php:300-339)
  *  - `graft_norm_key(key)` — normalized `_key` family ([[NormalizeKey]],
  *    the value the reference tallies, Porter.php:328-332)
  *  - `graft_nfc(s)` — Unicode NFC normalization ([[NfcNormalize]])
  *  - `graft_md5_56(s)` — 56-bit md5 hash ([[Md5Hash56]], the
  *    shingle/bucket key)
  *  - `graft_bloom_probe(s, bloom, m)` — packed-bit-array bloom
  *    membership probe ([[BloomProbe]], the q75 decontamination filter)
  *  - `graft_kmin(h, k)` — bounded bottom-k distinct aggregate
  *    ([[KMinDistinct]], the q195 KMV distinct-count sketch)
  *  - `graft_kmin_str(s, k)` — bounded bottom-k distinct STRING
  *    aggregate ([[KMinStrings]], the q225 low-cardinality block cap)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(
      e: SparkSessionExtensions,
      name: String,
      clazz: Class[_],
      build: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      build))

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "graft_dot", classOf[DotProduct], exprs => {
      require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(exprs.head, exprs(1))
    })
    inject(e, "graft_route", classOf[RouteKey], exprs => {
      require(exprs.length == 2,
        "graft_route takes exactly 2 arguments: key, collection")
      val collection = exprs(1) match {
        case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"graft_route collection must be a string literal, got $other")
      }
      RouteKey(exprs.head, collection)
    })
    inject(e, "graft_norm_key", classOf[NormalizeKey], exprs => {
      require(exprs.length == 1, "graft_norm_key takes exactly 1 argument")
      NormalizeKey(exprs.head)
    })
    inject(e, "graft_nfc", classOf[NfcNormalize], exprs => {
      require(exprs.length == 1, "graft_nfc takes exactly 1 argument")
      NfcNormalize(exprs.head)
    })
    inject(e, "graft_md5_56", classOf[Md5Hash56], exprs => {
      require(exprs.length == 1, "graft_md5_56 takes exactly 1 argument")
      Md5Hash56(exprs.head)
    })
    inject(e, "graft_bloom_probe", classOf[BloomProbe], exprs => {
      require(exprs.length == 3,
        "graft_bloom_probe takes exactly 3 arguments: s, bloom, m")
      BloomProbe(exprs.head, exprs(1), exprs(2))
    })
    inject(e, "graft_kmin", classOf[KMinDistinct], KMinDistinct.fromArgs)
    inject(e, "graft_kmin_str", classOf[KMinStrings], KMinStrings.fromArgs)
  }
}
