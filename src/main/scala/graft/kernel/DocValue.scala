package graft.kernel

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** A pure model of a BSON-ish document value, used by the fidelity kernel
  * (flatten / infer / child extraction) and its property tests. The Spark
  * pipeline ([[graft.porter]]) operates on `DataFrame`s whose schemas map
  * onto the same shapes: `DocObj`→`StructType`, `DocArr`→`ArrayType`,
  * `DocDate`→`TimestampType`, `DocObjectId`→24-hex `StringType`.
  */
sealed trait DocValue

object DocValue {
  case object DocNull                                       extends DocValue
  final case class DocInt(v: Long)                          extends DocValue
  final case class DocDouble(v: Double)                     extends DocValue
  final case class DocString(v: String)                     extends DocValue
  /** MongoDate — epoch seconds (`/root/reference/src/Porter.php:290-292`). */
  final case class DocDate(epochSec: Long)                  extends DocValue
  /** MongoId — 24-char hex (`/root/reference/src/Porter.php:359-360`). */
  final case class DocObjectId(hex: String)                 extends DocValue
  /** Unsupported in the reference → fail-fast (Porter.php:388-395). */
  final case class DocBool(v: Boolean)                      extends DocValue
  final case class DocObj(fields: Vector[(String, DocValue)]) extends DocValue
  final case class DocArr(values: Vector[DocValue])         extends DocValue

  /** Raised for value shapes the reference cannot type
    * (`/root/reference/src/Porter.php:388-395`): same fail-fast contract,
    * with the field name and row context in the message. */
  final class UnknownTypeException(msg: String) extends RuntimeException(msg)

  /** `gmdate('c')` rendering of a MongoDate: ISO-8601 with UTC offset,
    * e.g. `2014-03-01T12:00:00+00:00` (Porter.php:290-292). */
  def isoUtc(epochSec: Long): String =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssxxx")
      .withZone(ZoneOffset.UTC)
      .format(Instant.ofEpochSecond(epochSec))

  /** Per-value type inference (`guessDbType`, Porter.php:358-396).
    * Nulls deliberately infer to `int`, exactly like the reference. */
  def infer(value: DocValue, name: String = "", context: String = ""): DType =
    value match {
      case DocObjectId(_)  => DType.DVarchar(24)
      case DocDate(_)      => DType.DDatetime
      case DocInt(_)       => DType.DInt
      case DocNull         => DType.DInt
      case DocDouble(_)    => DType.DDouble
      case DocString(s)    => DType.ofString(s)
      case other =>
        val where = if (name.nonEmpty) s"$name in $context" else other.toString
        throw new UnknownTypeException(s"Unknown type for: $where")
    }
}
