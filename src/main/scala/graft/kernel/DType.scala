package graft.kernel

/** The destination-side scalar type lattice of the reference engine.
  *
  * The reference infers a SQL type per observed value
  * (`/root/reference/src/Porter.php:358-396`) and widens conflicting
  * observations of the same column through a small lattice
  * (`/root/reference/src/Porter.php:405-429`). We model the types as an ADT
  * and the two operations as pure functions so they can be property-tested
  * without Spark and folded distributively inside a Spark aggregation
  * (see [[graft.porter.SchemaInfer]]).
  */
sealed trait DType { def render: String }

object DType {
  case object DInt      extends DType { val render = "int" }
  case object DDouble   extends DType { val render = "double" }
  case object DDatetime extends DType { val render = "datetime" }
  case object DText     extends DType { val render = "text" }
  final case class DVarchar(n: Int) extends DType { def render = s"varchar($n)" }

  /** Strings longer than this become `text` (Porter.php:38). */
  val MaxVarcharLength = 512

  /** ISO-8601 prefix that promotes a string to `datetime`
    * (Porter.php:372-373). Anchored at the start only, like the reference. */
  private val IsoDateTimePrefix =
    """^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d{1,4})?""".r

  def looksLikeIsoDateTime(s: String): Boolean =
    IsoDateTimePrefix.findFirstIn(s).isDefined

  /** Varchar size bucketing: 50 / 100 / 255 / 512 (Porter.php:375-386).
    * Note the reference buckets len==50 to 100 and len==255 to 512 because
    * its comparisons are strict `<`. */
  def bucketVarchar(len: Int): Int =
    if (len < 50) 50
    else if (len < 100) 100
    else if (len < 255) 255
    else 512 // len <= MaxVarcharLength; longer strings are `text` upstream

  /** Type of an observed string value (Porter.php:366-386). */
  def ofString(s: String): DType = {
    val n = s.length
    if (n > MaxVarcharLength) DText
    else if (looksLikeIsoDateTime(s)) DDatetime
    else DVarchar(bucketVarchar(n))
  }

  /** Widen two observed types to the most forgiving one
    * (`guessCompareDbTypes`, Porter.php:405-429). The reference sorts its
    * two arguments lexicographically by rendered name first, which makes
    * the function commutative by construction; we reproduce that ordering
    * so warts survive intact. Notable lattice facts, all pinned in tests:
    *   - `text` absorbs everything;
    *   - `double ⊔ int = double`;
    *   - `varchar(a) ⊔ varchar(b) = varchar(max(a,b))`;
    *   - any other mixed pair collapses to `varchar(255)` — including the
    *     non-monotone `varchar(512) ⊔ int = varchar(255)` and
    *     `datetime ⊔ int = varchar(255)`.
    */
  def widen(a: DType, b: DType): DType = {
    val Seq(t1, t2) = Seq(a, b).sortBy(_.render)
    (t1, t2) match {
      case _ if t1 == t2                      => t1
      case (DText, _) | (_, DText)            => DText
      case (DDouble, DInt)                    => DDouble
      case (DVarchar(x), DVarchar(y))         => DVarchar(math.max(x, y))
      case _                                  => DVarchar(255)
    }
  }

  /** Fold a non-empty collection of observations deterministically.
    *
    * The reference folds in row-arrival order, which is nondeterministic
    * under distributed execution (and its lattice is not associative:
    * e.g. `(varchar(512) ⊔ int) ⊔ text = text` but `varchar(512) ⊔ (int ⊔
    * text) = text` happens to agree while `(datetime ⊔ int) ⊔ datetime =
    * varchar(255)` differs from arrival-order folds). We define the
    * canonical result as the left fold over observations sorted by
    * rendered name, which is deterministic regardless of partitioning. */
  def widenAll(types: Iterable[DType]): DType = {
    require(types.nonEmpty, "widenAll of empty observation set")
    types.toSeq.distinct.sortBy(_.render).reduceLeft(widen)
  }

  /** Parse a rendered type back (used by tests and the JDBC DDL path). */
  def parse(s: String): DType = s match {
    case "int"      => DInt
    case "double"   => DDouble
    case "datetime" => DDatetime
    case "text"     => DText
    case v if v.startsWith("varchar(") && v.endsWith(")") =>
      DVarchar(v.stripPrefix("varchar(").stripSuffix(")").toInt)
    case other => throw new IllegalArgumentException(s"Unknown DType: $other")
  }
}
