package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy => JProxy}
import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** An in-memory SQL-EXECUTING fake (`jdbc:mini:*`) covering the MySQL
  * subset [[graft.porter.JdbcReplaceSink]] emits: `CREATE TABLE IF NOT
  * EXISTS`, `ALTER TABLE ADD/MODIFY COLUMN`, `TRUNCATE TABLE`, and batched
  * `REPLACE INTO`. Unlike [[FakeJdbc]] (which only records strings), this
  * fake PARSES the generated SQL text and maintains real table state —
  * column types, primary keys, REPLACE-on-PK-collision upserts — so tests
  * validate the statements themselves, the closest this offline sandbox
  * gets to an embedded MySQL-dialect engine. Unparseable SQL throws, so a
  * malformed statement fails the test instead of being recorded silently.
  */
object MiniMySql {

  final case class ColDef(name: String, typeName: String, size: Int) {
    def rendered: String = if (size > 0) s"$typeName($size)" else typeName
  }

  final class Table(
      val cols: mutable.LinkedHashMap[String, ColDef],
      var pk: Seq[String]) {
    /** pk-value → row (column → value); LinkedHashMap keeps insert order. */
    val rows = mutable.LinkedHashMap.empty[Seq[Any], mutable.Map[String, Any]]
    private var autoKey = 0L
    def keyOf(row: mutable.Map[String, Any]): Seq[Any] =
      if (pk.nonEmpty) pk.map(row.getOrElse(_, null))
      else { autoKey += 1; Seq(autoKey) } // MySQL REPLACE w/o keys = INSERT
  }

  val tables = TrieMap.empty[String, Table]
  def reset(): Unit = tables.clear()

  def rowsOf(name: String): Seq[Map[String, Any]] =
    tables(name).synchronized { tables(name).rows.values.map(_.toMap).toSeq }
  def colTypes(name: String): Map[String, String] =
    tables(name).cols.values.map(c => c.name -> c.rendered).toMap

  // ---- SQL parsing (the exact statement shapes the sink generates) ----

  private val createRe =
    """(?s)CREATE TABLE IF NOT EXISTS `([^`]+)` \((.*)\)""".r
  private val colDefRe = """`([^`]+)` ([A-Z]+)(?:\((\d+)\))? NULL""".r
  private val pkRe = """PRIMARY KEY \(([^)]*)\)""".r
  private val alterAddRe =
    """ALTER TABLE `([^`]+)` ADD COLUMN `([^`]+)` ([A-Z]+)(?:\((\d+)\))? NULL""".r
  private val alterModifyRe =
    """ALTER TABLE `([^`]+)` MODIFY COLUMN `([^`]+)` ([A-Z]+)(?:\((\d+)\))? NULL""".r
  private val truncateRe = """TRUNCATE TABLE `([^`]+)`""".r
  private val replaceRe =
    """(?s)REPLACE INTO `([^`]+)` \(([^)]*)\) VALUES \(([^)]*)\)""".r

  /** The only types [[graft.porter.JdbcReplaceSink]] ever emits (the
    * DType lattice rendered to MySQL). Anything else in a parsed DDL is
    * a bug in the generator, so the fake REJECTS it rather than storing
    * a type whose semantics it does not model. */
  private val ModeledTypes = Set("INT", "DOUBLE", "DATETIME", "TEXT", "VARCHAR")

  private def parseCol(name: String, typ: String, size: String): ColDef = {
    require(ModeledTypes(typ), s"MiniMySql does not model column type $typ")
    ColDef(name, typ, Option(size).map(_.toInt).getOrElse(0))
  }

  def executeUpdate(sql: String): Unit = sql.trim match {
    case createRe(name, body) =>
      if (!tables.contains(name)) {
        val cols = mutable.LinkedHashMap.empty[String, ColDef]
        colDefRe.findAllMatchIn(body).foreach { m =>
          val c = parseCol(m.group(1), m.group(2), m.group(3))
          cols(c.name) = c
        }
        val pk = pkRe.findFirstMatchIn(body)
          .map(_.group(1).split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty)
        require(cols.nonEmpty, s"CREATE TABLE parsed no columns: $sql")
        tables.put(name, new Table(cols, pk))
      }
    case alterAddRe(name, c, typ, size) =>
      val t = tables(name)
      t.synchronized {
        require(!t.cols.contains(c), s"duplicate ADD COLUMN `$c` on `$name`")
        t.cols(c) = parseCol(c, typ, size)
        t.rows.values.foreach(_.getOrElseUpdate(c, null))
      }
    case alterModifyRe(name, c, typ, size) =>
      val t = tables(name)
      t.synchronized {
        require(t.cols.contains(c), s"MODIFY of unknown column `$c` on `$name`")
        t.cols(c) = parseCol(c, typ, size)
      }
    case truncateRe(name) =>
      val t = tables(name)
      t.synchronized(t.rows.clear())
    case other =>
      throw new IllegalArgumentException(s"MiniMySql cannot parse: $other")
  }

  // ---- JDBC surface (dynamic proxies, FakeJdbc's technique) ----

  private def proxy[T](cls: Class[T])(
      f: PartialFunction[(String, Seq[AnyRef]), AnyRef]): T =
    JProxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val a: Seq[AnyRef] = if (args == null) Seq.empty else args.toSeq
          f.applyOrElse((m.getName, a), (_: (String, Seq[AnyRef])) =>
            m.getReturnType match {
              case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
              case java.lang.Integer.TYPE => Integer.valueOf(0)
              case java.lang.Long.TYPE    => java.lang.Long.valueOf(0L)
              case java.lang.Short.TYPE   => java.lang.Short.valueOf(0.toShort)
              case java.lang.Void.TYPE    => null
              case _                      => null
            })
        }
      }).asInstanceOf[T]

  /** Forward-only ResultSet over named-column rows (enough for the
    * DatabaseMetaData reads the sink performs). */
  private def resultSet(rows: Seq[Map[String, Any]]): java.sql.ResultSet = {
    var i = -1
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        i += 1; java.lang.Boolean.valueOf(i < rows.size)
      case ("getString", Seq(c: String)) =>
        String.valueOf(rows(i)(c))
      case ("getInt", Seq(c: String)) =>
        Integer.valueOf(rows(i)(c).asInstanceOf[Int])
      case ("getShort", Seq(c: String)) =>
        java.lang.Short.valueOf(rows(i)(c).asInstanceOf[Int].toShort)
      case ("close", _) => null
    }
  }

  private def preparedStatement(sql: String): java.sql.PreparedStatement = {
    val (table, columns) = sql.trim match {
      case replaceRe(t, cols, placeholders) =>
        val cs = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
        require(placeholders.split(",").map(_.trim).forall(_ == "?"),
          s"non-placeholder VALUES in: $sql")
        (t, cs)
      case other =>
        throw new IllegalArgumentException(s"MiniMySql cannot prepare: $other")
    }
    val params = mutable.Map.empty[Int, Any]
    val batch = mutable.ArrayBuffer.empty[Seq[Any]]
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("setObject", Seq(idx: Integer, v)) =>
        params(idx.intValue()) = v; null
      case ("addBatch", _) =>
        require(params.size == columns.size,
          s"bound ${params.size} of ${columns.size} params for: $sql")
        batch += columns.indices.map(i => params(i + 1))
        params.clear(); null
      case ("executeBatch", _) =>
        val t = tables.getOrElse(table,
          throw new IllegalStateException(s"REPLACE into unknown table `$table`"))
        t.synchronized {
          val unknown = columns.filterNot(t.cols.contains)
          require(unknown.isEmpty,
            s"REPLACE references unknown columns $unknown on `$table`")
          batch.foreach { vals =>
            val row = mutable.Map.empty[String, Any]
            t.cols.keys.foreach(row(_) = null)
            columns.zip(vals).foreach { case (c, v) => row(c) = v }
            t.rows(t.keyOf(row)) = row // REPLACE: same PK overwrites
          }
        }
        val statuses = new Array[Int](batch.size)
        batch.clear()
        statuses
      case ("close", _) => null
    }
  }

  private def metaData(): java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData]) {
      case ("getTables", a) if a.length >= 3 =>
        resultSet(
          if (tables.contains(String.valueOf(a(2))))
            Seq(Map("TABLE_NAME" -> String.valueOf(a(2)))) else Seq.empty)
      case ("getColumns", a) if a.length >= 3 =>
        val rows = tables.get(String.valueOf(a(2))).toSeq.flatMap(_.cols.values)
          .map(c => Map[String, Any]("COLUMN_NAME" -> c.name,
            "TYPE_NAME" -> c.typeName, "COLUMN_SIZE" -> c.size))
        resultSet(rows)
      case ("getPrimaryKeys", a) if a.length >= 3 =>
        val rows = tables.get(String.valueOf(a(2))).toSeq.flatMap(t =>
          t.pk.zipWithIndex.map { case (c, i) =>
            Map[String, Any]("COLUMN_NAME" -> c, "KEY_SEQ" -> (i + 1))
          })
        resultSet(rows)
    }

  private def statement(): java.sql.Statement =
    proxy(classOf[java.sql.Statement]) {
      case ("executeUpdate", Seq(sql: String)) =>
        executeUpdate(sql); Integer.valueOf(0)
      case ("close", _) => null
    }

  private def connection(): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("prepareStatement", Seq(sql: String)) => preparedStatement(sql)
      case ("createStatement", _)                 => statement()
      case ("getMetaData", _)                     => metaData()
      case ("setAutoCommit", _) | ("commit", _) | ("close", _) => null
    }

  final class Driver extends java.sql.Driver {
    override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:mini:")
    override def connect(url: String, info: java.util.Properties): java.sql.Connection =
      if (!acceptsURL(url)) null else connection()
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def getPropertyInfo(url: String, info: java.util.Properties) =
      Array.empty[java.sql.DriverPropertyInfo]
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger: java.util.logging.Logger =
      throw new java.sql.SQLFeatureNotSupportedException()
  }

  /** Idempotent registration with DriverManager. */
  lazy val register: Unit = java.sql.DriverManager.registerDriver(new Driver)
}
