package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy => JProxy}
import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** An in-memory recording JDBC driver (`jdbc:fake:*`): every connection,
  * statement, batch flush and commit is appended to a shared event log so
  * tests can pin the exact wire behavior of [[graft.porter.JdbcReplaceSink]]
  * — REPLACE batching cadence, truncate-once, `tableExists` via metadata —
  * without a database. Built on dynamic proxies over the `java.sql`
  * interfaces; runs driver- and executor-side in the same local JVM.
  */
object FakeJdbc {

  /** Chronological event log (thread-safe; executors append too). */
  val events = new CopyOnWriteArrayList[String]()
  /** Rows "written": (table, row values) captured at executeBatch. */
  val rows = new CopyOnWriteArrayList[(String, Seq[Any])]()
  /** Tables that `getMetaData.getTables` reports as existing. */
  val existing = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def reset(): Unit = { events.clear(); rows.clear(); existing.clear() }
  def eventList: Seq[String] = events.asScala.toSeq
  def rowList: Seq[(String, Seq[Any])] = rows.asScala.toSeq

  private def log(e: String): Unit = events.add(e)

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
              case java.lang.Void.TYPE    => null
              case _                      => null
            })
        }
      }).asInstanceOf[T]

  private val replaceTable = "REPLACE INTO `([^`]+)`".r.unanchored
  private val createTable = "CREATE TABLE IF NOT EXISTS `([^`]+)`".r.unanchored
  private val truncateTable = "TRUNCATE TABLE `([^`]+)`".r.unanchored

  private def oneShotResultSet(hasRow: Boolean): java.sql.ResultSet = {
    var consumed = false
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        val r = hasRow && !consumed; consumed = true; java.lang.Boolean.valueOf(r)
      case ("close", _) => null
    }
  }

  private def preparedStatement(sql: String): java.sql.PreparedStatement = {
    val table = sql match {
      case replaceTable(t) => t
      case _               => "?"
    }
    val params = scala.collection.mutable.Map.empty[Int, Any]
    val batch = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("setObject", Seq(idx: Integer, v)) =>
        params(idx.intValue()) = v; null
      case ("addBatch", _) =>
        batch += params.toSeq.sortBy(_._1).map(_._2); params.clear(); null
      case ("executeBatch", _) =>
        log(s"executeBatch:$table:${batch.size}")
        batch.foreach(r => rows.add(table -> r))
        val statuses = new Array[Int](batch.size)
        batch.clear()
        statuses
      case ("close", _) => null
    }
  }

  private def statement(): java.sql.Statement =
    proxy(classOf[java.sql.Statement]) {
      case ("executeUpdate", Seq(sql: String)) =>
        sql match {
          case createTable(t)   => existing.add(t); log(s"create:$t")
          case truncateTable(t) => log(s"truncate:$t")
          case _                => log(s"update:$sql")
        }
        Integer.valueOf(0)
      case ("close", _) => null
    }

  private def metaData(): java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData]) {
      case ("getTables", a) if a.length >= 3 =>
        val name = String.valueOf(a(2))
        log(s"getTables:$name")
        oneShotResultSet(existing.contains(name))
      // the recording fake knows table NAMES but not column structure:
      // empty column metadata makes the sink's tableDef return None, so
      // ensureTable takes the CREATE path (the SQL-executing MiniMySql
      // fake covers the evolve path)
      case ("getColumns", _)     => oneShotResultSet(false)
      case ("getPrimaryKeys", _) => oneShotResultSet(false)
    }

  private def connection(): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("setAutoCommit", Seq(b)) => log(s"autocommit:$b"); null
      case ("prepareStatement", Seq(sql: String)) =>
        log(s"prepare:$sql"); preparedStatement(sql)
      case ("createStatement", _) => statement()
      case ("getMetaData", _)     => metaData()
      case ("commit", _)          => log("commit"); null
      case ("close", _)           => log("closeConnection"); null
    }

  final class Driver extends java.sql.Driver {
    override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:fake:")
    override def connect(url: String, info: java.util.Properties): java.sql.Connection =
      if (!acceptsURL(url)) null else { log(s"connect:$url"); connection() }
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
