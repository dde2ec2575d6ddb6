package graft.porter

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.kernel.DType

/** Destination-table definition: ordered columns with inferred types and
  * the primary key (`_id`, or `(_parentid,_index)` for child tables —
  * `/root/reference/src/Porter.php:116-120`). */
final case class TableDef(columns: Seq[(String, DType)], pk: Seq[String]) {
  def columnNames: Seq[String] = columns.map(_._1)
}

/** A destination for exported tables. The reference writes row-at-a-time
  * `REPLACE INTO` MySQL (`Porter.php:207`); the engine abstracts the
  * destination so tests write parquet and production writes batched JDBC.
  */
trait Sink {
  def tableExists(name: String): Boolean
  def ensureTable(name: String, ddl: TableDef): Unit
  def truncate(name: String): Unit
  def write(name: String, df: DataFrame, ddl: TableDef): Unit
}

/** Test / lakehouse sink: one parquet dir per table plus a schema sidecar
  * recording the inferred destination DDL. */
final class ParquetSink(baseDir: String) extends Sink {
  private def dir(name: String) = s"$baseDir/$name"

  override def tableExists(name: String): Boolean =
    Files.exists(Paths.get(dir(name)))

  override def ensureTable(name: String, ddl: TableDef): Unit = {
    Files.createDirectories(Paths.get(baseDir))
    val json = ddl.columns
      .map { case (c, t) => s"""    "$c": "${t.render}"""" }
      .mkString("{\n  \"columns\": {\n", ",\n", "\n  },\n" +
        s"""  "primary_key": [${ddl.pk.map("\"" + _ + "\"").mkString(", ")}]\n}\n""")
    Files.createDirectories(Paths.get(dir(name)))
    Files.writeString(Paths.get(s"${dir(name)}/_schema.json"), json)
  }

  override def truncate(name: String): Unit = ()

  override def write(name: String, df: DataFrame, ddl: TableDef): Unit =
    df.write.mode("overwrite").parquet(s"${dir(name)}/data")
}

/** Production sink: batched `REPLACE INTO` over JDBC — the set-oriented
  * form of the reference's row-at-a-time autocommit inserts
  * (`Porter.php:207`, the acknowledged bottleneck at README.md:63-64).
  * DDL is emitted ONCE per table from the inferred [[TableDef]] instead of
  * being re-checked per row.
  *
  * Each partition opens one connection and flushes `PreparedStatement`
  * batches of `batchSize` — at 1000-executor scale the write parallelism
  * is the partition count, and `df.repartition(n)` upstream is the knob
  * that matches it to what the database can absorb.
  */
final class JdbcReplaceSink(
    url: String,
    connProps: java.util.Properties,
    batchSize: Int = 1000) extends Sink {

  private def sqlType(t: DType): String = t match {
    case DType.DInt        => "INT"
    case DType.DDouble     => "DOUBLE"
    case DType.DDatetime   => "DATETIME"
    case DType.DText       => "TEXT"
    case DType.DVarchar(n) => s"VARCHAR($n)"
  }

  /** CREATE TABLE statement for an inferred definition (exposed for
    * tests — no database is needed to pin the DDL shape). */
  def createTableSql(name: String, ddl: TableDef): String = {
    val cols = ddl.columns.map { case (c, t) => s"`$c` ${sqlType(t)} NULL" }
    val pk = if (ddl.pk.nonEmpty)
      Seq(s"PRIMARY KEY (${ddl.pk.map(c => s"`$c`").mkString(", ")})")
    else Seq.empty
    s"CREATE TABLE IF NOT EXISTS `$name` (${(cols ++ pk).mkString(", ")})"
  }

  /** REPLACE INTO statement with one placeholder per column. */
  def replaceSql(name: String, columns: Seq[String]): String =
    s"REPLACE INTO `$name` (${columns.map(c => s"`$c`").mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")})"

  private def withConnection[A](f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url, connProps)
    try f(conn) finally conn.close()
  }

  override def tableExists(name: String): Boolean = withConnection { conn =>
    val rs = conn.getMetaData.getTables(null, null, name, null)
    try rs.next() finally rs.close()
  }

  override def ensureTable(name: String, ddl: TableDef): Unit =
    withConnection(_.createStatement().executeUpdate(createTableSql(name, ddl)))

  override def truncate(name: String): Unit =
    withConnection(_.createStatement().executeUpdate(s"TRUNCATE TABLE `$name`"))

  override def write(name: String, df: DataFrame, ddl: TableDef): Unit = {
    val cols = df.columns.toSeq
    val sql = replaceSql(name, cols)
    val (u, p, bs) = (url, connProps, batchSize)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val conn = java.sql.DriverManager.getConnection(u, p)
      try {
        conn.setAutoCommit(false)
        val ps = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { row =>
          var i = 0
          while (i < cols.length) { ps.setObject(i + 1, row.get(i)); i += 1 }
          ps.addBatch(); n += 1
          if (n % bs == 0) { ps.executeBatch(); conn.commit() }
        }
        ps.executeBatch(); conn.commit()
      } finally conn.close()
    }
  }
}
