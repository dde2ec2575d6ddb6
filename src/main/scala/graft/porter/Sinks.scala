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

object TableDef {

  /** Merge a freshly inferred definition into an existing destination's
    * definition, the reference's re-export behavior (`ensureRowStructure`,
    * `/root/reference/src/Porter.php:86-123`): columns unseen by the
    * destination are added, columns present in both with conflicting types
    * widen through the lattice, and columns only the destination knows are
    * left untouched. Column order is the destination's, new columns
    * appended in inferred order; the primary key keeps the destination's
    * if it has one (re-keying an existing table is not something the
    * reference does either). */
  def evolve(existing: TableDef, inferred: TableDef): TableDef = {
    val inferredMap = inferred.columns.toMap
    val kept = existing.columns.map { case (c, t) =>
      c -> inferredMap.get(c).map(DType.widen(t, _)).getOrElse(t)
    }
    val existingNames = existing.columnNames.toSet
    val added = inferred.columns.filterNot { case (c, _) => existingNames(c) }
    TableDef(kept ++ added, if (existing.pk.nonEmpty) existing.pk else inferred.pk)
  }
}

/** A destination for exported tables. The reference writes row-at-a-time
  * `REPLACE INTO` MySQL (`Porter.php:207`); the engine abstracts the
  * destination so tests write parquet and production writes batched JDBC.
  */
trait Sink {
  def tableExists(name: String): Boolean

  /** Current definition of an existing destination table, if the sink can
    * read one back (the reference's `getTableDef`, Porter.php:86). `None`
    * means "treat as absent": `ensureTable` creates instead of evolving. */
  def tableDef(name: String): Option[TableDef] = None

  /** Create the destination if absent; EVOLVE it if present — add unseen
    * columns and widen conflicting types per [[TableDef.evolve]] — so
    * re-exporting into a table created by an earlier run picks up schema
    * drift the way the reference does (Porter.php:86-123). */
  def ensureTable(name: String, ddl: TableDef): Unit
  def truncate(name: String): Unit
  def write(name: String, df: DataFrame, ddl: TableDef): Unit

  /** Write every destination in ONE pass over `df`: `tableCol` names each
    * row's table (the reference writes all routed tables from a single
    * cursor pass, Porter.php:150-207). Implementations override with a
    * genuinely single-job form; this default falls back to one filtered
    * write per table. */
  def writeMany(df: DataFrame, tableCol: String, ddls: Map[String, TableDef]): Unit =
    ddls.foreach { case (t, ddl) =>
      write(t, df.filter(org.apache.spark.sql.functions.col(tableCol) === t)
        .drop(tableCol), ddl)
    }
}

/** Test / lakehouse sink: one parquet dir per table plus a schema sidecar
  * recording the inferred destination DDL. */
final class ParquetSink(baseDir: String) extends Sink {
  private def dir(name: String) = s"$baseDir/$name"

  override def tableExists(name: String): Boolean =
    Files.exists(Paths.get(dir(name)))

  /** Parses the `_schema.json` sidecar this sink wrote back into a
    * [[TableDef]]. The format is fixed and machine-generated (one
    * 4-space-indented `"col": "type"` line per column), so a line-shape
    * match is exact here — this is the test/lakehouse sink, not a general
    * JSON reader. */
  override def tableDef(name: String): Option[TableDef] = {
    val p = Paths.get(s"${dir(name)}/_schema.json")
    if (!Files.exists(p)) None
    else {
      val text = Files.readString(p)
      val cols = """    "([^"]+)": "([^"]+)"""".r.findAllMatchIn(text)
        .map(m => m.group(1) -> DType.parse(m.group(2))).toSeq
      val pk = """"primary_key": \[([^\]]*)\]""".r.findFirstMatchIn(text)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      if (cols.isEmpty) None else Some(TableDef(cols, pk))
    }
  }

  override def ensureTable(name: String, ddl: TableDef): Unit = {
    Files.createDirectories(Paths.get(baseDir))
    // re-export into an existing table evolves its recorded definition
    // (add + widen) instead of clobbering it — see TableDef.evolve
    val target = tableDef(name).map(TableDef.evolve(_, ddl)).getOrElse(ddl)
    val json = target.columns
      .map { case (c, t) => s"""    "$c": "${t.render}"""" }
      .mkString("{\n  \"columns\": {\n", ",\n", "\n  },\n" +
        s"""  "primary_key": [${target.pk.map("\"" + _ + "\"").mkString(", ")}]\n}\n""")
    Files.createDirectories(Paths.get(dir(name)))
    Files.writeString(Paths.get(s"${dir(name)}/_schema.json"), json)
  }

  override def truncate(name: String): Unit = ()

  override def write(name: String, df: DataFrame, ddl: TableDef): Unit =
    df.write.mode("overwrite").parquet(s"${dir(name)}/data")

  /** Single-job multi-table write: `partitionBy(tableCol)` splits every
    * destination in one scan, then each partition directory is renamed
    * into its table's `data/` location (a driver-side metadata move, no
    * second data pass). Tables with no surviving rows still get an empty
    * data directory so the layout matches the per-table path. */
  override def writeMany(
      df: DataFrame, tableCol: String, ddls: Map[String, TableDef]): Unit = {
    // stage under baseDir, NOT the system temp dir: Files.move of a
    // non-empty directory only works within one file store, and /tmp is
    // frequently a different filesystem (tmpfs) than the destination
    Files.createDirectories(Paths.get(baseDir))
    val tmp = Files.createTempDirectory(Paths.get(baseDir), ".graft_writemany").toString
    df.write.partitionBy(tableCol).mode("overwrite").parquet(tmp)
    ddls.keys.foreach { t =>
      val src = Paths.get(tmp, s"$tableCol=$t")
      val dst = Paths.get(dir(t), "data")
      deleteRecursively(dst)
      Files.createDirectories(dst.getParent)
      if (Files.exists(src)) Files.move(src, dst)
      else // zero-row table: write its (empty) frame so readers still
           // find a parquet directory with the right schema
        df.filter(org.apache.spark.sql.functions.col(tableCol) === t)
          .drop(tableCol).write.mode("overwrite").parquet(dst.toString)
    }
    deleteRecursively(Paths.get(tmp))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
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

  /** Inverse of [[sqlType]] over the type names JDBC metadata reports.
    * Anything the lattice doesn't model maps to TEXT — widening into the
    * absorbing element is the safe direction for a destination column. */
  private def dtypeOf(typeName: String, size: Int): DType =
    typeName.toUpperCase match {
      case "INT" | "INTEGER" | "BIGINT" | "SMALLINT" | "TINYINT" => DType.DInt
      case "DOUBLE" | "FLOAT" | "REAL" | "DECIMAL"               => DType.DDouble
      case "DATETIME" | "TIMESTAMP"                              => DType.DDatetime
      case "VARCHAR" | "CHAR"                                    => DType.DVarchar(size)
      case _                                                     => DType.DText
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

  /** Reads the destination's current definition back through JDBC column
    * metadata (the reference's `getTableDef`, Porter.php:86). A table the
    * metadata reports as existing but with zero columns is treated as
    * absent (no real MySQL table has zero columns). */
  override def tableDef(name: String): Option[TableDef] = withConnection { conn =>
    if (!tableExists(name)) None
    else {
      val cols = scala.collection.mutable.ArrayBuffer.empty[(String, DType)]
      val rs = conn.getMetaData.getColumns(null, null, name, null)
      try while (rs.next())
        cols += rs.getString("COLUMN_NAME") ->
          dtypeOf(rs.getString("TYPE_NAME"), rs.getInt("COLUMN_SIZE"))
      finally rs.close()
      if (cols.isEmpty) None
      else {
        val pk = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
        val pkRs = conn.getMetaData.getPrimaryKeys(null, null, name)
        try while (pkRs.next())
          pk += pkRs.getShort("KEY_SEQ") -> pkRs.getString("COLUMN_NAME")
        finally pkRs.close()
        Some(TableDef(cols.toSeq, pk.sortBy(_._1).map(_._2).toSeq))
      }
    }
  }

  /** ALTER statements evolving `existing` into `target`: ADD COLUMN for
    * unseen columns, MODIFY for type changes (the reference's
    * `setTableDef` diff, Porter.php:108-122). Empty when nothing drifted. */
  def alterTableSql(name: String, existing: TableDef, target: TableDef): Seq[String] = {
    val existingMap = existing.columns.toMap
    target.columns.flatMap { case (c, t) =>
      existingMap.get(c) match {
        case None                    => Some(s"ALTER TABLE `$name` ADD COLUMN `$c` ${sqlType(t)} NULL")
        case Some(old) if old != t   => Some(s"ALTER TABLE `$name` MODIFY COLUMN `$c` ${sqlType(t)} NULL")
        case _                       => None
      }
    }
  }

  override def ensureTable(name: String, ddl: TableDef): Unit =
    tableDef(name) match {
      case None =>
        withConnection(_.createStatement().executeUpdate(createTableSql(name, ddl)))
      case Some(existing) =>
        val merged = TableDef.evolve(existing, ddl)
        val alters = alterTableSql(name, existing, merged)
        if (alters.nonEmpty) withConnection { conn =>
          val st = conn.createStatement()
          alters.foreach(st.executeUpdate)
        }
    }

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

  /** Single-pass multi-table write — the set-oriented form of the
    * reference's one-cursor-pass routing (Porter.php:150-207): each
    * partition opens one connection and keeps one PreparedStatement per
    * destination it encounters, batching per table and committing every
    * `batchSize` rows per statement. */
  override def writeMany(
      df: DataFrame, tableCol: String, ddls: Map[String, TableDef]): Unit = {
    val allCols = df.columns.toSeq
    val tIdx = allCols.indexOf(tableCol)
    require(tIdx >= 0, s"missing $tableCol column")
    val dataIdx = allCols.indices.filterNot(_ == tIdx)
    val dataCols = dataIdx.map(allCols)
    val sqls = ddls.keys.map(t => t -> replaceSql(t, dataCols)).toMap
    val (u, p, bs) = (url, connProps, batchSize)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val conn = java.sql.DriverManager.getConnection(u, p)
      try {
        conn.setAutoCommit(false)
        val stmts = scala.collection.mutable.Map
          .empty[String, (java.sql.PreparedStatement, Array[Int])]
        rows.foreach { row =>
          val t = row.getString(tIdx)
          val (ps, counter) = stmts.getOrElseUpdate(t,
            (conn.prepareStatement(sqls(t)), Array(0)))
          var i = 0
          while (i < dataIdx.length) {
            ps.setObject(i + 1, row.get(dataIdx(i))); i += 1
          }
          ps.addBatch(); counter(0) += 1
          if (counter(0) % bs == 0) { ps.executeBatch(); conn.commit() }
        }
        stmts.values.foreach { case (ps, _) => ps.executeBatch() }
        conn.commit()
      } finally conn.close()
    }
  }
}
