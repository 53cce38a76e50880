package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}

/** foreachBatch partial-update JDBC writer (SURVEY.md §2.5 K4; reference
  * semantics: `WrappedDataTable.java:72-715` with its UpdateStatement
  * cache keyed by present-column set at `:616-713`).
  *
  * Consumes wrapped-envelope rows — key columns plus a `vals`
  * map<string,string> holding ONLY the columns present in the redo — and
  * applies them as partial updates: UPDATE sets exactly the present
  * columns; a zero-row UPDATE falls back to INSERT of the present
  * columns; DELETE uses the key. Prepared statements are cached per
  * distinct present-column set, so a workload with k distinct update
  * shapes compiles k statements, not one per row.
  */
case class PartialUpsertSink(
    url: String,
    table: String,
    keyCols: Seq[String],
    opCol: String = "op",
    valsCol: String = "vals",
    user: String = "",
    password: String = "") extends Serializable {

  private def connect(): Connection =
    if (user.isEmpty) DriverManager.getConnection(url)
    else DriverManager.getConnection(url, user, password)

  def writeBatch(df: DataFrame): Unit = {
    val kCols = keyCols
    val t = table
    val opIdx = df.columns.indexOf(opCol)
    val valsIdx = df.columns.indexOf(valsCol)
    val keyIdx = kCols.map(df.columns.indexOf(_))
    require(opIdx >= 0 && valsIdx >= 0 && keyIdx.forall(_ >= 0),
      s"sink needs columns $kCols + $opCol + $valsCol")
    val connectFn = () => connect()

    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = connectFn()
        conn.setAutoCommit(false)
        // the reference's UpdateStatement cache: present-column set → stmt
        val updCache = collection.mutable.Map[Seq[String], PreparedStatement]()
        val insCache = collection.mutable.Map[Seq[String], PreparedStatement]()
        val del = conn.prepareStatement(
          s"DELETE FROM $t WHERE ${kCols.map(k => s"$k = ?").mkString(" AND ")}")
        try {
          rows.foreach { r =>
            val keyVals = keyIdx.map(r.get)
            val isDelete = r.get(opIdx) match {
              case i: Int => i == graft.cdc.Ops.Delete
              case s: String => s == "d" || s == "DELETE"
              case _ => false
            }
            if (isDelete) {
              keyVals.zipWithIndex.foreach { case (v, i) => del.setObject(i + 1, v) }
              del.executeUpdate()
            } else {
              val vals = r.getMap[String, String](valsIdx)
              // data-driven map keys become SQL TEXT: validate them as
              // plain identifiers (a crafted key would otherwise inject
              // into the statement — values are bound, keys are not),
              // and exclude key columns (they bind via the WHERE/INSERT
              // key slots; repeating them would duplicate columns)
              val present = vals.keys.toSeq
                .filterNot(c => kCols.exists(_.equalsIgnoreCase(c))).sorted
              present.foreach { c =>
                if (!c.matches("[A-Za-z_][A-Za-z0-9_$#]*"))
                  throw new IllegalArgumentException(
                    s"illegal column identifier in wrapped payload: '$c'")
              }
              if (present.isEmpty) {
                // key-only change: nothing to SET; ensure the row exists
                // via an existence probe, NOT insert-and-swallow — a
                // swallowed SQLException would hide real failures and on
                // PostgreSQL abort the whole open transaction
                val sel = updCache.getOrElseUpdate(Seq("\u0000exists"),
                  conn.prepareStatement(
                    s"SELECT 1 FROM $t WHERE ${kCols.map(k => s"$k = ?").mkString(" AND ")}"))
                keyVals.zipWithIndex.foreach { case (v, i) =>
                  sel.setObject(i + 1, v)
                }
                val rs = sel.executeQuery()
                val exists = try rs.next() finally rs.close()
                if (!exists) {
                  val ins = insCache.getOrElseUpdate(Nil, conn.prepareStatement(
                    s"INSERT INTO $t (${kCols.mkString(", ")}) " +
                      s"VALUES (${kCols.map(_ => "?").mkString(", ")})"))
                  keyVals.zipWithIndex.foreach { case (v, i) =>
                    ins.setObject(i + 1, v)
                  }
                  ins.executeUpdate()
                }
              } else {
              val upd = updCache.getOrElseUpdate(present, conn.prepareStatement(
                s"UPDATE $t SET ${present.map(c => s"$c = ?").mkString(", ")} " +
                  s"WHERE ${kCols.map(k => s"$k = ?").mkString(" AND ")}"))
              present.zipWithIndex.foreach { case (c, i) =>
                upd.setString(i + 1, vals(c))
              }
              keyVals.zipWithIndex.foreach { case (v, i) =>
                upd.setObject(present.size + i + 1, v)
              }
              if (upd.executeUpdate() == 0) {
                val ins = insCache.getOrElseUpdate(present, conn.prepareStatement(
                  s"INSERT INTO $t (${(kCols ++ present).mkString(", ")}) " +
                    s"VALUES (${(kCols ++ present).map(_ => "?").mkString(", ")})"))
                keyVals.zipWithIndex.foreach { case (v, i) => ins.setObject(i + 1, v) }
                present.zipWithIndex.foreach { case (c, i) =>
                  ins.setString(kCols.size + i + 1, vals(c))
                }
                ins.executeUpdate()
              }
              }
            }
          }
          conn.commit()
          PartialUpsertSink.lastStatementCacheSize = updCache.size
        } catch {
          case e: Throwable =>
            // roll back before close — Derby refuses to close a
            // connection with an open transaction, and that close
            // error would REPLACE the real failure (the JdbcUpsertSink
            // masking bug, fixed there with in-task transient retry;
            // this sink keeps the simpler propagate-unmasked shape)
            try conn.rollback()
            catch { case s: Exception => e.addSuppressed(s) }
            throw e
        } finally {
          def quiet(c: AutoCloseable): Unit =
            try c.close() catch { case _: Exception => }
          (updCache.values ++ insCache.values).foreach(quiet)
          quiet(del)
          quiet(conn)
        }
      }
    }
  }
}

object PartialUpsertSink {
  /** Update-statement cache size of the last completed partition — a
    * local-mode test observability hook (executors share the JVM there).
    */
  @volatile var lastStatementCacheSize: Int = 0
}
