package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** foreachBatch JDBC upsert writer (SURVEY.md §2.5 K2/K4; reference
  * semantics: `JdbcSinkTable.putData:426` / `execUpsert:574` /
  * `duplicatedKeyInBatch:829`).
  *
  * Per micro-batch:
  *  1. dedup within the batch — keep only the LAST change per key (by the
  *     given ordering columns) so per-key ordering survives batched
  *     execution, like the reference's duplicated-key barrier;
  *  2. partition the batch into upserts (INSERT/UPDATE) and deletes;
  *  3. each PARTITION opens its own connection and executes batched
  *     prepared statements — so sink throughput scales with executors,
  *     no driver-side row loop (100 TB rule).
  *
  * Usage:
  * {{{
  * changes.writeStream.foreachBatch { (df, id) =>
  *   JdbcUpsertSink(url, "t", keyCols = Seq("id"), dialect = PostgresDialect)
  *     .writeBatch(df)
  * }.start()
  * }}}
  */
case class JdbcUpsertSink(
    url: String,
    table: String,
    keyCols: Seq[String],
    dialect: SinkDialect,
    opCol: String = "op",
    // ssn breaks ties for multi-statement operations at one SCN (e.g. a
    // key update logged as DELETE+INSERT with identical scn) — without it
    // row_number picks a nondeterministic batch winner
    orderCols: Seq[String] = Seq("commitScn", "scn", "ssn"),
    user: String = "",
    password: String = "",
    batchSize: Int = 1000,
    autoCreate: Boolean = true) extends Serializable {

  private def connect(): Connection =
    if (user.isEmpty) DriverManager.getConnection(url)
    else DriverManager.getConnection(url, user, password)

  /** Order columns present in this batch's frame (callers may omit e.g.
    * ssn; ordering degrades gracefully to the columns supplied).
    */
  private def presentOrderCols(df: DataFrame): Seq[String] =
    orderCols.filter(df.columns.contains)

  /** Dedup within batch: latest change per key wins (K2 barrier). */
  def dedupBatch(df: DataFrame): DataFrame = {
    val present = presentOrderCols(df)
    require(present.nonEmpty,
      s"dedupBatch needs at least one ordering column of ${orderCols.mkString(",")} " +
        s"in the batch frame (got columns: ${df.columns.mkString(",")})")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(present.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  def writeBatch(df: DataFrame): Unit = {
    val dataCols = df.columns.filterNot(c =>
      c == opCol || orderCols.contains(c)).toSeq
    val deduped = dedupBatch(df)

    if (autoCreate && !JdbcUpsertSink.ensured.contains((url, table))) {
      val schema = org.apache.spark.sql.types.StructType(
        df.schema.fields.filter(f => dataCols.contains(f.name)))
      val ddl = dialect.createTableSql(table, schema, keyCols)
      val conn = connect()
      try {
        val st = conn.createStatement()
        // existence probe instead of create-and-swallow: a failing CREATE
        // (permissions, bad DDL) must surface, not masquerade as "exists"
        val exists =
          try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close(); true }
          catch { case _: java.sql.SQLException => false }
        if (!exists) st.execute(ddl)
        st.close()
        JdbcUpsertSink.ensured.add((url, table))
      } finally conn.close()
    }

    val upsertSqlText = dialect.upsertSql(table, dataCols, keyCols)
    val deleteSqlText = dialect.deleteSql(table, keyCols)
    val bindCols = dialect.upsertParams(dataCols, keyCols)
      .map(c => dataCols.indexOf(c))
    val bs = batchSize

    // deletes second so an upsert+delete pair within one batch lands as
    // absent, matching apply-in-order semantics after key-dedup.
    val plan = deduped.select(
      (dataCols.map(col) :+ col(opCol)): _*)

    // Chunked for transient-error replay: each chunk is at most
    // batchSize rows of an already key-deduped micro-batch and commits
    // as its OWN transaction, so the replay buffer is O(batchSize) —
    // never the whole shuffle partition (a large micro-batch partition
    // must stream, not accumulate on the task heap). Upserts/deletes
    // are key-idempotent and the batch is key-deduped, so replaying a
    // rolled-back chunk is exactly-once in effect.
    plan.foreachPartition { (rows: Iterator[Row]) =>
      var conn: Connection = null
      var up: PreparedStatement = null
      var del: PreparedStatement = null
      def open(): Unit = {
        conn = connect()
        conn.setAutoCommit(false)
        up = conn.prepareStatement(upsertSqlText)
        del = conn.prepareStatement(deleteSqlText)
      }
      // roll back BEFORE close: Derby's close() throws "Cannot close a
      // connection while a transaction is still active" on an un-ended
      // transaction, which would REPLACE the real error (it cost a
      // debugging session as a full-suite-only "flake"). Any
      // rollback/close failure rides along as a suppressed exception.
      def shut(failure: Throwable): Unit = {
        def quiet(c: AutoCloseable): Unit =
          if (c != null) {
            try c.close()
            catch { case s: Exception =>
              if (failure != null) failure.addSuppressed(s) else throw s }
          }
        if (conn != null && failure != null) {
          try conn.rollback()
          catch { case s: Exception => failure.addSuppressed(s) }
        }
        quiet(up); quiet(del); quiet(conn)
        up = null; del = null; conn = null
      }
      try {
        rows.grouped(bs).foreach { chunk =>
          var attempt = 0
          var done = false
          while (!done) {
            if (conn == null) open()
            try {
              chunk.foreach { r =>
                val isDelete = r.get(dataCols.length) match {
                  case i: Int => i == graft.cdc.Ops.Delete
                  case s: String => s == "DELETE" || s == "d"
                  case _ => false
                }
                if (isDelete) {
                  keyCols.zipWithIndex.foreach { case (k, i) =>
                    del.setObject(i + 1, r.get(dataCols.indexOf(k)))
                  }
                  del.addBatch()
                } else {
                  bindCols.zipWithIndex.foreach { case (srcIdx, i) =>
                    up.setObject(i + 1, r.get(srcIdx))
                  }
                  up.addBatch()
                }
              }
              up.executeBatch()
              del.executeBatch()
              conn.commit()
              done = true
            } catch {
              case e: Throwable =>
                // close (with rollback) and reconnect on retry — a
                // transient failure may have poisoned the connection
                shut(e)
                val transient = e match {
                  case t: java.sql.SQLException =>
                    t.isInstanceOf[java.sql.SQLTransientException] ||
                      Option(t.getSQLState).exists(_.startsWith("40"))
                  case _ => false
                }
                // deadlock / lock-timeout victims (SQLState class 40,
                // SQLTransientException) are retried in-task with a short
                // backoff — the reference surfaces the SQLException to the
                // Connect framework whose task retry replays the same put
                // (solutions/a2/kafka/sink/JdbcSinkTask.java:175-186);
                // Spark's task-level retry would replay the whole batch
                // tree, so the bounded in-task replay is the Spark-first
                // shape. Non-transient errors propagate unmasked.
                if (transient && attempt < 3) {
                  attempt += 1
                  JdbcUpsertSink.lastRetryCount = attempt
                  Thread.sleep(50L * attempt)
                } else throw e
            }
          }
        }
      } finally {
        // clean path: last chunk committed, nothing to roll back
        shut(null)
      }
    }
  }
}

object JdbcUpsertSink {
  /** (url, table) pairs whose existence has been ensured this JVM — the
    * probe/create runs once per sink target, not once per micro-batch.
    */
  private val ensured =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Highest transient-retry attempt of the most recent retried
    * partition — a local-mode test observability hook (the
    * PartialUpsertSink.lastStatementCacheSize precedent); executors
    * share the JVM there.
    */
  @volatile var lastRetryCount: Int = 0
}
