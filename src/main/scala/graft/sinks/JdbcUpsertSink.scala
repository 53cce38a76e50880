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

  /** Order columns resolved against this batch's frame — matched
    * case- and underscore-insensitively, because the engine's own
    * envelopes rename them (wrapped emits `commit_scn` for commitScn):
    * a literal-name filter silently degraded such a stream to
    * scn-only ordering, the exact wrong-batch-winner hazard the
    * orderCols doc warns about. Columns genuinely absent (e.g. ssn on
    * a reduced envelope) still degrade gracefully.
    */
  private def presentOrderCols(df: DataFrame): Seq[String] = {
    def canon(c: String) = c.replace("_", "").toLowerCase
    orderCols.flatMap(oc => df.columns.find(c => canon(c) == canon(oc)))
  }

  /** The sink's effective key columns: `keyCols` when supplied; when a
    * record stream arrives KEYLESS, discovered from the TARGET
    * database's catalog like the reference sink
    * (`solutions/a2/kafka/sink/JdbcSinkTableBase.java:200` →
    * `PgRdbmsInfo.getPkColumnsFromDict`, `PgRdbmsInfo.java:58-158`):
    * the declared PRIMARY KEY first, else the first UNIQUE index
    * whose columns are all NOT NULL (the reference's well-defined-key
    * fallback), both via the portable `DatabaseMetaData` surface.
    * Discovered names map back to the stream's columns
    * case-insensitively (catalogs typically store identifiers
    * upper-cased; the stream schema is the writer's casing).
    * Cached per (url, table) — one catalog probe per sink target,
    * not per micro-batch.
    */
  private def resolvedKeyCols(frameCols: Seq[String]): Seq[String] = {
    if (keyCols.nonEmpty) return keyCols
    // NEVER cache an empty discovery: the target may gain its PK after
    // the stream starts (table created late, constraint added by the
    // DBA) — a poisoned empty cache would require a JVM restart to
    // recover; re-probing until the key appears costs one catalog read
    // per failing batch, which is already the failure path
    val cached = JdbcUpsertSink.discoveredKeys.get((url, table))
    val discovered =
      if (cached != null) cached
      else {
        val conn = connect()
        val found =
          try JdbcUpsertSink.discoverKeyCols(conn, table)
          finally conn.close()
        if (found.nonEmpty)
          JdbcUpsertSink.discoveredKeys.putIfAbsent((url, table), found)
        found
      }
    require(discovered.nonEmpty,
      s"sink target $table declares no primary key and no non-null " +
        "unique index, and the stream supplied no keyCols")
    discovered.map { k =>
      frameCols.find(_.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(
          s"target $table key column $k is absent from the stream " +
            s"schema (${frameCols.mkString(",")})"))
    }
  }

  /** Dedup within batch: latest change per key wins (K2 barrier). */
  def dedupBatch(df: DataFrame): DataFrame =
    dedupBatch(df, resolvedKeyCols(df.columns.toSeq))

  private def dedupBatch(df: DataFrame, keys: Seq[String]): DataFrame = {
    val present = presentOrderCols(df)
    require(present.nonEmpty,
      s"dedupBatch needs at least one ordering column of ${orderCols.mkString(",")} " +
        s"in the batch frame (got columns: ${df.columns.mkString(",")})")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(present.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // A FAILED batch drops the target's cached catalog metadata
  // (discovered keys, known columns, ensured-existence) before the
  // error propagates: a mid-stream key redefinition or table
  // recreation otherwise keeps the sink binding the STALE key for the
  // JVM's lifetime — the foreachBatch retry re-probes instead. Wraps
  // the WHOLE batch path: the stale key can already fail at key
  // resolution (key column absent from the frame), not only in SQL.
  private def invalidateOnFailure[A](body: => A): A =
    try body catch { case e: Throwable =>
      JdbcUpsertSink.discoveredKeys.remove((url, table))
      JdbcUpsertSink.knownCols.remove((url, table))
      JdbcUpsertSink.ensured.remove((url, table))
      throw e
    }

  def writeBatch(df: DataFrame): Unit = invalidateOnFailure {
    val keys = resolvedKeyCols(df.columns.toSeq)
    val dataCols = df.columns.filterNot(c =>
      c == opCol || orderCols.contains(c)).toSeq
    val deduped = dedupBatch(df, keys)

    if (autoCreate && !JdbcUpsertSink.ensured.contains((url, table))) {
      val schema = org.apache.spark.sql.types.StructType(
        df.schema.fields.filter(f => dataCols.contains(f.name)))
      val ddl = dialect.createTableSql(table, schema, keys)
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

    if (autoCreate) {
      // K3 sink schema evolution (reference: new record field → ALTER
      // TABLE ADD on the target, `JdbcSinkTableBase`/`TargetDbSqlUtils`
      // alter path): columns the stream carries but the target lacks
      // are added before the batch binds. Columns land nullable —
      // pre-evolution rows have no value for them, and no addColumnSql
      // dialect emits a constraint (a NOT NULL add on a non-empty
      // table fails everywhere).
      val needed = df.schema.fields.filter(f => dataCols.contains(f.name))
      val known = JdbcUpsertSink.knownCols.get((url, table))
      if (known == null ||
          needed.exists(f => !known.contains(f.name.toLowerCase))) {
        val conn = connect()
        try {
          val current = JdbcUpsertSink.targetColumns(conn, table)
          // an EMPTY probe for a table we can otherwise reach means the
          // catalog read failed (quoted mixed-case name outside the
          // probe ladder, permissions) — treat as UNKNOWN and skip
          // evolution rather than trying to ADD every column (which
          // would fail on the first one that already exists); the
          // binds below behave exactly as before this feature existed
          if (current.nonEmpty) {
            val missing = needed.filterNot(f =>
              current.contains(f.name.toLowerCase))
            if (missing.nonEmpty) {
              val st = conn.createStatement()
              try missing.foreach { f =>
                try st.execute(dialect.addColumnSql(table, f))
                catch { case e: java.sql.SQLException =>
                  // a concurrent writer may have added it between the
                  // probe and the ALTER (two sinks racing one widened
                  // stream) — duplicate-column is success, anything
                  // else surfaces
                  if (!JdbcUpsertSink.targetColumns(conn, table)
                        .contains(f.name.toLowerCase)) throw e
                }
              } finally st.close()
            }
            JdbcUpsertSink.knownCols.put((url, table),
              current ++ missing.map(_.name.toLowerCase))
          }
        } finally conn.close()
      }
    }

    val upsertSqlText = dialect.upsertSql(table, dataCols, keys)
    val deleteSqlText = dialect.deleteSql(table, keys)
    val bindCols = dialect.upsertParams(dataCols, keys)
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
            // batch-constant key positions — indexOf per key per row
            // was O(rows × keys × cols) string scans in the hot loop
            val keyIdx = keys.map(dataCols.indexOf)
            try {
              chunk.foreach { r =>
                val isDelete = r.get(dataCols.length) match {
                  case i: Int => i == graft.cdc.Ops.Delete
                  case s: String => s == "DELETE" || s == "d"
                  case _ => false
                }
                if (isDelete) {
                  keyIdx.zipWithIndex.foreach { case (srcIdx, i) =>
                    del.setObject(i + 1, r.get(srcIdx))
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

  /** Discovered target-key cache: (url, table) → key columns in
    * KEY_SEQ order. Populated once per sink target by
    * [[discoverKeyCols]].
    */
  private val discoveredKeys = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Seq[String]]()

  /** Known target columns per (url, table), lower-cased — the schema-
    * evolution fast path: a batch whose columns are all known skips the
    * catalog probe entirely; a new column (post-DDL stream) triggers
    * one probe + the missing ALTERs.
    */
  private val knownCols = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Set[String]]()

  /** Identifier-form probe shared by the catalog readers: unquoted
    * identifiers are stored upper-cased by Derby/Oracle/DB2 and
    * lower-cased by PostgreSQL, so a (schema, table) read is tried
    * as-written, then upper-, then lower-cased; first non-empty result
    * wins. (Three-part catalog.schema.table names are not parsed —
    * they fall through as one opaque name; none of the supported
    * dialects need them for the sink surface.)
    */
  private def probeForms[A](table: String)(
      read: (String, String) => A)(nonEmpty: A => Boolean, empty: A): A = {
    val (schema0, name0) = table.split('.') match {
      case Array(s, n) => (Option(s), n)
      case _ => (None, table)
    }
    Seq(identity[String] _, (s: String) => s.toUpperCase,
        (s: String) => s.toLowerCase)
      .iterator.map(f => read(schema0.map(f).orNull, f(name0)))
      .find(nonEmpty).getOrElse(empty)
  }

  /** getColumns' schema/table arguments are LIKE patterns (unlike the
    * exact-name getPrimaryKeys/getIndexInfo): an unescaped `_` in a
    * table name like G_T matches G0T/GXT too, polluting the result
    * with another table's columns. Escape the metacharacters with the
    * driver's declared escape string.
    */
  private def likeEscape(conn: Connection, s: String): String = {
    val esc = conn.getMetaData.getSearchStringEscape
    if (esc == null || esc.isEmpty) s
    else s.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
  }

  /** The schema to probe: the parsed schema part if the sink was
    * configured with one, else the CONNECTION's current schema — a
    * null schema criterion means "any schema" and would match a
    * same-named table elsewhere. Unescaped (for the exact-name
    * getPrimaryKeys/getIndexInfo APIs); getColumns callers wrap it in
    * [[likeEscape]].
    */
  private def schemaOrCurrent(conn: Connection, schema: String): String =
    if (schema != null) schema
    else try conn.getSchema catch { case _: Exception => null }

  /** [[schemaOrCurrent]] escaped for the LIKE-pattern APIs. */
  private def schemaPattern(conn: Connection, schema: String): String = {
    val s = schemaOrCurrent(conn, schema)
    if (s == null) null else likeEscape(conn, s)
  }

  /** The target table's column names from the catalog, lower-cased. */
  private[sinks] def targetColumns(conn: Connection,
      table: String): Set[String] =
    probeForms(table) { (schema, name) =>
      val rs = conn.getMetaData.getColumns(null,
        schemaPattern(conn, schema), likeEscape(conn, name), null)
      val buf = Set.newBuilder[String]
      try while (rs.next()) buf += rs.getString("COLUMN_NAME").toLowerCase
      finally rs.close()
      buf.result()
    }(_.nonEmpty, Set.empty)

  /** Read the target table's key from the database catalog: the
    * declared PRIMARY KEY (ordered by KEY_SEQ), else the first UNIQUE
    * index all of whose columns are NOT NULL — the reference's
    * well-defined-key ladder (`PgRdbmsInfo.java:58-158`) on the
    * portable `DatabaseMetaData` surface. `table` may be
    * schema-qualified; unquoted identifiers are probed as-written
    * first, then upper-cased (how Derby/Oracle/DB2 store them), then
    * lower-cased (PostgreSQL).
    */
  private[sinks] def discoverKeyCols(conn: Connection,
      table: String): Seq[String] = {
    val md = conn.getMetaData
    probeForms(table) { (schema, name) =>
      val pk = {
        val rs = md.getPrimaryKeys(null, schemaOrCurrent(conn, schema), name)
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
        try while (rs.next())
          buf += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
        finally rs.close()
        buf.sortBy(_._1).map(_._2).toSeq
      }
      if (pk.nonEmpty) pk
      else {
        // nullability per column, for the well-defined (NOT NULL) test
        // (getColumns takes LIKE patterns — escape, see likeEscape)
        val nullable = {
          val rs = md.getColumns(null,
            schemaPattern(conn, schema), likeEscape(conn, name), null)
          val m = scala.collection.mutable.Map.empty[String, Boolean]
          try while (rs.next())
            m(rs.getString("COLUMN_NAME")) =
              rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls
          finally rs.close()
          m
        }
        val uniq = {
          val rs = md.getIndexInfo(null, schemaOrCurrent(conn, schema),
            name, true, false)
          val m = scala.collection.mutable.LinkedHashMap
            .empty[String, scala.collection.mutable.ArrayBuffer[(Short, String)]]
          try while (rs.next()) {
            val idx = rs.getString("INDEX_NAME")
            val c = rs.getString("COLUMN_NAME")
            if (idx != null && c != null)
              m.getOrElseUpdate(idx,
                scala.collection.mutable.ArrayBuffer.empty) +=
                ((rs.getShort("ORDINAL_POSITION"), c))
          } finally rs.close()
          m
        }
        uniq.values
          .map(cols => cols.sortBy(_._1).map(_._2).toSeq)
          .find(cols => cols.nonEmpty &&
            cols.forall(c => !nullable.getOrElse(c, true)))
          .getOrElse(Seq.empty)
      }
    }(_.nonEmpty, Seq.empty)
  }
}
