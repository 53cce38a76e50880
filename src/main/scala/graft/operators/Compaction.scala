package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the other half of table maintenance next to
  * z-order layout ([[ZOrderLayout]]): a CDC-fed table accretes one file
  * per micro-batch per partition, and scan planning cost grows with the
  * FILE count, not the byte count. Compaction rewrites a directory into
  * ~size-targeted files.
  *
  * Scale design: file sizing derives from the INPUT's on-disk footprint
  * (sum of file lengths via the scan's own file index — metadata only,
  * no data pass, no driver collect of rows). The rewrite itself is one
  * `repartition(n)` — a single round-robin shuffle sized so each output
  * file lands near the target; with an optional cluster column it
  * becomes `repartitionByRange` so compaction and layout clustering
  * happen in the same shuffle.
  */
object Compaction {

  /** Swap-journal file name under a bucketed table's location — present
    * only between a crashed swap's renames and its replayed deletes.
    */
  val JournalName = "_graft_compaction_journal"

  /** Delete an OLD (superseded) data file with the boolean VERIFIED —
    * HDFS-style filesystems signal failure by return value, exactly
    * like the renames this module already checks. A false return with
    * the file still present would otherwise leave its (duplicated)
    * rows in the table permanently once the journal is removed, with
    * nothing left to drive a retry; failing loudly keeps the journal,
    * and the next compactBucketed call replays the delete.
    */
  private[operators] def deleteOldVerified(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      journal: org.apache.hadoop.fs.Path): Unit = {
    val ok =
      try fs.delete(p, false)
      catch { case _: java.io.FileNotFoundException => true }
    if (!ok && fs.exists(p))
      throw new java.io.IOException(
        s"compaction swap could not delete superseded file $p " +
          s"(delete returned false); journal kept at $journal — " +
          "re-run compaction to replay the delete, or the table " +
          "serves duplicated rows")
  }

  /** Total on-disk bytes feeding `df` — the scan's own file index when
    * the plan is a V1 file relation (metadata only, exact), otherwise
    * the optimizer's size estimate (DSv2/catalog tables), so a
    * non-file-backed frame never silently sizes to one file.
    */
  def inputBytes(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    // SUM over every file relation — a compaction input is often a
    // union of the base directory plus newly accreted files, and sizing
    // from the first relation alone would double the output file size
    val fileBytes = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation
          if r.relation.isInstanceOf[HadoopFsRelation] =>
        r.relation.asInstanceOf[HadoopFsRelation].location.sizeInBytes
    }
    if (fileBytes.nonEmpty) fileBytes.sum
    else {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (est.isValidLong) est.toLong else Long.MaxValue
    }
  }

  /** Rewrite `src` (a parquet directory) into `dst` with files sized
    * near `targetFileBytes`. Returns the chosen output file count.
    */
  def compact(df: DataFrame, dst: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Option[String] = None): Int = {
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    val bytes = inputBytes(df)
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .min(1 << 20).toInt
    val shaped = clusterBy match {
      case Some(c) => df.repartitionByRange(n, col(c))
      case None => df.repartition(n)
    }
    shaped.write.mode(SaveMode.Overwrite).parquet(dst)
    n
  }

  /** Metadata-only maintenance trigger for [[compactBucketed]]: the
    * average number of data files per bucket (1.0 = fully compacted;
    * each append adds ~1 per touched bucket). A streamed table's
    * ingest loop checks this every batch — one directory listing, no
    * data touched — and compacts past its threshold, e.g.
    * `if (bucketedFileFactor(s, t) >= 8) compactBucketed(s, t)`.
    */
  def bucketedFileFactor(s: SparkSession, tableName: String): Double = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val meta = s.sessionState.catalog
      .getTableMetadata(TableIdentifier(tableName))
    val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
      throw new IllegalArgumentException(s"$tableName is not bucketed"))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
    val n =
      try fs.listStatus(loc).count(f => f.isFile &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      catch { case _: java.io.FileNotFoundException => 0 } // pre-first-append
    n.toDouble / buckets
  }

  /** Bucket-PRESERVING compaction of a catalog-registered bucketed
    * table ([[BucketedLayout]]'s stream-owned facts): rewrites the
    * table's many per-batch files into ONE file per bucket while
    * keeping the bucket ids the scan plans on.
    *
    * [[compact]] cannot maintain a bucketed table — its
    * `repartition(n)` round-robins rows across output files that carry
    * no bucket id, so a bucketed scan over the compacted directory
    * either rejects the files or, re-registered unbucketed, silently
    * loses the exchange-free join the layout exists for. Here the
    * rewrite goes BACK through Spark's bucketed writer: repartition by
    * the bucket expression (repartition and bucketBy share Murmur3
    * hashing, so each task holds exactly one bucket), `bucketBy` into
    * the table's own bucket count at a temp location — the output
    * files carry valid `_000NN` bucket ids — then the data files are
    * swapped under the table's unchanged location and the relation
    * cache refreshed. Registration, location and bucket metadata never
    * change; only the file set does.
    *
    * The swap is move-new-then-delete-old, guarded by a commit-point
    * journal: once the fresh set is fully built, the tmp dir plus the
    * exact NEW and OLD file names publish under the table location,
    * and a crash anywhere after that point rolls FORWARD at the next
    * compactBucketed call (finish the renames from tmp, verify every
    * fresh file in place, finish the deletes) — duplicates exist only
    * until that replay, and no crash window can lose rows (before the
    * journal, only the tmp build is lost). Like [[compact]], this is a
    * single-writer maintenance operation — do not run it concurrently
    * with appends to the same table.
    *
    * The reference needs no analogue because Kafka owns its log
    * segments and compacts them itself (`log.cleaner` on the broker);
    * a lakehouse engine owns its files, so small-file maintenance is
    * this operator's job (SURVEY §2.21 × §2.56).
    *
    * Returns the number of compacted data files (≤ the bucket count;
    * empty buckets write no file).
    */
  def compactBucketed(s: SparkSession, tableName: String): Int = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val meta = s.sessionState.catalog
      .getTableMetadata(TableIdentifier(tableName))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$tableName is not bucketed — use compact() for plain directories"))
    // multi-column bucket specs work too: repartition on the same column
    // list uses the same Murmur3 hash over the same tuple as bucketBy,
    // so task-per-bucket alignment holds exactly as in the 1-column case
    val keys = spec.bucketColumnNames
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
    def dataFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).toSeq.filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
    // a journal left by a crashed prior swap is a COMMITTED swap whose
    // file moves did not finish: the fresh compacted set was fully
    // written and validated (the journal publishes only after the
    // build), so recovery rolls FORWARD — complete any renames still
    // sitting in the recorded tmp dir, verify every fresh file is in
    // place, then finish deleting the exact superseded old set. Run
    // BEFORE this round snapshots the table: replaying leftover old
    // files as data would compact their (duplicated) rows in
    // permanently, and replaying before the fresh set is in place
    // would delete the only copy.
    val journal = new org.apache.hadoop.fs.Path(loc, JournalName)
    if (fs.exists(journal)) {
      val in = fs.open(journal)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      val jTmp = new org.apache.hadoop.fs.Path(
        lines.headOption.getOrElse(throw new java.io.IOException(
          s"empty swap journal $journal")))
      val oldNames = lines.collect { case l if l.startsWith("OLD ") =>
        l.substring(4) }
      val newNames = lines.collect { case l if l.startsWith("NEW ") =>
        l.substring(4) }
      newNames.foreach { name =>
        val src = new org.apache.hadoop.fs.Path(jTmp, name)
        val dst = new org.apache.hadoop.fs.Path(loc, name)
        if (fs.exists(src) && !fs.rename(src, dst))
          throw new java.io.IOException(
            s"swap recovery failed renaming $src -> $dst")
      }
      val missing = newNames.filterNot(n =>
        fs.exists(new org.apache.hadoop.fs.Path(loc, n)))
      if (missing.nonEmpty) throw new java.io.IOException(
        s"swap journal $journal lists fresh files present neither in " +
          s"$jTmp nor $loc: ${missing.mkString(", ")} — refusing to " +
          "delete the old set")
      oldNames.foreach { name =>
        deleteOldVerified(fs, new org.apache.hadoop.fs.Path(loc, name),
          journal)
      }
      // tmp BEFORE journal: the journal is the only pointer to tmp, so
      // deleting it first would strand the dir forever on a crash
      // between the two deletes (tmp holds no data files by this point)
      fs.delete(jTmp, true)
      fs.delete(journal, false)
      s.catalog.refreshTable(tableName)
    }
    // snapshot BEFORE the rewrite reads the table: files appended after
    // this point survive the swap untouched (they are simply not
    // compacted this round)
    val old = dataFiles(loc)
    val tmp = new org.apache.hadoop.fs.Path(
      loc.getParent, loc.getName + graft.Tables.tmpSuffix())
    val bld = tableName + "_cpt_bld"
    s.sql(s"DROP TABLE IF EXISTS $bld")
    try {
      // write through a pre-created bucketed table + insertInto — the
      // same path [[BucketedLayout.appendBatch]] uses, whose writer
      // tasks provably align one-task-one-bucket. The CTAS route
      // (bucketBy().saveAsTable) is NOT equivalent: AQE rewrites the
      // repartition's shuffle read into mapper-local reads (no
      // downstream distribution requirement on a CTAS root), so each
      // writer task receives mixed buckets and emits one small file
      // per (task, bucket) — re-fragmenting the very layout this
      // rewrite exists to heal (measured: 191 files in → 153 out).
      // preserve the FULL sort spec: the table's metadata keeps
      // claiming it after the swap, and Spark elides downstream Sort
      // nodes off that claim exactly when each bucket holds one file —
      // the post-compaction state — so writing unsorted files under a
      // SORTED BY table would produce wrong query results, not just
      // slow ones
      val sorted =
        if (spec.sortColumnNames.isEmpty) ""
        else s"SORTED BY (${spec.sortColumnNames.mkString(", ")}) "
      s.sql(
        s"""CREATE TABLE $bld (${s.table(tableName).schema.toDDL})
           |USING parquet CLUSTERED BY (${keys.mkString(", ")}) ${sorted}INTO
           |${spec.numBuckets} BUCKETS LOCATION '$tmp'""".stripMargin)
      // read the files as PLAIN parquet, not through the bucketed
      // table: the bucketed scan reports HashPartitioning(key, n), the
      // optimizer then drops the repartition as redundant, and
      // DisableUnnecessaryBucketedScan (no downstream distribution
      // requirement on a write) falls back to a plain multi-file scan —
      // leaving the writer tasks with mixed buckets again. A raw scan
      // has UnknownPartitioning, so the repartition genuinely shuffles
      // — the exact appendBatch shape whose tasks align one-per-bucket.
      // read exactly the SNAPSHOT file list, not the live directory:
      // a file appended between the snapshot and a directory-listing
      // read would be compacted IN while surviving the delete — every
      // one of its rows duplicated. Pinning the inputs to `old` makes
      // the snapshot comment's guarantee real.
      BucketedLayout.withBucketAlignedWrite(s) {
        s.read.schema(s.table(tableName).schema)
          .parquet(old.map(_.getPath.toString): _*)
          .repartition(spec.numBuckets, keys.map(col): _*)
          .write.mode(SaveMode.Append).insertInto(bld)
      }
    } finally s.sql(s"DROP TABLE IF EXISTS $bld") // external: files stay
    val fresh = dataFiles(tmp)
    // journal = the swap's COMMIT POINT, published after the fresh set
    // is fully built and before the first rename: line 1 the tmp dir,
    // then the exact NEW (fresh) and OLD (superseded) file names. A
    // crash anywhere after this point recovers FORWARD at the next
    // compactBucketed (finish renames from tmp, then finish the
    // deletes); a crash before it loses only the tmp build. Without
    // the NEW set a recovery could not tell a half-renamed swap from a
    // half-deleted one — and deleting OLD before the fresh set is
    // verified in place would drop the only copy. The `_`-prefixed
    // name is invisible to Spark's file index and dataFiles(), so the
    // journal never scans as data; create-then-rename so a torn write
    // can't half-commit.
    val journalTmp = new org.apache.hadoop.fs.Path(loc, JournalName + ".tmp")
    val out = fs.create(journalTmp, true)
    try out.write((tmp.toString +: (
        fresh.map("NEW " + _.getPath.getName) ++
        old.map("OLD " + _.getPath.getName)))
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(journalTmp, journal))
      throw new java.io.IOException(s"could not publish swap journal $journal")
    // move-new-then-delete-old: UUID-named files cannot collide with
    // the old set, and the failure mode is duplicates until the journal
    // replays, never loss — but ONLY if every rename is verified:
    // rename() signals failure by RETURN VALUE, and deleting the old
    // files after a silent false would drop that bucket's rows entirely
    fresh.foreach { f =>
      val target = new org.apache.hadoop.fs.Path(loc, f.getPath.getName)
      if (!fs.rename(f.getPath, target))
        throw new java.io.IOException(
          s"compaction swap failed renaming ${f.getPath} -> $target; " +
            s"journal at $journal (re-run compaction to roll forward)")
    }
    old.foreach(f => deleteOldVerified(fs, f.getPath, journal))
    // tmp before journal — same stranding argument as the recovery path
    fs.delete(tmp, true)
    fs.delete(journal, false)
    // drop the cached file listing or the next scan unions old+new
    s.catalog.refreshTable(tableName)
    fresh.size
  }
}
