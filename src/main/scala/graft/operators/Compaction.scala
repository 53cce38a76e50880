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
    * The swap is move-new-then-delete-old, guarded by a journal: the
    * exact old-file list is published under the table location before
    * the first rename, so a crash mid-swap leaves duplicates only until
    * the NEXT compactBucketed call, which replays the journal's deletes
    * before snapshotting (never treating superseded files as data) —
    * and never data loss at any point. Like [[compact]], this is a
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
    // a journal left by a crashed prior swap means some old files were
    // superseded but not yet deleted — their rows exist twice (once in
    // a compacted file that was renamed in, once in themselves). Finish
    // that delete FIRST, off the journal's exact list, so the table is
    // row-consistent before this round snapshots it; treating leftover
    // old files as data would compact the duplicates in permanently.
    val journal = new org.apache.hadoop.fs.Path(loc, JournalName)
    if (fs.exists(journal)) {
      val in = fs.open(journal)
      val listed =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      listed.filter(_.nonEmpty).foreach { name =>
        fs.delete(new org.apache.hadoop.fs.Path(loc, name), false)
      }
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
    // journal the exact old-file set BEFORE the first rename: a crash
    // after some renames but before the deletes below leaves those rows
    // duplicated, and without the journal a re-run would read the
    // leftovers as data and compact the duplicates in permanently. The
    // `_`-prefixed name is invisible to both Spark's file index and
    // dataFiles(), so the journal itself never scans as data. Written
    // via create-then-rename so a torn write can't half-delete.
    val journalTmp = new org.apache.hadoop.fs.Path(loc, JournalName + ".tmp")
    val out = fs.create(journalTmp, true)
    try out.write(old.map(_.getPath.getName).mkString("\n").getBytes("UTF-8"))
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
            s"old files left in place; journal at $journal")
    }
    old.foreach(f => fs.delete(f.getPath, false))
    fs.delete(journal, false)
    fs.delete(tmp, true)
    // drop the cached file listing or the next scan unions old+new
    s.catalog.refreshTable(tableName)
    fresh.size
  }
}
