package graft

import java.io.File

import graft.cdc.{Ops, RedoRecord}
import graft.redo.{RedoLogReader, RedoLogWriter, RedoStorageProvider}

/** Redo-log diagnostic CLI — the analogue of the reference's
  * `OraRedoLogFile` dump/extract tool (`utils/file/OraRedoLogFile.java`:
  * header print, record listing, SCN/XID filtering) and its
  * incident/test-case machinery (`OraCdcIncidentWriter/-Reader`: the
  * `-t` flag extracts ONE transaction's records into a standalone
  * binary file a support engineer can replay). The Spark-side use is
  * identical: when a transaction misbehaves in the pipeline, extract
  * it from the archived GRL segment as a SELF-CONTAINED mini-log
  * (readable by every graft consumer — the DSv2 source, the assembler,
  * this tool) and attach it to the incident.
  *
  * Usage:
  *   RedoDump <file.grl | dir | url> [--xid X] [--scn lo:hi]
  *            [--extract out.grl] [--counts]
  *
  * The source may be REMOTE — any transport `RedoStorageProvider.forPath`
  * dispatches (`http(s)://`, `graft-ship://`): support can dump or
  * extract an incident straight off the standby's archive endpoint
  * without first shipping multi-GiB segments (a remote path ending in
  * `.grl` is a single log; anything else lists as a directory).
  *
  *  - no flags: header + one line per record
  *  - --xid / --scn: filter records (both may combine)
  *  - --extract: write the filtered records as a standalone GRL log
  *    (sequence/thread inherited from the source header) instead of
  *    printing them — the incident-file roundtrip. The target must
  *    live OUTSIDE the dumped directory: it inherits the source's
  *    sequence number, and a duplicate (thread, seq) in a watched log
  *    directory would break the per-thread continuity check for every
  *    consumer listing it.
  *  - --counts: per-(table, op) record counts instead of per-record
  *    lines (the first thing support looks at on a multi-GiB segment)
  *
  * The read side streams: records are consumed one segment at a time
  * through the reader's iterator — no mode materializes a segment's
  * (let alone a directory's) parsed records in memory. The one
  * write-side bound: --extract buffers the serialized OUTPUT until
  * close (see [[extractTo]]) — incident-sized by design.
  */
object RedoDump {

  private val Usage =
    "usage: RedoDump <file.grl|dir> [--xid X] [--scn lo:hi] " +
      "[--extract out.grl] [--counts]"

  private[graft] case class Args(path: String, xid: Option[String],
      scn: Option[(Long, Long)], extract: Option[String], counts: Boolean)

  private[graft] def parse(argv: Array[String]): Args = {
    require(argv.nonEmpty, Usage)
    var a = Args(argv(0), None, None, None, counts = false)
    var i = 1
    def value(flag: String): String = {
      require(i + 1 < argv.length, s"$flag needs a value\n$Usage")
      argv(i + 1)
    }
    while (i < argv.length) {
      argv(i) match {
        case "--xid" => a = a.copy(xid = Some(value("--xid"))); i += 2
        case "--scn" =>
          val v = value("--scn")
          val parts = v.split(":", 2)
          // toLongOption (not isDigit+toLong): an all-digit string past
          // Long.MaxValue would pass the digit check and then throw a
          // raw NumberFormatException instead of this usage error
          val bounds = if (parts.length == 2)
            (parts(0).toLongOption, parts(1).toLongOption) else (None, None)
          require(bounds._1.isDefined && bounds._2.isDefined,
            s"--scn expects lo:hi (two longs), got '$v'\n$Usage")
          require(bounds._1.get <= bounds._2.get,
            s"--scn range is empty: ${bounds._1.get} > ${bounds._2.get}\n$Usage")
          a = a.copy(scn = Some((bounds._1.get, bounds._2.get))); i += 2
        case "--extract" => a = a.copy(extract = Some(value("--extract"))); i += 2
        case "--counts" => a = a.copy(counts = true); i += 1
        case other =>
          throw new IllegalArgumentException(s"unknown flag $other\n$Usage")
      }
    }
    a
  }

  private def keep(a: Args)(r: RedoRecord): Boolean =
    a.xid.forall(_ == r.xid) &&
      a.scn.forall { case (lo, hi) => r.scn >= lo && r.scn <= hi }

  /** The logs to dump as provider paths: one .grl, or every .grl in a
    * directory in (thread, seq) order. Local paths probe the
    * filesystem; remote URLs are a single log iff they end in `.grl`.
    */
  private[graft] def logPaths(path: String): Seq[String] =
    logMeta(path).map(_._1)

  /** The logs WITH their headers — listLogs already fetched every
    * header to sort and gap-check, so the banner and the extract reuse
    * them instead of re-opening each remote segment (the tool's primary
    * use is a remote archive, where a header read is a round trip).
    */
  private[graft] def logMeta(path: String)
      : Seq[(String, RedoLogReader.FileHeader)] = {
    val provider = RedoStorageProvider.forPath(path)
    val local = provider eq graft.redo.LocalRedoProvider
    val single =
      if (local) new File(path).isFile
      else path.endsWith(".grl")
    val metas =
      if (single) Seq(path -> header(path))
      else RedoLogReader.listLogs(provider,
        if (local) new File(path).getAbsolutePath else path)
    require(metas.nonEmpty, s"no .grl logs under $path")
    metas
  }

  private def header(path: String): RedoLogReader.FileHeader = {
    val src = RedoStorageProvider.forPath(path).open(path)
    try RedoLogReader.readHeader(src, path) finally src.close()
  }

  private def fmt(r: RedoRecord): String =
    f"scn=${r.scn}%-8d ssn=${r.ssn}%-3d xid=${r.xid}%-12s " +
      f"op=${Ops.name(r.op)}%-12s table=${r.table}%-16s rowId=${r.rowId}" +
      (if (r.rollback) " ROLLBACK-ENTRY" else "")

  /** Lazy filtered record stream over already-listed logs (one
    * listing serves the banner, the stream and the extract). Each
    * log's byte source drains before the next opens (recordsFrom
    * consumes the bounded segment eagerly and closes).
    */
  private def stream(a: Args, paths: Seq[String]): Iterator[RedoRecord] =
    paths.iterator.flatMap { p =>
      val src = RedoStorageProvider.forPath(p).open(p)
      try RedoLogReader.recordsFrom(src, p, 1, 0) finally src.close()
    }.filter(keep(a))

  /** Library surface for filters (specs; eager — spec-sized inputs). */
  private[graft] def run(argv: Array[String]): Seq[RedoRecord] = {
    val a = parse(argv)
    stream(a, logPaths(a.path)).toSeq
  }

  /** Extract the filtered records into a standalone incident log;
    * returns the record count. The READ side streams (one segment at a
    * time), but [[RedoLogWriter]] buffers the serialized OUTPUT until
    * close (the header and block layout finalize there), so driver
    * memory is ~1x the EXTRACTED bytes — incident-sized by design (one
    * transaction / a narrow SCN window), not archive-sized. A loose
    * filter over a multi-GiB archive is the caller's foot-gun; the
    * writer warns once past [[ExtractWarnBytes]].
    */
  private[graft] def extractTo(a: Args, metas: Seq[(String,
      RedoLogReader.FileHeader)], out: String): Long = {
    val paths = metas.map(_._1)
    val outFile = new File(out).getCanonicalFile
    // the collision guard applies to LOCAL sources (remote namespaces
    // cannot collide with a local extract target)
    paths.filter(p => RedoStorageProvider.forPath(p) eq
        graft.redo.LocalRedoProvider).foreach { p =>
      require(new File(p).getCanonicalFile.getParentFile != outFile.getParentFile,
        s"extract target $out must live OUTSIDE the dumped log " +
          "directory: it inherits the source's sequence number, and a " +
          "duplicate (thread, seq) would break the directory's " +
          "continuity check for every consumer")
    }
    val hdr = metas.head._2
    val w = new RedoLogWriter(outFile, hdr.blockSize,
      seq = hdr.seq, thread = hdr.thread)
    var n = 0L
    var warned = false
    stream(a, paths).foreach { r =>
      w.append(r); n += 1
      if (!warned && w.bufferedBytes > ExtractWarnBytes) {
        warned = true
        System.err.println(s"[redodump] extract has buffered " +
          s"${w.bufferedBytes >> 20} MiB — an incident extract should be " +
          "one transaction or a narrow --scn window; tighten the filter " +
          "if this is unintentional")
      }
    }
    w.close()
    n
  }

  /** Extract-size advisory threshold (see [[extractTo]]). */
  private val ExtractWarnBytes = 256L << 20

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val metas = logMeta(a.path)
    val files = metas.map(_._1)
    metas.foreach { case (f, h) =>
      println(s"$f: blockSize=${h.blockSize} seq=${h.seq} " +
        s"thread=${h.thread} firstScn=${h.firstScn} nextScn=${h.nextScn}")
    }
    a.extract match {
      case Some(out) =>
        val n = extractTo(a, metas, out)
        println(s"extracted $n records to $out")
      case None if a.counts =>
        // incremental fold — constant memory over any segment count
        val counts = collection.mutable.Map.empty[(String, String), Long]
        stream(a, files).foreach { r =>
          val k = (r.table, Ops.name(r.op))
          counts(k) = counts.getOrElse(k, 0L) + 1
        }
        counts.toSeq.sortBy(_._1).foreach { case ((t, o), n) =>
          println(f"$t%-20s $o%-12s $n%8d")
        }
      case None =>
        stream(a, files).foreach(r => println(fmt(r)))
    }
  }
}
