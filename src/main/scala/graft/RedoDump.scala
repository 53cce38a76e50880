package graft

import java.io.File

import graft.cdc.{Ops, RedoRecord}
import graft.redo.{RedoLogReader, RedoLogWriter}

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
  *   RedoDump <file.grl | dir> [--xid X] [--scn lo:hi]
  *            [--extract out.grl] [--counts]
  *
  *  - no flags: header + one line per record
  *  - --xid / --scn: filter records (both may combine)
  *  - --extract: write the filtered records as a standalone GRL log
  *    (sequence/thread inherited from the source header) instead of
  *    printing them — the incident-file roundtrip
  *  - --counts: per-(table, op) record counts instead of per-record
  *    lines (the first thing support looks at on a multi-GiB segment)
  */
object RedoDump {

  private case class Args(path: String, xid: Option[String],
      scn: Option[(Long, Long)], extract: Option[String], counts: Boolean)

  private def parse(argv: Array[String]): Args = {
    require(argv.nonEmpty,
      "usage: RedoDump <file.grl|dir> [--xid X] [--scn lo:hi] " +
        "[--extract out.grl] [--counts]")
    var a = Args(argv(0), None, None, None, counts = false)
    var i = 1
    while (i < argv.length) {
      argv(i) match {
        case "--xid" => a = a.copy(xid = Some(argv(i + 1))); i += 2
        case "--scn" =>
          val Array(lo, hi) = argv(i + 1).split(":", 2)
          a = a.copy(scn = Some((lo.toLong, hi.toLong))); i += 2
        case "--extract" => a = a.copy(extract = Some(argv(i + 1))); i += 2
        case "--counts" => a = a.copy(counts = true); i += 1
        case other =>
          throw new IllegalArgumentException(s"unknown flag $other")
      }
    }
    a
  }

  private def keep(a: Args)(r: RedoRecord): Boolean =
    a.xid.forall(_ == r.xid) &&
      a.scn.forall { case (lo, hi) => r.scn >= lo && r.scn <= hi }

  /** The files to dump: one .grl, or every .grl in a directory in
    * (thread, seq) order.
    */
  private def logFiles(path: String): Seq[File] = {
    val f = new File(path)
    if (f.isFile) Seq(f)
    else RedoLogReader.listLogs(f).map(_._1)
  }

  private def fmt(r: RedoRecord): String =
    f"scn=${r.scn}%-8d ssn=${r.ssn}%-3d xid=${r.xid}%-12s " +
      f"op=${Ops.name(r.op)}%-12s table=${r.table}%-16s rowId=${r.rowId}" +
      (if (r.rollback) " ROLLBACK-ENTRY" else "")

  /** Library surface (the CLI body, println-free for specs): returns
    * the filtered records after optionally extracting them.
    */
  private[graft] def run(a: Args): Seq[RedoRecord] = {
    val files = logFiles(a.path)
    val records = files.flatMap(f => RedoLogReader.records(f))
      .filter(keep(a))
    a.extract.foreach { out =>
      val hdr = RedoLogReader.readHeader(files.head)
      val w = new RedoLogWriter(new File(out), hdr.blockSize,
        seq = hdr.seq, thread = hdr.thread)
      records.foreach(w.append)
      w.close()
    }
    records
  }

  private[graft] def run(argv: Array[String]): Seq[RedoRecord] =
    run(parse(argv))

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    logFiles(a.path).foreach { f =>
      val h = RedoLogReader.readHeader(f)
      println(s"${f.getPath}: blockSize=${h.blockSize} seq=${h.seq} " +
        s"thread=${h.thread} firstScn=${h.firstScn} nextScn=${h.nextScn}")
    }
    val records = run(a)
    if (a.counts) {
      records.groupBy(r => (r.table, Ops.name(r.op)))
        .toSeq.sortBy { case ((t, o), _) => (t, o) }
        .foreach { case ((t, o), rs) =>
          println(f"$t%-20s $o%-12s ${rs.size}%8d")
        }
    } else if (a.extract.isEmpty) {
      records.foreach(r => println(fmt(r)))
    } else {
      println(s"extracted ${records.size} records to ${a.extract.get}")
    }
  }
}
