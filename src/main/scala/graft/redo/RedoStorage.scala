package graft.redo

import java.io.{File, IOException, RandomAccessFile}

/** Storage abstraction for redo log bytes (S6).
  *
  * The reference reads redo remotely through a family of byte-stream
  * readers behind one small interface — `internals/OraCdcRedoReader
  * .java:30` (read/skip/close/blockSize) with per-transport factories
  * for local file, ASM, BFILE, SSH and SMB
  * (`OraCdcRedoFileReader.java`, `OraCdcRedoAsmReader.java`,
  * `OraCdcRedoLogSshjFactory.java`, `OraCdcRedoLogSmbjFactory.java`).
  * GRL1 re-expresses that as a positional byte source: every access the
  * parser needs is "read N bytes at offset P", which maps directly onto
  * local files, HTTP range requests, SMB/SSH seek+read, and ASM extent
  * reads alike. Executors open their own source per partition — no
  * driver-side state, so a 1000-executor scan fans out across the
  * remote transport the same way it does across local disks.
  */
trait RedoByteSource extends java.io.Closeable {
  def length: Long
  /** Fill `buf[off, off+len)` from absolute position `pos`; throws on
    * short reads — redo blocks are fixed-size, a partial block is
    * corruption, not EOF.
    */
  def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit
  final def readFully(pos: Long, buf: Array[Byte]): Unit =
    readFully(pos, buf, 0, buf.length)
}

/** Opens redo logs by name and lists a log directory — the factory
  * side of the reference's per-transport `OraCdcRedoLog*Factory`.
  */
trait RedoStorageProvider {
  def open(path: String): RedoByteSource
  /** File names (not paths) of redo logs under `dir`. */
  def list(dir: String): Seq[String]
}

/** Local-filesystem provider (the reference's `OraCdcRedoFileReader`). */
object LocalRedoProvider extends RedoStorageProvider {
  override def open(path: String): RedoByteSource = new RedoByteSource {
    private val raf = new RandomAccessFile(path, "r")
    override def length: Long = raf.length()
    override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit = {
      raf.seek(pos)
      raf.readFully(buf, off, len)
    }
    override def close(): Unit = raf.close()
  }
  override def list(dir: String): Seq[String] = {
    // listFiles() returns null for a missing/unreadable path — that is
    // an ERROR, not an empty archive: mapping it to Nil turns a typo'd
    // directory into a silent "no changes" answer
    val files = new File(dir).listFiles()
    if (files == null)
      throw new IOException(
        s"cannot list redo directory $dir (missing, not a directory, " +
          "or unreadable)")
    files.filter(f => f.isFile && f.getName.endsWith(".grl"))
      .map(_.getName).toSeq.sorted
  }
}

/** In-memory provider — the test double for transports whose bytes
  * arrive from elsewhere (ASM extents, SSH/SMB fetches).
  */
final class InMemoryRedoProvider(files: Map[String, Array[Byte]])
    extends RedoStorageProvider {
  override def open(path: String): RedoByteSource = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val bytes = files.getOrElse(name,
      throw new IOException(s"no such in-memory redo log: $name"))
    new RedoByteSource {
      override def length: Long = bytes.length.toLong
      override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit = {
        if (pos + len > bytes.length)
          throw new IOException(s"read past end of $name: $pos+$len > ${bytes.length}")
        System.arraycopy(bytes, pos.toInt, buf, off, len)
      }
      override def close(): Unit = ()
    }
  }
  override def list(dir: String): Seq[String] =
    files.keys.filter(_.endsWith(".grl")).toSeq.sorted
}

/** HTTP(S) range-request provider — a real non-local transport: each
  * `readFully` issues one `Range: bytes=p-(p+n-1)` GET, exactly the
  * remote-seek-and-read shape of the reference's SSH/SMB readers. Log
  * listing expects a text index document (one file name per line) at
  * `dir/index`, mirroring how the reference asks ASM/SSH for a
  * directory listing before opening sequences.
  */
final class HttpRedoProvider extends RedoStorageProvider {
  import java.net.{HttpURLConnection, URI}

  private def connect(url: String, range: Option[(Long, Long)]): HttpURLConnection = {
    val c = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    range.foreach { case (from, to) =>
      c.setRequestProperty("Range", s"bytes=$from-$to")
    }
    c.setConnectTimeout(10000)
    c.setReadTimeout(30000)
    c
  }

  override def open(path: String): RedoByteSource = new RedoByteSource {
    override lazy val length: Long = {
      // a non-2xx HEAD (GET-only endpoints: presigned URLs, 405s) falls
      // through to the range probe instead of aborting — readFully
      // already tolerates those servers, so length must too
      val c = connect(path, None)
      c.setRequestMethod("HEAD")
      val fromHead =
        try { if (c.getResponseCode / 100 == 2) c.getContentLengthLong else -1L }
        finally c.disconnect()
      if (fromHead > 0) fromHead
      else {
        // servers that omit Content-Length on HEAD (or reject HEAD): ask
        // for one byte and read the total from Content-Range
        // ("bytes 0-0/TOTAL"); a server that ignores Range and answers
        // 200 still reports the full size in Content-Length — use it
        // (the same 200-tolerance readFully has)
        val r = connect(path, Some((0L, 0L)))
        try r.getResponseCode match {
          case 206 =>
            val cr = Option(r.getHeaderField("Content-Range"))
              .getOrElse(throw new IOException(s"no Content-Range from $path"))
            cr.substring(cr.indexOf('/') + 1).toLong
          case 200 if r.getContentLengthLong > 0 => r.getContentLengthLong
          case code => throw new IOException(
            s"no usable length for $path (range probe -> $code)")
        } finally r.disconnect()
      }
    }
    override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit = {
      val c = connect(path, Some((pos, pos + len - 1)))
      try {
        val code = c.getResponseCode
        if (code != 206 && code != 200)
          throw new IOException(s"GET $path range $pos+$len -> $code")
        val in = c.getInputStream
        if (code == 200 && pos > 0) {
          // server ignored the Range header and sent the whole body:
          // the first `pos` bytes are NOT the requested window — skip
          // them, never serve offset-0 bytes as offset-pos data
          var toSkip = pos
          while (toSkip > 0) {
            val skipped = in.skip(toSkip)
            if (skipped > 0) toSkip -= skipped
            else if (in.read() >= 0) toSkip -= 1
            else throw new IOException(s"EOF while skipping to $pos in $path")
          }
        }
        var done = 0
        while (done < len) {
          val n = in.read(buf, off + done, len - done)
          if (n < 0) throw new IOException(s"short read from $path at $pos")
          done += n
        }
        in.close()
      } finally c.disconnect()
    }
    override def close(): Unit = ()
  }

  override def list(dir: String): Seq[String] = {
    val c = connect(dir.stripSuffix("/") + "/index", None)
    try {
      if (c.getResponseCode / 100 != 2)
        throw new IOException(s"GET $dir/index -> ${c.getResponseCode}")
      val src = scala.io.Source.fromInputStream(c.getInputStream, "UTF-8")
      // filter to .grl names like the local/in-memory providers: an
      // `ls > index`-generated document lists the index itself (or
      // checksums/READMEs), and opening those as redo logs would fail
      // the whole listing on "bad magic"
      try src.getLines().map(_.trim)
        .filter(n => n.nonEmpty && n.endsWith(".grl")).toList
      finally src.close()
    } finally c.disconnect()
  }
}

object RedoStorageProvider {
  /** Scheme-based factory: `http(s)://` → ranged HTTP, `graft-ship://`
    * → the TCP shipment agent ([[ShipRedoProvider]]), `mem:` handled
    * by callers holding an [[InMemoryRedoProvider]], everything else →
    * local filesystem.
    */
  def forPath(path: String): RedoStorageProvider =
    if (path.startsWith("http://") || path.startsWith("https://"))
      new HttpRedoProvider
    else if (path.startsWith(RedoShipment.Scheme))
      new ShipRedoProvider
    else LocalRedoProvider
}
