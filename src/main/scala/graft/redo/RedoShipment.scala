package graft.redo

import java.io.{DataInputStream, DataOutputStream, File, IOException,
  RandomAccessFile}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** TCP redo shipment (S6) — the one remote transport the reference
  * ships that needs no external binary or client jar: a socket pair
  * that moves redo logs between hosts
  * (`utils/file/SourceDatabaseShipmentAgent.java:34` — a
  * ServerSocketChannel file server on the source database host — and
  * `TargetDatabaseShipmentAgent.java`, the pull-and-spool daemon on
  * the mining host, with throughput exposed through
  * `jmx/OraCdcRedoShipment.java`).
  *
  * The reference protocol is fire-and-forget: a 1024-byte path
  * request, then the whole file streamed until close. GRFT1 keeps the
  * topology (source serves, target pulls) but frames the protocol so
  * it can serve BOTH shipment modes a Spark topology needs:
  *
  *  - `SHIP path offset` — whole-file spool with RESUME: the target
  *    re-requests from its partial offset after a mid-transfer kill,
  *    instead of re-paying the transferred gigabytes (the reference
  *    restarts from zero);
  *  - `READ path pos len` / `STAT` / `LIST` — the positional window
  *    [[RedoByteSource]] needs, so executors can also MINE DIRECTLY
  *    over the socket without spooling (the ranged-HTTP shape of
  *    [[HttpRedoProvider]]), each task opening its own connection —
  *    1000 executors fan out across the transport like local disks.
  *
  * Wire format: every request is one `int32 length + UTF-8 command`
  * frame; every response starts with an `int32 status` (0 = OK,
  * else an `int32 length + UTF-8 message` error payload follows).
  */
object RedoShipment {
  val Scheme = "graft-ship://"

  /** Parse `graft-ship://host:port/abs/path` → (host, port, path). */
  def parse(url: String): (String, Int, String) = {
    require(url.startsWith(Scheme), s"not a $Scheme url: $url")
    val rest = url.stripPrefix(Scheme)
    val slash = rest.indexOf('/')
    if (slash < 0) throw new IllegalArgumentException(s"no path in $url")
    val hostPort = rest.substring(0, slash)
    val colon = hostPort.lastIndexOf(':')
    if (colon < 0) throw new IllegalArgumentException(s"no port in $url")
    (hostPort.substring(0, colon), hostPort.substring(colon + 1).toInt,
      rest.substring(slash))
  }

  /** Path fields travel URL-encoded so the space-separated command
    * grammar survives paths containing spaces (or any byte).
    */
  private[redo] def enc(path: String): String =
    java.net.URLEncoder.encode(path, "UTF-8")
  private[redo] def dec(field: String): String =
    java.net.URLDecoder.decode(field, "UTF-8")

  private[redo] def writeErr(out: DataOutputStream, msg: String): Unit = {
    out.writeInt(1)
    val b = msg.getBytes("UTF-8")
    out.writeInt(b.length)
    out.write(b)
    out.flush()
  }

  private[redo] def readOk(in: DataInputStream, what: String): Unit = {
    val status = in.readInt()
    if (status != 0) {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      throw new IOException(s"$what failed: ${new String(b, "UTF-8")}")
    }
  }
}

/** The source-host agent: serves redo files under `root` (and nothing
  * outside it — every requested path is resolved and checked against
  * the root, the containment the reference's agent lacks) on a
  * thread-per-connection blocking server. `port = 0` binds ephemeral
  * (tests); a production standby runs one fixed-port instance next to
  * its archive destination.
  *
  * `throttleBytesPerSec` caps SHIP bandwidth (0 = unthrottled) — the
  * WAN-friendliness knob the reference left as a TODO ("chunk
  * size!!!", `SourceDatabaseShipmentAgent.java:108`); READ windows are
  * never throttled (mining latency, not bulk copy).
  *
  * Shipment throughput telemetry mirrors the reference's
  * `OraCdcRedoShipment` MBean surface (files/bytes/last-file) as plain
  * thread-safe counters; [[graft.metrics.CdcMetrics]]-style MBean
  * registration stays the caller's choice.
  */
final class ShipmentServer(root: File, bind: String = "127.0.0.1",
    port: Int = 0, throttleBytesPerSec: Long = 0L) extends AutoCloseable {

  private val rootPath = root.getCanonicalFile.toPath
  private val listener = new ServerSocket()
  listener.setReuseAddress(true)
  listener.bind(new InetSocketAddress(bind, port))

  val filesShipped = new AtomicInteger(0)
  val bytesShipped = new AtomicLong(0L)
  @volatile var lastShippedFile: String = ""

  // live connections, so close() can sever in-flight transfers too —
  // an agent shutdown that leaves daemon handler threads streaming
  // would be unkillable (and untestable for resume)
  private val live = java.util.concurrent.ConcurrentHashMap
    .newKeySet[Socket]()

  def boundPort: Int = listener.getLocalPort

  /** Resolve a requested path inside the root or refuse. */
  private def resolve(p: String): File = {
    val f = new File(p).getCanonicalFile
    if (!f.toPath.startsWith(rootPath))
      throw new IOException(s"path outside shipment root: $p")
    f
  }

  /** `ship = true` = a SHIP bulk copy: counted toward the shipment
    * MBean (files/bytes/MiB-per-second) and subject to the bandwidth
    * throttle. READ mining windows are neither — counting them would
    * report phantom transfer throughput for a scan that ships nothing.
    */
  private def copyWindow(raf: RandomAccessFile, out: DataOutputStream,
      total: Long, ship: Boolean): Unit = {
    val buf = new Array[Byte](64 * 1024)
    var left = total
    var windowStart = System.nanoTime()
    var windowBytes = 0L
    while (left > 0) {
      val n = raf.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (n < 0) throw new IOException("file truncated mid-ship")
      out.write(buf, 0, n)
      left -= n
      if (ship) bytesShipped.addAndGet(n)
      if (ship && throttleBytesPerSec > 0) {
        windowBytes += n
        val due = windowStart + windowBytes * 1000000000L / throttleBytesPerSec
        val wait = due - System.nanoTime()
        if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
        if (windowBytes >= throttleBytesPerSec) {
          windowStart = System.nanoTime(); windowBytes = 0L
        }
      }
    }
  }

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream, 64 * 1024))
    try {
      while (true) {
        val len = try in.readInt() catch { case _: java.io.EOFException => return }
        if (len < 0 || len > 4096) throw new IOException(s"bad frame length $len")
        val cmdBytes = new Array[Byte](len)
        in.readFully(cmdBytes)
        val cmd = new String(cmdBytes, "UTF-8")
        // error frames are only valid BEFORE the success header: once
        // `writeInt(0)` + a length have gone out, the client is
        // counting body bytes, and an error frame appended mid-body
        // would be persisted as payload (a spooled file would then
        // pass its completeness check while corrupt). headerSent
        // routes mid-body failures to a connection DROP instead — the
        // client sees a short stream and keeps its resumable partial.
        var headerSent = false
        def header(write: => Unit): Unit = { headerSent = true; write }
        try {
          val parts = cmd.split(" ", 4)
          parts(0) match {
            case "LIST" =>
              val dir = resolve(RedoShipment.dec(parts(1)))
              val names = Option(dir.listFiles()).getOrElse(
                  throw new IOException(s"cannot list ${parts(1)}"))
                .filter(f => f.isFile && f.getName.endsWith(".grl"))
                .map(_.getName).sorted
              val body = names.mkString("\n").getBytes("UTF-8")
              header { out.writeInt(0); out.writeInt(body.length) }
              out.write(body)
              out.flush()
            case "STAT" =>
              val f = resolve(RedoShipment.dec(parts(1)))
              if (!f.isFile) throw new IOException(s"no such file: ${parts(1)}")
              header { out.writeInt(0); out.writeLong(f.length()) }
              out.flush()
            case "READ" =>
              val f = resolve(RedoShipment.dec(parts(1)))
              val pos = parts(2).toLong
              val n = parts(3).toInt
              if (pos < 0 || n < 0 || pos + n > f.length())
                throw new IOException(
                  s"window $pos+$n outside ${parts(1)} (${f.length()} bytes)")
              val raf = new RandomAccessFile(f, "r")
              try {
                raf.seek(pos)
                header { out.writeInt(0); out.writeInt(n) }
                copyWindow(raf, out, n, ship = false)
              } finally raf.close()
              out.flush()
            case "SHIP" =>
              val f = resolve(RedoShipment.dec(parts(1)))
              val offset = parts(2).toLong
              if (!f.isFile) throw new IOException(s"no such file: ${parts(1)}")
              if (offset < 0 || offset > f.length())
                throw new IOException(s"bad resume offset $offset for " +
                  s"${parts(1)} (${f.length()} bytes)")
              val remaining = f.length() - offset
              val raf = new RandomAccessFile(f, "r")
              try {
                raf.seek(offset)
                header { out.writeInt(0); out.writeLong(remaining) }
                copyWindow(raf, out, remaining, ship = true)
              } finally raf.close()
              out.flush()
              filesShipped.incrementAndGet()
              lastShippedFile = f.getName
            case other => throw new IOException(s"unknown command: $other")
          }
        } catch {
          // PRE-header failure: report on the wire, keep serving — a
          // bad path from one consumer must not drop the connection
          // another request is multiplexed on. NonFatal, not just
          // IOException: a malformed command (missing args, non-numeric
          // offset) parses with an index/format exception and must be
          // a protocol error, not a dropped connection. POST-header:
          // rethrow — dropping the connection is the only way to keep
          // the byte stream honest.
          case e: IOException if !headerSent =>
            RedoShipment.writeErr(out, e.getMessage)
          case scala.util.control.NonFatal(e) if !headerSent =>
            RedoShipment.writeErr(out, s"malformed command '$cmd': $e")
        }
      }
    } catch {
      case _: IOException => // connection-level failure: drop quietly
    } finally {
      live.remove(sock)
      sock.close()
    }
  }

  private val acceptLoop = new Thread(() => {
    try {
      while (!listener.isClosed) {
        val sock = listener.accept()
        live.add(sock)
        val t = new Thread(() => handle(sock), "graft-ship-conn")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: IOException => } // closed
  }, "graft-ship-accept")
  acceptLoop.setDaemon(true)
  acceptLoop.start()

  override def close(): Unit = {
    listener.close()
    live.forEach { s => try s.close() catch { case _: IOException => } }
  }
}

/** [[RedoStorageProvider]] over the shipment protocol — executors mine
  * `graft-ship://host:port/path` urls directly, one connection per
  * opened source, reconnecting once if the agent restarted between
  * reads (a standby failover must not kill a long scan that can simply
  * retry its positional read).
  */
final class ShipRedoProvider extends RedoStorageProvider {

  private def connect(host: String, port: Int): Socket = {
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), 10000)
    s.setSoTimeout(30000)
    s
  }

  override def open(url: String): RedoByteSource = new RedoByteSource {
    private val (host, port, path) = RedoShipment.parse(url)
    private var sock: Socket = _

    private def ensure(): (DataInputStream, DataOutputStream) = {
      if (sock == null || sock.isClosed) sock = connect(host, port)
      (new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream))
    }

    private def request[T](cmd: String)(read: DataInputStream => T): T = {
      def once(): T = {
        val (in, out) = ensure()
        val b = cmd.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b); out.flush()
        RedoShipment.readOk(in, cmd.takeWhile(_ != ' '))
        read(in)
      }
      def drop(): Unit = {
        if (sock != null) try sock.close() catch { case _: IOException => () }
        sock = null
      }
      try once()
      catch {
        case _: java.net.SocketException | _: java.io.EOFException =>
          // agent restarted / connection dropped: reconnect once and
          // retry — positional reads are idempotent. The RETRY is
          // guarded the same way as the first attempt: a failure after
          // its readOk would otherwise leave the desynced socket
          // cached for the next request
          drop()
          try once()
          catch { case e: Throwable => drop(); throw e }
        case e: Throwable =>
          // any other failure after bytes may have been exchanged (a
          // short-window mismatch, a mid-body read timeout) leaves
          // announced-but-unread payload in the stream — the connection
          // is desynced, so the next request must start on a fresh
          // socket rather than read stale body bytes as a status int
          drop()
          throw e
      }
    }

    override lazy val length: Long =
      request(s"STAT ${RedoShipment.enc(path)}")(_.readLong())

    override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit =
      request(s"READ ${RedoShipment.enc(path)} $pos $len") { in =>
        val n = in.readInt()
        if (n != len) throw new IOException(s"short window from $url: $n != $len")
        in.readFully(buf, off, len)
      }

    override def close(): Unit = if (sock != null) sock.close()
  }

  override def list(dir: String): Seq[String] = {
    val (host, port, path) = RedoShipment.parse(dir)
    val sock = connect(host, port)
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val b = s"LIST ${RedoShipment.enc(path)}".getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.flush()
      RedoShipment.readOk(in, "LIST")
      val n = in.readInt()
      val body = new Array[Byte](n)
      in.readFully(body)
      val s = new String(body, "UTF-8")
      if (s.isEmpty) Nil else s.split("\n").toSeq
    } finally sock.close()
  }
}

/** The target-host agent (`TargetDatabaseShipmentAgent` analogue):
  * pulls a remote redo log into a local spool directory. The in-flight
  * file is `<name>.inprogress` (the [[graft.RedoDump]] atomic-appearance
  * convention: a concurrent miner listing the spool never sees a
  * half-shipped `.grl`), renamed into place only when the byte count
  * matches the agent's announced size. A mid-transfer kill leaves the
  * partial `.inprogress` behind, and the NEXT fetch resumes from its
  * length instead of byte zero.
  */
object ShipmentClient {

  // per-destination monitors for SAME-JVM fetcher serialization:
  // FileChannel.lock() serializes across PROCESSES but throws
  // OverlappingFileLockException (rather than blocking) when the
  // contender is a thread of the same JVM — two Spark tasks in one
  // executor fetching the same log would crash instead of queueing.
  // The map stays small (one entry per distinct dest ever fetched —
  // spool paths, not data-sized).
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Fetch `graft-ship://host:port/path` into `destDir/<name>`.
    * Returns the local file after verifying completeness; resumes an
    * existing partial transfer.
    */
  def fetch(url: String, destDir: File): File = {
    val (host, port, path) = RedoShipment.parse(url)
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dest = new File(destDir, name)
    val monitor = jvmLocks.computeIfAbsent(
      dest.getAbsolutePath, _ => new Object)
    monitor.synchronized { fetchLocked(host, port, path, destDir, dest, name) }
  }

  private def fetchLocked(host: String, port: Int, path: String,
      destDir: File, dest: File, name: String): File = {
    val partial = new File(destDir, name + ".inprogress")
    if (dest.isFile) return dest // already shipped and published
    Files.createDirectories(destDir.toPath)

    // Exclusive lock on the .inprogress serializes concurrent fetchers
    // of the same log ACROSS PROCESSES (same-JVM threads queue on the
    // monitor above): two interleaved writers would each complete
    // their own byte-count loop and publish a corrupt file that passes
    // the completeness check. The loser blocks here, then sees the
    // winner's published dest and returns it.
    val raf = new RandomAccessFile(partial, "rw")
    try {
      val flock = raf.getChannel.lock()
      try {
        if (dest.isFile) {
          // the winner published while we waited; our open may have
          // (re)created an empty partial at this path — remove it
          if (raf.length() == 0L) Files.deleteIfExists(partial.toPath)
          return dest
        }
        val offset = raf.length() // resume an interrupted transfer
        val sock = new Socket()
        sock.connect(new InetSocketAddress(host, port), 10000)
        sock.setSoTimeout(60000)
        try {
          val in = new DataInputStream(sock.getInputStream)
          val out = new DataOutputStream(sock.getOutputStream)
          val cmd = s"SHIP ${RedoShipment.enc(path)} $offset".getBytes("UTF-8")
          out.writeInt(cmd.length); out.write(cmd); out.flush()
          RedoShipment.readOk(in, "SHIP")
          val remaining = in.readLong()
          raf.seek(offset)
          val buf = new Array[Byte](64 * 1024)
          var left = remaining
          while (left > 0) {
            val n = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
            if (n < 0) throw new IOException(
              s"connection lost with $left bytes left — partial kept at " +
                s"$partial for resume")
            raf.write(buf, 0, n)
            left -= n
          }
          // completeness: the spool must hold exactly the announced
          // size before it may be published
          val got = raf.length()
          if (got != offset + remaining) throw new IOException(
            s"spool length $got != expected ${offset + remaining} for $partial")
          // publish atomically only when complete
          Files.move(partial.toPath, dest.toPath,
            StandardCopyOption.ATOMIC_MOVE)
          dest
        } finally sock.close()
      } finally flock.release()
    } finally raf.close()
  }
}
