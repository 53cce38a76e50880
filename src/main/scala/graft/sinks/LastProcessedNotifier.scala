package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** K6 ops hook (reference: `OraCdcLastProcessedSeqFileNotifier.java:48`):
  * records the last fully processed micro-batch — id, timestamp, end
  * offsets — to a file after every progress event, so external tooling
  * can watch pipeline position. Register with
  * `spark.streams.addListener(new LastProcessedNotifier(path))`.
  */
class LastProcessedNotifier(path: String) extends StreamingQueryListener {
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val line =
      s"""{"queryId":"${p.id}","batchId":${p.batchId},"timestamp":"${p.timestamp}",""" +
        s""""numInputRows":${p.numInputRows}}"""
    // atomic replace: external pollers must never observe a torn write
    val target = Paths.get(path)
    val tmp = Paths.get(path + s".tmp.${p.id}")
    Files.write(tmp, (line + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
