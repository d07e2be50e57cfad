package graft

import graft.core.{Event, StreamMeta, SummaryDB}
import java.nio.file.Files

/** The single-writer guard on the versioned swap: a second concurrent
  * writer fails loudly instead of racing the version pointer, readers
  * never block on (or see) the lock, sequential writers need no
  * handshake, and a stale lock from a dead writer is cleared with
  * [[SummaryDB.breakLock]]. (The reference is single-writer by
  * construction — one process, one store; at cluster scale two jobs can
  * open the same dir, so the contract must be enforced, not assumed.)
  */
class ConcurrentWriterSpec extends SparkSpec {
  import spark.implicits._

  private def events(n: Int, sid: Long = 1L) =
    (0 until n).map(i => Event(sid, i.toLong, i.toLong, i.toDouble)).toDS()

  private def freshDir(): String =
    Files.createTempDirectory("graft_lock").toString + "/db"

  test("second concurrent writer fails loudly; first proceeds; lock releases") {
    val dir = freshDir()
    val db1 = SummaryDB.open(spark, dir)
    val db2 = SummaryDB.open(spark, dir)
    db1.withWriteLock {
      val e = intercept[IllegalStateException] { db2.append(events(5)) }
      assert(e.getMessage.contains("locked by another writer"))
      assert(e.getMessage.contains("pid="), "lock message names the holder")
      // The holder itself keeps working (reentrant within the call).
      db1.append(events(10))
    }
    // Lock released at call exit: the second writer now succeeds.
    db2.append(events(5, sid = 2L))
    assert(db1.summaryWindows.filter($"streamId" === 1L).count() > 0)
    assert(db2.summaryWindows.filter($"streamId" === 2L).count() > 0)
  }

  test("readers never block on the lock and see only complete versions") {
    val dir = freshDir()
    val db1 = SummaryDB.open(spark, dir)
    db1.append(events(20))
    val before = db1.summaryWindows.count()
    db1.withWriteLock {
      // A pure reader opened mid-write reads the current complete
      // version without touching the lock.
      val reader = SummaryDB.open(spark, dir)
      assert(reader.summaryWindows.count() == before)
      assert(reader.query(1L, "count", Long.MinValue, Long.MaxValue).value == 20.0)
    }
  }

  test("sequential writers (reopen after restart) need no handshake") {
    val dir = freshDir()
    SummaryDB.open(spark, dir).append(events(8))
    val db2 = SummaryDB.open(spark, dir)
    db2.append(events(8, sid = 2L)) // no breakLock, no error
    assert(db2.summaryWindows.select("streamId").distinct().count() == 2)
  }

  test("breakLock clears a stale lock from a dead writer") {
    val dir = freshDir()
    val db1 = SummaryDB.open(spark, dir)
    db1.append(events(5))
    // Simulate a writer that died mid-call: its lock file remains.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_writer.lock"), false)
    out.write("dead-writer pid=0 at=0".getBytes("UTF-8")); out.close()
    intercept[IllegalStateException] { db1.append(events(3, sid = 3L)) }
    assert(SummaryDB.breakLock(spark, dir))
    assert(!SummaryDB.breakLock(spark, dir), "second break finds nothing")
    db1.append(events(3, sid = 3L))
    assert(db1.summaryWindows.filter($"streamId" === 3L).count() > 0)
  }

  test("crashed writer mid-swap: stale lock + uncommitted version, full recovery") {
    val dir = freshDir()
    val db1 = SummaryDB.open(spark, dir)
    db1.append(events(6))
    val committed = db1.summaryWindows.count()
    // Simulate a writer that died between writing a new version and its
    // _SUCCESS marker: an uncommitted version dir AND its stale lock.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val junk = new org.apache.hadoop.fs.Path(
      s"$dir/summary_windows__v${System.currentTimeMillis() + 1}")
    fs.mkdirs(junk)
    val part = fs.create(new org.apache.hadoop.fs.Path(junk, "part-00000.parquet"), false)
    part.write("not parquet".getBytes("UTF-8")); part.close() // no _SUCCESS
    val lock = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_writer.lock"), false)
    lock.write("crashed pid=0 at=0".getBytes("UTF-8")); lock.close()
    // Readers resolve only complete versions: the torn one is invisible.
    assert(SummaryDB.open(spark, dir).summaryWindows.count() == committed)
    // Writes fail loudly until the documented recovery step...
    intercept[IllegalStateException] { db1.append(events(4, sid = 2L)) }
    assert(SummaryDB.breakLock(spark, dir))
    // ...after which the next write succeeds and supersedes the torn
    // version (its stamp is monotonic past the junk dir's).
    db1.append(events(4, sid = 2L))
    val db2 = SummaryDB.open(spark, dir)
    assert(db2.summaryWindows.select("streamId").distinct().count() == 2)
    assert(db2.summaryWindows.count() > committed)
  }

  test("mutating entry points all take the lock") {
    val dir = freshDir()
    val db1 = SummaryDB.open(spark, dir)
    val db2 = SummaryDB.open(spark, dir)
    db1.append(events(10))
    db1.withWriteLock {
      intercept[IllegalStateException] { db2.newStream(StreamMeta.exponential(9L, 2.0)) }
      intercept[IllegalStateException] { db2.newLandmark(1L, 2L, 4L) }
      intercept[IllegalStateException] { db2.startLandmark(1L, 5L) }
      intercept[IllegalStateException] { db2.appendOnce(0L, events(2)) }
      intercept[IllegalStateException] { db2.enableDistinctSummaries() }
      intercept[IllegalStateException] { db2.enableFreqSummaries() }
      intercept[IllegalStateException] { db2.enableSampleSummaries() }
    }
  }
}
