package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory single-writer guard for the persisted serving indexes
  * ([[graft.ops.DedupIndex]], [[graft.ops.NearDupIndex]],
  * [[graft.ops.AnnIndex]]) — the same protocol
  * [[graft.core.SummaryDB]] uses for its versioned swap.
  *
  * Why: each index's mutators are individually crash-safe, but they
  * are NOT safe against each other. The concrete hazard is compact
  * racing ingest/append — compact snapshots the live table, writes a
  * fresh generation, and swaps the directory in; rows appended between
  * the snapshot and the swap are silently dropped from the new
  * generation (for a dedup index that silently un-sees hashes, so
  * previously-kept duplicates pass the filter forever after). Two
  * concurrent ingests of one index can also double-append survivors.
  *
  * Mechanics: every mutating call holds `<indexRoot>/_writer.lock` for
  * the CALL's duration — acquired with atomic create-if-absent,
  * token-checked on release (never deletes a lock someone re-acquired
  * after a [[break]] of ours), reentrant within a thread (ingest may
  * call append under the same lock). A second concurrent writer fails
  * LOUDLY instead of racing. Readers/probes never take the lock: every
  * reader-visible mutation is already atomic on its own (bucketed
  * appends, single-name installs, directory swaps).
  *
  * A writer that DIES mid-call leaves a stale lock; that is
  * intentionally loud (the dead writer may have left a half-applied
  * batch worth inspecting) and is cleared with [[break]]. The
  * underscore name keeps the lock file invisible to parquet readers.
  *
  * Portability contract: the guarantee is exactly as strong as the
  * filesystem's create-if-absent. On HDFS `create(overwrite=false)` is
  * an atomic namespace operation; on the local filesystem Hadoop's
  * `RawLocalFileSystem`/`ChecksumFileSystem` implement it as
  * exists-check-then-create (NOT atomic), so local paths are acquired
  * through `java.nio.file.Files.createFile` (O_EXCL — atomic). On
  * object stores WITHOUT atomic create-if-absent (S3A before
  * conditional-write support) two writers can both "acquire"; run
  * mutators for one index from one coordinator there, or front the
  * lock with a store that has the primitive (HDFS, ABFS, GCS preconditions,
  * S3 If-None-Match). SCALING.md §locks records the same contract.
  */
object WriterLock {

  private val held = new ThreadLocal[collection.mutable.Map[String, (Int, String)]] {
    override def initialValue(): collection.mutable.Map[String, (Int, String)] =
      collection.mutable.Map.empty
  }

  /** The lock file for an index rooted at `dir`. */
  def lockPath(dir: String): Path = new Path(dir, "_writer.lock")

  private def holder(fs: FileSystem, lock: Path): String =
    try {
      val in = fs.open(lock)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } catch { case _: Throwable => "<unreadable>" }

  /** Run `body` holding the single-writer lock at `lock`; `what` names
    * the index in the failure message.
    */
  def withLock[T](fs: FileSystem, lock: Path, what: String)(body: => T): T = {
    val key = lock.toString
    val m = held.get()
    m.get(key) match {
      case Some((depth, token)) =>
        m(key) = (depth + 1, token)
        try body
        finally m(key) = (m(key)._1 - 1, token)
      case None =>
        val token = java.util.UUID.randomUUID().toString +
          " pid=" + ProcessHandle.current().pid() + " at=" + System.currentTimeMillis()
        fs.mkdirs(lock.getParent)
        acquire(fs, lock, what, token)
        m(key) = (1, token)
        try body
        finally {
          m.remove(key)
          if (holder(fs, lock) == token) fs.delete(lock, false)
        }
    }
  }

  private def lockedBy(fs: FileSystem, lock: Path, what: String) =
    new IllegalStateException(
      s"$what is locked by another writer (${holder(fs, lock)}); " +
        "wait for it, or clear a stale lock from a dead writer with WriterLock.break")

  /** Create the lock file with the token inside, atomically-if-absent.
    *
    * Only "already exists" maps to the locked-by-another-writer error;
    * any OTHER IOException (permissions, quota, transient FS failure)
    * propagates as what it is — misreporting those as "locked" would
    * steer an operator toward [[break]], which breaks a lock someone
    * may actually hold. If the create succeeded but the token write
    * failed, the just-created file is removed before rethrowing (an
    * empty lock with no holder bookkeeping would wedge every later
    * mutator until a manual break).
    */
  private def acquire(fs: FileSystem, lock: Path, what: String, token: String): Unit =
    if (fs.getUri.getScheme == "file") {
      // Hadoop's local create(overwrite=false) is exists-check-then-
      // create — two processes can both win. O_EXCL via nio is atomic.
      val nio = java.nio.file.Paths.get(lock.toUri.getPath)
      try java.nio.file.Files.createFile(nio)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw lockedBy(fs, lock, what)
      }
      try java.nio.file.Files.write(nio, token.getBytes("UTF-8"))
      catch {
        case e: Throwable =>
          try java.nio.file.Files.deleteIfExists(nio) catch { case _: Throwable => () }
          throw e
      }
    } else {
      val out =
        try fs.create(lock, false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            throw lockedBy(fs, lock, what)
          // some filesystems signal an existing file as a bare
          // IOException — treat it as locked only when the file IS there
          case e: java.io.IOException =>
            if (fs.exists(lock)) throw lockedBy(fs, lock, what) else throw e
        }
      try {
        out.write(token.getBytes("UTF-8"))
        out.close()
      } catch {
        case e: Throwable =>
          try out.close() catch { case _: Throwable => () }
          try fs.delete(lock, false) catch { case _: Throwable => () }
          throw e
      }
    }

  /** Forcibly clear a stale lock left by a dead writer. Returns true
    * when a lock file was removed.
    */
  def break(fs: FileSystem, lock: Path): Boolean = fs.delete(lock, false)
}
