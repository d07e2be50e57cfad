package graft

import graft.ops.{AnnIndex, DedupIndex}
import graft.sources.WriterLock
import org.apache.hadoop.fs.Path

/** Single-writer discipline on the serving indexes: a second
  * concurrent writer fails loudly (never races), the lock is
  * reentrant within a thread, a dead writer's stale lock is broken
  * explicitly, and normal sequential mutators leave no lock behind.
  */
class WriterLockSpec extends SparkSpec {
  import spark.implicits._

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("second writer fails loudly while the first holds the lock; sequential is fine") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wlock").toString
    val lock = WriterLock.lockPath(dir)
    @volatile var insideError: Option[Throwable] = None
    WriterLock.withLock(fs, lock, "index A") {
      // a SECOND writer (different thread = different driver in spirit)
      val t = new Thread(() =>
        try WriterLock.withLock(fs, lock, "index A")(())
        catch { case e: Throwable => insideError = Some(e) })
      t.start(); t.join()
      assert(insideError.exists(_.isInstanceOf[IllegalStateException]),
        s"expected the concurrent writer to fail loudly, got $insideError")
      assert(insideError.exists(_.getMessage.contains("locked by another writer")))
    }
    // released: a later writer proceeds, and no lock file remains
    WriterLock.withLock(fs, lock, "index A")(())
    assert(!fs.exists(lock))
  }

  test("reentrant within a thread; released only at the outermost exit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wlock2").toString
    val lock = WriterLock.lockPath(dir)
    WriterLock.withLock(fs, lock, "x") {
      WriterLock.withLock(fs, lock, "x") {
        assert(fs.exists(lock))
      }
      assert(fs.exists(lock), "inner exit must not release the outer hold")
    }
    assert(!fs.exists(lock))
  }

  test("stale lock from a dead writer blocks mutators until broken") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wlock3").toString
    val e = vecs(60)
    AnnIndex.build(e, dir, nClusters = 4, iters = 1)
    // simulate a dead writer: lock file exists, nobody holds it
    fs.create(WriterLock.lockPath(dir), false).close()
    val err = intercept[IllegalStateException] {
      AnnIndex.delete(spark, dir, Seq(1L).toDF("vec_id"))
    }
    assert(err.getMessage.contains("locked by another writer"))
    assert(WriterLock.break(fs, WriterLock.lockPath(dir)))
    assert(AnnIndex.delete(spark, dir, Seq(1L).toDF("vec_id")) == 1L)
  }

  test("DedupIndex mutators lock the index root derived from the catalog") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wlock4").toString
    val tbl = "graft_wlock_dedup"
    DedupIndex.build(Seq((1L, "seed page")).toDF("doc_id", "text"), dir, tbl, nBuckets = 2)
    // hold the root lock; ingest (which only knows the TABLE) must block on it
    WriterLock.withLock(fs, WriterLock.lockPath(dir), "outer") {
      @volatile var got: Option[Throwable] = None
      val t = new Thread(() =>
        try DedupIndex.ingest(spark, tbl, Seq((2L, "new page")).toDF("doc_id", "text"))
        catch { case e: Throwable => got = Some(e) })
      t.start(); t.join()
      assert(got.exists(_.getMessage.contains("locked by another writer")),
        s"ingest must contend on the same root lock, got $got")
    }
    // lock released -> ingest proceeds
    assert(DedupIndex.ingest(spark, tbl, Seq((2L, "new page")).toDF("doc_id", "text"))
      .count() == 1L)
  }

  test("create-if-absent is atomic under contention (O_EXCL on local fs)") {
    // Hadoop's RawLocalFileSystem create(overwrite=false) is an
    // exists-check-then-create — two racing writers could both win.
    // The nio O_EXCL acquire must give mutual exclusion: 16 threads
    // retry-loop to acquire; inside the critical section at most one
    // may ever be present, and all 16 eventually succeed.
    val dir = java.nio.file.Files.createTempDirectory("graft_wlock5").toString
    val lock = WriterLock.lockPath(dir)
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var violation: Option[String] = None
    val threads = (0 until 16).map { i =>
      new Thread(() => {
        var acquired = false
        while (!acquired && violation.isEmpty) {
          try {
            WriterLock.withLock(fs, lock, s"contender $i") {
              val now = active.incrementAndGet()
              if (now != 1) violation = Some(s"$now writers inside the lock at once")
              Thread.sleep(1)
              active.decrementAndGet()
            }
            acquired = true
            done.incrementAndGet()
          } catch {
            case _: IllegalStateException => Thread.sleep(1) // locked; retry
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(violation.isEmpty, violation.toString)
    assert(done.get() == 16, s"all contenders must eventually acquire, got ${done.get()}")
    assert(!fs.exists(lock))
  }

  test("a non-'already exists' create failure is NOT reported as locked") {
    // An environmental failure (here: the index root is not a
    // directory) must propagate as what it is — misreporting it as
    // "locked by another writer" steers operators toward
    // WriterLock.break against a lock nobody holds.
    val f = java.nio.file.Files.createTempFile("graft_wlock6", ".notadir")
    val err = intercept[Throwable] {
      WriterLock.withLock(fs, WriterLock.lockPath(f.toString), "x")(())
    }
    assert(!String.valueOf(err.getMessage).contains("locked by another writer"),
      s"a file-as-root failure is not a held lock: $err")
  }

  private def vecs(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  /** Local filesystem wearing a non-"file" scheme, so acquire takes the
    * NON-local branch — the `createFile().overwrite(false)` builder
    * surface that recent S3A maps to a conditional PUT. The builder is
    * exercised for real (create, token write, close, already-exists
    * taxonomy); only the store-side atomicity is local-fs-grade here.
    */
  private def mockSchemeFs = {
    val raw = new org.apache.hadoop.fs.RawLocalFileSystem()
    raw.initialize(java.net.URI.create("file:///"), spark.sparkContext.hadoopConfiguration)
    new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def getUri: java.net.URI = java.net.URI.create("mockstore:///")
    }
  }

  test("non-local acquire uses the conditional-create builder: token, taxonomy, release") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wlock7").toString
    val mock = mockSchemeFs
    val lock = WriterLock.lockPath(dir)
    @volatile var second: Option[Throwable] = None
    WriterLock.withLock(mock, lock, "builder index") {
      assert(mock.exists(lock), "builder acquire must create the lock")
      // the token is IN the lock (written through the builder stream)
      val in = mock.open(lock)
      val tok = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      assert(tok.contains("pid="), s"token not written through the builder: '$tok'")
      // a second writer on the same store fails loudly with the holder
      val t = new Thread(() =>
        try WriterLock.withLock(mockSchemeFs, lock, "builder index")(())
        catch { case e: Throwable => second = Some(e) })
      t.start(); t.join()
      assert(second.exists(_.getMessage.contains("locked by another writer")),
        s"expected loud lock failure, got $second")
    }
    assert(!mock.exists(lock), "outermost exit must release")
    // stale foreign lock -> locked taxonomy -> break -> proceeds
    mock.createFile(lock).overwrite(false).build().close()
    val e = intercept[IllegalStateException] {
      WriterLock.withLock(mock, lock, "builder index")(())
    }
    assert(e.getMessage.contains("locked by another writer"))
    assert(WriterLock.break(mock, lock))
    WriterLock.withLock(mock, lock, "builder index")(())
    assert(!mock.exists(lock))
  }
}
