package graft.format

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

/** Cross-process branch-lock hardening: quarantine-rename steal with
  * observed-state verification, heartbeat lease refresh, and the
  * overstay-safe release path. These target the failure modes a plain
  * delete-based mtime lease has on real stores (racing stealers
  * destroying a winner's fresh lock; a release deleting a thief's
  * lock; a long section silently losing its lease mid-write). The
  * reference serializes writers with storage locks
  * (muller/core/version_control/commits.py:383-399); we keep its lease
  * semantics but make every transition an atomic create or rename. */
class BranchLockSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("label", StringType)))

  private def freshTable(): GraftDataset = {
    val ds = GraftDataset.create(spark, tmpDir("lock"), schema)
    ds.append(Seq((0L, "a"), (1L, "b")).toDF("id", "label"))
    ds.commit("rows")
    ds
  }

  test("steal verifies the quarantined lock IS the observed stale one") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val lock = new Path(ds.root, "_graft/branch.lock")
    // a second stealer that decided to steal from a STALE observation,
    // firing after the first stealer already re-created a FRESH lock,
    // must not displace the fresh lock (the ADVICE delete-race shape)
    assert(CommitLog.tryCreateExclusive(f, lock, "fresh-winner"))
    val freshMtime = f.getFileStatus(lock).getModificationTime
    val won = CommitLog.stealBranchLock(f, lock,
      observedToken = Some("dead-writer"),
      observedMtime = freshMtime - 60000L)
    assert(!won, "stealer verified against a stale observation must lose")
    assert(f.exists(lock), "the fresh lock must survive the failed steal")
    assert(CommitLog.tryCreateExclusive(f, lock, "x") == false) // still held
    val content = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(lock.toUri.getPath)))
    assert(content == "fresh-winner", "restored lock must keep its token")
    f.delete(lock, false)
  }

  test("steal succeeds only against the exact observed stale lock") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val lock = new Path(ds.root, "_graft/branch.lock")
    assert(CommitLog.tryCreateExclusive(f, lock, "dead-writer"))
    val past = System.currentTimeMillis() - 10000L
    f.setTimes(lock, past, -1L)
    val observed = f.getFileStatus(lock).getModificationTime
    assert(CommitLog.stealBranchLock(f, lock, Some("dead-writer"), observed))
    assert(!f.exists(lock), "won steal removes the stale lock")
    // no quarantine litter left behind
    val litter = f.listStatus(new Path(ds.root, "_graft"))
      .map(_.getPath.getName).filter(_.contains("branch.lock.stale"))
    assert(litter.isEmpty, s"quarantine files left: ${litter.mkString(",")}")
  }

  test("racing stealers: at most one wins, fresh re-creation survives") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val lock = new Path(ds.root, "_graft/branch.lock")
    for (_ <- 0 until 20) { // repeat: the race window is narrow
      assert(CommitLog.tryCreateExclusive(f, lock, "dead-writer"))
      f.setTimes(lock, System.currentTimeMillis() - 10000L, -1L)
      val observed = f.getFileStatus(lock).getModificationTime
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val barrier = new java.util.concurrent.CyclicBarrier(4)
      val ths = (0 until 4).map { _ =>
        val t = new Thread(() => {
          barrier.await()
          val won = CommitLog.stealBranchLock(
            f, lock, Some("dead-writer"), observed)
          if (won) {
            wins.incrementAndGet()
            // winner immediately re-creates, like the acquire loop does
            assert(CommitLog.tryCreateExclusive(f, lock, "fresh"))
          }
        })
        t.start(); t
      }
      ths.foreach(_.join())
      assert(wins.get() == 1, s"${wins.get()} stealers won one stale lock")
      // the winner's fresh lock must still be there with its own token
      val content = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(lock.toUri.getPath)))
      assert(content == "fresh",
        "a losing stealer displaced or destroyed the winner's fresh lock")
      f.delete(lock, false)
    }
  }

  test("heartbeat keeps a section longer than the lease from being stolen") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    spark.conf.set("spark.graft.branchLockLeaseMs", "300")
    try {
      val inside = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
      val holder = new Thread(() =>
        CommitLog.withBranchLock(spark, ds.root) {
          val n = inside.incrementAndGet(); maxInside.getAndAccumulate(n, math.max)
          Thread.sleep(1200) // 4x the lease — pre-heartbeat this IS stolen
          inside.decrementAndGet(); ()
        })
      holder.start()
      Thread.sleep(150) // let the holder acquire first
      val waiter = new Thread(() =>
        CommitLog.withBranchLock(spark, ds.root) {
          val n = inside.incrementAndGet(); maxInside.getAndAccumulate(n, math.max)
          Thread.sleep(20)
          inside.decrementAndGet(); ()
        })
      waiter.start()
      holder.join(); waiter.join()
      assert(maxInside.get() == 1,
        s"waiter stole a heartbeat-fresh lock (${maxInside.get()} inside)")
      assert(!f.exists(new Path(ds.root, "_graft/branch.lock")))
    } finally spark.conf.unset("spark.graft.branchLockLeaseMs")
  }

  test("release never removes a lock carrying someone else's token") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val lock = new Path(ds.root, "_graft/branch.lock")
    assert(CommitLog.tryCreateExclusive(f, lock, "thief"))
    // a displaced holder releasing after a steal+replace must leave the
    // thief's live lock alone (take-verify-restore path)
    CommitLog.releaseBranchLock(f, lock, token = "overstayed")
    assert(f.exists(lock), "release deleted the thief's live lock")
    // ... and on the guarded-delete path for rename-unsafe schemes too
    CommitLog.releaseBranchLock(f, lock, token = "overstayed",
      renameSafe = false)
    assert(f.exists(lock))
    // the actual owner releases it, on both paths
    CommitLog.releaseBranchLock(f, lock, token = "thief")
    assert(!f.exists(lock), "owner's release must release")
    assert(CommitLog.tryCreateExclusive(f, lock, "thief2"))
    CommitLog.releaseBranchLock(f, lock, token = "thief2",
      renameSafe = false)
    assert(!f.exists(lock))
    // no .rel litter from the take-verify path
    val litter = f.listStatus(new Path(ds.root, "_graft"))
      .map(_.getPath.getName).filter(_.contains("branch.lock.rel"))
    assert(litter.isEmpty, s"release litter: ${litter.mkString(",")}")
  }

  test("steal fails closed when the pre-steal token read never succeeded") {
    // ADVICE r17: two transient IO failures (pre-steal read None,
    // quarantine read None) made tokenOk vacuously true and a live
    // holder's lock could be discarded on IO errors alone. The verify
    // must POSITIVELY match: observedToken = None ⇒ steal refused,
    // lock restored.
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val lock = new Path(ds.root, "_graft/branch.lock")
    assert(CommitLog.tryCreateExclusive(f, lock, "live-holder"))
    val mtime = f.getFileStatus(lock).getModificationTime
    assert(!CommitLog.stealBranchLock(f, lock, observedToken = None,
      observedMtime = mtime + 60000L))
    assert(f.exists(lock), "fail-closed steal must restore the lock")
    val restored = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(lock.toUri.getPath)))
    assert(restored == "live-holder")
    f.delete(lock, false)
  }

  test("guarded-delete steal (rename-unsafe schemes) re-verifies freshly") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val lock = new Path(ds.root, "_graft/branch.lock")
    // stale lock, matching token: the delete-based steal wins
    assert(CommitLog.tryCreateExclusive(f, lock, "dead-writer"))
    val mtime = f.getFileStatus(lock).getModificationTime
    assert(CommitLog.stealBranchLock(f, lock, Some("dead-writer"),
      observedMtime = mtime + 1000L, renameSafe = false))
    assert(!f.exists(lock))
    // re-created (refreshed) lock: the fresh re-stat sees a NEWER mtime
    // than observed and refuses — the stale observation does not carry
    assert(CommitLog.tryCreateExclusive(f, lock, "dead-writer"))
    assert(!CommitLog.stealBranchLock(f, lock, Some("dead-writer"),
      observedMtime = f.getFileStatus(lock).getModificationTime - 60000L,
      renameSafe = false))
    assert(f.exists(lock), "refreshed lock must survive the failed steal")
    // token mismatch refuses too
    assert(!CommitLog.stealBranchLock(f, lock, Some("someone-else"),
      observedMtime = f.getFileStatus(lock).getModificationTime + 1000L,
      renameSafe = false))
    assert(f.exists(lock))
    f.delete(lock, false)
  }

  test("lock file records scheme and steal mode for post-mortems (r19)") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val lock = new Path(ds.root, "_graft/branch.lock")
    CommitLog.withBranchLock(spark, ds.root) {
      val content = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(lock.toUri.getPath)))
      val parts = content.split(' ')
      assert(parts.length === 3, s"lock content: '$content'")
      assert(java.util.UUID.fromString(parts(0)) != null)
      assert(parts(1) === "scheme=file")
      assert(parts(2) === "mode=rename-verify",
        "file:// must run the rename-verify steal contract")
    }
    assert(!f.exists(lock))
  }

  test("steal-mode selection follows the scheme's rename contract") {
    def fsWithScheme(s: String): org.apache.hadoop.fs.FileSystem =
      new org.apache.hadoop.fs.RawLocalFileSystem {
        override def getScheme: String = s
      }
    // true filesystem namespaces: rename is atomic + mtime-preserving
    for (s <- Seq("file", "hdfs", "viewfs"))
      assert(CommitLog.renameSafeScheme(fsWithScheme(s)), s)
    // object stores with atomic create but copy+delete / mtime-refreshing
    // rename: must degrade to the guarded-delete steal
    for (s <- Seq("gs", "abfs", "abfss", "o3fs", "ofs", "s3a", ""))
      assert(!CommitLog.renameSafeScheme(fsWithScheme(s)), s)
  }

  test("a beat queued before release never touches the successor's lock") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val lock = new Path(ds.root, "_graft/branch.lock")
    // successor holds the lock with a deliberately OLD mtime (stealable)
    assert(CommitLog.tryCreateExclusive(f, lock, "successor"))
    val old = System.currentTimeMillis() - 60000L
    f.setTimes(lock, old, -1L)
    // the previous holder's released flag is set (release ran): its
    // queued beat must NOT stamp the successor's lock with fresh time
    val released = new java.util.concurrent.atomic.AtomicBoolean(true)
    CommitLog.beatOnce(f, lock, "successor", released)
    assert(f.getFileStatus(lock).getModificationTime === old,
      "post-release beat refreshed the successor's lease")
    // an un-released holder whose lock was STOLEN (token no longer its
    // own) must not stamp the successor's lock either: perpetual foreign
    // beats would make the successor's lock unstealable after a crash
    released.set(false)
    CommitLog.beatOnce(f, lock, "displaced-holder", released)
    assert(f.getFileStatus(lock).getModificationTime === old,
      "a displaced holder's beat refreshed the successor's lease")
    // sanity: the un-released OWNER's beat does touch
    CommitLog.beatOnce(f, lock, "successor", released)
    assert(f.getFileStatus(lock).getModificationTime > old)
    f.delete(lock, false)
  }

  test("heartbeat IO pool is bounded: saturation skips beats, no pile-up") {
    val cap = CommitLog.HeartbeatIoMaxThreads
    assert(CommitLog.heartbeatIoExec.getMaximumPoolSize === cap)
    // wedge `cap` fake beats (a hanging store), then assert the next
    // dispatch REJECTS (the tick's catch skips the beat) instead of
    // growing the pool
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(cap)
    try {
      (0 until cap).foreach { _ =>
        CommitLog.heartbeatIoExec.execute { () =>
          started.countDown()
          gate.await(10, java.util.concurrent.TimeUnit.SECONDS); ()
        }
      }
      assert(started.await(10, java.util.concurrent.TimeUnit.SECONDS))
      intercept[java.util.concurrent.RejectedExecutionException] {
        CommitLog.heartbeatIoExec.execute(() => ())
      }
      assert(CommitLog.heartbeatIoExec.getPoolSize <= cap)
    } finally gate.countDown()
  }

  test("strict store conf names the contract (file:// passes it)") {
    val ds = freshTable()
    spark.conf.set("spark.graft.branchLockStrictStore", "true")
    try {
      // file:// IS in the atomic-create contract: strict mode still works
      CommitLog.withBranchLock(spark, ds.root) { () }
    } finally spark.conf.unset("spark.graft.branchLockStrictStore")
  }
}
