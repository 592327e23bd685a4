package graft

import graft.core._
import graft.operators._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-process single-writer enforcement for signature stores
  * ([[StoreMeta.withLease]]): the JVM-local merge lock cannot see a second
  * pipeline process, so the staged-append commit window (sidecar merge +
  * marker + file moves) runs under a create-exclusive lease file with TTL
  * — a concurrent committer waits briefly then fails LOUDLY, never
  * interleaves; a crashed holder's stale lease is taken over. */
class StoreLeaseSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ctx(): ActionPipelineContext = ActionPipelineContext(spark, new InstanceRegistry)

  test("a second committer blocks on a held lease and fails loudly past the wait budget") {
    implicit val c: ActionPipelineContext = ctx()
    val dir = java.nio.file.Files.createTempDirectory("lease_held").toString
    System.setProperty("graft.store.lease.waitMs", "400")
    try {
      val inBody = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => StoreMeta.withLease(dir, "writerA") {
        inBody.countDown(); release.await()
      })
      holder.start()
      assert(inBody.await(10, java.util.concurrent.TimeUnit.SECONDS))
      // second "process": must NOT enter while A holds the lease; past the
      // wait budget it fails with the loud single-writer message
      val e = intercept[IllegalStateException] {
        StoreMeta.withLease(dir, "writerB") { fail("B must not enter while A holds the lease") }
      }
      assert(e.getMessage.contains("another writer"), e.getMessage)
      release.countDown(); holder.join(10000)
      // with A released, B acquires immediately
      var entered = false
      StoreMeta.withLease(dir, "writerB") { entered = true }
      assert(entered)
    } finally System.clearProperty("graft.store.lease.waitMs")
  }

  test("a crashed holder's stale lease is taken over after the TTL; a live one is respected") {
    implicit val c: ActionPipelineContext = ctx()
    val dir = java.nio.file.Files.createTempDirectory("lease_stale").toString
    // the lease is a SIBLING of the data dir (the swap path deletes the
    // data dir wholesale — an in-dir lease would die mid-hold)
    val leaseFile = new java.io.File(dir + "_graft_lease")
    java.nio.file.Files.writeString(leaseFile.toPath, "crashed-writer deadbeef")
    // fresh lease + tiny wait: the newcomer must FAIL (holder presumed live)
    System.setProperty("graft.store.lease.waitMs", "300")
    try {
      intercept[IllegalStateException] { StoreMeta.withLease(dir, "writerB") { () } }
      // age the lease past the TTL: presumed crashed — taken over loudly
      assert(leaseFile.setLastModified(System.currentTimeMillis() - 11 * 60 * 1000L))
      var entered = false
      StoreMeta.withLease(dir, "writerB") { entered = true }
      assert(entered, "stale lease must be taken over")
      assert(!leaseFile.exists, "takeover holder must release its own lease")
    } finally System.clearProperty("graft.store.lease.waitMs")
  }

  test("the release is nonce-guarded: an overrunning holder never deletes a successor's lease") {
    implicit val c: ActionPipelineContext = ctx()
    val dir = java.nio.file.Files.createTempDirectory("lease_nonce").toString
    val leaseFile = new java.io.File(dir + "_graft_lease")
    StoreMeta.withLease(dir, "writerA") {
      // simulate a stale takeover replacing OUR lease mid-body (we overran
      // the TTL): the successor's lease must survive our release
      java.nio.file.Files.writeString(leaseFile.toPath, "writerB successor-nonce")
    }
    assert(leaseFile.exists, "A's release must not delete B's lease")
    assert(java.nio.file.Files.readString(leaseFile.toPath).startsWith("writerB"))
    leaseFile.delete()
  }

  test("staged-append commits run under the lease: foreign holder refused loudly, clean path unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("lease_commit").toString
    // two "processes" (own contexts — pendingStoreMetaUpdates is
    // per-context state) committing one after another: the lease must not
    // perturb the normal path, and both sidecar merges must apply
    (1 to 2).foreach { i =>
      implicit val c: ActionPipelineContext = ctx()
      val store = ParquetFileDataObject(s"store$i", s"$dir/store")
      c.pendingStoreMetaUpdates(s"store$i") = Map(s"commit$i" -> "done")
      store.writeDataFrameStagedAppend(Seq((i.toLong, s"delta$i")).toDF("id", "payload"))
    }
    implicit val c: ActionPipelineContext = ctx()
    assert(spark.read.parquet(s"$dir/store").select("id").as[Long].collect().toSet ==
      Set(1L, 2L), "both increments must land")
    val meta = StoreMeta.read(s"$dir/store").get
    assert(meta.get("commit1").contains("done") && meta.get("commit2").contains("done"),
      s"both sidecar merges must apply, got $meta")
    assert(!new java.io.File(s"$dir/store_graft_lease").exists,
      "lease must be released after both commits")
    // a FOREIGN process mid-commit (fresh live lease on the store): a
    // third committer's commit window must be refused loudly — never
    // interleaved — and the store left exactly as committed
    val leaseFile = new java.io.File(s"$dir/store_graft_lease")
    java.nio.file.Files.writeString(leaseFile.toPath, "other-process foreign-nonce")
    System.setProperty("graft.store.lease.waitMs", "300")
    try {
      val e = intercept[IllegalStateException] {
        ParquetFileDataObject("store3", s"$dir/store")
          .writeDataFrameStagedAppend(Seq((3L, "delta3")).toDF("id", "payload"))
      }
      assert(e.getMessage.contains("another writer"), e.getMessage)
      assert(spark.read.parquet(s"$dir/store").select("id").as[Long].collect().toSet ==
        Set(1L, 2L), "the refused commit must not have moved any files in")
    } finally {
      System.clearProperty("graft.store.lease.waitMs")
      leaseFile.delete()
    }
  }

  test("staged-overwrite swaps run under the lease; the sibling lease survives the swap") {
    implicit val c: ActionPipelineContext = ctx()
    val dir = java.nio.file.Files.createTempDirectory("lease_swap").toString
    val store = ParquetFileDataObject("sw", s"$dir/store")
    store.writeDataFrame(Seq((1L, "a")).toDF("id", "payload"))
    def ids(): Set[Long] = spark.read.parquet(s"$dir/store").select("id").as[Long].collect().toSet
    // a FOREIGN live lease refuses the swap loudly and leaves the data
    // untouched (the overwrite path deletes the data dir wholesale — an
    // interleaved swap is total silent loss, the worst case of the class)
    val leaseFile = new java.io.File(s"$dir/store_graft_lease")
    java.nio.file.Files.writeString(leaseFile.toPath, "other-process foreign-nonce")
    System.setProperty("graft.store.lease.waitMs", "300")
    try {
      val e = intercept[IllegalStateException] {
        store.writeDataFrameStaged(Seq((2L, "b")).toDF("id", "payload"))
      }
      assert(e.getMessage.contains("another writer"), e.getMessage)
      assert(ids() == Set(1L), "the refused swap must not have touched the store")
    } finally {
      System.clearProperty("graft.store.lease.waitMs")
      leaseFile.delete()
    }
    // clean path: the swap replaces the state and releases the lease —
    // which it can only do because the lease lives BESIDE the data dir
    // the swap deletes
    store.writeDataFrameStaged(Seq((2L, "b")).toDF("id", "payload"))
    assert(ids() == Set(2L))
    assert(!leaseFile.exists, "lease must be released after the swap")
  }
}
