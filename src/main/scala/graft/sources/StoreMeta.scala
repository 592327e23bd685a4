package graft.sources

import graft.core.ActionPipelineContext
import org.apache.hadoop.fs.Path

/** Signature-store metadata sidecar: the signing parameters a
  * fingerprint/signature store was created with, persisted as
  * `.schema/storeMeta.json` next to the store's data (the same sidecar
  * directory as [[SchemaUtil.persistSchema]]'s `currentSchema.json` —
  * the reference persists per-DataObject metadata the same way,
  * `sdl-core/.../SparkFileDataObject.scala:114-170`).
  *
  * Why a sidecar and not a data probe: appending deltas signed with
  * different parameters to a store SILENTLY never matches — dedup quietly
  * stops deduplicating, the worst failure mode of the family. A
  * `limit(1)` data probe (the r15 guard) costs one read PER MICRO-BATCH,
  * can only see one row (a store that was ever mixed passes while part of
  * it never matches), and cannot detect a minhash↔oph scheme swap at the
  * same width at all — the VALUES are indistinguishable. The sidecar
  * records intent at creation, is validated once per transformer instance
  * (cached across micro-batches: a stream validates on its first batch
  * only), and catches every parameter drift loudly, including same-width
  * scheme swaps.
  *
  * Format: one flat JSON object of string key/values, e.g.
  * `{"scheme":"minhash","numHashes":"32","shingleSize":"5"}`. Writers put
  * every parameter that changes signature VALUES; readers fail on any
  * key whose stored value differs from the current config. A key MISSING
  * from an older sidecar is tolerated only while the current value equals
  * the parameter's DEFAULT — a pre-upgrade store was necessarily written
  * at the default, so a non-default current value IS drift (flipping
  * `storePartitions` on a legacy store would otherwise schema-evolve a
  * NULL `store_pfx` column into it and silently break prefix pruning);
  * after validation the sidecar is rewritten with the merged keys so
  * later flips are caught as ordinary both-present drift.
  *
  * The sidecar also carries the APPLIED-BATCH fingerprints
  * (`lastBatchCount` / `lastBatchChecksum` for the newest batch plus the
  * bounded `recentBatchFingerprints` ring, written by the staged-append
  * commit path via [[ActionPipelineContext.pendingStoreMetaUpdates]]) —
  * the rerun-after-commit guard's state. These keys are store STATE, not
  * signing parameters; [[validateParams]] ignores them (they appear only
  * on the stored side).
  *
  * WRITER CONTRACT: one writer per store at a time. Within the JVM that
  * is enforced — [[merge]]'s read-modify-write serializes on a per-path
  * lock, so two actions committing against one store both apply their
  * updates instead of silently losing one. ACROSS processes the contract
  * is by design (the DAG gives each store one committing action); the
  * tmp-reclaim below is age-gated so a concurrent process's in-flight
  * tmp file is not deleted mid-write by our housekeeping.
  */
object StoreMeta {

  /** JVM-local count of sidecar FILE READS — spec instrumentation pinning
    * the once-per-stream validation discipline (a 3-micro-batch stream
    * must read the sidecar exactly once). */
  val metaReads = new java.util.concurrent.atomic.LongAdder

  private def metaFile(basePath: String) = new Path(basePath, ".schema/storeMeta.json")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** tmp files younger than this are presumed in-flight and never reclaimed */
  private val tmpReclaimAgeMs = 10 * 60 * 1000L

  /** per-store-path merge locks (JVM-local, interned so every caller of
    * one path synchronizes on the same object) */
  private val mergeLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  // ------------------------------------------------------------ writer lease
  // Cross-PROCESS enforcement of the single-writer store contract: the
  // JVM-local merge lock cannot see a second pipeline process, and at
  // 100 TB with multiple pipelines an accidental second writer is a when,
  // not an if — two staged-append commits interleaving against one store
  // corrupt silently (both fingerprint rings half-applied, both deltas
  // moved into one file set). A create-EXCLUSIVE lease file with TTL next
  // to the sidecar turns the documented contract into an enforced one:
  // the commit window (staged-append moves + sidecar merge) runs under
  // the lease; a second committer WAITS briefly, then fails LOUDLY —
  // never interleaves. A crashed holder's lease goes stale after the TTL
  // and is taken over with a loud log line.

  /** lease considered stale (holder crashed) after this; the lease is
    * taken AFTER the long staged Spark write, so the TTL only needs to
    * cover the commit window (sidecar merge + marker + file moves) */
  private def leaseTtlMs: Long =
    sys.props.get("graft.store.lease.ttlMs").map(_.toLong).getOrElse(10 * 60 * 1000L)
  /** how long a second committer waits for the lease before failing */
  private def leaseWaitMs: Long =
    sys.props.get("graft.store.lease.waitMs").map(_.toLong).getOrElse(30 * 1000L)

  /** SIBLING of the data dir (the `_graft_staging` pattern), NOT inside
    * it: the staged-overwrite swap deletes the data dir wholesale — a
    * lease stored inside would be destroyed by the very window it
    * protects, and a concurrent committer would acquire a "fresh" lease
    * mid-swap. */
  private def leaseFile(basePath: String) = new Path(basePath.stripSuffix("/") + "_graft_lease")

  /** Run `body` holding the store's writer lease. Reentrant per JVM via
    * the interned path lock is NOT provided — callers hold it once per
    * commit (the DAG serializes same-store actions). `holder` names the
    * acquirer in logs and in the lease content. */
  def withLease[T](basePath: String, holder: String)
                  (body: => T)(implicit ctx: ActionPipelineContext): T = {
    val f = leaseFile(basePath)
    val fs = f.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
    val nonce = java.util.UUID.randomUUID().toString
    val content = s"$holder $nonce".getBytes("UTF-8")
    fs.mkdirs(f.getParent)
    val deadline = System.currentTimeMillis() + leaseWaitMs
    var acquired = false
    while (!acquired) {
      try {
        // overwrite=false = atomic create-exclusive on HDFS/S3A-with-
        // conditional-puts; on the local FS it is check-then-create, which
        // still catches every non-pathological overlap (and the JVM-local
        // merge lock covers in-process races)
        val out = fs.create(f, false)
        try out.write(content) finally out.close()
        acquired = true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException |
             _: org.apache.hadoop.fs.PathExistsException =>
          val ageMs = try System.currentTimeMillis() - fs.getFileStatus(f).getModificationTime
                      catch { case _: java.io.FileNotFoundException => -1L } // released between create and stat — retry now
          if (ageMs > leaseTtlMs) {
            val prev = try {
              val in = fs.open(f)
              try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
            } catch { case scala.util.control.NonFatal(_) => "<unreadable>" }
            System.err.println(s"[graft] StoreMeta: TAKING OVER stale writer lease on " +
              s"'$basePath' (held by '$prev', age ${ageMs / 1000}s > TTL ${leaseTtlMs / 1000}s) " +
              "— the previous holder is presumed crashed; if it is alive, the single-writer " +
              "contract is being violated")
            fs.delete(f, false) // next loop races the create-exclusive fairly
          } else if (ageMs >= 0 && System.currentTimeMillis() >= deadline) {
            throw new IllegalStateException(
              s"StoreMeta: store '$basePath' is being committed by another writer " +
                s"(lease age ${ageMs / 1000}s, waited ${leaseWaitMs / 1000}s) — a store has ONE " +
                "committing action; a concurrent commit would interleave staged-append moves " +
                "and sidecar merges silently. Serialize the pipelines, or remove " +
                s"$f if the holder is known dead")
          } else Thread.sleep(100)
      }
    }
    try body
    finally {
      // release only OUR lease: a stale takeover may have replaced it while
      // we overran the TTL — deleting the newcomer's lease would let a
      // third writer in on top of the second
      val ours = try {
        val in = fs.open(f)
        (try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close())
          .contains(nonce)
      } catch { case scala.util.control.NonFatal(_) => false }
      if (ours) try fs.delete(f, false) catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  def write(basePath: String, params: Map[String, String])
           (implicit ctx: ActionPipelineContext): Unit = {
    val f = metaFile(basePath)
    val fs = f.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
    val node = mapper.createObjectNode()
    params.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    // write-temp-then-RENAME-OVER: an in-place overwrite crashed between
    // create and close leaves a 0-byte sidecar that wedges every later run
    // with an opaque JSON parse error, and a delete-then-rename crashed
    // between the two leaves NO sidecar at all — the next run would then
    // silently re-bootstrap from the CURRENT (possibly drifted) config,
    // the exact failure the sidecar guards. FileContext's Rename.OVERWRITE
    // replaces the destination atomically where the FS supports it; only
    // when FileContext is unavailable for the scheme do we fall back to
    // the delete+rename window.
    // reclaim tmp residue of CRASHED writers only: age-gated (the
    // staged-append reclaim discipline) so a concurrent writer's
    // in-flight tmp — a violation of the single-writer contract, but one
    // that must degrade to a lost race, not a corrupted write — is never
    // deleted mid-write
    if (fs.exists(f.getParent))
      fs.listStatus(f.getParent)
        .filter(_.getPath.getName.startsWith(s".${f.getName}.tmp_"))
        .filter(_.getModificationTime < System.currentTimeMillis() - tmpReclaimAgeMs)
        .foreach(s => fs.delete(s.getPath, false))
    val tmp = new Path(f.getParent, s".${f.getName}.tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(f.toUri,
        ctx.spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, f, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(f)) fs.delete(f, false)
        require(fs.rename(tmp, f),
          s"StoreMeta: could not move $tmp to $f — sidecar left unwritten, retry the run")
    }
  }

  /** merge `updates` into an existing (or absent) sidecar — the
    * staged-append commit path records the applied batch fingerprint this
    * way without clobbering the signing parameters written at bootstrap.
    * The read-modify-write is SERIALIZED per store path (JVM-local lock):
    * today the DAG gives each store a single commit point, but a future
    * second in-process writer must not silently lose the race — with the
    * lock, concurrent merges both apply. */
  def merge(basePath: String, updates: Map[String, String])
           (implicit ctx: ActionPipelineContext): Unit =
    mergeLocks.computeIfAbsent(basePath, _ => new Object).synchronized {
      write(basePath, read(basePath).getOrElse(Map.empty) ++ updates)
    }

  def read(basePath: String)(implicit ctx: ActionPipelineContext): Option[Map[String, String]] = {
    val f = metaFile(basePath)
    val fs = f.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(f)) None
    else {
      metaReads.increment()
      val in = fs.open(f)
      val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
                 finally in.close()
      val node = mapper.readTree(text)
      val b = Map.newBuilder[String, String]
      node.fields().forEachRemaining(e => b += (e.getKey -> e.getValue.asText))
      Some(b.result())
    }
  }

  /** Fail loudly on ANY persisted key whose value differs from the
    * current configuration — a delta signed with the current parameters
    * would never (or wrongly) match the store's signatures. A current key
    * MISSING from the sidecar is drift too when its value differs from
    * the parameter's registered default (`defaults`): a pre-upgrade store
    * was written at the default, so a non-default current value means the
    * delta layout no longer matches the store's (the silent failure:
    * flipping `storePartitions` on a legacy store NULL-schema-evolves
    * `store_pfx` and pruning would drop every legacy row). Keys present
    * only in `stored` are ignored (older parameters, plus the
    * lastBatch* state keys). `owner` names the transformer for the
    * message. */
  def validateParams(stored: Map[String, String], current: Map[String, String],
                     owner: String, basePath: String,
                     defaults: Map[String, String] = Map.empty): Unit = {
    val drift = stored.toSeq.sorted.collect {
      case (k, v) if current.contains(k) && current(k) != v => (k, v, current(k))
    }
    require(drift.isEmpty,
      s"$owner: store at '$basePath' was created with " +
        drift.map { case (k, v, c) => s"$k=$v (this run: $k=$c)" }.mkString(", ") +
        " — deltas signed with the current parameters would silently never match " +
        "the store; align the configuration with the store (or rebuild the store)")
    val upgraded = current.toSeq.sorted.collect {
      case (k, c) if !stored.contains(k) && defaults.get(k).exists(_ != c) => (k, defaults(k), c)
    }
    require(upgraded.isEmpty,
      s"$owner: store at '$basePath' predates parameter" +
        s"${if (upgraded.size > 1) "s" else ""} " +
        upgraded.map { case (k, d, c) => s"$k (store: default $d, this run: $c)" }.mkString(", ") +
        " — the store was written at the default, so deltas produced with the current " +
        "value would silently never match it; keep the default for this store (or " +
        "rebuild the store with the new layout)")
  }
}
