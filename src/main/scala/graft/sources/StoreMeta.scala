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
