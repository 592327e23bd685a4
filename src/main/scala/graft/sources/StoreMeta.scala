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
  * key whose stored value differs from the current config (missing keys
  * in an older sidecar are tolerated — parameters added later validate
  * from the next bootstrap on).
  */
object StoreMeta {

  /** JVM-local count of sidecar FILE READS — spec instrumentation pinning
    * the once-per-stream validation discipline (a 3-micro-batch stream
    * must read the sidecar exactly once). */
  val metaReads = new java.util.concurrent.atomic.LongAdder

  private def metaFile(basePath: String) = new Path(basePath, ".schema/storeMeta.json")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def write(basePath: String, params: Map[String, String])
           (implicit ctx: ActionPipelineContext): Unit = {
    val f = metaFile(basePath)
    val fs = f.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
    val node = mapper.createObjectNode()
    params.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    // write-temp-then-rename: an in-place overwrite crashed between create
    // and close leaves a 0-byte sidecar that wedges every later run with
    // an opaque JSON parse error instead of a clean validation message
    val tmp = new Path(f.getParent, s".${f.getName}.tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    if (fs.exists(f)) fs.delete(f, false)
    require(fs.rename(tmp, f),
      s"StoreMeta: could not move $tmp to $f — sidecar left unwritten, retry the run")
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
    * would never (or wrongly) match the store's signatures. Keys present
    * only on one side are tolerated (older sidecars validate the
    * parameters they know). `owner` names the transformer for the
    * message. */
  def validateParams(stored: Map[String, String], current: Map[String, String],
                     owner: String, basePath: String): Unit = {
    val drift = stored.toSeq.sorted.collect {
      case (k, v) if current.contains(k) && current(k) != v => (k, v, current(k))
    }
    require(drift.isEmpty,
      s"$owner: store at '$basePath' was created with " +
        drift.map { case (k, v, c) => s"$k=$v (this run: $k=$c)" }.mkString(", ") +
        " — deltas signed with the current parameters would silently never match " +
        "the store; align the configuration with the store (or rebuild the store)")
  }
}
