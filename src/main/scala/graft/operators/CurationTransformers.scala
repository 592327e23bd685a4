package graft.operators

import graft.core._
import graft.functions.{Dedup, Sampling, TemporalJoins, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-surface transformers for the training-data curation operators, so
  * a declarative pipeline (HOCON/YAML) can run near-dedup, sessionization,
  * deterministic sampling, repetition scoring and PII scrubbing the same
  * way it runs the reference's transformers. Thin wrappers — the scale
  * design lives in `graft.functions.*`.
  */

/** Remove near-duplicate documents, keeping the smallest id per duplicate
  * cluster. `method`: exact | minhash | simhash. The corpus loses only
  * non-canonical cluster members (left_anti on the drop set). The drop set
  * is DUPLICATE-VOLUME-sized — tiny on clean corpora, but a large fraction
  * of a boilerplate-heavy web corpus — so the anti-join carries NO
  * broadcast hint: AQE broadcasts it when it fits under the threshold and
  * falls back to shuffle when it doesn't (r13 VERDICT #1; forcing it would
  * hit the 8 GB broadcast cap precisely when dedup matters most). */
case class NearDedupTransformer(
    idColumn: String, textColumn: String,
    method: String = "minhash", threshold: Double = 0.7,
    shingleSize: Int = 5, numHashes: Int = 32, bands: Int = 8,
    maxHamming: Int = 3) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame = {
    // Init phase propagates SCHEMAS only, and dedup never changes the
    // schema — return the input untouched so the DAG's init runs zero
    // Spark jobs (duplicateClusters' size probe would otherwise execute
    // the whole pair pipeline once in init and again at exec: at 100 TB
    // that doubles the most expensive stage of the run).
    if (ctx.phase == ExecutionPhase.Init) return df
    val drop = method match {
      case "exact" =>
        // exact dupes are already canonical stars (every member points at
        // the min-id head), so their "clustering" is the identity — the
        // drop set is simply every id that isn't its group's canonical id.
        // No union-find needed (r13 VERDICT #2: feeding stars through
        // duplicateClusters paid the symmetrize-persist-probe machinery
        // for a no-op — one whole job per run at corpus scale).
        val canon = Dedup.exactDedup(df, idColumn, textColumn)
        // persisted: the drop set's lineage contains df, and df is also
        // the anti-join's left side below — on a multi-source UNION input
        // Catalyst's anti-join-through-Union pushdown would otherwise
        // replicate this whole subtree into every branch (the q133
        // plan-explosion mechanism, SCALE.md round-14). Slim id-only
        // rows, disk-spillable — scale-legal at any duplicate volume.
        val dropSet = df
          .select(Dedup.contentHash(col(textColumn)).as("text_hash"), col(idColumn).as(idColumn))
          .join(canon.where(col("n_copies") > 1), Seq("text_hash"))
          .where(col(idColumn) =!= col("canonical_id"))
          .select(col(idColumn))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // lifecycle handed to the DAG (run-end sweep of persistedFrames):
        // without it a long-lived session running many pipeline executions
        // grows the cache registry monotonically (slow spillable leak)
        ctx.persistedFrames(s"__graft_neardedup_drop_${System.identityHashCode(dropSet)}") = dropSet
        dropSet
      case "minhash" | "simhash" =>
        val pairs =
          if (method == "minhash") Dedup.minhashDuplicatePairs(df, idColumn, textColumn,
            shingleSize, numHashes, bands, threshold).select("id_a", "id_b")
          else Dedup.simhashNearDupPairs(df, idColumn, textColumn,
            shingleSize, maxHamming).select("id_a", "id_b")
        Dedup.duplicateClusters(pairs)
          .where(col("id") =!= col("cluster_id"))
          .select(col("id").as(idColumn))
      case m => throw new IllegalArgumentException(s"NearDedupTransformer: unknown method '$m'")
    }
    df.join(drop, Seq(idColumn), "left_anti")
  }
}

/** Append `session_id` per key from timestamp gaps. */
case class SessionizeTransformer(
    keyColumns: Seq[String], tsColumn: String,
    maxGapSeconds: Long = 1800) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame =
    TemporalJoins.sessionize(df, keyColumns, tsColumn, maxGapSeconds)
}

/** Deterministic (md5-keyed, partitioning-independent) sampling; with
  * `stratumColumn` + `rates` it applies per-stratum domain-mixing rates. */
case class DeterministicSampleTransformer(
    keyColumn: String, rate: Double = 1.0,
    stratumColumn: Option[String] = None,
    rates: Map[String, Double] = Map.empty,
    defaultRate: Double = 0.0) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame =
    stratumColumn match {
      case Some(s) => Sampling.stratifiedSample(df, col(keyColumn),
        col(s).cast("string"), rates, defaultRate)
      case None => Sampling.sampleByKey(df, col(keyColumn), rate)
    }
}

/** Append text-quality signal columns: token stats, quality score,
  * repetition fractions (up to `repetitionMaxN`). */
case class TextQualityTransformer(
    textColumn: String, repetitionMaxN: Int = 3) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame = {
    val scored = df
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textColumn)))
      .withColumn("quality_score", TextAnalysis.qualityScore(col(textColumn)))
    if (repetitionMaxN >= 1)
      TextAnalysis.withRepetitionSignals(scored, textColumn, repetitionMaxN)
    else scored
  }
}

/** Redact emails/phones/IPv4 in place (standard pre-training PII pass). */
case class PiiRedactTransformer(textColumn: String) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame =
    df.withColumn(textColumn, TextAnalysis.redactPII(col(textColumn)))
}

/** Shared contract of the store-backed incremental transformers: per run
  * they consume `batchInput` (+ the store's current state under
  * `storeInput` as a recursive input), emit the batch's SURVIVING rows
  * under [[novelKey]] (dedup family: the store-novel rows; scrubbing
  * family — span/line removal: every row, text cleaned in place) and a
  * store DELTA under `storeInput` — never the grown store (dedup: the
  * novel rows' signatures; scrubbing: the batch's partial
  * window/line counts, summed per key at read time). Wire the enclosing
  * action with `saveMode = Append` (enforced by [[CustomDataFrameAction]])
  * so the store GROWS by appending the delta: per-run store I/O is
  * O(increment); the old `unionByName` full-rewrite shape was O(store) per
  * batch — quadratic cumulative I/O under continuous ingestion.
  *
  * RERUN CONTRACT (batch path): a run whose store append COMMITTED (the
  * staged-append marker exists; crash-mid-move recovery completes the
  * moves) must NOT be re-executed with the same batch — the batch's state
  * is already in the store, so a dedup rerun classifies the whole batch
  * as duplicate and overwrites the novel output empty, and a count-store
  * rerun (span/line scrubbing) APPENDS the batch's counts a second time,
  * over-scrubbing later batches. At-least-once sources belong on
  * [[StreamingIncrementalDedupAction]]: its batchId-keyed dynamic
  * partition overwrite makes re-delivery of the same batchId idempotent
  * for both output and store (replay-spec'd). */
trait IncrementalStoreDfsTransformer extends DfsTransformer {
  def batchInput: String
  def storeInput: String
  def novelOutput: Option[String]
  final def novelKey: String = novelOutput.getOrElse(batchInput)
  /** Within-batch dedup (the reference contract: DeduplicateAction dedups
    * WITHIN the load before merging against existing state,
    * `sdl-core/.../DeduplicateAction.scala:214-219`): a real ingestion
    * feed bursts duplicates inside one micro-batch, and without this BOTH
    * copies pass the store join (neither is stored yet) — both reach the
    * output and both signatures enter the store. Implementation: the same
    * pair machinery SELF-joined on the batch's already-persisted
    * signature frame (zero extra decodes/signings), keeping the head =
    * the duplicate pair's smaller id under the id column's natural
    * ordering — only the head's signature is appended to the store. */
  def intraBatch: Boolean
  /** drop-ids from a self-pair frame: every id that duplicates a
    * SMALLER-id batch sibling (the head survives; in a duplicate chain
    * the minimum id is always kept) */
  protected final def intraDropIds(selfPairs: DataFrame, idColumn: String): DataFrame =
    selfPairs.where(col("id_new") > col("id_corpus"))
      .select(col("id_new").as(idColumn))

  /** The signing parameters that determine signature VALUES — persisted
    * to the store's `.schema/storeMeta.json` sidecar at bootstrap and
    * validated against it on every later run ([[graft.sources.StoreMeta]]):
    * appending deltas signed with drifted parameters would SILENTLY never
    * match the store (dedup quietly stops deduplicating). */
  protected def storeMetaParams: Map[String, String]
  /** the DEFAULT value of each [[storeMetaParams]] key — what a store
    * written BEFORE a parameter existed was necessarily created with, so
    * a sidecar missing the key validates against it: without this,
    * flipping a later-added layout knob (e.g. `storePartitions`) over a
    * legacy store passes validation, schema-evolves a NULL `store_pfx`
    * column into the store, and prefix pruning silently drops every
    * legacy row from the history join */
  protected def storeMetaDefaults: Map[String, String]
  /** Permit re-running a batch whose store append already COMMITTED —
    * intentional re-ingestion only: the rerun classifies the whole batch
    * as already-stored (dedup family: novel output comes out EMPTY) or
    * double-counts it (span/line count stores: later batches
    * over-scrubbed). Default false = [[guardBatchRerun]] fails loudly on
    * any of the last [[rerunGuardRingSize]] applied batches (older ones
    * fall off the ring — a rerun from beyond that horizon is not
    * detected). true disables the guard for EVERY batch of this
    * transformer, permanently — prefer fixing the orchestration. */
  def allowRerun: Boolean = false
  /** set by [[StreamingIncrementalDedupAction]]: its sinks are batchId-
    * keyed dynamic partition OVERWRITES, so a replayed micro-batch is
    * idempotent by construction and the batch-path rerun guard (plus its
    * per-batch fingerprint job) must not run there */
  @transient private[operators] var skipRerunGuard: Boolean = false
  /** OPTIONAL batch-keyed novel sink — closes the documented novel-rows
    * re-append window (a run failing between the novel write and the
    * store append re-appends the same novel rows on its guard-permitted
    * rerun): when BOTH are set, the novel/clean output carries
    * `novelBatchKeyColumn = novelBatchKeyValue` as a literal column and
    * the enclosing [[CustomDataFrameAction]] writes that output with
    * DYNAMIC PARTITION OVERWRITE — the streaming action's layout
    * ([[StreamingIncrementalDedupAction]]), so the rerun overwrites its
    * own partition instead of duplicating it. Declare the column as the
    * novel DataObject's (leading) partition; validated at write. */
  def novelBatchKeyColumn: Option[String] = None
  /** the current batch's key value — caller-supplied and STABLE across a
    * rerun of the same batch (an ingestion date / feed batch id) */
  def novelBatchKeyValue: Option[String] = None
  /** batch key DERIVED by the enclosing action from its execution mode's
    * batch identity ([[graft.operators.modes.ExecutionMode.batchIdentity]]:
    * PartitionDiffMode's partition values, the incremental modes' state
    * tokens) — a config-only pipeline gets exactly-once novel output
    * without a custom driver loop stamping the key. Used only when
    * [[novelBatchKeyValue]] is not explicitly configured (an explicit key
    * always wins). Installed per run before transform; JVM-local. */
  @transient private[operators] var derivedNovelBatchKeyValue: Option[String] = None
  final def effectiveNovelBatchKeyValue: Option[String] =
    novelBatchKeyValue.orElse(derivedNovelBatchKeyValue)
  /** stamp the configured batch key onto a novel/clean output frame */
  protected final def keyNovel(df: DataFrame): DataFrame =
    (for { c <- novelBatchKeyColumn; v <- effectiveNovelBatchKeyValue }
      yield df.withColumn(c, lit(v))).getOrElse(df)

  /** The CONTENT column folded into the batch fingerprint's checksum, so
    * a legitimately new batch that reuses a previous batch's id set (a
    * re-keyed feed, content updates under stable keys) is distinguishable
    * from a rerun — an id-only checksum would refuse it, and the only
    * escape (allowRerun) permanently disables the guard. Each transformer
    * names its payload column (text / media bytes / embedding). */
  protected def fingerprintContentColumn: Option[String] = None
  /** fingerprints the guard remembers — a re-submitted batch N−K..N−1
    * after batch N committed must fail as loudly as N itself (the
    * reference's skip-completed protects ALL completed actions,
    * `sdl-core/.../app/SmartDataLakeBuilder.scala:377-396`); default 16
    * covers any sane retry horizon while keeping the sidecar bounded.
    * A RETRY HORIZON is operational policy, not a code constant — the
    * concrete transformers expose it as a constructor/HOCON knob. */
  def rerunGuardRingSize: Int = 16
  /** Machine-checked rerun-after-commit contract (the RERUN CONTRACT
    * above, enforced instead of documented): fingerprint the incoming
    * batch (row count + an order-independent xxhash64 checksum over the
    * id and content columns — one column-pruned, delta-bounded job) and
    * fail loudly when it matches ANY of the store sidecar's last
    * [[rerunGuardRingSize]] applied batches, because that batch's state
    * is already in the store. The fingerprint becomes durable WITH the
    * store append (registered as a pending sidecar update that
    * [[graft.sources.SparkFileDataObject.writeDataFrameStagedAppend]]
    * merges at its commit point), so a run that fails BEFORE the append
    * stays freely rerunnable — the reference makes recovery-reruns a
    * first-class mechanic (`sdl-core/.../app/SmartDataLakeBuilder
    * .scala:377-396` skips completed actions by state); this guard is the
    * equivalent for the store append's effects, which live outside the
    * run-state file.
    *
    * Sidecar keys: `recentBatchFingerprints` = newest-last
    * `count:checksum` entries, '|'-separated, bounded at the ring size;
    * `lastBatchCount`/`lastBatchChecksum` mirror the newest entry
    * (pre-ring sidecars carry ONLY those — they join the match set, and
    * their id-only checksum era is covered by matching the incoming
    * batch's id-only checksum too).
    *
    * SCOPE: the guard protects the STORE (the state that silently
    * corrupts). The NOVEL sink defaults to a plain Append that writes
    * BEFORE the store append — a run that fails between the two
    * re-appends the same novel rows on its (guard-permitted) rerun.
    * Exactly-once novel output needs an idempotent sink: key it by an
    * ingestion-batch partition (the streaming action's layout) or dedupe
    * downstream. */
  protected final def guardBatchRerun(batch: DataFrame, idColumn: String)
                                     (implicit ctx: ActionPipelineContext): Unit = {
    val (observed, obs) = observeForRerunGuard(batch, idColumn)
    // standalone (non-ride-along) form: force with a projection pruned to
    // the fingerprint columns — one column-pruned delta job, the pre-r20
    // guard cost
    checkBatchRerun(obs, observed
      .select((idColumn +: fingerprintContentColumn.toSeq).map(col): _*)
      .foreach(_ => ()))
  }

  /** The fingerprint aggregates, ride-along form (guide §1: one pass, two
    * outputs): attach them to the batch plan that feeds the signature /
    * fingerprint pass via `observe`, so they fill DURING that pass's
    * materialization and [[checkBatchRerun]] reads them without the
    * dedicated per-batch delta aggregate the r18 shape paid (~one
    * column-pruned batch scan per store batch — r19 VERDICT #5). Returns
    * the frame to build on plus the observation to hand to
    * [[checkBatchRerun]]; None (frame unchanged) whenever the guard would
    * not run — Init phase, streaming replay path, unresolvable store —
    * so those plans carry no CollectMetrics node.
    *
    * decimal(38,0) sums: order-independent, duplicate-sensitive, and
    * cannot overflow under ANSI mode (sum of 19-digit hashes needs
    * ~10^19 rows to reach 38 digits). BOTH checksums ride one
    * aggregate: the id+content one is the fingerprint going forward;
    * the id-only one matches entries a pre-content-era sidecar
    * recorded (which scheme a stored value used is not recorded, so
    * match either — a 64-bit-sum collision across schemes is noise). */
  protected final def observeForRerunGuard(batch: DataFrame, idColumn: String)
                                          (implicit ctx: ActionPipelineContext)
      : (DataFrame, Option[org.apache.spark.sql.Observation]) = {
    val active = ctx.phase == ExecutionPhase.Exec && !skipRerunGuard &&
      ctx.registry.dataObjectOption(storeInput)
        .exists(_.isInstanceOf[graft.sources.SparkFileDataObject])
    if (!active) (batch, None)
    else {
      def ckSum(c: Column) = coalesce(sum(c
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
        lit(java.math.BigDecimal.ZERO))
      val fullHash = fingerprintContentColumn match {
        case Some(cc) => xxhash64(col(idColumn), col(cc))
        case None => xxhash64(col(idColumn))
      }
      val obs = org.apache.spark.sql.Observation()
      (batch.observe(obs, count(lit(1)).as("_n"), ckSum(fullHash).as("_ck"),
        ckSum(xxhash64(col(idColumn))).as("_ckId")), Some(obs))
    }
  }

  /** Second half of the ride-along guard: read the observed fingerprint
    * and enforce the rerun contract. `force` must run an action over the
    * observed plan so get() cannot block forever — at call sites where an
    * earlier collect already materialized the persisted pass, the force is
    * a cache-hit scan of the delta-sized cache (milliseconds), and the
    * metrics come from the build's CollectMetrics accumulator (reported
    * through InMemoryTableScanExec — verified empirically, see
    * OPTIMIZATION_r20.md). */
  protected final def checkBatchRerun(obs: Option[org.apache.spark.sql.Observation],
                                      force: => Unit)
                                     (implicit ctx: ActionPipelineContext): Unit = obs.foreach { o =>
    force
    val m = o.get
    def big(v: Any): java.math.BigInteger = v match {
      case d: java.math.BigDecimal => d.toBigInteger
      case d: scala.math.BigDecimal => d.toBigInt.bigInteger
      case other => new java.math.BigInteger(other.toString)
    }
    applyRerunGuard(m("_n").asInstanceOf[Long].toString,
      big(m("_ck")).toString, big(m("_ckId")).toString)
  }

  private def applyRerunGuard(n: String, ck: String, ckId: String)
                             (implicit ctx: ActionPipelineContext): Unit =
    ctx.registry.dataObjectOption(storeInput) match {
      case Some(f: graft.sources.SparkFileDataObject) =>
        val stored = graft.sources.StoreMeta.read(f.path).getOrElse(Map.empty)
        // ring entry format: `count:checksum[:v2]` — the v2 tag marks an
        // entry KNOWN to carry the content-folded checksum. The id-only
        // fallback match applies only to entries NOT known to be v2
        // (pre-content-era sidecars, and r18's untagged content-era
        // entries, which are indistinguishable from them): against a
        // tagged entry, a same-ids-new-content batch — the exact case
        // fingerprintContentColumn exists to permit — is a fresh batch,
        // not a refused rerun.
        case class RingEntry(count: String, checksum: String, tagged: Boolean) {
          def render: String = s"$count:$checksum" + (if (tagged) ":v2" else "")
        }
        val ring = stored.get("recentBatchFingerprints").toSeq
          .flatMap(_.split('|')).filter(_.contains(':'))
          .map { e =>
            val parts = e.split(':')
            RingEntry(parts(0), parts(1), parts.length > 2 && parts(2) == "v2")
          }
        val legacy = for { c <- stored.get("lastBatchCount")
                           k <- stored.get("lastBatchChecksum") } yield RingEntry(c, k, tagged = false)
        val applied = (ring ++ legacy).distinct
        val hit = applied.exists(e => e.count == n &&
          (e.checksum == ck || (!e.tagged && e.checksum == ckId)))
        if (hit && !allowRerun) throw new IllegalStateException(
          s"${getClass.getSimpleName}: batch '$batchInput' ($n rows) matches a batch " +
            s"already applied to store '$storeInput' (last ${applied.size} remembered) — " +
            "its state is in the store, so re-running it would empty the novel output " +
            "(dedup stores) or double-count it (span/line count stores). A recovery rerun " +
            "should resume from the NEXT batch; for intentional re-ingestion set " +
            "allowRerun = true. At-least-once sources belong on " +
            "StreamingIncrementalDedupAction, whose batchId-keyed partition overwrite " +
            "makes replays idempotent")
        val entry = RingEntry(n, ck, tagged = true)
        val newRing = (ring.filterNot(e => e.count == n && e.checksum == ck)
          .map(_.render) :+ entry.render)
          .takeRight(rerunGuardRingSize)
        ctx.pendingStoreMetaUpdates(storeInput) = Map(
          "lastBatchCount" -> n, "lastBatchChecksum" -> ck,
          "recentBatchFingerprints" -> newRing.mkString("|"))
      case _ => ()
    }
  /** store paths whose sidecar this INSTANCE already validated — a
    * long-running stream validates on its first micro-batch only (one
    * sidecar read per stream, not one data probe per batch; the sidecar
    * cannot drift under us — this transformer is the store's only
    * writer). JVM-local like the rest of the per-instance state. */
  @transient private var metaValidatedFor: String = null
  /** Validate (or bootstrap) the store sidecar when the store DataObject
    * is resolvable through the registry. Returns true when sidecar-based
    * validation applies; false for standalone use (store frame passed
    * directly, no registered DataObject) — the caller then falls back to
    * its data-level probe. `legacyProbe` runs ONCE when a pre-sidecar
    * store (data, no meta) is first seen: a data-level check guards the
    * upgrade before the sidecar is written from the current config. */
  protected final def validateStoreMeta(legacyProbe: () => Unit)
                                       (implicit ctx: ActionPipelineContext): Boolean =
    ctx.registry.dataObjectOption(storeInput) match {
      case Some(f: graft.sources.SparkFileDataObject) =>
        if (ctx.phase == ExecutionPhase.Exec && metaValidatedFor != f.path) {
          graft.sources.StoreMeta.read(f.path) match {
            case Some(stored) =>
              graft.sources.StoreMeta.validateParams(stored, storeMetaParams,
                getClass.getSimpleName, f.path, storeMetaDefaults)
              // upgrade an older sidecar in place: validation just proved
              // the missing keys sit at their defaults, so record them —
              // a later flip is then ordinary both-present drift instead
              // of a defaults-table lookup
              val missing = storeMetaParams -- stored.keySet
              if (missing.nonEmpty)
                graft.sources.StoreMeta.write(f.path, stored ++ missing)
            case None =>
              if (f.exists) legacyProbe()
              graft.sources.StoreMeta.write(f.path, storeMetaParams)
          }
          metaValidatedFor = f.path
        }
        true
      case _ => false
    }
  /** Prefix-prune a store view for the pair join (the blocking-key-pruned
    * store layout, [[graft.functions.Dedup.storePrefix]]): keep only the
    * store rows whose `store_pfx` appears in the delta's own prefix set,
    * then drop the transport column. `deltaPrefixes` is evaluated ONLY
    * when pruning applies — it runs one bounded driver job (≤
    * `storePartitions` values, a config constant, never data-scaled) over
    * the already-persisted delta signatures; parquet partition pruning
    * then skips every store file outside the delta's buckets, making the
    * per-batch store READ O(store × |delta prefixes| / N) instead of
    * O(store). Tolerates a store frame WITHOUT the column (standalone use
    * with an unpartitioned frame, or the first-run bootstrap): pruning is
    * an I/O optimization, never a correctness requirement. NULL-prefix
    * rows are KEPT: a store that ever mixed layouts (legacy rows appended
    * before `store_pfx` existed read back NULL under schema merge) must
    * still join its whole history — dropping NULLs would silently forget
    * every pre-upgrade signature. The sidecar default-drift check makes
    * that mixture unreachable through this transformer; the null guard
    * covers standalone frames and hand-migrated stores. */
  protected final def pruneStoreByPrefix(store: DataFrame, storePartitions: Int,
                                         deltaPrefixes: => Seq[Long]): DataFrame =
    if (storePartitions > 0 && store.columns.contains("store_pfx"))
      store.where(col("store_pfx").isNull || col("store_pfx").isin(deltaPrefixes: _*))
        .drop("store_pfx")
    else store.drop("store_pfx")

  /** FUSED store+within-batch pair pass, corpus-side tagging half: wrap a
    * corpus frame's id as `struct(i = id, d = isDelta)` so ONE band/block/
    * bucket join over store ∪ delta covers both duplicate classes. The
    * pair functions treat ids opaquely (they only select, join-by-key and
    * dropDuplicates them), so the tag rides through to `id_corpus` where
    * [[fusedDropIds]] applies the drop rule. A second self-join per batch
    * was the bulk of the intra contract's measured overhead (two extra
    * shuffles + a distinct per micro-batch, r16's 1.27× A/B); fused, the
    * within-batch rows are just |delta| extra corpus input to the join
    * that already runs. Trade (documented): the over-cap bucket guard now
    * counts store and delta rows TOGETHER — a bucket that only tips over
    * combined is capped (exact-copy fallback still recovers exact
    * matches), which also guards a within-batch viral-boilerplate burst
    * the split passes could not see. */
  protected final def tagCorpus(df: DataFrame, delta: Boolean): DataFrame =
    df.withColumn("id", struct(col("id").as("i"), lit(delta).as("d")))
  /** fused drop rule over (id_new, id_corpus=struct(i,d), …) pairs: a
    * STORE pair (d=false) always drops the delta id; a DELTA-DELTA pair
    * drops the LARGER id (the min-id head survives — self-pairs fail the
    * strict inequality). Decision-set identical to the split
    * store-join ∪ intra-self-join shape. */
  protected final def fusedDropIds(pairs: DataFrame, idColumn: String): DataFrame =
    pairs.where(!col("id_corpus").getField("d") ||
        col("id_corpus").getField("i") < col("id_new"))
      .select(col("id_new").as(idColumn))

  /** persist an expensive per-batch intermediate and hand its lifecycle to
    * the DAG: [[graft.core.ActionDAGRun]] sweeps `ctx.persistedFrames` when
    * the run's last action settles, so the cache registry cannot grow
    * monotonically across runs/micro-batches (each batch's frame is
    * released at run end). The key is identity-unique — two incremental
    * actions in one DAG never evict each other's entry. */
  protected final def persistForRun(df: DataFrame, tag: String)
                                   (implicit ctx: ActionPipelineContext): DataFrame = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ctx.persistedFrames(s"__graft_inc_${tag}_${System.identityHashCode(cached)}") = cached
    cached
  }
}

/** Incremental near-dedup for continuous ingestion: drop new-batch docs
  * that near-duplicate the EXISTING corpus, by joining the batch against
  * the corpus signature STORE (`Dedup.minhashSignatures` output, persisted
  * between runs) — per-batch cost scales with the delta, never
  * corpus × corpus.
  *
  * DAG wiring with [[CustomDataFrameAction]]: `inputIds = Seq(batchInput)`,
  * `outputIds = Seq(novelOutput, storeInput)`,
  * `recursiveInputIds = Seq(storeInput)`, `saveMode = Some(Append)` — the
  * store is this action's own output read back each run, grown by a staged
  * APPEND of the delta this transformer emits (work scales with the
  * increment, the reference's merge-mode principle). On the FIRST run the
  * store doesn't exist yet; the transformer bootstraps from an empty
  * store, so the whole batch is novel and the store is created from its
  * signatures. `novelOutput` defaults to `batchInput` for standalone
  * (non-DAG) use where keying outputs by input name is fine.
  *
  * Decode-once: the batch is SIGNED exactly once per run — the signature
  * frame is persisted, feeds the pair join
  * ([[Dedup.minhashIncrementalPairsFromSigs]]) AND the store delta (a
  * semi-join against the novel ids), and is released by the DAG at run
  * end. */
case class IncrementalDedupTransformer(
    batchInput: String, storeInput: String,
    idColumn: String, textColumn: String,
    threshold: Double = 0.7, shingleSize: Int = 5,
    numHashes: Int = 32, bands: Int = 8,
    novelOutput: Option[String] = None,
    /** "minhash" (classic) | "oph" (one-permutation hashing, O(shingles+k)
      * per row — prefer at corpus scale). Signature VALUES differ between
      * schemes, so a store written with one NEVER matches deltas signed
      * with the other — pick once per store (the numHashes probe below
      * catches a width mismatch loudly; a scheme swap at the same width is
      * undetectable from data, hence the config-level discipline). */
    signatureScheme: String = "minhash",
    /** dedup WITHIN the batch too (keep the min-id head per duplicate
      * pair) — see [[IncrementalStoreDfsTransformer.intraBatch]] */
    intraBatch: Boolean = true,
    /** "compact" ((id, shingles, sig) rows, exact shingle-Jaccard
      * verification) | "banded" (one row per band bucket carrying the
      * signature, [[graft.functions.Dedup.minhashBandedStore]] —
      * verification by the signature-agreement ESTIMATE for BOTH store
      * and within-batch pairs (the fused pass uses the layout's one
      * verifier uniformly; exact copies estimate exactly 1.0), and the
      * only layout `storePartitions` can prune). Pick once per store
      * (sidecar-enforced). */
    storeLayout: String = "compact",
    /** > 0 (banded layout only): the store delta carries a `store_pfx`
      * partition column = pmod(xxhash64(band, bucket), storePartitions);
      * declare it on the store DataObject (`partitions = ["store_pfx"]`)
      * and the pair join reads only the store files in the delta's own
      * bucket set — the per-batch store READ stops scaling with the
      * store. */
    storePartitions: Int = 0,
    /** batch-keyed novel sink: column stamped onto the novel/clean
      * output, written with dynamic partition overwrite — see
      * [[IncrementalStoreDfsTransformer.novelBatchKeyColumn]] */
    override val novelBatchKeyColumn: Option[String] = None,
    override val novelBatchKeyValue: Option[String] = None,
    /** permit re-running a batch whose store append already committed —
      * see [[IncrementalStoreDfsTransformer.allowRerun]] */
    override val allowRerun: Boolean = false,
    /** retry horizon: applied-batch fingerprints the rerun guard remembers
      * — see [[IncrementalStoreDfsTransformer.rerunGuardRingSize]] */
    override val rerunGuardRingSize: Int = 16) extends IncrementalStoreDfsTransformer {
  override protected def fingerprintContentColumn: Option[String] = Some(textColumn)
  require(signatureScheme == "minhash" || signatureScheme == "oph",
    s"IncrementalDedupTransformer: unknown signatureScheme '$signatureScheme' (minhash|oph)")
  require(storeLayout == "compact" || storeLayout == "banded",
    s"IncrementalDedupTransformer: unknown storeLayout '$storeLayout' (compact|banded)")
  require(storePartitions == 0 || storeLayout == "banded",
    "IncrementalDedupTransformer: storePartitions requires storeLayout='banded' — compact " +
      "store rows participate in every band bucket, so no single partition key can prune them")
  private def sign(df: DataFrame): DataFrame =
    if (signatureScheme == "oph")
      Dedup.minhashSignaturesOph(df, idColumn, textColumn, shingleSize, numHashes)
    else Dedup.minhashSignatures(df, idColumn, textColumn, shingleSize, numHashes)
  /** a signature frame in the configured STORE layout (the store delta's
    * shape; for "banded" the `store_pfx` column rides along when
    * `storePartitions > 0`) */
  private def toStoreLayout(sigs: DataFrame): DataFrame =
    if (storeLayout == "banded")
      Dedup.minhashBandedStore(sigs, numHashes, bands, storePartitions)
    else sigs
  override protected def storeMetaParams: Map[String, String] = Map(
    "scheme" -> signatureScheme,
    "numHashes" -> numHashes.toString,
    "shingleSize" -> shingleSize.toString,
    "storeLayout" -> storeLayout,
    "storePartitions" -> storePartitions.toString) ++
    // banded rows BAKE the band decomposition into the stored (band,
    // bucket) values — a bands drift would silently never key-match. The
    // compact layout bands per batch, so bands stays a free knob there.
    (if (storeLayout == "banded") Map("bands" -> bands.toString) else Map.empty)
  override protected def storeMetaDefaults: Map[String, String] = Map(
    "scheme" -> "minhash", "numHashes" -> "32", "shingleSize" -> "5",
    "storeLayout" -> "compact", "storePartitions" -> "0", "bands" -> "8")
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val batch = dfs.getOrElse(batchInput,
      throw new IllegalArgumentException(s"IncrementalDedupTransformer: missing input '$batchInput'"))
    // first-run bootstrap: no signature store yet → empty store with the
    // signature schema (recursive inputs are absent until their object exists)
    val store = dfs.getOrElse(storeInput, toStoreLayout(sign(batch.limit(0))))
    // Init: schemas are unchanged (survivors ⊆ batch, the store delta has
    // the store's shape) — propagate without running the pair pipeline
    if (ctx.phase == ExecutionPhase.Init)
      return Map(novelKey -> keyNovel(batch), storeInput -> store.limit(0))
    // store-param guard: appending deltas signed at a different width or
    // scheme to an existing store would SILENTLY never match (dedup
    // quietly stops deduplicating — the worst failure mode). Primary
    // check: the store's `.schema/storeMeta.json` sidecar, validated once
    // per instance (a stream reads it on its first micro-batch only) —
    // it also catches a minhash↔oph scheme swap at the SAME width, which
    // no data probe can see. The limit(1) width probe remains for
    // standalone use (store frame passed without a registered DataObject)
    // and as the one-time legacy check when a pre-sidecar store is first
    // seen.
    def widthProbe(): Unit = if (dfs.contains(storeInput))
      store.select(size(col("sig")).as("w")).limit(1).collect().headOption.foreach(r =>
        require(r.getInt(0) == numHashes,
          s"IncrementalDedupTransformer: store '$storeInput' holds ${r.getInt(0)}-hash " +
            s"signatures but this transformer signs at numHashes=$numHashes — deltas would " +
            "never match the store; align numHashes (and the signature scheme) with the store"))
    if (!validateStoreMeta(() => widthProbe())) widthProbe()
    // rerun-guard fingerprint rides the signature pass (guide §1: one
    // pass, two outputs) — checked below once a pass materializes, so the
    // former dedicated per-batch delta aggregate is gone (r19 VERDICT #5)
    val (obsBatch, guardObs) = observeForRerunGuard(batch, idColumn)
    // sign ONCE; multi-consumer (pair pipeline + store delta) → persisted,
    // swept by the DAG at run end
    val sigs = persistForRun(sign(obsBatch), s"$batchInput.sigs")
    // banded layout: the delta's banded frame is ALSO computed once per
    // batch and persisted — the prefix set, the pair join's delta side,
    // and the store delta all read it
    val banded = if (storeLayout == "banded")
      Some(persistForRun(toStoreLayout(sigs), s"$batchInput.banded")) else None
    // prefix-pruned store view (banded layout): only the store files in
    // the delta's own (band, bucket) prefix set feed the pair join
    val storeView = pruneStoreByPrefix(store, storePartitions,
      banded.get.select(col("store_pfx")).distinct()
        .collect().map(_.getLong(0)).toSeq)
    // guard reads the observation filled by the prefix collect above
    // (prefix-pruned banded layout — zero extra jobs); otherwise the force
    // materializes the signature cache, work the first sink job would do
    // anyway, pulled forward
    val prefixCollectRan = storePartitions > 0 && store.columns.contains("store_pfx")
    checkBatchRerun(guardObs, if (!prefixCollectRan) sigs.count())
    // FUSED store + within-batch pass: ONE band join whose corpus side is
    // store ∪ (delta when intraBatch), origins tagged — see
    // [[IncrementalStoreDfsTransformer.tagCorpus]]. Within-batch EXACT
    // re-posts need no special pass: identical shingle sets share every
    // band bucket (pairs verify at Jaccard exactly 1), and a burst big
    // enough to trip the over-cap guard falls to the exact-copy checksum
    // fallback, which is LINEAR in the burst (an explicit checksum
    // prepass was A/B'd at this exact shape and lost — it added a
    // shuffle + anti-join to every batch to save pairs the cap already
    // bounds; SCALE.md round-17).
    val fusedPairs = storeLayout match {
      case "banded" =>
        val corpus = (Seq(tagCorpus(storeView, delta = false)) ++
          (if (intraBatch) Seq(tagCorpus(banded.get.drop("store_pfx"), delta = true)) else Nil))
          .reduce(_ unionByName _)
        Dedup.minhashIncrementalPairsBandedStore(sigs, corpus,
          numHashes, bands, threshold,
          deltaBanded = banded.map(_.drop("store_pfx")))
      case _ =>
        val corpus = (Seq(tagCorpus(storeView, delta = false)) ++
          (if (intraBatch) Seq(tagCorpus(sigs, delta = true)) else Nil))
          .reduce(_ unionByName _)
        Dedup.minhashIncrementalPairsFromSigs(sigs, corpus, numHashes, bands, threshold)
    }
    val allDups = fusedDropIds(fusedPairs, idColumn)
    // dup-id set persisted too: novel feeds BOTH outputs (survivor rows +
    // store delta), and without the persist each sink's write re-executes
    // the whole pair join — the ids are delta-bounded (≤ batch), tiny
    val dupIds = persistForRun(allDups.distinct(), s"$batchInput.dups")
    val novel = batch.join(broadcast(dupIds), Seq(idColumn), "left_anti")
    // store DELTA: the novel docs' already-computed signatures in the
    // store layout (banded: the persisted banded frame filtered by novel
    // ids — no re-explode) — appended by the action, never unioned onto
    // the store frame
    val novelIds = novel.select(col(idColumn).as("id"))
    val storeDelta = banded match {
      case Some(b) => b.join(novelIds, Seq("id"), "left_semi")
      case None => sigs.join(novelIds, Seq("id"), "left_semi")
    }
    Map(novelKey -> keyNovel(novel), storeInput -> storeDelta)
  }
}

/** Incremental MEDIA dedup for continuous ingestion —
  * [[IncrementalDedupTransformer]]'s multimodal twin: drop new-batch
  * images / audio clips / videos whose perceptual fingerprint
  * near-duplicates the EXISTING corpus, by joining the batch's
  * fingerprints against the persisted fingerprint STORE
  * (`Multimodal.imageFingerprintStore` (id, dhash64) /
  * `audioFingerprintStore` (id, afp64) / `videoFrameHashStore` (id, fh)).
  * Only the batch is ever decoded — corpus BYTES are not an input at all,
  * so per-batch cost scales with the delta and 8 bytes/fingerprint of
  * store state. Same DAG wiring (store as recursive input, bootstrap from
  * empty on first run, action saveMode = Append for O(increment) store
  * growth).
  *
  * Decode-once: the batch is DECODED exactly once per run — the
  * fingerprint frame is persisted, feeds the pair join AND the store
  * delta, and is released by the DAG at run end. Decode is the measured
  * dominant cost of this family (SCALE.md round-14), so a second decode
  * for store growth would double precisely the term that matters.
  *
  * Video (`modality = "video"`): `frameSize` is REQUIRED (the synthetic
  * fixed-size-frame layout of [[Multimodal.sampleFrames]]); pairs need
  * `minSharedFrames` shared frame hashes, and frames occurring more than
  * `maxFrameOccurrences` times store-wide are pruned (intro-card guard). */
case class IncrementalMediaDedupTransformer(
    batchInput: String, storeInput: String,
    idColumn: String, contentColumn: String = "content",
    modality: String = "image", maxHamming: Int = 2,
    maxBucketSize: Int = 1000,
    novelOutput: Option[String] = None,
    frameSize: Int = 0, stride: Int = 1,
    minSharedFrames: Int = 2, maxFrameOccurrences: Int = 1000,
    /** dedup WITHIN the batch too (keep the min-id head per duplicate
      * pair) — see [[IncrementalStoreDfsTransformer.intraBatch]] */
    intraBatch: Boolean = true,
    /** > 0: the store delta carries a `store_pfx` partition column =
      * pmod(xxhash64(blocking key), storePartitions); declare it on the
      * store DataObject and the pair join reads only the store files in
      * the delta's own blocking-key set. Video: the frame hash is the
      * natural single blocking key (layout unchanged). Image/audio:
      * switches the store to the BLOCKED layout
      * ([[graft.functions.Dedup.simhashBlockedStore]] — one row per
      * Manku block key, fingerprint carried; identical verification
      * semantics, the block decomposition bakes `maxHamming` into the
      * store, sidecar-pinned). Pruning is semantics-preserving on all
      * three: candidates share a key with the delta by construction and
      * over-cap counts are complete per prefix. */
    storePartitions: Int = 0,
    /** batch-keyed novel sink: column stamped onto the novel/clean
      * output, written with dynamic partition overwrite — see
      * [[IncrementalStoreDfsTransformer.novelBatchKeyColumn]] */
    override val novelBatchKeyColumn: Option[String] = None,
    override val novelBatchKeyValue: Option[String] = None,
    /** permit re-running a batch whose store append already committed —
      * see [[IncrementalStoreDfsTransformer.allowRerun]] */
    override val allowRerun: Boolean = false,
    /** retry horizon: applied-batch fingerprints the rerun guard remembers
      * — see [[IncrementalStoreDfsTransformer.rerunGuardRingSize]] */
    override val rerunGuardRingSize: Int = 16)
  extends IncrementalStoreDfsTransformer {
  override protected def fingerprintContentColumn: Option[String] = Some(contentColumn)
  require(modality == "image" || modality == "audio" || modality == "video",
    s"IncrementalMediaDedupTransformer: unknown modality '$modality' (image|audio|video)")
  require(modality != "video" || frameSize > 0,
    "IncrementalMediaDedupTransformer: modality 'video' requires frameSize > 0")
  private def fingerprints(df: DataFrame): DataFrame = modality match {
    case "image" => Multimodal.imageFingerprintStore(df, idColumn, contentColumn)
    case "audio" => Multimodal.audioFingerprintStore(df, idColumn, contentColumn)
    case "video" => Multimodal.videoFrameHashStore(df, idColumn, contentColumn, frameSize, stride)
  }
  private def hashCol: String = modality match {
    case "image" => "dhash64"
    case "audio" => "afp64"
    case "video" => "fh"
  }
  /** a fingerprint frame in the configured store layout: video carries
    * `store_pfx` on its natural frame-hash key; image/audio switch to the
    * blocked layout (one row per Manku block key, fingerprint carried) */
  private def toStoreLayout(fps: DataFrame): DataFrame = modality match {
    case "video" if storePartitions > 0 =>
      fps.withColumn("store_pfx", Dedup.storePrefix(storePartitions, col(hashCol)))
    case "image" | "audio" if storePartitions > 0 =>
      Dedup.simhashBlockedStore(fps.select(col("id"), col(hashCol).as("simhash")),
          maxHamming = maxHamming, storePartitions = storePartitions)
        .withColumnRenamed("simhash", hashCol)
    case _ => fps
  }
  override protected def storeMetaParams: Map[String, String] =
    Map("modality" -> modality,
      "storePartitions" -> storePartitions.toString) ++
      (if (modality == "video")
        Map("frameSize" -> frameSize.toString, "stride" -> stride.toString)
      else Map.empty) ++
      // the blocked layout bakes the hamming budget into the block keys
      (if (modality != "video" && storePartitions > 0)
        Map("storeBlockedMaxHamming" -> maxHamming.toString)
      else Map.empty)
  override protected def storeMetaDefaults: Map[String, String] = Map(
    "storePartitions" -> "0", "stride" -> "1", "storeBlockedMaxHamming" -> "2")
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val batch = dfs.getOrElse(batchInput,
      throw new IllegalArgumentException(s"IncrementalMediaDedupTransformer: missing input '$batchInput'"))
    val store = dfs.getOrElse(storeInput, toStoreLayout(fingerprints(batch.limit(0))))
    if (ctx.phase == ExecutionPhase.Init)
      return Map(novelKey -> keyNovel(batch), storeInput -> store.limit(0))
    // fingerprint kernels are parameterless for image/audio; for video the
    // frame layout (frameSize/stride) determines frame-hash values — the
    // sidecar catches a layout drift that would silently never match
    validateStoreMeta(() => ())
    // rerun-guard fingerprint rides the decode pass (guide §1: one pass,
    // two outputs) — checked once a pass materializes, replacing the
    // former dedicated per-batch content scan (r19 VERDICT #5; decode is
    // this family's measured dominant cost, so the saved scan is the
    // expensive kind)
    val (obsBatch, guardObs) = observeForRerunGuard(batch, idColumn)
    // decode ONCE; multi-consumer (pair join + store delta) → persisted,
    // swept by the DAG at run end
    val deltaFps = persistForRun(fingerprints(obsBatch), s"$batchInput.fps")
    // blocked delta computed ONCE per batch and persisted (r16 What's
    // wrong #1: the old shape re-blocked the delta up to three times) —
    // the prefix set, the store pair join, the fused intra contribution
    // and the store delta all read this frame
    val blocked = if (modality != "video" && storePartitions > 0)
      Some(persistForRun(toStoreLayout(deltaFps), s"$batchInput.blk")) else None
    def blockedSimhash: DataFrame = blocked.get.drop("store_pfx")
      .withColumnRenamed(hashCol, "simhash")
    // prefix-pruned store view: only the store files in the delta's own
    // blocking-key prefix set (frame hashes / Manku block keys) feed the
    // pair join
    val storeView = pruneStoreByPrefix(store, storePartitions,
      blocked.getOrElse(toStoreLayout(deltaFps)).select(col("store_pfx"))
        .distinct().collect().map(_.getLong(0)).toSeq)
    // guard reads the observation filled by the prefix collect above
    // (partitioned layouts — zero extra jobs); otherwise the force
    // materializes the decode cache, work the first sink job would do
    // anyway, pulled forward
    val prefixCollectRan = storePartitions > 0 && store.columns.contains("store_pfx")
    checkBatchRerun(guardObs, if (!prefixCollectRan) deltaFps.count())
    def pairsAgainst(corpus: DataFrame): DataFrame = modality match {
      case "video" =>
        Multimodal.videoIncrementalPairsFromSigs(deltaFps, corpus,
          minSharedFrames = minSharedFrames, maxFrameOccurrences = maxFrameOccurrences)
      case _ =>
        graft.functions.Dedup.simhashIncrementalPairsFromSigs(
          deltaFps.select(col("id"), col(hashCol).as("simhash")),
          corpus.select(col("id"), col(hashCol).as("simhash")),
          maxHamming = maxHamming, maxBucketSize = maxBucketSize)
    }
    // FUSED store + within-batch pass for the single-fingerprint
    // modalities: ONE block join whose corpus side is store ∪ (delta when
    // intraBatch), origins tagged ([[tagCorpus]]/[[fusedDropIds]]); the
    // partitioned path reads the PRE-BLOCKED store layout (no per-batch
    // store explode) and reuses the persisted blocked delta frame on both
    // the join's delta side and its corpus contribution. Video keeps the
    // two-pass shape (frame-multiset pairing has no single corpus row to
    // tag through the shared-frame aggregation).
    val joinDrops: DataFrame = modality match {
      case "video" =>
        val storeD = pairsAgainst(storeView).select(col("id_new").as(idColumn))
        if (intraBatch) storeD.unionByName(intraDropIds(pairsAgainst(deltaFps), idColumn))
        else storeD
      case _ if storePartitions > 0 =>
        val corpus = (Seq(tagCorpus(storeView.select(col("id"), col("block"), col("bkey"),
            col(hashCol).as("simhash")), delta = false)) ++
          (if (intraBatch) Seq(tagCorpus(blockedSimhash, delta = true)) else Nil))
          .reduce(_ unionByName _)
        fusedDropIds(Dedup.simhashIncrementalPairsFromBlockedStore(
          deltaFps.select(col("id"), col(hashCol).as("simhash")), corpus,
          maxHamming = maxHamming, maxBucketSize = maxBucketSize,
          deltaBlocked = Some(blockedSimhash)), idColumn)
      case _ =>
        val corpus = (Seq(tagCorpus(storeView.select(col("id"),
            col(hashCol).as("simhash")), delta = false)) ++
          (if (intraBatch) Seq(tagCorpus(deltaFps.select(col("id"),
            col(hashCol).as("simhash")), delta = true)) else Nil))
          .reduce(_ unionByName _)
        fusedDropIds(Dedup.simhashIncrementalPairsFromSigs(
          deltaFps.select(col("id"), col(hashCol).as("simhash")), corpus,
          maxHamming = maxHamming, maxBucketSize = maxBucketSize), idColumn)
    }
    val allDups = joinDrops
    // persisted like the fingerprint frame: novel feeds BOTH outputs, and
    // without it each sink's write re-executes the pair join
    val dupIds = persistForRun(allDups.distinct(), s"$batchInput.dups")
    // delta-bounded (⊆ batch ids) → legal broadcast
    val novel = batch.join(broadcast(dupIds), Seq(idColumn), "left_anti")
    // store DELTA: the novel items' already-computed fingerprints in the
    // store layout (pre-blocked frame reused — no re-explode)
    val novelIds = novel.select(col(idColumn).as("id"))
    val storeDelta = blocked match {
      case Some(b) => b.join(novelIds, Seq("id"), "left_semi")
      case None => toStoreLayout(deltaFps.join(novelIds, Seq("id"), "left_semi"))
    }
    Map(novelKey -> keyNovel(novel), storeInput -> storeDelta)
  }
}

/** Incremental EMBEDDING (semantic) dedup for continuous ingestion — the
  * store-backed discipline on the embedding modality, completing the
  * family (text / image / audio / video / embeddings): drop new-batch
  * items whose vector near-duplicates the EXISTING corpus by joining the
  * batch's hyperplane-LSH signatures against the persisted
  * [[graft.functions.Dedup.embeddingStore]] (id, emb, bucket), exact
  * cosine verified. Same DAG wiring as its siblings (store as recursive
  * input, bootstrap from empty, action saveMode = Append for
  * O(increment) store growth); the batch is signed ONCE per run. */
case class IncrementalEmbeddingDedupTransformer(
    batchInput: String, storeInput: String,
    idColumn: String, embColumn: String, dim: Int,
    numPlanes: Int = 16, threshold: Double = 0.95,
    maxBucketSize: Int = 1000,
    novelOutput: Option[String] = None,
    /** dedup WITHIN the batch too (keep the min-id head per duplicate
      * pair) — see [[IncrementalStoreDfsTransformer.intraBatch]] */
    intraBatch: Boolean = true,
    /** > 0: the store delta carries a `store_pfx` partition column =
      * pmod(xxhash64(bucket), storePartitions); declare it on the store
      * DataObject and the bucket join reads only the store files in the
      * delta's own bucket set. Semantics-preserving on every path: the
      * LSH join matches within a bucket, exact copies share their bucket,
      * and over-cap counts are complete per prefix (bucket → prefix is a
      * function). */
    storePartitions: Int = 0,
    /** batch-keyed novel sink: column stamped onto the novel/clean
      * output, written with dynamic partition overwrite — see
      * [[IncrementalStoreDfsTransformer.novelBatchKeyColumn]] */
    override val novelBatchKeyColumn: Option[String] = None,
    override val novelBatchKeyValue: Option[String] = None,
    /** permit re-running a batch whose store append already committed —
      * see [[IncrementalStoreDfsTransformer.allowRerun]] */
    override val allowRerun: Boolean = false,
    /** retry horizon: applied-batch fingerprints the rerun guard remembers
      * — see [[IncrementalStoreDfsTransformer.rerunGuardRingSize]] */
    override val rerunGuardRingSize: Int = 16) extends IncrementalStoreDfsTransformer {
  override protected def fingerprintContentColumn: Option[String] = Some(embColumn)
  /** the store layout: embedding store rows have exactly one blocking key
    * (the hyperplane bucket), so partitioning needs no layout change —
    * just the transport column */
  private def toStoreLayout(sigs: DataFrame): DataFrame =
    if (storePartitions > 0)
      sigs.withColumn("store_pfx", Dedup.storePrefix(storePartitions, col("bucket")))
    else sigs
  override protected def storeMetaParams: Map[String, String] = Map(
    "dim" -> dim.toString, "numPlanes" -> numPlanes.toString,
    "storePartitions" -> storePartitions.toString)
  override protected def storeMetaDefaults: Map[String, String] = Map(
    "numPlanes" -> "16", "storePartitions" -> "0")
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val batch = dfs.getOrElse(batchInput,
      throw new IllegalArgumentException(s"IncrementalEmbeddingDedupTransformer: missing input '$batchInput'"))
    val store = dfs.getOrElse(storeInput,
      toStoreLayout(Dedup.embeddingStore(batch.limit(0), idColumn, embColumn, dim, numPlanes)))
    if (ctx.phase == ExecutionPhase.Init)
      return Map(novelKey -> keyNovel(batch), storeInput -> store.limit(0))
    // dim/numPlanes determine bucket values — the sidecar catches a
    // drift that would silently never (or wrongly) bucket-match
    validateStoreMeta(() => ())
    // rerun-guard fingerprint rides the signature pass (guide §1: one
    // pass, two outputs — r19 VERDICT #5), checked after the prefix
    // collect (or the forced cache materialization) below
    val (obsBatch, guardObs) = observeForRerunGuard(batch, idColumn)
    val sigs = persistForRun(
      Dedup.embeddingStore(obsBatch, idColumn, embColumn, dim, numPlanes), s"$batchInput.esigs")
    // prefix-pruned store view: only the store files in the delta's own
    // bucket-prefix set feed the bucket join
    val storeView = pruneStoreByPrefix(store, storePartitions,
      sigs.select(Dedup.storePrefix(storePartitions, col("bucket")).as("p"))
        .distinct().collect().map(_.getLong(0)).toSeq)
    // observation filled by the prefix collect when it ran; force otherwise
    val prefixCollectRan = storePartitions > 0 && store.columns.contains("store_pfx")
    checkBatchRerun(guardObs, if (!prefixCollectRan) sigs.count())
    // FUSED store + within-batch pass: ONE bucket join over store ∪
    // (delta when intraBatch), origins tagged — see
    // [[IncrementalStoreDfsTransformer.tagCorpus]]
    val corpus = (Seq(tagCorpus(storeView, delta = false)) ++
      (if (intraBatch) Seq(tagCorpus(sigs, delta = true)) else Nil))
      .reduce(_ unionByName _)
    val allDups = fusedDropIds(
      Dedup.embeddingIncrementalPairsFromSigs(sigs, corpus, threshold, maxBucketSize),
      idColumn)
    val dupIds = persistForRun(allDups.distinct(), s"$batchInput.dups")
    val novel = batch.join(broadcast(dupIds), Seq(idColumn), "left_anti")
    val storeDelta = toStoreLayout(sigs.join(
      novel.select(col(idColumn).as("id")), Seq("id"), "left_semi"))
    Map(novelKey -> keyNovel(novel), storeInput -> storeDelta)
  }
}

/** Incremental SPAN removal (ExactSubstr) for continuous ingestion — the
  * store-backed discipline applied to passage scrubbing: every batch is
  * cleaned against the corpus HISTORY's window-fingerprint store PLUS
  * itself (a window is duplicated iff its delta count + stored count
  * exceeds 1 — within-batch repeats are inherent to the counting, no
  * separate intra pass), and the store grows by APPENDING the batch's
  * window counts as PARTIAL rows (summed per key after the delta
  * semi-join at read time — no read-merge-rewrite cycle, per-run store
  * I/O stays O(increment)). The batch is tokenized and fingerprinted
  * exactly ONCE per run: the window frame feeds the clean AND the store
  * delta. Same DAG wiring as its dedup siblings (store as recursive
  * input, bootstrap from empty, saveMode = Append); `storePartitions`
  * prunes the history read to the delta's own window prefixes
  * ((h, h2) is the store row's single blocking key).
  *
  * Output: the batch with `textColumn` REPLACED by the cleaned text
  * (whitespace-normalized), plus `n_tokens` / `n_dup_windows` /
  * `n_removed_tokens` audit columns — [[SpanRemovalTransformer]]'s
  * contract, incrementally. */
case class IncrementalSpanRemovalTransformer(
    batchInput: String, storeInput: String,
    idColumn: String, textColumn: String,
    windowTokens: Int = 8, portableFingerprints: Boolean = true,
    cleanOutput: Option[String] = None,
    storePartitions: Int = 0,
    /** batch-keyed novel sink: column stamped onto the novel/clean
      * output, written with dynamic partition overwrite — see
      * [[IncrementalStoreDfsTransformer.novelBatchKeyColumn]] */
    override val novelBatchKeyColumn: Option[String] = None,
    override val novelBatchKeyValue: Option[String] = None,
    /** permit re-running a batch whose store append already committed —
      * see [[IncrementalStoreDfsTransformer.allowRerun]] */
    override val allowRerun: Boolean = false,
    /** retry horizon: applied-batch fingerprints the rerun guard remembers
      * — see [[IncrementalStoreDfsTransformer.rerunGuardRingSize]] */
    override val rerunGuardRingSize: Int = 16) extends IncrementalStoreDfsTransformer {
  override protected def fingerprintContentColumn: Option[String] = Some(textColumn)
  override def novelOutput: Option[String] = cleanOutput
  /** within-batch repeats are counted by construction (delta window
    * counts), not via a separate self-join */
  override def intraBatch: Boolean = true
  override protected def storeMetaParams: Map[String, String] = Map(
    "windowTokens" -> windowTokens.toString,
    "portableFingerprints" -> portableFingerprints.toString,
    "storePartitions" -> storePartitions.toString)
  override protected def storeMetaDefaults: Map[String, String] = Map(
    "windowTokens" -> "8", "portableFingerprints" -> "true", "storePartitions" -> "0")
  private def toStoreLayout(counts: DataFrame): DataFrame =
    if (storePartitions > 0)
      counts.withColumn("store_pfx",
        Dedup.storePrefix(storePartitions, col("h"), col("h2")))
    else counts
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val batch = dfs.getOrElse(batchInput,
      throw new IllegalArgumentException(s"IncrementalSpanRemovalTransformer: missing input '$batchInput'"))
    val store = dfs.getOrElse(storeInput, toStoreLayout(
      Dedup.spanFingerprintStore(batch.limit(0), idColumn, textColumn, windowTokens,
        portableFingerprints)))
    if (ctx.phase == ExecutionPhase.Init)
      return Map(novelKey -> keyNovel(batch.withColumn(textColumn, col(textColumn))
        .withColumn("n_tokens", lit(0)).withColumn("n_dup_windows", lit(0))
        .withColumn("n_removed_tokens", lit(0))),
        storeInput -> store.limit(0))
    validateStoreMeta(() => ())
    // rerun-guard fingerprint rides the tokenize pass (guide §1: one pass,
    // two outputs — r19 VERDICT #5): the force materializes the window
    // cache, work the first sink job would do anyway, pulled forward
    val (obsBatch, guardObs) = observeForRerunGuard(batch, idColumn)
    // tokenize + fingerprint ONCE: base and windows feed the clean AND
    // the store delta, swept by the DAG at run end
    val base = persistForRun(Dedup.spanBase(obsBatch, idColumn, textColumn), s"$batchInput.sbase")
    val windows = persistForRun(
      Dedup.spanWindows(base, windowTokens, portableFingerprints), s"$batchInput.swin")
    checkBatchRerun(guardObs, windows.count())
    val cleaned = Dedup.removeRepeatedSpansIncrementalFromWindows(
        base, windows, store, windowTokens, storePartitions)
      .select(col("id").as(idColumn), col("cleaned_text"),
        col("n_tokens"), col("n_dup_windows"), col("n_removed_tokens"))
    val out = batch.drop("n_tokens", "n_dup_windows", "n_removed_tokens")
      .join(cleaned, Seq(idColumn))
      .withColumn(textColumn, col("cleaned_text")).drop("cleaned_text")
    // store DELTA: the RAW batch's window counts (history = all text ever
    // seen, including spans this run scrubbed) — partial rows, appended
    val storeDelta = toStoreLayout(
      windows.groupBy(col("h"), col("h2")).agg(count(lit(1)).as("c")))
    Map(novelKey -> keyNovel(out), storeInput -> storeDelta)
  }
}

/** Incremental CCNet LINE dedup for continuous ingestion —
  * [[IncrementalSpanRemovalTransformer]]'s line-level twin: every batch's
  * lines are counted against the corpus history's [[graft.functions
  * .Dedup.lineCountStore]] plus the batch itself; lines whose total
  * count exceeds `maxOccurrences` are boilerplate and dropped from every
  * occurrence. The batch is exploded/hashed ONCE per run (the frame
  * feeds the clean AND the store delta), the store grows by appending
  * PARTIAL count rows (summed per key after the delta semi-join), and
  * `storePartitions` prunes the history read by line-hash prefix.
  * `maxOccurrences` is a POLICY knob, not a store parameter — counts are
  * raw, so it may change between runs without invalidating the store. */
case class IncrementalLineDedupTransformer(
    batchInput: String, storeInput: String,
    idColumn: String, textColumn: String,
    maxOccurrences: Int = 1,
    cleanOutput: Option[String] = None,
    storePartitions: Int = 0,
    /** batch-keyed novel sink: column stamped onto the novel/clean
      * output, written with dynamic partition overwrite — see
      * [[IncrementalStoreDfsTransformer.novelBatchKeyColumn]] */
    override val novelBatchKeyColumn: Option[String] = None,
    override val novelBatchKeyValue: Option[String] = None,
    /** permit re-running a batch whose store append already committed —
      * see [[IncrementalStoreDfsTransformer.allowRerun]] */
    override val allowRerun: Boolean = false,
    /** retry horizon: applied-batch fingerprints the rerun guard remembers
      * — see [[IncrementalStoreDfsTransformer.rerunGuardRingSize]] */
    override val rerunGuardRingSize: Int = 16) extends IncrementalStoreDfsTransformer {
  override protected def fingerprintContentColumn: Option[String] = Some(textColumn)
  override def novelOutput: Option[String] = cleanOutput
  /** within-batch repeats are counted by construction */
  override def intraBatch: Boolean = true
  override protected def storeMetaParams: Map[String, String] =
    Map("storePartitions" -> storePartitions.toString)
  override protected def storeMetaDefaults: Map[String, String] =
    Map("storePartitions" -> "0")
  private def toStoreLayout(counts: DataFrame): DataFrame =
    if (storePartitions > 0)
      counts.withColumn("store_pfx", Dedup.storePrefix(storePartitions, col("lh")))
    else counts
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val batch = dfs.getOrElse(batchInput,
      throw new IllegalArgumentException(s"IncrementalLineDedupTransformer: missing input '$batchInput'"))
    val store = dfs.getOrElse(storeInput, toStoreLayout(
      Dedup.lineCountStore(batch.limit(0), idColumn, textColumn)))
    if (ctx.phase == ExecutionPhase.Init)
      return Map(novelKey -> keyNovel(batch.withColumn(textColumn, col(textColumn))
        .withColumn("n_lines", lit(0)).withColumn("n_removed_lines", lit(0))),
        storeInput -> store.limit(0))
    validateStoreMeta(() => ())
    // rerun-guard fingerprint rides the explode+hash pass (guide §1: one
    // pass, two outputs — r19 VERDICT #5)
    val (obsBatch, guardObs) = observeForRerunGuard(batch, idColumn)
    // explode + hash ONCE: base and hashes feed the clean AND the store
    // delta, swept by the DAG at run end
    val base = persistForRun(Dedup.lineBase(obsBatch, idColumn, textColumn), s"$batchInput.lbase")
    val hashes = persistForRun(Dedup.lineHashes(base), s"$batchInput.lh")
    checkBatchRerun(guardObs, hashes.count())
    val cleaned = Dedup.removeDuplicatedLinesIncrementalFromLines(
        base, hashes, store, maxOccurrences, storePartitions)
      .select(col("id").as(idColumn), col("cleaned_text"),
        col("n_lines"), col("n_removed_lines"))
    val out = batch.drop("n_lines", "n_removed_lines")
      .join(cleaned, Seq(idColumn))
      .withColumn(textColumn, col("cleaned_text")).drop("cleaned_text")
    // store DELTA: the RAW batch's line counts — partial rows, appended
    val storeDelta = toStoreLayout(
      hashes.groupBy(col("lh")).agg(count(lit(1)).as("c")))
    Map(novelKey -> keyNovel(out), storeInput -> storeDelta)
  }
}

/** N:1 span-level decontamination: the corpus input's text is stripped of
  * every window that appears in the benchmark input (see
  * `Dedup.removeContaminatedSpans`) — the config surface for eval-leak
  * scrubbing inside a declarative pipeline. */
case class DecontaminateSpansTransformer(
    corpusInput: String, benchmarkInput: String,
    idColumn: String, textColumn: String, benchTextColumn: String,
    windowTokens: Int = 8,
    cleanOutput: Option[String] = None) extends DfsTransformer {
  private def outKey: String = cleanOutput.getOrElse(corpusInput)
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val corpus = dfs.getOrElse(corpusInput,
      throw new IllegalArgumentException(s"DecontaminateSpansTransformer: missing input '$corpusInput'"))
    val bench = dfs.getOrElse(benchmarkInput,
      throw new IllegalArgumentException(s"DecontaminateSpansTransformer: missing input '$benchmarkInput'"))
    if (ctx.phase == ExecutionPhase.Init)
      return Map(outKey -> corpus.withColumn(textColumn, col(textColumn))
        .withColumn("n_removed_tokens", lit(0)))
    val cleaned = Dedup.removeContaminatedSpans(corpus, idColumn, textColumn,
        bench, benchTextColumn, l = windowTokens)
      .select(col("id").as(idColumn), col("cleaned_text"), col("n_removed_tokens"))
    Map(outKey -> corpus.drop("n_removed_tokens").join(cleaned, Seq(idColumn))
      .withColumn(textColumn, col("cleaned_text")).drop("cleaned_text"))
  }
}

/** Append a deterministic train/val/test split label (md5-thresholded —
  * partitioning/seed/engine-independent; see `Sampling.splitLabel`). */
case class TrainSplitTransformer(
    keyColumn: String, valFraction: Double = 0.05,
    testFraction: Double = 0.05, labelColumn: String = "split") extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame =
    df.withColumn(labelColumn, Sampling.splitLabel(col(keyColumn),
      Seq("val" -> valFraction, "test" -> testFraction)))
}

/** Append deterministic `shard` + within-shard `pos` training order
  * (hash shard + per-shard window; see `Sampling.shardAssignment`). */
case class ShardAssignmentTransformer(
    keyColumn: String, numShards: Int) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame =
    Sampling.shardAssignment(df, col(keyColumn), numShards)
}

/** Cross-document repeated-span removal (ExactSubstr) as a 1:1 config
  * transformer: `textColumn` is REPLACED by the cleaned text; audit counts
  * ride along. Schema-only in Init (adds the audit columns). */
case class SpanRemovalTransformer(
    idColumn: String, textColumn: String,
    windowTokens: Int = 8, portableFingerprints: Boolean = true) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame = {
    if (ctx.phase == ExecutionPhase.Init)
      return df.withColumn(textColumn, col(textColumn))
        .withColumn("n_dup_windows", lit(0))
        .withColumn("n_removed_tokens", lit(0))
    val cleaned = Dedup.removeRepeatedSpans(df, idColumn, textColumn,
        l = windowTokens, portableFingerprints = portableFingerprints)
      .select(col("id").as(idColumn), col("cleaned_text"),
        col("n_dup_windows"), col("n_removed_tokens"))
    df.drop("n_dup_windows", "n_removed_tokens")
      .join(cleaned, Seq(idColumn))
      .withColumn(textColumn, col("cleaned_text")).drop("cleaned_text")
  }
}

/** CCNet line-level dedup as a 1:1 config transformer (corpus-wide
  * boilerplate lines stripped in place). */
case class LineDedupTransformer(
    idColumn: String, textColumn: String,
    maxOccurrences: Int = 1) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame = {
    if (ctx.phase == ExecutionPhase.Init)
      return df.withColumn(textColumn, col(textColumn))
        .withColumn("n_removed_lines", lit(0))
    val cleaned = Dedup.removeDuplicatedLines(df, idColumn, textColumn, maxOccurrences)
      .select(col("id").as(idColumn), col("cleaned_text"), col("n_removed_lines"))
    df.drop("n_removed_lines").join(cleaned, Seq(idColumn))
      .withColumn(textColumn, col("cleaned_text")).drop("cleaned_text")
  }
}

/** Fixed-length token chunking (one row per chunk) as a config
  * transformer — the explode changes row count, never the Init contract
  * (schema gains the chunk columns). */
case class TokenChunkTransformer(
    idColumn: String, textColumn: String,
    maxLen: Int, overlap: Int = 0) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame =
    graft.functions.Packing.chunkTokens(df, col(idColumn), col(textColumn), maxLen, overlap)
}

/** Temperature-scaled domain mixing as a config transformer (survivors
  * only, `_mix_rate_e6` attached). Init returns the schema untouched plus
  * the rate column — the rate table would otherwise run jobs in Init. */
case class TemperatureMixTransformer(
    keyColumn: String, stratumColumn: String, tokenCountColumn: String,
    budgetTokens: Long, alpha: Double = 0.5) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame = {
    if (ctx.phase == ExecutionPhase.Init) return df.withColumn("_mix_rate_e6", lit(0L))
    Sampling.temperatureMix(df, col(keyColumn), col(stratumColumn),
      col(tokenCountColumn), budgetTokens, alpha)
  }
}

/** Unicode NFC normalization of a text column in place (codegen'd kernel,
  * zero-copy on already-normalized rows; see `TextAnalysis.nfcNormalize`). */
case class NfcNormalizeTransformer(textColumn: String) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame =
    df.withColumn(textColumn, TextAnalysis.nfcNormalize(col(textColumn)))
}

// ---- Scoring-family transformers -------------------------------------
//
// The declarative surface for the corpus SCORERS (NB quality gate, CCNet
// perplexity buckets, DSIR importance resampling) — the r13 curation
// family's pattern applied to `graft.functions.{QualityClassifier,
// NgramLM, ImportanceResampling}`. All three TRAIN by driver-collecting a
// bounded bucket table (the functions' documented ≤2^20 contract), so
// their Init paths MUST return schema stubs: calling the scorer in Init
// would run the training aggregations once per DAG traversal.

/** Naive-Bayes quality gate (CCNet wiki-vs-crawl shape) as an N:1 config
  * transformer: score the corpus input against target/background seed
  * inputs, appending (n_grams, score_micro, predicted);
  * `keepOnlyPredicted` turns the scorer into a filter gate. */
case class NbQualityTransformer(
    corpusInput: String, targetSeedInput: String, backgroundSeedInput: String,
    textColumn: String,
    targetTextColumn: Option[String] = None,
    backgroundTextColumn: Option[String] = None,
    numBuckets: Int = 256, keepOnlyPredicted: Boolean = false,
    scoredOutput: Option[String] = None) extends DfsTransformer {
  private def outKey: String = scoredOutput.getOrElse(corpusInput)
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val corpus = dfs.getOrElse(corpusInput,
      throw new IllegalArgumentException(s"NbQualityTransformer: missing input '$corpusInput'"))
    if (ctx.phase == ExecutionPhase.Init)
      return Map(outKey -> corpus.withColumn("n_grams", lit(0))
        .withColumn("score_micro", lit(0L)).withColumn("predicted", lit(true)))
    val target = dfs.getOrElse(targetSeedInput,
      throw new IllegalArgumentException(s"NbQualityTransformer: missing input '$targetSeedInput'"))
    val background = dfs.getOrElse(backgroundSeedInput,
      throw new IllegalArgumentException(s"NbQualityTransformer: missing input '$backgroundSeedInput'"))
    val scored = graft.functions.QualityClassifier.scoreNB(corpus, col(textColumn),
      target, col(targetTextColumn.getOrElse(textColumn)),
      background, col(backgroundTextColumn.getOrElse(textColumn)), numBuckets)
    Map(outKey -> (if (keepOnlyPredicted) scored.where(col("predicted")) else scored))
  }
}

/** CCNet head/middle/tail perplexity bucketing as an N:1 config
  * transformer: bigram-LM-score the corpus against a seed input, appending
  * (n_bigrams, nll_micro, ppl_micro, bucket). The exact per-language
  * tercile needs one window sort — for web-scale single languages use
  * [[PplCutoffAssignTransformer]] (the zero-shuffle production path). */
case class PerplexityBucketsTransformer(
    corpusInput: String, seedInput: String,
    idColumn: String, textColumn: String, langColumn: String,
    seedTextColumn: Option[String] = None,
    numBuckets: Int = 4096,
    scoredOutput: Option[String] = None) extends DfsTransformer {
  private def outKey: String = scoredOutput.getOrElse(corpusInput)
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val corpus = dfs.getOrElse(corpusInput,
      throw new IllegalArgumentException(s"PerplexityBucketsTransformer: missing input '$corpusInput'"))
    if (ctx.phase == ExecutionPhase.Init)
      return Map(outKey -> corpus.withColumn("n_bigrams", lit(0))
        .withColumn("nll_micro", lit(0L)).withColumn("ppl_micro", lit(0L))
        .withColumn("bucket", lit("head")))
    val seed = dfs.getOrElse(seedInput,
      throw new IllegalArgumentException(s"PerplexityBucketsTransformer: missing input '$seedInput'"))
    Map(outKey -> graft.functions.NgramLM.pplBuckets(corpus, idColumn, col(textColumn),
      langColumn, seed, col(seedTextColumn.getOrElse(textColumn)), numBuckets))
  }
}

/** Zero-shuffle CCNet bucket assignment from PRE-TRAINED per-language
  * cutoffs (`lang -> [headMax, middleMax]` in ppl micro-nats) — the
  * production path when the cutoffs were computed once on a sample. Pure
  * broadcast lookup, safe in Init (no jobs, schema gains `bucket`). */
case class PplCutoffAssignTransformer(
    langColumn: String, cutoffs: Map[String, Seq[Long]]) extends DfTransformer {
  require(cutoffs.nonEmpty && cutoffs.values.forall(_.length == 2),
    "PplCutoffAssignTransformer: cutoffs must map each language to [headMax, middleMax]")
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame =
    graft.functions.NgramLM.assignByPplCutoffs(df, langColumn,
      cutoffs.map { case (l, s) => l -> (s.head, s(1)) })
}

/** DSIR importance resampling (top-k corpus rows by hashed-n-gram
  * importance against a target seed) as an N:1 config transformer —
  * appends (n_grams, score, rank) and KEEPS only the k selected rows. */
case class DsirResampleTransformer(
    corpusInput: String, targetSeedInput: String,
    idColumn: String, textColumn: String, k: Int,
    targetTextColumn: Option[String] = None,
    numBuckets: Int = 256,
    selectedOutput: Option[String] = None) extends DfsTransformer {
  private def outKey: String = selectedOutput.getOrElse(corpusInput)
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val corpus = dfs.getOrElse(corpusInput,
      throw new IllegalArgumentException(s"DsirResampleTransformer: missing input '$corpusInput'"))
    if (ctx.phase == ExecutionPhase.Init)
      return Map(outKey -> corpus.withColumn("n_grams", lit(0))
        .withColumn("score", lit(0.0)).withColumn("rank", lit(0)))
    val target = dfs.getOrElse(targetSeedInput,
      throw new IllegalArgumentException(s"DsirResampleTransformer: missing input '$targetSeedInput'"))
    // resampleTopK evaluates ONE text expression against both frames —
    // align the seed's text column name when it differs
    val targetNorm = targetTextColumn.filter(_ != textColumn)
      .map(tc => target.withColumn(textColumn, col(tc))).getOrElse(target)
    Map(outKey -> graft.functions.ImportanceResampling.resampleTopK(corpus, targetNorm,
      col(idColumn), col(textColumn), numBuckets, k))
  }
}
