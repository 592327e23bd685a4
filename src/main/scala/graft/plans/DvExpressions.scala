package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector membership as a SCAN-side predicate (the shape of the
  * public Delta DV read path, which applies per-file bitmaps inside the
  * scan task): `(file, row_index) ∈ tombstones`, with the tombstone sets
  * shipped once per executor via a Spark broadcast — per-row cost is one
  * hash lookup + binary search, and the filter stays inside the
  * whole-stage-codegen span instead of forcing the scan through an
  * anti-join exchange. Used by the versioned table's reads when the
  * active DV volume is below the broadcast threshold; larger sets fall
  * back to the shuffle anti-join (see `VersionedTable.applyDv`).
  *
  * The expression serializes only the BROADCAST HANDLE to executors
  * (standard broadcast-in-expression pattern); the tombstone arrays are
  * fetched once per executor by the broadcast machinery.
  */
case class DvTombstoned(file: Expression, rowIndex: Expression,
                        tombstones: Broadcast[Map[String, Array[Long]]])
  extends BinaryExpression with Predicate {

  override def left: Expression = file
  override def right: Expression = rowIndex
  override def nullable: Boolean = false
  override def prettyName: String = "dv_tombstoned"

  def contains(f: UTF8String, ri: Long): Boolean =
    tombstones.value.get(f.toString)
      .exists(arr => java.util.Arrays.binarySearch(arr, ri) >= 0)

  override def nullSafeEval(f: Any, ri: Any): Any =
    contains(f.asInstanceOf[UTF8String], ri.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvExpr", this)
    nullSafeCodeGen(ctx, ev, (f, ri) => s"${ev.value} = $ref.contains($f, $ri);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DvTombstoned =
    copy(file = newLeft, rowIndex = newRight)
}

/** A Hadoop Configuration that survives Java serialization (Spark's own
  * SerializableConfiguration is private[spark]). */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

/** Executor-side cache of per-file deletion-vector sidecars — the
  * above-broadcast-threshold DV read path (the public Delta design: the
  * scan task applies the bitmap OF THE FILE IT IS READING, so memory is
  * bounded by the tombstones of the files an executor actually scans,
  * never the table's full tombstone volume).
  *
  * The versioned table stages, under each tombstone-set dir's `_sidecar/`
  * subdir (underscore-prefixed: invisible to parquet directory listing),
  * one `f-<md5(file)>.bin` sidecar per scanned file holding that file's
  * tombstoned positions as sorted big-endian longs. A scan task resolves
  * its current file's sidecar by NAME (md5 of the scan-relative path — no
  * listing), checks the driver-broadcast presence set (zero FS RPCs for
  * the common no-tombstone file), loads + merges the hits across active
  * dv versions once, and binary-searches per row. A byte-budgeted LRU
  * (`graft.dv.sidecarCacheBytes`, default 512 MB) bounds executor memory;
  * eviction only re-pays a sidecar read. */
object DvSidecarCache {
  /** Cache budget resolution order: the Hadoop Configuration that ships
    * with the expression (set cluster-wide via
    * `--conf spark.hadoop.graft.dv.sidecarCacheBytes=N` — session Hadoop
    * confs propagate to every executor), then a JVM system property
    * (local mode / tests ONLY: a driver-side System.setProperty does NOT
    * reach executor JVMs in cluster mode — r13 ADVICE #4), then 512 MB. */
  private def maxBytes(conf: org.apache.hadoop.conf.Configuration): Long = {
    val fromConf = conf.get("graft.dv.sidecarCacheBytes")
    if (fromConf != null) fromConf.toLong
    else sys.props.get("graft.dv.sidecarCacheBytes").map(_.toLong).getOrElse(512L << 20)
  }
  // access-order LRU; guarded by its own monitor
  private val lru = new java.util.LinkedHashMap[String, Array[Long]](128, 0.75f, true)
  private var used = 0L

  def sidecarName(rel: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(rel.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "f-" + h.map(b => f"$b%02x").mkString + ".bin"
  }

  private def load(path: String, conf: org.apache.hadoop.conf.Configuration): Array[Long] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val hfs = hp.getFileSystem(conf)
    val n = (hfs.getFileStatus(hp).getLen / 8).toInt
    val out = new Array[Long](n)
    val dis = new java.io.DataInputStream(new java.io.BufferedInputStream(hfs.open(hp), 1 << 16))
    try { var i = 0; while (i < n) { out(i) = dis.readLong(); i += 1 } } finally dis.close()
    out
  }

  /** merged sorted positions of `rel` across the active dv dirs (cached;
    * empty array — also cached — for the no-tombstone common case) */
  def positions(dirs: Seq[String], present: Set[String], rel: String,
                conf: org.apache.hadoop.conf.Configuration): Array[Long] = {
    val key = dirs.mkString("\u0001") + "\u0002" + rel
    lru.synchronized { val hit = lru.get(key); if (hit != null) return hit }
    val name = sidecarName(rel)
    val hits = dirs.map(d => s"$d/_sidecar/$name").filter(present.contains)
    val arr =
      if (hits.isEmpty) Array.empty[Long]
      else if (hits.size == 1) load(hits.head, conf)
      else { val a = hits.toArray.flatMap(load(_, conf)); java.util.Arrays.sort(a); a }
    val budget = maxBytes(conf)
    lru.synchronized {
      if (!lru.containsKey(key)) {
        used += 8L * arr.length + 64
        lru.put(key, arr)
        val it = lru.entrySet().iterator()
        while (used > budget && it.hasNext) {
          val e = it.next()
          if (e.getKey != key) { used -= 8L * e.getValue.length + 64; it.remove() }
        }
      }
    }
    arr
  }

  def tombstoned(dirs: Seq[String], present: Set[String], rel: String, ri: Long,
                 conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val arr = positions(dirs, present, rel, conf)
    arr.length > 0 && java.util.Arrays.binarySearch(arr, ri) >= 0
  }
}

/** [[DvTombstoned]]'s above-threshold sibling: the same scan-side codegen
  * predicate shape, but the tombstones are NOT broadcast — each executor
  * lazily loads only the per-file sidecars of the files its tasks scan
  * ([[DvSidecarCache]]). Only the sidecar presence SET (one string per
  * tombstoned file) is broadcast, so driver/executor memory is O(touched
  * files), never O(tombstoned rows). The filter stays inside the
  * whole-stage-codegen span — no exchange at any tombstone volume. */
case class DvTombstonedScan(file: Expression, rowIndex: Expression,
                            dvDirs: Seq[String],
                            present: Broadcast[Set[String]],
                            conf: SerializableHadoopConf)
  extends BinaryExpression with Predicate {

  override def left: Expression = file
  override def right: Expression = rowIndex
  override def nullable: Boolean = false
  override def prettyName: String = "dv_tombstoned_scan"

  // single-entry memo: a task reads ONE file split, so the rel repeats for
  // millions of consecutive rows — resolve (md5 name + LRU lookup + load)
  // only at file transitions and pay one byte-compare per row. Written as
  // one immutable pair so a racing task sharing this deserialized instance
  // can at worst overwrite it with another VALID entry (benign; the arrays
  // are immutable). Measured: without the memo the per-row
  // MessageDigest.getInstance + synchronized cache made this path slower
  // than the anti-join it replaces (4.6 s vs 2.1 s on 2.7M rows).
  @transient private var memo: (UTF8String, Array[Long]) = _

  def contains(f: UTF8String, ri: Long): Boolean = {
    var m = memo
    if (m == null || !m._1.equals(f)) {
      m = (f.clone(), DvSidecarCache.positions(dvDirs, present.value, f.toString, conf.value))
      memo = m
    }
    m._2.length > 0 && java.util.Arrays.binarySearch(m._2, ri) >= 0
  }

  override def nullSafeEval(f: Any, ri: Any): Any =
    contains(f.asInstanceOf[UTF8String], ri.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvScanExpr", this)
    nullSafeCodeGen(ctx, ev, (f, ri) => s"${ev.value} = $ref.contains($f, $ri);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DvTombstonedScan =
    copy(file = newLeft, rowIndex = newRight)
}
