package graft.sources

import org.apache.hadoop.io.compress.{CompressionInputStream, CompressionOutputStream, Compressor, DefaultCodec}
import java.io.{InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Hadoop codec for `.zip`-packed text files (enterprise CSV drops are
  * routinely zip archives, which Spark's gzip/bzip2 codecs don't cover).
  * Reads the FIRST archive entry; writes a single entry (`data.csv`).
  * Reference: `workflow/dataobject/ZipCsvCodec.scala` — write-only there;
  * here [[GraftZipCodec.register]] also wires the codec into the Hadoop
  * codec factory so `.zip` inputs decompress transparently on READ.
  *
  * Scale note: zip (like gzip) is a non-splittable stream — one task per
  * archive. Fine for the many-medium-files drop pattern; repack to a
  * splittable layout for single huge archives.
  */
class GraftZipCodec extends DefaultCodec {
  override def createInputStream(in: InputStream): CompressionInputStream =
    new GraftZipCodec.FirstEntryInputStream(new ZipInputStream(in))
  // record readers obtain a pooled (de)compressor and call the two-arg
  // variants — both must bypass the inherited zlib streams
  override def createInputStream(in: InputStream,
      d: org.apache.hadoop.io.compress.Decompressor): CompressionInputStream =
    createInputStream(in)
  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new GraftZipCodec.SingleEntryOutputStream(new ZipOutputStream(out), "data.csv")
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)
  override def getDefaultExtension: String = ".zip"
}

object GraftZipCodec {
  /** register for `.zip` files in the session's Hadoop conf so text-based
    * reads (csv/json/text) decompress automatically */
  def register(ctx: graft.core.ActionPipelineContext): Unit = {
    val conf = ctx.spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val cls = classOf[GraftZipCodec].getName
    val existing = Option(conf.get(key)).filter(_.nonEmpty)
    if (!existing.exists(_.contains(cls)))
      conf.set(key, (existing.toSeq :+ cls).mkString(","))
  }

  private class FirstEntryInputStream(zin: ZipInputStream) extends CompressionInputStream(zin) {
    // skip DIRECTORY entries: `zip -r` stores the root dir first, and a
    // directory entry has no data — stopping there would read the whole
    // archive as zero bytes (silent empty table)
    locally {
      var e = zin.getNextEntry
      while (e != null && e.isDirectory) e = zin.getNextEntry
      require(e != null, "zip archive contains no file entries")
    }
    override def read(): Int = {
      val one = new Array[Byte](1)
      if (read(one, 0, 1) == -1) -1 else one(0) & 0xff
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = zin.read(b, off, len)
    override def resetState(): Unit = ()
  }

  private class SingleEntryOutputStream(zout: ZipOutputStream, entryName: String)
    extends CompressionOutputStream(zout) {
    zout.putNextEntry(new ZipEntry(entryName))
    override def write(b: Int): Unit = zout.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit = zout.write(b, off, len)
    override def finish(): Unit = { zout.closeEntry(); zout.finish() }
    override def resetState(): Unit = ()
  }
}
