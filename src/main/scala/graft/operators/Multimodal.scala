package graft.operators

import graft.core.ActionPipelineContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns: opaque `binary` content + typed
  * metadata struct, with decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`StubCodecs`) — but the Spark-side
  * plumbing is real and what matters at 100 TB:
  *  - binary + metadata schema ([[mediaSchema]]) matching the binaryFile
  *    source, so `spark.read.format("binaryFile")` feeds straight in;
  *  - decode runs via `mapPartitions` over batches of rows (the Scala
  *    equivalent of `mapInPandas`: one iterator per partition, vectorizable
  *    batch shape, no per-row driver round-trips);
  *  - media rows are large — `repartitionByRange` on size buckets keeps
  *    task memory bounded instead of letting one partition collect all the
  *    4K videos.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** STUB decode: derives deterministic metadata from the first bytes.
    * Replace with a real codec (javax.imageio / ffmpeg bindings) in an
    * environment that ships them — the call shape stays identical. */
  object StubCodecs {
    def imageMeta(content: Array[Byte]): (Int, Int, Int, String) = {
      if (content == null || content.isEmpty) return (0, 0, 0, "empty")
      // ??? real impl: ImageIO.read(new ByteArrayInputStream(content))
      val h = java.util.Arrays.hashCode(content)
      (256 + math.abs(h % 1024), 256 + math.abs((h / 1024) % 1024), 3, "stub")
    }
    /** STUB pixel decode → fixed-length float features (hash-derived) */
    def imageFeatures(content: Array[Byte], dim: Int): Array[Float] = {
      val seed = java.util.Arrays.hashCode(content)
      val rnd = new scala.util.Random(seed)
      Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    }
  }

  /** Attach decoded metadata via mapPartitions (batched, executor-side). */
  def withImageMetadata(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("image_meta", imageMetaSchema))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c, f) = StubCodecs.imageMeta(r.getAs[Array[Byte]](contentIdx))
        Row.fromSeq(r.toSeq :+ Row(w, h, c, f))
      }
    }(enc)
  }

  /** Feature extraction: content → Array[Float] embedding column (stub
    * features, real batched execution shape). */
  def withImageFeatures(df: DataFrame, contentCol: String = "content",
                        dim: Int = 64, featureCol: String = "features"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(featureCol, ArrayType(FloatType, containsNull = false)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ StubCodecs.imageFeatures(r.getAs[Array[Byte]](contentIdx), dim).toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk of
    * `frameSize` bytes, as an array of binary frames — pure builtin
    * expressions (no decode needed for containerless formats). */
  def sampleFrames(df: DataFrame, contentCol: String, frameSize: Int, stride: Int,
                   framesCol: String = "frames"): DataFrame =
    df.withColumn(framesCol,
      transform(
        sequence(lit(0),
          greatest((length(col(contentCol)) / (frameSize * stride)).cast(IntegerType) - 1, lit(0))),
        i => substring(col(contentCol), (i * frameSize * stride + 1).cast(IntegerType), lit(frameSize))))

  /** Size-bucketed repartition: bounds task memory when payload sizes are
    * heavily skewed (mix of thumbnails and 4K frames). */
  def repartitionBySize(df: DataFrame, contentCol: String, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, length(col(contentCol)))
}
