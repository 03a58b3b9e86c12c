package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column convention (SURVEY.md §2.8): media travel as opaque
  * `binary` payloads inside a typed struct with metadata — the schema,
  * partitioning, and batch shape are real Spark; only the codec itself is
  * stubbed (no image/audio libraries in this environment).
  *
  * Layout: `media: struct<bytes binary, mime string, width int, height int,
  * duration_ms bigint>`. At 100 TB the payload column dominates: keep media
  * tables bucketed by id, project metadata-only when possible (Parquet column
  * pruning skips the blob pages entirely), and decode per-partition in
  * batches.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a string column as a fake media payload (deterministic: utf-8
    * bytes; metadata derived from content so tests are reproducible). */
  def mediaFromText(text: org.apache.spark.sql.Column, mime: String): org.apache.spark.sql.Column =
    struct(
      encode(text, "UTF-8").as("bytes"),
      lit(mime).as("mime"),
      (length(text) % 1920).cast(IntegerType).as("width"),
      (length(text) % 1080).cast(IntegerType).as("height"),
      (length(text) * 40L).cast(LongType).as("duration_ms"))

  /** Metadata-only projection — never touches the blob pages. */
  def metadata(df: DataFrame, mediaCol: String): DataFrame =
    df.select(col("*"), col(s"$mediaCol.mime"), col(s"$mediaCol.width"),
      col(s"$mediaCol.height"), col(s"$mediaCol.duration_ms")).drop(mediaCol)

  final case class MediaRow(doc_id: Long, bytes: Array[Byte], mime: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, feature: Array[Float])

  /** STUB decoder: real pipelines decode image/audio here (the libraries are
    * not in this container). The Spark-side plumbing is real — typed Dataset
    * in, per-partition batch iteration, fixed-width feature vector out — and
    * the stub is deterministic: a 8-dim byte-histogram sketch standing in for
    * a model embedding. */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media.bytes").as("bytes"), col("media.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // batch loop: one decoder instance per partition, like a real codec
        rows.map { r =>
          val hist = new Array[Float](8)
          var i = 0
          while (i < r.bytes.length) { hist((r.bytes(i) & 0xff) % 8) += 1f; i += 1 }
          val n = math.max(r.bytes.length, 1).toFloat
          MediaFeatures(r.doc_id, r.bytes.length.toLong, hist.map(_ / n))
        }
      }
  }

  /** STUB resize: downsample the payload to a byte budget by stride
    * sampling — keep every k-th byte, k = ⌈len/budget⌉ — standing in for
    * image down-scaling; metadata scales with the same factor so the
    * struct stays self-consistent. Deterministic and content-derived like
    * the other stubs; the payload is utf-8 of ASCII testdata text, so the
    * byte stride is also a character stride and the DuckDB twin can slice
    * characters (same ASCII contract as sampleFrames). */
  def resize(media: org.apache.spark.sql.Column, budget: Int): org.apache.spark.sql.Column = {
    val raw = decode(media.getField("bytes"), "UTF-8")
    val len = length(raw)
    // clamp to >=1: an empty payload has ceil(0/budget)=0, which must not
    // reach the stride/metadata divisions (no-op for any non-empty payload)
    val k = greatest(ceil(len / lit(budget.toDouble)), lit(1)).cast(IntegerType)
    // let-bind the decoded payload as a lambda VARIABLE: interpreted HOFs
    // re-evaluate non-variable subtrees per invocation, so referencing the
    // decode directly inside the sampling lambda would decode the full
    // payload once per sampled byte (~budget× per row). The 1-element
    // transform wrapper (TextFns.shingles idiom) decodes once per row; the
    // stride bounds are arguments to the inner transform, also once per row.
    val strided = element_at(transform(array(raw), txt => {
      val l = length(txt)
      val kk = greatest(ceil(l / lit(budget.toDouble)), lit(1)).cast(IntegerType)
      when(l > 0,
        array_join(transform(sequence(lit(1), l, kk), i => txt.substr(i, lit(1))), ""))
        .otherwise(lit(""))
    }), 1)
    struct(
      encode(strided, "UTF-8").as("bytes"),
      media.getField("mime").as("mime"),
      ceil(media.getField("width") / k).cast(IntegerType).as("width"),
      ceil(media.getField("height") / k).cast(IntegerType).as("height"),
      media.getField("duration_ms").as("duration_ms"))
  }

  /** STUB frame sampler: slice the payload into `n` contiguous frames —
    * stands in for video frame extraction; produces one row per frame, the
    * real explode shape for downstream per-frame featurization. Boundaries
    * are cumulative floor(i·len/n) offsets, so frames tile the payload with
    * no gaps (independent per-frame truncation would silently skip bytes). */
  def sampleFrames(df: DataFrame, mediaCol: String, n: Int): DataFrame = {
    val len = length(col(s"$mediaCol.bytes"))
    def off(i: org.apache.spark.sql.Column) = (i * len / n).cast(IntegerType)
    df.select(col("doc_id"), posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => col(s"$mediaCol.bytes").substr(off(i) + 1, off(i + 1) - off(i)))))
      .toDF("doc_id", "frame_idx", "frame_bytes")
  }
}
