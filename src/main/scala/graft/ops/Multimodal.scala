package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with a typed metadata struct, and a partition-wise feature-extraction
  * operator.
  *
  * The real decode step (image/audio codecs) is STUBBED — the container
  * has no media libraries — with a deterministic byte-level surrogate
  * (moment statistics over the payload bytes). Everything around the stub
  * is production-shaped: payloads stay off the driver, extraction runs as
  * `mapPartitions` over the typed Dataset (one JVM-side pass per
  * partition, the same batch shape a JNI/codec bridge would use), and the
  * output is a fixed-width feature schema that downstream similarity
  * operators can consume.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      kind: String, n_bytes: Long)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      byte_mean: Double, byte_var: Double, head_hex: String)

  /** Attach a binary payload + metadata columns to a text table — the
    * ingestion shape for any media column (here the payload is the UTF-8
    * encoding of the text; for real media it would be the file bytes). */
  def withBinaryPayload(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("kind"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** Partition-wise "decode + featurize". The decode is the stub: a real
    * implementation would hand `payload` to a codec and emit pixel/sample
    * features; the surrogate computes deterministic byte statistics so
    * the plumbing (partitioning, schema, batching) is fully testable. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        // --- stubbed decode: byte moments instead of codec output ---
        var sum = 0.0; var sumSq = 0.0
        var i = 0
        while (i < r.payload.length) {
          val b = r.payload(i) & 0xff
          sum += b; sumSq += b.toDouble * b; i += 1
        }
        val n = math.max(r.payload.length, 1)
        val mean = sum / n
        val headHex = r.payload.take(4).map("%02X".format(_)).mkString
        MediaFeatures(r.doc_id, r.n_bytes, mean, sumSq / n - mean * mean, headHex)
      }
    }.toDF()
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int,
      frame_hex: String)

  /** Frame sampling: every `stride`-th fixed-width block of the payload
    * — the video/audio prep step (sample 1 frame per second, 1 window per
    * hop) expressed over the opaque binary column. Like [[extractFeatures]]
    * the "decode" is positional (a real codec would parse container
    * frames); the distribution shape is the production one: one streamed
    * pass per partition, payloads never leave the executors, output rows
    * explode ~payload/(frameSize·stride)-fold. Deterministic in content
    * and order regardless of partitioning (keyed by doc_id, frame_idx). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameSize: Int = 32, stride: Int = 4): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val step = frameSize * stride
        Iterator.range(0, math.max(r.payload.length, 1), step).zipWithIndex
          .map { case (off, idx) =>
            val end = math.min(off + frameSize, r.payload.length)
            val frame = java.util.Arrays.copyOfRange(r.payload, off, math.max(end, off))
            Frame(r.doc_id, idx, frame.length,
              frame.take(8).map("%02X".format(_)).mkString)
          }
      }
    }.toDF()
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- binary column + metadata + expression-level byte features.
    //      (The mapPartitions path is exercised by MultimodalSpec; this
    //      query pins the SQL-expressible subset against DuckDB.) ----
    "q40_multimodal_meta" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), lit("text/plain").as("kind"),
            octet_length(col("text")).cast("long").as("n_bytes"),
            hex(encode(substring(col("text"), 1, 4), "UTF-8")).as("head_hex"),
            md5(col("text")).as("content_md5"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, 'text/plain' AS kind,
               octet_length(encode(text)) AS n_bytes,
               hex(encode(substring(text, 1, 4))) AS head_hex,
               md5(text) AS content_md5
             FROM documents
             ORDER BY doc_id""")),
  )
}
