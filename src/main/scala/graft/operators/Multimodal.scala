package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata. */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                    width: Int, height: Int, sample_rate: Int)

/** Output of the (stubbed) decode/feature-extract stage. */
case class MediaFeatures(media_id: Long, kind: String, batch_size: Int,
                         n_bytes: Long, byte_sum: Long, f0: Double, f1: Double)

/** Per-frame features: media id + frame ordinal + the decode output. */
case class FrameFeatures(media_id: Long, frame_id: Int, kind: String,
                         batch_size: Int, n_bytes: Long, byte_sum: Long,
                         f0: Double, f1: Double)

/** Multimodal plumbing (SURVEY.md §2.6): image/audio/video handled as
  * opaque `binary` columns with typed metadata, decoded/feature-extracted
  * in BATCHES via mapPartitions — the Spark-side shape of a Pandas-UDF /
  * mapInPandas pipeline. No media libraries exist in this container, so
  * the decode kernel is a clearly-marked DETERMINISTIC STUB
  * ([[Multimodal.stubDecode]]); everything around it — schema, binary
  * payload, partitioning, batch accumulation, feature struct — is real
  * and is what a production decoder would drop into.
  *
  * Scale: decode is the expensive stage, so it must see batches (GPU /
  * vectorized codecs amortize per-call cost); `mapPartitions` + grouped(N)
  * gives exactly that with zero shuffle — decode parallelism = input
  * partitions.
  */
object Multimodal {

  val BatchSize = 32

  /** Synthesize the media table from `documents`: payload = UTF-8 bytes
    * (an opaque blob as far as the pipeline is concerned), kind cycles
    * image/audio/video, metadata derived deterministically. At 100 TB
    * this is a straight map over the scan — no shuffle.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (lit(64) + (col("doc_id") * 37) % 1024).cast("int").as("width"),
      (lit(64) + (col("doc_id") * 53) % 768).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).as("sample_rate"))

  /** `mm_binary_meta`: the typed-metadata view of the binary column —
    * byte size via octet_length semantics, per-kind counts stay in SQL.
    */
  def binaryMeta(docs: DataFrame): DataFrame =
    mediaTable(docs)
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("width"), col("height"), col("sample_rate"))
      .orderBy(col("media_id"))

  /** The decode seam (VERDICT r5 #8): the ONE injection point where a
    * real codec enters the pipeline. Implementations must be
    * Serializable (the instance ships inside the task closure to every
    * executor) and batch-shaped (a whole `Seq` per call — GPU/vectorized
    * codecs amortize per-call cost across the batch). Swapping in a
    * JNI/ONNX decoder touches NOTHING but this trait: partitioning,
    * batching, schema and frame attribution all live in the pipeline.
    * Stateful codecs should lazily initialize native handles on first
    * `decode` (once per executor JVM, not per task — standard
    * lazy-transient discipline).
    */
  trait MediaDecoder extends Serializable {
    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** STUB decoder — stands in for the real image/audio codec (not in
    * this container). Deterministic pure function of the payload bytes
    * so the pipeline is testable end-to-end.
    */
  object StubDecoder extends MediaDecoder {
    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { m =>
        var sum = 0L; var i = 0
        while (i < m.payload.length) { sum += m.payload(i) & 0xff; i += 1 }
        MediaFeatures(m.media_id, m.kind, batch.size, m.payload.length.toLong, sum,
          f0 = (sum % 1000) / 1000.0,
          f1 = if (m.payload.isEmpty) 0.0 else sum.toDouble / m.payload.length)
      }
  }

  /** The default decode kernel ([[StubDecoder]]) as a function — kept as
    * the direct-call surface specs and docs reference.
    */
  def stubDecode(batch: Seq[MediaRow]): Seq[MediaFeatures] = StubDecoder.decode(batch)

  /** `mm_batch_pipeline`: Dataset[MediaRow] → per-partition batches of
    * [[BatchSize]] → `decoder.decode` → Dataset[MediaFeatures]. The
    * grouped iterator never materializes a partition — memory is
    * O(BatchSize), not O(partition).
    */
  def batchPipeline(media: Dataset[MediaRow],
                    decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(b => decoder.decode(b)))
  }

  def mediaDataset(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    mediaTable(docs).as[MediaRow]
  }

  /** STUB resize — stands in for an image scaler: recomputes metadata
    * exactly, "resamples" the payload deterministically to the byte
    * budget a w×h thumbnail would occupy (stride subsampling). The
    * plumbing (pure row transform, no shuffle) is what a real scaler
    * drops into.
    */
  def stubResize(m: MediaRow, w: Int, h: Int): MediaRow = {
    if (m.payload.isEmpty) return m.copy(width = w, height = h)
    val budget = math.max(1, math.min(m.payload.length, w * h / 8))
    // ceil stride so the output never exceeds the thumbnail byte budget
    val stride = (m.payload.length + budget - 1) / budget
    val out = Array.tabulate((m.payload.length + stride - 1) / stride)(i => m.payload(i * stride))
    m.copy(payload = out, width = w, height = h)
  }

  /** STUB frame sampler — for video rows, emit n evenly-spaced "frames"
    * (deterministic payload slices with their frame index); non-video
    * rows pass through as a single frame. Shape-wise this is exactly
    * uniform frame sampling before per-frame feature extraction.
    */
  def stubFrameSample(m: MediaRow, n: Int): Seq[(Int, MediaRow)] =
    if (m.kind != "video" || m.payload.length < n || n <= 1) Seq(0 -> m)
    else {
      val span = m.payload.length / n
      (0 until n).map { f =>
        f -> m.copy(payload = m.payload.slice(f * span, (f + 1) * span))
      }
    }

  /** Frame-level pipeline: sample frames (video) → batch → decode,
    * keeping the frame ordinal on every output row so per-frame features
    * stay attributable. Composes the same mapPartitions batching as
    * [[batchPipeline]]; at 100 TB frame explosion happens inside the
    * partition, never through a shuffle.
    */
  def framePipeline(media: Dataset[MediaRow], framesPerVideo: Int = 4,
                    decoder: MediaDecoder = StubDecoder): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_
      .flatMap(m => stubFrameSample(m, framesPerVideo))
      .grouped(BatchSize)
      .flatMap { batch =>
        decoder.decode(batch.map(_._2)).zip(batch).map { case (f, (frameId, _)) =>
          FrameFeatures(f.media_id, frameId, f.kind, f.batch_size, f.n_bytes,
            f.byte_sum, f.f0, f.f1)
        }
      })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> ((s, d) => binaryMeta(Tables.documents(s, d))),
    // batch_size depends on physical partitioning → project it away in
    // the driver-visible result; the spec asserts the batching itself
    "mm_batch_pipeline" -> ((s, d) =>
      batchPipeline(mediaDataset(Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("byte_sum"),
          round(col("f0"), 6).as("f0"), round(col("f1"), 6).as("f1"))
        .orderBy(col("media_id"))),
    "mm_frame_features" -> ((s, d) =>
      framePipeline(mediaDataset(Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("frame_id"), col("kind"), col("n_bytes"),
          col("byte_sum"), round(col("f0"), 6).as("f0"), round(col("f1"), 6).as("f1"))
        .orderBy(col("media_id"), col("frame_id"))))

  val oracle: Map[String, String] = Map(
    // the corpus is ASCII, so the UTF-8 byte sum equals the codepoint sum
    // and the stub-decode features are SQL-expressible end-to-end.
    // Empty documents: list_sum over [] is NULL in DuckDB and x/0 errors,
    // while stubDecode emits byte_sum=0, f1=0.0 — COALESCE + CASE mirror
    // the stub's empty-payload branch (ADVICE r2).
    "mm_batch_pipeline" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(COALESCE(list_sum(list_transform(string_split(text, ''), c -> unicode(c))), 0) AS BIGINT) AS byte_sum
        | FROM documents)
        |SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | n_bytes, byte_sum,
        | round((byte_sum % 1000) / 1000.0, 6) AS f0,
        | CASE WHEN n_bytes = 0 THEN 0.0 ELSE round(byte_sum * 1.0 / n_bytes, 6) END AS f1
        |FROM s ORDER BY media_id""".stripMargin,
    // uniform frame sampling mirrored in SQL: video rows with >= 4 bytes
    // emit 4 stride-span character slices (ASCII corpus: chars == bytes;
    // the len % 4 tail is dropped, matching stubFrameSample's slice
    // bounds); everything else passes through as frame 0
    "mm_frame_features" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  text FROM documents),
        |fr AS (
        | SELECT media_id, kind, 0 AS frame_id, text AS payload FROM m
        |  WHERE kind <> 'video' OR length(text) < 4
        | UNION ALL
        | SELECT media_id, kind, CAST(f AS INT) AS frame_id,
        |   substr(text, CAST(f * (length(text) // 4) + 1 AS INT), CAST(length(text) // 4 AS INT)) AS payload
        |  FROM m, range(0, 4) r(f)
        |  WHERE kind = 'video' AND length(text) >= 4),
        |s AS (SELECT media_id, frame_id, kind,
        |  CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
        |  CAST(COALESCE(list_sum(list_transform(string_split(payload, ''), c -> unicode(c))), 0) AS BIGINT) AS byte_sum
        | FROM fr)
        |SELECT media_id, frame_id, kind, n_bytes, byte_sum,
        | round((byte_sum % 1000) / 1000.0, 6) AS f0,
        | CASE WHEN n_bytes = 0 THEN 0.0 ELSE round(byte_sum * 1.0 / n_bytes, 6) END AS f1
        |FROM s ORDER BY media_id, frame_id""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(64 + (doc_id * 37) % 1024 AS INT) AS width,
        | CAST(64 + (doc_id * 53) % 768 AS INT) AS height,
        | CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate
        |FROM documents ORDER BY media_id""".stripMargin)
}
