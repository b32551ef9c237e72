package graft.multimodal

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract / resize /
  * frame-sample run as batched per-partition functions over `Dataset[T]`
  * (the Scala analog of `mapInPandas`: one iterator per partition, vectorized
  * batch inside, no per-row driver round-trips, no shuffle).
  *
  * The container has no image/audio codecs, so the decode kernel itself is a
  * clearly marked STUB (`decodeStub`) producing deterministic fake features
  * from the bytes — everything around it (schema, binary column handling,
  * partition-level batching, feature schema) is real and tested.
  */
final case class MediaMeta(mime: String, nBytes: Long)
final case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
final case class MediaFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    brightness: Double)

object Multimodal {

  /** Build the media table: documents' text bytes stand in for an encoded
    * media payload (`binary` column + metadata struct) — the schema a real
    * 100 TB multimodal table would have.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          lit("application/octet-stream").as("mime"),
          octet_length(col("text")).cast("long").as("nBytes")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decode kernel: a real implementation would call an image/audio
    * codec here (per batch, inside the partition). This deterministic fake
    * derives "dimensions" and a "brightness" feature from the raw bytes so
    * the full pipeline is testable end-to-end without codecs.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    MediaFeatures(
      doc_id = r.doc_id,
      width = 64 + (n % 64),
      height = 64 + ((n / 64) % 64),
      n_frames = 1 + (n % 4),
      brightness = if (n == 0) 0.0 else sum.toDouble / n.toDouble)
  }

  /** Batched per-partition decode/feature-extract (mapPartitions = one
    * iterator per partition; the batch loop amortizes any per-batch codec
    * setup, exactly like a Pandas-UDF batch).
    */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup (codec init) would happen here
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** STUB resize kernel: a real implementation would decode, rescale with a
    * codec, and re-encode; this deterministic fake downsamples the raw bytes
    * by striding (keeping the batched-per-partition shape identical to the
    * real thing). Output payload length == ceil(n / stride).
    */
  def resizeStub(r: MediaRecord, stride: Int): MediaRecord = {
    require(stride > 0)
    val resized = r.payload.indices.collect { case i if i % stride == 0 => r.payload(i) }.toArray
    r.copy(
      payload = resized,
      meta = r.meta.copy(nBytes = resized.length.toLong))
  }

  /** Batched per-partition resize (same mapPartitions shape as decode). */
  def resize(media: Dataset[MediaRecord], stride: Int = 4, batchSize: Int = 256): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map(resizeStub(_, stride)))
    }
  }

  /** Frame sampling: pick every k-th "frame" offset from a payload —
    * demonstrated as a generator (posexplode over a computed offset array),
    * staying codegen-friendly.
    */
  def sampleFrames(media: Dataset[MediaRecord], everyK: Int = 100): DataFrame =
    media.toDF()
      .select(
        col("doc_id"),
        col("meta.nBytes").as("n_bytes"),
        posexplode(sequence(lit(0), greatest(col("meta.nBytes") - 1, lit(0)), lit(everyK.toLong))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_offset")

  /** Oracle-checked plumbing query: binary length + head bytes as hex —
    * byte-exact in both engines.
    */
  val mediaPlumbing: QueryDef = QueryDef(
    "multimodal_plumbing",
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
      |  lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS head_hex
      |FROM documents""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).select(
      col("doc_id"),
      octet_length(col("text")).as("n_bytes"),
      lower(hex(substring(col("text"), 1, 8).cast("binary"))).as("head_hex"))
  }

  /** Feature extraction end-to-end (binary -> batched stub decode ->
    * features). The decode stub is deterministic arithmetic over the payload
    * bytes, so the oracle recomputes it in SQL (the corpus is ASCII, so byte
    * values are `ord` of chars); ScalaTest additionally pins exact values on
    * known inputs. A real codec kernel would stay rows-only.
    */
  val mediaFeatures: QueryDef = QueryDef(
    "multimodal_features",
    """SELECT doc_id,
      |  CAST(64 + (n % 64) AS INTEGER) AS width,
      |  CAST(64 + ((n // 64) % 64) AS INTEGER) AS height,
      |  CAST(1 + (n % 4) AS INTEGER) AS n_frames,
      |  CASE WHEN n = 0 THEN 0.0
      |       ELSE CAST(bsum AS DOUBLE) / CAST(n AS DOUBLE) END AS brightness
      |FROM (
      |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n,
      |         list_sum(list_transform(range(1, length(text) + 1),
      |                                 i -> ord(text[i]))) AS bsum
      |  FROM documents)""".stripMargin) { (spark, dir) =>
    extractFeatures(mediaTable(spark, dir)).toDF()
  }

  /** Multimodal record assembly: text document ⋈ its embedding vector ⋈ the
    * binary payload + typed metadata — the joined (text, vector, media)
    * row shape a multimodal training pipeline feeds downstream. Oracle
    * checks the join and the per-modality derived columns.
    */
  val multimodalJoin: QueryDef = QueryDef(
    "multimodal_join",
    """SELECT d.doc_id, d.lang, e.label,
      |  CAST(octet_length(CAST(d.text AS BLOB)) AS INTEGER) AS n_bytes,
      |  CAST(len(e.embedding) AS INTEGER) AS dim,
      |  CAST(list_sum(list_transform(
      |         list_transform(e.embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)),
      |         v -> v * v)) AS BIGINT) AS q_norm2
      |FROM documents d
      |JOIN embeddings e ON e.vec_id = d.doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir).selectExpr(
      "vec_id", "label",
      "CAST(size(embedding) AS INT) AS dim",
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q")
    docs.join(emb, col("vec_id") === col("doc_id"))
      .select(
        col("doc_id"), col("lang"), col("label"),
        octet_length(col("text")).as("n_bytes"),
        col("dim"),
        graft.functions.VectorFunctions.longDot(col("q"), col("q")).as("q_norm2"))
  }

  /** Frame sampling through the gate: every 100th byte offset of each
    * payload as a (doc_id, frame_idx, frame_offset) row — the video-style
    * "sample every k-th frame" generator whose output feeds per-frame
    * decode at 100 TB. Pure row-local expansion (`posexplode` over a
    * computed `sequence` — zero shuffles, output volume = Σ ceil(bytes/k));
    * the oracle replays the offset arithmetic with `range`, so the gate
    * proves the generator's indexing, not just its row count.
    */
  val frameSample: QueryDef = QueryDef(
    "multimodal_frame_sample",
    """SELECT doc_id,
      |  CAST(o // 100 AS INTEGER) AS frame_idx,
      |  CAST(o AS BIGINT) AS frame_offset,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      |FROM documents,
      |  UNNEST(range(0, CAST(greatest(octet_length(CAST(text AS BLOB)), 1) AS BIGINT), 100))
      |    AS u(o)""".stripMargin) { (spark, dir) =>
    sampleFrames(mediaTable(spark, dir), everyK = 100)
      .select(
        col("doc_id"),
        col("frame_idx").cast("int").as("frame_idx"),
        col("frame_offset").cast("long").as("frame_offset"),
        col("n_bytes"))
  }

  val all: Seq[QueryDef] = Seq(mediaPlumbing, mediaFeatures, multimodalJoin, frameSample)
}
