package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata.
  *
  * The container has no codec libraries, so the *decode* step is a
  * clearly-marked deterministic stub ([[FakeDecoder]]); the Spark-side
  * plumbing — binary schema, batched partition-wise decode, frame
  * explosion shape — is real and tested. On a real cluster the stub
  * body is replaced by a JNI/codec call with the identical signature.
  */
object Multimodal {

  /** Decoded-media metadata produced per blob. */
  final case class MediaMeta(doc_id: Long, n_bytes: Int, content_md5: String,
                             sniffed: String, width: Int, height: Int)

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec. Derives fake dimensions from the content digest so results
    * are stable across runs/engines. Replace body for real decoding.
    */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val hex = md.map("%02x".format(_)).mkString
      val sniffed = if (bytes.nonEmpty && bytes(0) < 'm') "typeA" else "typeB"
      // fake dimensions: 8..128 in steps derived from digest nibbles
      val w = 8 + (Character.digit(hex.charAt(0), 16) % 8) * 16
      val h = 8 + (Character.digit(hex.charAt(1), 16) % 8) * 16
      MediaMeta(docId, bytes.length, hex, sniffed, w, h)
    }
  }

  /** Partition-wise batched decode over a binary column — the real
    * plumbing path (mapPartitions: one decoder instance per partition,
    * rows streamed, no driver collection).
    */
  def decodePartitions(df: DataFrame, id: Column, bin: Column): Dataset[MediaMeta] = {
    val src = df.select(id.cast("long").as("doc_id"), bin.as("payload"))
    src.mapPartitions { rows =>
      rows.map { r => FakeDecoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }(Encoders.product[MediaMeta])
  }

  /** Column-expression twin of the metadata extraction (used by the
    * oracle-checked query surface: identical math, pure Catalyst).
    */
  def binaryMeta(df: DataFrame, id: Column, text: Column): DataFrame = {
    val bin = encode(text, "UTF-8")
    val h = md5(bin)
    df.select(id.as("doc_id"),
      octet_length(bin).cast("long").as("n_bytes"),
      h.as("content_md5"),
      when(substring(text, 1, 1) < "m", lit("typeA")).otherwise(lit("typeB")).as("sniffed"),
      (lit(8) + (conv(substring(h, 1, 1), 16, 10).cast("int") % 8) * 16).as("width"),
      (lit(8) + (conv(substring(h, 2, 1), 16, 10).cast("int") % 8) * 16).as("height"))
  }

  /** STUB feature extractor — deterministic fake embedding standing in
    * for a vision/text encoder (no model runtimes in this sandbox).
    * Dimension d = (md5(content||':'||d) first 8 hex as int) mod 2001,
    * shifted to [-1000, 1000] and scaled to [-1, 1] — md5-replayable
    * by any engine, so the downstream ANN hand-off is oracle-checked.
    * On a real cluster this column is produced by a batched model UDF
    * (mapPartitions/mapInPandas over the binary payload) with the
    * identical `array<double>` signature; everything downstream —
    * schema, normalization, top-k search — is unchanged.
    */
  def fakeEmbedding(content: Column, dims: Int): Column =
    array((0 until dims).map { d =>
      ((conv(substring(md5(concat(content, lit(s":$d"))), 1, 8), 16, 10)
        .cast("long") % 2001 - 1000).cast("double") / 1000.0)
    }: _*)

  /** STUB resize — the downsample plumbing of an image/audio resize
    * stage: keep every `step`-th payload unit up to `maxUnits` kept
    * units (deterministic pixel-decimation stand-in; on a cluster the
    * selection becomes a real scaler with the identical in/out
    * shape). Output per doc: original size, resized size, digest of
    * the resized payload. Row-local, no shuffle; resized payload
    * never leaves the expression.
    */
  def thumbnail(df: DataFrame, id: Column, text: Column,
                step: Int = 4, maxUnits: Int = 256): DataFrame = {
    require(step > 0 && maxUnits > 0, "step and maxUnits must be positive")
    val t = text
    // sequence(1, 0, step) throws "Illegal sequence boundaries" — an
    // empty payload must yield an empty thumb (md5('')), not a crash
    val idxs = when(length(t) > 0,
      sequence(lit(1), least(length(t), lit(maxUnits * step)), lit(step)))
      .otherwise(array().cast("array<int>"))
    val resized = concat_ws("", transform(idxs, i => t.substr(i, lit(1))))
    df.select(id.as("doc_id"),
      length(t).cast("long").as("n_units"),
      length(resized).cast("long").as("thumb_units"),
      md5(resized).as("thumb_md5"))
  }

  /** Frame sampling plumbing: split the payload into fixed-size blocks
    * and keep every `stride`-th block as a "frame" with its digest —
    * the shape of video frame extraction, over fake frames.
    */
  def frameSample(df: DataFrame, id: Column, text: Column,
                  blockChars: Int = 64, stride: Int = 4): DataFrame = {
    val nBlocks = floor((length(text) - 1) / blockChars) + 1
    df.select(id.as("doc_id"), text.as("t"), nBlocks.as("nb"))
      .select(col("doc_id"),
        explode(filter(sequence(lit(0), col("nb") - 1), i => i % stride === 0)).as("frame_idx"),
        col("t"))
      .select(col("doc_id"), col("frame_idx"),
        md5(col("t").substr(col("frame_idx").cast("int") * blockChars + 1, lit(blockChars))).as("frame_md5"))
  }
}
