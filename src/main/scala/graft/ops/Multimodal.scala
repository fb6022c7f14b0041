package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata.
  *
  * IMAGES are decoded for real: [[ImageCodec]] runs `javax.imageio`
  * (PNG/BMP/JPEG, headless-JDK, zero external deps) — byte-sniffed
  * format, true dimensions, exact pixel digests, and a real area-mean
  * thumbnail scaler, oracle-checked end to end (`mm_decode_roundtrip`,
  * `mm_thumbnail_real`). Codecs the JDK lacks (audio/video) keep a
  * clearly-marked deterministic stub ([[FakeDecoder]]) so the
  * partition-wise decode plumbing — binary schema, batched decode,
  * frame explosion shape — stays real and tested; on a cluster the
  * stub body is replaced by a codec call with the identical signature.
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

  // ---- REAL image codec path (JDK javax.imageio; no external deps) -------

  /** Decoded image: true dimensions, sniffed container format, and the
    * 8-bit gray samples (blue channel; the test images are r=g=b). */
  final case class DecodedImage(doc_id: Long, width: Int, height: Int,
                                format: String, gray: Array[Int])

  /** Real image encode/decode via `javax.imageio` — PNG/BMP/JPEG work
    * in a headless JDK with no external libraries. 8-bit truecolor
    * PNG/BMP roundtrips are lossless, so pixel digests computed from
    * DECODED images are engine-deterministic and oracle-checkable.
    */
  object ImageCodec {
    // ImageIO's image input/output streams are DISK-cache-backed by
    // default — every encode/decode writes a temp FILE. All payloads
    // here are in-memory byte arrays; memory-backed streams drop the
    // per-row filesystem round-trip (measured ~2x on the codec
    // queries). Executor-JVM-wide, set once at first class use.
    javax.imageio.ImageIO.setUseCache(false)

    /** Encode gray samples (r=g=b) as 8-bit truecolor in `fmt`
      * ("png"/"bmp": lossless; "jpeg": lossy). */
    def encodeGray(gray: Array[Int], w: Int, h: Int, fmt: String = "png"): Array[Byte] = {
      require(gray.length == w * h, s"expected ${w * h} samples, got ${gray.length}")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < gray.length) {
        val v = gray(i) & 0xFF
        img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
      bos.toByteArray
    }

    /** Decode any ImageIO-supported payload: sniff the container from
      * the bytes (not a filename), read true dimensions and samples. */
    def decode(docId: Long, bytes: Array[Byte]): DecodedImage = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"doc $docId: unrecognized image payload")
        val reader = readers.next()
        val format = reader.getFormatName.toLowerCase
        reader.setInput(iis)
        val img = reader.read(0)
        reader.dispose()
        val w = img.getWidth
        val h = img.getHeight
        val gray = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { gray(y * w + x) = img.getRGB(x, y) & 0xFF; x += 1 }
          y += 1
        }
        DecodedImage(docId, w, h, format, gray)
      } finally iis.close()
    }

    /** Area-mean (box-filter) downsample by integer factor `f`:
      * thumb(x, y) = floor(mean of the f×f source block) — the real
      * scaler the stub decimation stood in for. */
    def boxDownsample(pix: Array[Int], w: Int, h: Int, f: Int): Array[Int] = {
      require(f > 0 && w % f == 0 && h % f == 0, s"factor $f must divide ${w}x$h")
      val tw = w / f
      val th = h / f
      val out = new Array[Int](tw * th)
      var ty = 0
      while (ty < th) {
        var tx = 0
        while (tx < tw) {
          var sum = 0
          var dy = 0
          while (dy < f) {
            var dx = 0
            while (dx < f) { sum += pix((ty * f + dy) * w + tx * f + dx); dx += 1 }
            dy += 1
          }
          out(ty * tw + tx) = sum / (f * f)
          tx += 1
        }
        ty += 1
      }
      out
    }

    /** Lower-hex digest of samples rendered as 2-char hex pairs — the
      * construction a SQL oracle replays with md5/printf. */
    def hexDigest(vals: Array[Int]): String = {
      val sb = new java.lang.StringBuilder(vals.length * 2)
      vals.foreach(v => sb.append(f"${v & 0xFF}%02x"))
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sb.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }

    /** Deterministic 8×8 test image: sample i = first md5 byte of
      * `text:i` — replayable by any engine, so a decode of its PNG
      * encoding is oracle-checkable end to end. */
    def mdImage(text: String): Array[Int] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(64) { i =>
        d.reset()
        d.digest(s"$text:$i".getBytes("UTF-8"))(0) & 0xFF
      }
    }
  }

  /** REAL decode roundtrip over the corpus: build the md5-derived
    * test image per doc, push it through a real PNG encode → sniff →
    * decode (one codec instance per partition, rows streamed), and
    * digest the DECODED samples. The oracle replays only the pixel
    * construction — a hash match proves the codec roundtrip is
    * bit-exact, not just that the plumbing ran. */
  def decodeRoundtrip(df: DataFrame, id: Column, text: Column): DataFrame = {
    import org.apache.spark.sql.Encoders
    df.select(id.cast("long").as("doc_id"), text.as("t"))
      .mapPartitions { rows =>
        rows.map { r =>
          val pix = ImageCodec.mdImage(r.getString(1))
          val png = ImageCodec.encodeGray(pix, 8, 8, "png")
          val dec = ImageCodec.decode(r.getLong(0), png)
          (dec.doc_id, dec.width.toLong, dec.height.toLong, dec.format,
            ImageCodec.hexDigest(dec.gray))
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.STRING, Encoders.STRING))
      .toDF("doc_id", "width", "height", "fmt", "pixel_md5")
  }

  /** REAL thumbnail: decode the PNG, area-mean downsample 8×8 → 4×4,
    * digest the thumb samples (floor-mean, so integer-exact in SQL). */
  def thumbnailReal(df: DataFrame, id: Column, text: Column): DataFrame = {
    import org.apache.spark.sql.Encoders
    df.select(id.cast("long").as("doc_id"), text.as("t"))
      .mapPartitions { rows =>
        rows.map { r =>
          val png = ImageCodec.encodeGray(ImageCodec.mdImage(r.getString(1)), 8, 8, "png")
          val dec = ImageCodec.decode(r.getLong(0), png)
          val thumb = ImageCodec.boxDownsample(dec.gray, dec.width, dec.height, 2)
          (dec.doc_id, (dec.width / 2).toLong, (dec.height / 2).toLong,
            ImageCodec.hexDigest(thumb))
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.STRING))
      .toDF("doc_id", "thumb_w", "thumb_h", "thumb_md5")
  }

  // ---- image perceptual-hash near-dup (dHash) ------------------------------

  /** dHash (difference hash) of a gray grid: one bit per horizontal
    * gradient, row-major — bit (r, c) = 1 iff pix(r, c) > pix(r, c+1)
    * — rendered as a '0'/'1' string of h·(w−1) chars (string form so a
    * SQL oracle replays it with substr/CASE, and banding is plain
    * substring). Gradient signs are invariant under uniform brightness
    * shifts and exact under the lossless PNG roundtrip, which is what
    * makes this the image near-dup key byte-md5 can't be: a re-encoded
    * or brightness-shifted twin hashes (near-)identically while its
    * payload bytes differ. */
  def dhashOf(gray: Array[Int], w: Int, h: Int): String = {
    require(gray.length == w * h, s"expected ${w * h} samples, got ${gray.length}")
    val sb = new java.lang.StringBuilder(h * (w - 1))
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w - 1) {
        sb.append(if (gray(r * w + c) > gray(r * w + c + 1)) '1' else '0')
        c += 1
      }
      r += 1
    }
    sb.toString
  }

  /** Per-image dHash through the REAL codec: build the md5-derived
    * 8×8 test image per doc, optionally brightness-shift it (`bright`
    * added per pixel, clamped at 255 — the deterministic stand-in for
    * a re-encode that changes bytes but not content), PNG-encode,
    * DECODE (one codec instance per partition), and dHash the decoded
    * samples. Output (img_id, dhash 56-char '0'/'1', pix_md5 of the
    * decoded samples — the [[ImageCodec.hexDigest]] construction the
    * oracle replays). PNG is lossless, so every output column is
    * pixel-math-replayable; a codec regression breaks the hash. */
  def imageDhash(df: DataFrame, id: Column, text: Column,
                 bright: Int = 0, idOffset: Long = 0L): DataFrame = {
    import org.apache.spark.sql.Encoders
    df.select(id.cast("long").as("doc_id"), text.as("t"))
      .mapPartitions { rows =>
        rows.map { r =>
          val pix = ImageCodec.mdImage(r.getString(1))
            .map(v => math.min(v + bright, 255))
          val png = ImageCodec.encodeGray(pix, 8, 8, "png")
          val dec = ImageCodec.decode(r.getLong(0) + idOffset, png)
          val h = dhashOf(dec.gray, dec.width, dec.height)
          // bit-packed twin of the hash string: hamming between two
          // hashes is then ONE codegen'd bit_count(xor) per candidate
          // pair instead of a 56-step per-char fold
          (dec.doc_id, h, java.lang.Long.parseLong(h, 2),
            ImageCodec.hexDigest(dec.gray))
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
        Encoders.scalaLong, Encoders.STRING))
      .toDF("img_id", "dhash", "dhash_bits", "pix_md5")
  }

  /** Hamming-banded near-dup pairs over a dHash frame
    * `(img_id, dhash, dhash_bits, pix_md5)` — the C5 SimHash
    * discipline applied to image hashes: split the 56-bit hash into
    * `nBands` equal substrings, bucket-join on (band index, band
    * value) for candidates, then EXACT-verify candidates at full
    * hamming ≤ `maxHamming` — ONE `bit_count(xor)` on the bit-packed
    * hash per pair. Recall contract: two hashes within hamming <
    * nBands share ≥ 1 exact band by pigeonhole (guaranteed found);
    * between nBands and maxHamming, discovery is probabilistic — the
    * standard LSH trade, tuned here to 4×14-bit bands because random
    * pairs collide on a band with p ≈ 2^-14 (a 7×8-bit split drowned
    * the verify stage in ~n²·7/256 random candidates at corpus
    * scale; real near-dups sit at hamming ≤ 3 anyway — a uniform
    * re-exposure flips only 255-clamp gradients).
    *
    * Candidate generation is a bucketed equi-join — shuffle ∝ band
    * buckets, never all-pairs; the hash frame is materialized ONCE
    * (hash-sized rows) so the self-join's two branches don't re-run
    * the upstream codec decode. Output (img_a, img_b, hamming,
    * same_pixels) — `same_pixels` false is the proof byte-identity
    * dedup would have missed the pair. */
  def dhashNearDupPairs(images: DataFrame, nBands: Int = 4,
                        maxHamming: Int = 8): DataFrame = {
    val bits = 56
    require(bits % nBands == 0, s"$nBands bands must divide $bits bits")
    val bw = bits / nBands
    val hashed = images.localCheckpoint(true)
    // the banding below substrings fixed offsets and the verify packs
    // exactly 56 bits — a frame hashed from a non-8×8 grid (dhashOf
    // emits h·(w−1) bits) would band on out-of-range substrings and
    // verify mismatched packs, silently returning wrong pairs; the
    // checkpoint is already materialized, so this width audit is one
    // scan of hash-sized rows, not a codec re-run
    val badWidth = hashed.where(length(col("dhash")) =!= bits).count()
    require(badWidth == 0,
      s"dhashNearDupPairs expects $bits-bit hashes (8×8 dHash grid); " +
        s"$badWidth rows have a different width")
    val bands = hashed.select(col("img_id"), col("dhash"), col("dhash_bits"),
        col("pix_md5"), explode(sequence(lit(0), lit(nBands - 1))).as("b"))
      .withColumn("bv", col("dhash").substr(col("b") * bw + 1, lit(bw)))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.img_id") < col("y.img_id"))
      .select(col("x.img_id").as("img_a"), col("y.img_id").as("img_b"),
        col("x.dhash_bits").as("ba"), col("y.dhash_bits").as("bb"),
        col("x.pix_md5").as("ma"), col("y.pix_md5").as("mb"))
      .distinct()
    // materialize the (bounded, pairs-sized) result so the hash
    // checkpoint can be freed HERE — otherwise every call pins a
    // per-image block set until JVM exit (the checkpoint-accumulation
    // failure mode the iterative-MV gates free in-loop)
    val out = cand.withColumn("hamming",
        bit_count(col("ba").bitwiseXOR(col("bb"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("img_a"), col("img_b"), col("hamming"),
        (col("ma") === col("mb")).as("same_pixels"))
      .localCheckpoint(true)
    graft.Ckpt.free(hashed)
    out
  }

  /** Per-frame energies of a signed big-endian 16-bit PCM payload:
    * (n_samples, per-frame Σs² energies). A trailing odd byte is
    * ignored; the last frame may be partial. Integer-exact by
    * construction (sum of ≤ 2³⁰-sized squares in a Long). */
  private[graft] def pcmFrameEnergies(bytes: Array[Byte], frame: Int): (Int, Array[Long]) = {
    val n = bytes.length / 2
    val nf = (n + frame - 1) / frame
    val energies = new Array[Long](math.max(nf, 0))
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort.toLong
      energies(i / frame) += s * s
      i += 1
    }
    (n, energies)
  }

  final case class AudioEnergy(doc_id: Long, n_samples: Long, n_frames: Long,
                               peak_frame: Long, peak_energy: Long,
                               mean_energy: Double)

  /** AUDIO feature extraction — the third media family next to the
    * image codec and frame sampler: the payload column is decoded as
    * 16-bit PCM per partition (one decoder per partition, the
    * mapPartitions media pattern), framed, and reduced to per-doc
    * loudness features: frame count, peak frame (argmax energy, tie →
    * first) and its energy, mean frame energy. All integer arithmetic
    * until the final mean, so results replay exactly cross-engine.
    * Zero-sample payloads yield zero frames and null-free zeros (the
    * empty-payload guard class from the image decoder). */
  def audioEnergy(df: DataFrame, id: Column, text: Column,
                  frame: Int = 64): DataFrame = {
    import org.apache.spark.sql.Encoders
    require(frame > 0, "frame must be positive")
    df.select(id.cast("long").as("doc_id"), text.as("t"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val (n, energies) = pcmFrameEnergies(bytes, frame)
          val (peakF, peakE) =
            if (energies.isEmpty) (0L, 0L)
            else {
              var bi = 0
              var b = energies(0)
              var j = 1
              while (j < energies.length) {
                if (energies(j) > b) { bi = j; b = energies(j) }
                j += 1
              }
              (bi.toLong, b)
            }
          val mean =
            if (energies.isEmpty) 0.0
            else math.floor(energies.sum.toDouble / energies.length * 10000 + 0.5) / 10000
          AudioEnergy(r.getLong(0), n.toLong, energies.length.toLong, peakF, peakE, mean)
        }
      }(Encoders.product[AudioEnergy])
      .toDF()
  }
}
