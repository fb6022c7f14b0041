package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.ImageCodec

/** Real javax.imageio decode path: byte-sniffing, lossless roundtrips,
  * true dimensions, and the area-mean scaler — on real encoded bytes,
  * not stubs. */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private val pix4x2 = Array(0, 64, 128, 255, 17, 34, 51, 68)

  test("PNG roundtrip is lossless and sniffed from bytes") {
    val png = ImageCodec.encodeGray(pix4x2, 4, 2, "png")
    // PNG magic, not a filename, drives the sniff
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte)
    val dec = ImageCodec.decode(1L, png)
    assert(dec.format == "png" && dec.width == 4 && dec.height == 2)
    assert(dec.gray.sameElements(pix4x2))
  }

  test("BMP roundtrip is lossless; JPEG decodes with true dims and sniffs lossy") {
    val bmp = ImageCodec.encodeGray(pix4x2, 4, 2, "bmp")
    val decB = ImageCodec.decode(2L, bmp)
    assert(decB.format == "bmp" && decB.width == 4 && decB.height == 2)
    assert(decB.gray.sameElements(pix4x2))

    val jpg = ImageCodec.encodeGray(Array.fill(64)(200), 8, 8, "jpeg")
    val decJ = ImageCodec.decode(3L, jpg)
    assert(decJ.format.startsWith("jp") && decJ.width == 8 && decJ.height == 8)
    // lossy: values near but not asserted equal
    assert(decJ.gray.forall(v => math.abs(v - 200) < 32))
  }

  test("garbage bytes fail loudly, not silently") {
    val e = intercept[IllegalArgumentException] {
      ImageCodec.decode(4L, "not an image".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("unrecognized"))
  }

  test("box downsample is an exact floor-mean, including non-square") {
    // 4x2, factor 2 → 2x1: means (0+64+17+34)/4=28, (128+255+51+68)/4=125
    assert(ImageCodec.boxDownsample(pix4x2, 4, 2, 2).sameElements(Array(28, 125)))
    // identity at factor 1
    assert(ImageCodec.boxDownsample(pix4x2, 4, 2, 1).sameElements(pix4x2))
    // 4x4 → 1x1: floor of the 16-sample mean
    val p = Array.tabulate(16)(i => i * 3)
    assert(ImageCodec.boxDownsample(p, 4, 4, 4).sameElements(
      Array(p.sum / 16)))
  }

  test("decodeRoundtrip runs the distributed path and matches the direct digest") {
    val df = Seq((10L, "alpha"), (11L, "")).toDF("doc_id", "text")
    val got = Multimodal.decodeRoundtrip(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    for ((docId, text) <- Seq(10L -> "alpha", 11L -> "")) {
      val want = ImageCodec.hexDigest(ImageCodec.mdImage(text))
      assert(got(docId) == ((docId, 8L, 8L, "png", want)))
    }
    val th = Multimodal.thumbnailReal(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val wantThumb = ImageCodec.hexDigest(
      ImageCodec.boxDownsample(ImageCodec.mdImage("alpha"), 8, 8, 2))
    assert(th(10L) == ((10L, 4L, 4L, wantThumb)))
  }

  test("dHash finds a re-encoded (brightness-shifted) twin where byte-md5 misses it") {
    import spark.implicits._
    val g = ImageCodec.mdImage("neardup")
    val g2 = g.map(v => math.min(v + 1, 255)) // uniform re-exposure
    val png1 = ImageCodec.encodeGray(g, 8, 8, "png")
    val png2 = ImageCodec.encodeGray(g2, 8, 8, "png")
    // byte identity MISSES the pair: the payloads differ
    def md5of(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    assert(md5of(png1) != md5of(png2))
    // ...but the decoded dHash is IDENTICAL (gradient signs are
    // invariant under a uniform brightness shift, modulo 255-clamp)
    val d1 = Multimodal.dhashOf(ImageCodec.decode(1L, png1).gray, 8, 8)
    val d2 = Multimodal.dhashOf(ImageCodec.decode(2L, png2).gray, 8, 8)
    val ham = d1.zip(d2).count { case (a, b) => a != b }
    assert(ham <= 8, s"twin hamming $ham")
    // the banded pipeline surfaces exactly this pair, flagged as
    // byte-different; a third unrelated image stays unpaired
    val g3 = ImageCodec.mdImage("unrelated")
    def bits(h: String) = java.lang.Long.parseLong(h, 2)
    val imgs = Seq(
      (1L, d1, bits(d1), ImageCodec.hexDigest(ImageCodec.decode(1L, png1).gray)),
      (2L, d2, bits(d2), ImageCodec.hexDigest(ImageCodec.decode(2L, png2).gray)),
      (3L, Multimodal.dhashOf(g3, 8, 8), bits(Multimodal.dhashOf(g3, 8, 8)),
        ImageCodec.hexDigest(g3)))
      .toDF("img_id", "dhash", "dhash_bits", "pix_md5")
    val pairs = Multimodal.dhashNearDupPairs(imgs)
      .select("img_a", "img_b", "same_pixels")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(pairs == Set((1L, 2L, false)),
      s"expected exactly the planted twin pair, got $pairs")
  }

  test("dHash is invariant under a lossless 2x upscale + area-mean downscale (resized twin)") {
    val g = ImageCodec.mdImage("resize")
    // 16x16 nearest-neighbor upscale (each pixel 2x2-replicated) — a
    // RESIZED re-encode of the same content
    val up = Array.tabulate(16 * 16)(i => g((i / 32) * 8 + (i % 16) / 2))
    val png16 = ImageCodec.encodeGray(up, 16, 16, "png")
    val dec = ImageCodec.decode(7L, png16)
    assert(dec.width == 16 && dec.height == 16)
    // normalize to the 8x8 hash grid with the real area-mean scaler
    val back = ImageCodec.boxDownsample(dec.gray, 16, 16, 2)
    assert(back.toSeq == g.toSeq, "2x up + box-mean down must be exact")
    assert(Multimodal.dhashOf(back, 8, 8) == Multimodal.dhashOf(g, 8, 8))
  }

  test("dHash survives a REAL lossy JPEG re-encode; the existing bands find every twin pair") {
    // the wild re-encode dHash exists for: PNG original vs the SAME
    // pixels pushed through javax.imageio's JPEG writer (lossy DCT) —
    // bytes and pixels change, gradient signs mostly don't. A DuckDB
    // oracle cannot replay a platform JPEG decoder, so this stays a
    // SPEC leg; the CORRECTNESS gate (dedup_image_phash) keeps the
    // lossless path (SURVEY documents the oracle boundary).
    // production dHash shape: hash the DOWNSCALED decode (classic
    // dHash resizes to a tiny grid first) — the box-mean is what
    // averages JPEG's high-frequency DCT noise away; hashing raw
    // full-res noise pixels is the adversarial non-case (measured
    // hamming 7 there). Source image = 32×32 of flat 4×4 blocks
    // (the 2x-upscale construction the resize test proves exact).
    def up(pix: Array[Int], w: Int, h: Int, f: Int): Array[Int] =
      Array.tabulate(w * f * h * f) { i =>
        val x = i % (w * f); val y = i / (w * f); pix((y / f) * w + x / f)
      }
    val rows = (0 until 24).map { i =>
      val base = ImageCodec.mdImage(s"jpegtwin-$i")
      val big = up(base, 8, 8, 4) // 32×32, flat 4×4 blocks
      val png = ImageCodec.decode(i.toLong, ImageCodec.encodeGray(big, 32, 32, "png"))
      val jpg = ImageCodec.decode(i.toLong, ImageCodec.encodeGray(big, 32, 32, "jpeg"))
      val gp = ImageCodec.boxDownsample(png.gray, 32, 32, 4)
      val gj = ImageCodec.boxDownsample(jpg.gray, 32, 32, 4)
      val hp = Multimodal.dhashOf(gp, 8, 8)
      val hj = Multimodal.dhashOf(gj, 8, 8)
      val ham = hp.zip(hj).count { case (a, b) => a != b }
      (i.toLong, hp, hj, ham, ImageCodec.hexDigest(gp), ImageCodec.hexDigest(gj))
    }
    val maxHam = rows.map(_._4).max
    assert(maxHam <= 3,
      s"JPEG re-encode must stay within hamming 3 of the original; " +
        s"max=$maxHam over ${rows.size} images")
    assert(rows.exists(r => r._5 != r._6),
      "JPEG is lossy — at least one twin's decoded pixels must differ")
    // the pipeline's own bands must surface every (png, jpeg) pair:
    // hamming < 4 shares ≥ 1 exact 14-bit band by pigeonhole
    val frame = (rows.map(r => (r._1, r._2, java.lang.Long.parseLong(r._2, 2), r._5)) ++
        rows.map(r => (r._1 + 1000L, r._3, java.lang.Long.parseLong(r._3, 2), r._6)))
      .toDF("img_id", "dhash", "dhash_bits", "pix_md5")
    val pairs = Multimodal.dhashNearDupPairs(frame)
      .where(col("img_b") === col("img_a") + 1000L)
      .select(col("img_a"), col("hamming"), col("same_pixels"))
      .as[(Long, Long, Boolean)].collect()
    assert(pairs.map(_._1).toSet == rows.map(_._1).toSet,
      s"bands must find all ${rows.size} twin pairs; found ${pairs.length}")
    pairs.foreach { case (id, ham, _) =>
      assert(ham <= 3, s"pair $id banded at hamming $ham > 3") }
    assert(pairs.exists(!_._3),
      "at least one found pair must differ in pixels (the case byte dedup misses)")
  }
}
