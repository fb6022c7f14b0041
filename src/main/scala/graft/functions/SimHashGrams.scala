package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over character n-grams — the CHARACTER-level
  * fingerprint for edit-distance blocking ([[SimHash64]] is the
  * token-level twin). Semantics match the SQL oracle exactly: for each
  * of the `length - n + 1` n-character grams, h = first 16 hex chars
  * of md5(gram) as an unsigned 64-bit value; bit j of the result is
  * set iff Σ_grams (2·bit_j(h) − 1) > 0. A string shorter than n has
  * no grams and fingerprints to 0.
  *
  * Grams are CODEPOINT windows, not UTF-16 code units: DuckDB's
  * `substr` counts characters, so a surrogate pair must count as one
  * position on both engines or fingerprints diverge on non-BMP text.
  *
  * Why character grams block edit distance: one edit touches at most
  * n grams, so d edits move at most 2·n·d of the gram multiset —
  * near-identical strings keep near-identical gram distributions and
  * land within a small Hamming ball, which 16-bit banding then finds
  * losslessly (pigeonhole: ≤3 flipped bits across 4 bands leave one
  * band clean).
  */
object SimHashGramsImpl {
  def compute(text: UTF8String, n: Int): Long = compute(text, n, "")

  def compute(text: UTF8String, n: Int, salt: String): Long =
    compute(text, n, salt, Set.empty[String])

  /** Salted + exclusion variant: h = md5(salt ++ gram), grams in
    * `excluded` are skipped. Two fingerprints with different salts are
    * (near-)independent hash views of the same gram multiset — ANDing
    * their Hamming gates squares the accidental collision probability
    * while truly similar strings stay close in every view. The
    * exclusion set carries corpus-COMMON grams (boilerplate,
    * templates, watermark tags): shared mass that appears in most
    * documents shifts every bit-sum the same way in every hash view,
    * collapsing fingerprint variance corpus-wide — removing it is the
    * idf-weighting / PPJoin-hot-shingle lesson applied to SimHash,
    * and it restores band entropy on templated corpora. */
  def compute(text: UTF8String, n: Int, salt: String,
              excluded: Set[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    val cp = text.toString.codePoints().toArray
    var i = 0
    while (i + n <= cp.length) {
      val raw = new String(cp, i, n)
      if (!excluded.contains(raw)) {
        val gram = salt + raw
        val d = md.digest(gram.getBytes("UTF-8"))
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  /** TWO independent fingerprint views from ONE digest pass: fp1 folds
    * md5 bytes 0-7 of each gram (bit-identical to `compute(text, n)`,
    * so banding built on fp1 is unchanged), fp2 folds bytes 8-15 — the
    * second hash view the edit-distance gate ANDs in, previously a
    * whole second salted md5-per-gram pass. md5's halves are
    * independent mixes of the gram, which is all the AND-gate needs
    * (an accidental band collision must repeat in a second view).
    *
    * Also allocation-free per gram: the text is UTF-8-encoded ONCE and
    * grams are digested as byte slices via codepoint byte offsets
    * (UTF-8 is self-contained per codepoint, so a substring's encoding
    * IS the slice of the full encoding — same digests as the
    * String-per-gram form, minus the per-gram String/byte[] churn).
    * Returns a (fp1, fp2) struct row.
    */
  def computePair(text: UTF8String, n: Int): InternalRow = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts1 = new Array[Int](64)
    val counts2 = new Array[Int](64)
    val s = text.toString
    val bytes = s.getBytes("UTF-8")
    // byte offset of each codepoint (+ end sentinel)
    val nCp = s.codePointCount(0, s.length)
    val offs = new Array[Int](nCp + 1)
    var ci = 0; var bi = 0; var cpI = 0
    while (ci < s.length) {
      offs(cpI) = bi
      val cp = s.codePointAt(ci)
      bi += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
      ci += Character.charCount(cp)
      cpI += 1
    }
    offs(nCp) = bytes.length
    var i = 0
    while (i + n <= nCp) {
      md.reset()
      md.update(bytes, offs(i), offs(i + n) - offs(i))
      val d = md.digest()
      var h1 = 0L; var h2 = 0L
      var b = 0
      while (b < 8) {
        h1 = (h1 << 8) | (d(b) & 0xffL)
        h2 = (h2 << 8) | (d(b + 8) & 0xffL)
        b += 1
      }
      var j = 0
      while (j < 64) {
        counts1(j) += (if (((h1 >>> j) & 1L) == 1L) 1 else -1)
        counts2(j) += (if (((h2 >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var f1 = 0L; var f2 = 0L
    var j = 0
    while (j < 64) {
      if (counts1(j) > 0) f1 |= (1L << j)
      if (counts2(j) > 0) f2 |= (1L << j)
      j += 1
    }
    new GenericInternalRow(Array[Any](f1, f2))
  }
}

/** (fp1, fp2) character-n-gram SimHash pair in one digest pass —
  * see [[SimHashGramsImpl.computePair]]. fp1 ≡ `SimHashGrams(text, n)`.
  */
case class SimHashGramsPair(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"gram width must be positive, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("fp1", LongType, nullable = false),
    StructField("fp2", LongType, nullable = false)))
  override def prettyName: String = "simhash_grams_pair"

  override def nullSafeEval(input: Any): Any =
    SimHashGramsImpl.computePair(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashGramsImpl.computePair($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character-n-gram SimHash of a text column in one pass inside
  * whole-stage codegen. Registered as SQL `simhash_grams(text, n)` by
  * GraftExtensions (n must be a literal).
  */
case class SimHashGrams(child: Expression, n: Int, salt: String = "",
                        excluded: Set[String] = Set.empty)
    extends UnaryExpression {
  require(n > 0, s"gram width must be positive, got $n")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_grams"

  override def nullSafeEval(input: Any): Any =
    SimHashGramsImpl.compute(input.asInstanceOf[UTF8String], n, salt, excluded)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // salt is embedded verbatim in generated Java source: keep it to
    // printable ASCII with no quote/backslash (internal constants only)
    require(salt.forall(c => c >= ' ' && c <= '~' && c != '"' && c != '\\'),
      s"unsupported salt for codegen: '$salt'")
    // the exclusion set rides along as one reference object (the
    // BloomContains pattern) — no per-row serialization
    val ref = ctx.addReferenceObj("simhashExcl", excluded,
      "scala.collection.immutable.Set")
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.SimHashGramsImpl.compute($c, $n, "$salt", $ref)""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
