package graft.sinks

import java.util.Base64

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file BLOOM sidecars for the TxLog lake — the point-lookup
  * complement to [[ZoneMap]]'s range pruning (Delta's bloom filter
  * index role): a zone map prunes when the file layout correlates with
  * the column (key sort, Z-order); a high-cardinality column with no
  * layout correlation (uuid-ish ids, foreign keys) range-prunes
  * nothing, but a per-file Bloom filter answers "can file F contain
  * value v?" at ~10 bits/value with a bounded false-positive rate —
  * a point lookup then opens ~1 + fpp·F of F files.
  *
  * Build: ONE pass over the just-written dir (∝ batch, like the zone
  * job), one `BloomFilter` per (file, column) via a typed Aggregator
  * (values inserted as their canonical string rendering; the probe
  * casts the same way, so typed lookups agree). Stored as base64 lines
  * in `<dir>/_bloom`, written inside the data dir before the manifest
  * claims it — committed dirs carry it atomically or (legacy) not at
  * all, and a missing sidecar means "all files may match".
  *
  * False positives cost an extra file scan; false NEGATIVES are
  * impossible (`mightContain` never rejects an inserted key), so
  * pruning never loses a matching row.
  */
object BloomSidecar {

  private val FileName = "_bloom"

  private class BloomAgg(expected: Long, fpp: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expected, fpp)
    override def reduce(b: BloomFilter, v: String): BloomFilter = {
      if (v != null) b.putString(v); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out); out.toByteArray
    }
    override def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private def bloomAgg(c: Column, expected: Long, fpp: Double): Column =
    udaf(new BloomAgg(expected, fpp), Encoders.STRING).apply(c)

  /** Record one Bloom filter per (parquet file, column) under `dir`.
    * `expectedPerFile` sizes each filter (over-sizing only wastes
    * sidecar bytes; undersizing raises the fpp, never correctness). */
  def write(spark: SparkSession, dir: String, cols: Seq[String],
            expectedPerFile: Long = 1L << 20, fpp: Double = 0.01): Unit = {
    if (cols.isEmpty) return
    val df = spark.read.parquet(dir)
    val usable = cols.filter(c => df.schema.fields.exists(_.name == c))
    if (usable.isEmpty) return
    val aggs = usable.map(c =>
      bloomAgg(col(c).cast("string"), expectedPerFile, fpp).as(s"bloom_$c"))
    val stats = df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("file") // deterministic sidecar bytes
      .toLocalIterator() // ~1 MB serialized filter per (file, column):
    // stream one file's row at a time instead of materializing every
    // filter (collect) plus a whole-sidecar string on the driver —
    // at full-compaction scale that's GB, streamed it's one row
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(dir, FileName), true)
    try stats.forEachRemaining { r =>
      val fname = new Path(r.getString(0)).getName
      usable.sorted.foreach { c =>
        val bytes = r.getAs[Array[Byte]](s"bloom_$c")
        val line = s"f=$fname\tc=$c\tb=${Base64.getEncoder.encodeToString(bytes)}\n"
        out.write(line.getBytes("UTF-8"))
      }
    } finally out.close()
  }

  /** The sidecar's filters as (file → column → filter), or None when
    * the dir predates bloom sidecars. */
  def read(spark: SparkSession, dir: String)
      : Option[Map[String, Map[String, BloomFilter]]] = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val txt = { val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close() }
    Some(txt.linesIterator.filter(_.nonEmpty).map { line =>
      val kv = line.split("\t").map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(Base64.getDecoder.decode(kv("b"))))
      (kv("f"), kv("c"), bf)
    }.toSeq.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap)
  }

  /** Absolute paths of the files under `dir` that MAY contain `value`
    * in `colName` (all files when the sidecar or the column's filter
    * is absent — legacy dirs stay correct, they just don't skip). */
  def pruneFiles(spark: SparkSession, dir: String, colName: String,
                 value: String): Seq[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles: Seq[String] = fs.listStatus(new Path(dir))
      .map(_.getPath).filter { p =>
        val n = p.getName; !n.startsWith("_") && !n.startsWith(".")
      }.map(_.toString).toSeq
    read(spark, dir) match {
      case None => dataFiles
      case Some(byFile) => dataFiles.filter { f =>
        byFile.get(new Path(f).getName)
          .flatMap(_.get(colName))
          .forall(_.mightContainString(value))
      }
    }
  }
}
