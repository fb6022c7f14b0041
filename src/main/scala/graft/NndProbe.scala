package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch diagnostic (not part of the library surface): separates
  * graph-ANN recall loss into GRAPH quality (are the true top-3 even
  * edges of the query?) vs WALK reach (does the beam find them).
  * args: corpusDir */
object NndProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.ready(GraftSession.builder(master = "local[8]",
      shufflePartitions = 8, maxPartitionBytes = "4m").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val qids = emb.where(col("vec_id") % 40 === 0)
      .orderBy(md5(concat(col("vec_id"), lit(":annq"))), col("vec_id"))
      .limit(32).select(col("vec_id")).as[Long].collect().toSeq
    val exact = Similarity.topkBruteForce(emb, col("vec_id"), col("embedding"),
      isQuery = _.isin(qids: _*), k = 3).select(col("qid"), col("nid"))
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val g = Similarity.nndSearchGraph(emb, col("vec_id"), col("embedding"))
    val buildS = (System.nanoTime() - t0) / 1e9
    // graph recall: true top-3 reachable as DIRECT edge of qid
    val gHits = exact.join(
      g.select(col("src").as("qid"), col("dst").as("nid")),
      Seq("qid", "nid"), "left_semi").count()
    val t1 = System.nanoTime()
    val walk = Similarity.nnDescentTopk(emb, col("vec_id"), col("embedding"),
      isQuery = _.isin(qids: _*), k = 3, graphOpt = Some(g))
    val wHits = walk.select(col("qid"), col("nid"))
      .join(exact, Seq("qid", "nid"), "left_semi").count()
    val walkS = (System.nanoTime() - t1) / 1e9
    println(f"NNDPROBE n=$n rounds=${Similarity.NndRounds} hops=${Similarity.NndHops} " +
      f"entries=${Similarity.NndEntries} beam=${Similarity.NndBeam} k=${Similarity.NndGraphK} " +
      f"ll=${Similarity.NndLongLinkTarget} graph_recall=${gHits / 96.0}%.3f " +
      f"walk_recall=${wHits / 96.0}%.3f build_s=$buildS%.1f walk_s=$walkS%.1f")
    spark.stop()
  }
}
