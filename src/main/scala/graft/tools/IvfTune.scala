package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps
import graft.pipeline.GraftSession

/** Dev tool: IVF recall vs k-means iterations / probe count at sf0.001. */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16, "ivf-tune")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val brute = SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", 1)
      .filter(col("rank") === 1).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toMap
    for (iters <- Seq(0, 1, 2, 3, 4); probes <- Seq(4)) {
      val ivf = SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
          1, 16, probes, kmeansIters = iters, nHome = 2)
        .filter(col("rank") === 1).as[(Long, Long, Int)].collect()
        .map(r => (r._1, r._2)).toMap
      val hits = ivf.count { case (q, n) => brute.get(q).contains(n) }
      println(s"RECALL iters=$iters probes=$probes -> ${hits.toDouble / brute.size}")
    }
    spark.stop()
  }
}
