package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.GraftSession

/** Dev tool: A/B the two ngramJaccardPairs shapes at sf0.1 —
  * (A) shingles carried through the single block join vs
  * (B) ids-only block join + per-pair shingle re-fetch.
  * Interleaved A,B,A,B,... so contention hits both; min per shape. */
object NgramShape {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "ngram-shape")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()

    def shapeA(df: DataFrame): DataFrame = {
      val sh = df.select(col("lang").as("blk"), col("doc_id").as("id"),
        graft.functions.GraftFunctions.shingle_hashes(col("text"), 2).as("sh"))
      val a = sh.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
      val b = sh.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, Seq("blk"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("inter_size", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("union_size", size(array_union(col("sh_a"), col("sh_b"))))
        .filter(col("inter_size") * 100 >= col("union_size") * 55)
        .select("blk", "id_a", "id_b", "inter_size", "union_size")
    }
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f; val t = (System.nanoTime() - t0) / 1e9
      println(s"  rows=$n"); t
    }
    var bestA = Double.MaxValue; var bestB = Double.MaxValue
    for (i <- 1 to 3) {
      bestA = math.min(bestA, time(shapeA(docs).count()))
      bestB = math.min(bestB, time(graft.ops.DedupOps.ngramJaccardPairs(
        docs, "doc_id", "text", "lang", 2, 55).count()))
      println(s"ROUND $i bestA(single-join)=$bestA bestB(pair-first)=$bestB")
    }
    spark.stop()
  }
}
