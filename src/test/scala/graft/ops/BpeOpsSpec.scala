package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BpeOpsSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("bpeTrain: the classic Sennrich example merges in frequency order, ties lexicographic") {
    // corpus word frequencies: newest x6, widest x3, lowest x2
    // pair counts round 1: (e,s)=11, (s,t)=11, (w,e)=9(newest's we? n-e,e-w,w-e,e-s,s-t) ...
    // ties between (e,s) and (s,t) break lexicographic → (e,s) first
    val corpus = Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq.fill(2)("lowest")
    val df = corpus.map(Tuple1(_)).toDF("text")
    val merges = BpeOps.bpeTrain(df, "text", nMerges = 3, maxVocabWords = 100)
    assert(merges.pairs.take(2) === Seq(("e", "s"), ("es", "t")))
    // after (e,s),(es,t): all three words end in "est"; next best pair is
    // the one completing the most frequent stem
    assert(merges.pairs.length === 3)
    // encoding applies merges by rank
    val toks = BpeOps.encodeWordRef("newest", merges)
    assert(toks.last.endsWith("est") || toks.contains("est"),
      s"'newest' must contain the learned 'est' unit, got $toks")
    assert(toks.mkString("") === "newest", "tokens must concatenate to the word")
  }

  test("bpe_encode kernel ≡ encodeWordRef on corpus words; round-trip lossless") {
    val merges = BpeOps.bpeTrain(docs, "text", nMerges = 40)
    assert(merges.pairs.length === 40)
    val words = docs.select(explode(TextOps.words(col("text"))).as("w"))
      .filter(col("w") =!= "").distinct().as[String].collect()
    assert(words.nonEmpty)
    // kernel over a one-word-per-row frame vs the driver reference
    val kernel = words.toSeq.toDF("w")
      .select(col("w"), BpeOps.bpeEncode(col("w"), merges).as("t"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      val ref = BpeOps.encodeWordRef(w, merges)
      assert(kernel(w) === ref, s"kernel/reference divergence on '$w'")
      assert(ref.mkString("") === w, s"round-trip broken on '$w'")
    }
  }

  test("tokenize: scan-side, no shuffle; compression vs character count") {
    val merges = BpeOps.bpeTrain(docs, "text", nMerges = 40)
    val tok = BpeOps.tokenize(docs, "text", merges)
    val plan = tok.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must be scan-side:\n$plan")
    val stats = tok.select(
        sum("n_bpe_tokens").cast("long"),
        sum(length(regexp_replace(col("text"), "\\s+", ""))).cast("long"))
      .as[(Long, Long)].head()
    assert(stats._1 > 0 && stats._1 < stats._2,
      s"BPE must compress below character count (${stats._1} vs ${stats._2})")
    // determinism across runs and partitionings
    val again = BpeOps.tokenize(docs.repartition(7), "text",
        BpeOps.bpeTrain(docs, "text", nMerges = 40))
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().sortBy(_._1)
    val first = tok.select("doc_id", "n_bpe_tokens")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(again === first)
  }
}
