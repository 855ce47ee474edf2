package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenization (Sennrich et al. 2016, the GPT-2/BPE
 * family): learn a merge table from corpus word frequencies, then encode
 * text as subword tokens by applying merges greedily in rank order.
 *
 * Scale shape, honest about what distributes:
 *
 *  - TRAINING's distributed part is the word-frequency table — one
 *    map-side-combining count over the corpus (the same shuffle
 *    vocabStats pays). The merge LOOP runs on the driver over the top
 *    `maxVocabWords` entries — bounded state (50k words ≈ a few MB),
 *    which is also how production tokenizer trainers work: merges are
 *    decided on a frequency dictionary, not by re-scanning 100 TB per
 *    merge. Determinism: ties in pair counts break lexicographically, and
 *    the vocab cut ties on (count desc, word asc), so the merge table is
 *    a pure function of the corpus.
 *  - ENCODING is scan-speed: one codegen `bpe_encode` kernel call per row
 *    (merge table embedded in the generated code like the IVF centroid
 *    matrix), no shuffle, no driver involvement.
 */
object BpeOps {

  /** A learned merge table: pairs in rank order (earlier = higher
    * priority), exactly what [[bpeEncode]] applies. */
  final case class BpeMerges(pairs: Seq[(String, String)])

  /**
   * Learn `nMerges` merges from the corpus. Words are whitespace tokens
   * (TextOps.words); symbols start as Unicode code points; merges never
   * cross word boundaries. `maxVocabWords` bounds driver state — the
   * frequency tail below the cut contributes no merge decisions worth
   * their memory (standard practice).
   */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
               maxVocabWords: Int = 50000): BpeMerges = {
    require(nMerges >= 0 && maxVocabWords > 0)
    val counts = df.select(explode(TextOps.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // driver loop over (symbol-sequence, weight)
    var words: Array[(Array[String], Long)] = counts.map { case (w, c) =>
      (codePoints(w), c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count, ties lexicographic ascending — deterministic
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        i += 1
      }
    }
    BpeMerges(merges.result())
  }

  private def codePoints(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def mergePair(syms: Array[String], p: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += syms(j) + syms(j + 1)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Reference (driver-side) encoder: apply merges greedily by RANK — at
    * each step merge the lowest-rank applicable pair, leftmost first on
    * rank ties. ≡ the codegen kernel (FunctionsSpec pins equality). */
  def encodeWordRef(word: String, merges: BpeMerges): Seq[String] = {
    val rank = merges.pairs.zipWithIndex.toMap
    var syms = codePoints(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        rank.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = j }
        }
        j += 1
      }
      if (bestAt < 0) continue = false
      else {
        syms = syms.take(bestAt) ++ Array(syms(bestAt) + syms(bestAt + 1)) ++
          syms.drop(bestAt + 2)
        continue = syms.length > 1
      }
    }
    syms.toSeq
  }

  /** Scan-side BPE encode: text → subword tokens (array<string>), words
    * tokenized independently and concatenated in order. One codegen kernel
    * call per row, merge table embedded. */
  def bpeEncode(text: Column, merges: BpeMerges): Column =
    graft.functions.GraftFunctions.bpe_encode(text,
      merges.pairs.map { case (a, b) => a + " " + b }.toArray)

  /** Tokens per document: (docCols..., tokens, n_bpe_tokens). Stays a pure
    * scan-side projection (BpeOpsSpec pins the zero-exchange plan): no
    * parallelism floor here — encode output feeds writes/aggregates whose
    * own partitioning is the caller's business. */
  def tokenize(df: DataFrame, textCol: String, merges: BpeMerges): DataFrame =
    df.withColumn("bpe_tokens", bpeEncode(col(textCol), merges))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
}
