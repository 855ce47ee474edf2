package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Round-6 measurement harness (guide §1): per-stage attribution of the
  * expensive bench operators at sf0.1 / local[32], each stage isolated with
  * the noop sink so we time computation, not collection. Also prints the
  * SCAN PARALLELISM of each input — the sf tables are single-file parquets,
  * so scan-stage kernels may be running on one core.
  *
  * Modes: `parts` (partition counts), `ann`, `minhash`, `ngram`, `ivf`,
  * `pq`, `all`.
  */
object R06Measure {

  private def time(f: => Any): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def time2(f: => Any): Double = (1 to 2).map(_ => time(f)).min

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.pipeline.GraftSession
      .builder(s"local[$cpus]", cpus, "r06measure").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    def label(s: String) = spark.sparkContext.setJobDescription(s)
    def p(name: String, v: Double): Unit = println(f"[r06] $name%-42s $v%7.3f s")

    // warm codegen
    noop(t("documents").select(
      graft.functions.GraftFunctions.minhash_sig(col("text"), 2, 8)))

    if (mode == "parts" || mode == "all") {
      for (n <- Seq("documents", "embeddings", "events", "lineitem", "orders"))
        println(s"[r06] scan partitions $n = ${t(n).rdd.getNumPartitions}")
    }

    if (mode == "ann" || mode == "all") {
      val e = t("embeddings")
      label("ann: scored only (BNLJ + cosine, noop)")
      val scored = {
        val q = e.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            graft.functions.GraftFunctions.cosine_sim(col("qv"), col("cv")).as("sim"))
      }
      p("ann_brute scored-only (noop)", time2(noop(scored)))
      label("ann: full bruteForceTopK")
      p("ann_brute full (count)", time2(
        SimilarityOps.bruteForceTopK(e, e, "vec_id", "embedding", 1).count()))
      label("ann: scored repartitioned")
      val scoredPar = {
        val q = e.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c = e.repartition(cpus)
          .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            graft.functions.GraftFunctions.cosine_sim(col("qv"), col("cv")).as("sim"))
      }
      p("ann_brute scored-only repart (noop)", time2(noop(scoredPar)))
      label("ann: lshTopK")
      val nEmb = e.count()
      val bits = SimilarityOps.occupancyBits(nEmb)
      p("ann_lsh full (count)", time2(
        SimilarityOps.lshTopK(e, "vec_id", "embedding", 1, bits, 8).count()))
    }

    if (mode == "minhash" || mode == "all") {
      val d = t("documents")
      label("minhash: banded signatures only (noop)")
      val src = d.select(col("doc_id").as("id"), col("text"))
      val banded = src.select(col("id"),
        explode(DedupOps.bandedSignature(
          graft.functions.GraftFunctions.minhash_sig(col("text"), 2, 8), 4, 2)).as("bb"))
      p("minhash banded-only (noop)", time2(noop(banded)))
      val bandedPar = src.repartition(cpus).select(col("id"),
        explode(DedupOps.bandedSignature(
          graft.functions.GraftFunctions.minhash_sig(col("text"), 2, 8), 4, 2)).as("bb"))
      p("minhash banded-only repart (noop)", time2(noop(bandedPar)))
      label("minhash: shingle fetch only (noop)")
      val sh = src.select(col("id"),
        graft.functions.GraftFunctions.shingle_hashes(col("text"), 2).as("sh"))
      p("minhash shingles-only (noop)", time2(noop(sh)))
      label("minhash: full")
      p("minhash full (count)", time2(
        DedupOps.minhashNearDups(d, "doc_id", "text", 2, 8, 4, 60).count()))
      label("simhash: full")
      p("simhash full (count)", time2(
        DedupOps.simhashNearDups(d, "doc_id", "text", 3).count()))
      label("clusters: full")
      p("clusters full (count)", time2(
        DedupOps.nearDupClusters(d, "doc_id", "text").count()))
      label("spans")
      p("spans full (count)", time2(
        DedupOps.spanDedup(d, "doc_id", "text", 8).count()))
    }

    if (mode == "ngram" || mode == "all") {
      val d = t("documents")
      label("ngram: full")
      p("ngram full (count)", time2(
        DedupOps.ngramJaccardPairs(d, "doc_id", "text", "lang", 2, 55).count()))
    }

    if (mode == "ngram2") {
      // sub-stage attribution of ngramJaccardPairs (replicates its phases)
      val d = t("documents")
      val src = graft.util.Par.ensure(d.select(col("lang").as("blk"),
        col("doc_id").as("id"), col("text")))
      var sized: DataFrame = null
      p("ngram sized localCheckpoint", time {
        sized = src.select(col("blk"), col("id"),
            graft.functions.GraftFunctions.shingle_hashes(col("text"), 2).as("sh"))
          .withColumn("ns", size(col("sh"))).localCheckpoint()
      })
      val exploded = sized.select(col("blk"), col("id"), col("ns"),
        explode(col("sh")).as("tok"))
      p("ngram exploded (noop)", time2(noop(exploded)))
      val dfTable = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
      p("ngram dfTable (noop)", time2(noop(dfTable)))
      val ordered = exploded.join(dfTable, Seq("tok"))
        .groupBy("blk", "id", "ns")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("st"))
        .select(col("blk"), col("id"), col("ns"),
          transform(col("st"), s => s.getField("tok")).as("shp"))
      p("ngram ordered (noop)", time2(noop(ordered)))
      val ceilT = floor((col("ns") * 55 + 99) / lit(100.0)).cast("int")
      val pref = ordered.select(col("blk"), col("id"), col("ns"),
        explode(slice(col("shp"), lit(1), greatest(col("ns") - ceilT + 1, lit(0)))).as("tok"))
      val a = pref.select(col("blk"), col("tok"), col("id").as("id_a"), col("ns").as("ns_a"))
      val b = pref.select(col("blk"), col("tok"), col("id").as("id_b"), col("ns").as("ns_b"))
      val candidates = a.join(b, Seq("blk", "tok"))
        .filter(col("id_a") < col("id_b"))
        .filter(least(col("ns_a"), col("ns_b")) * 100 >=
                greatest(col("ns_a"), col("ns_b")) * 55)
        .select("blk", "id_a", "id_b").dropDuplicates("id_a", "id_b")
      p("ngram candidates (count)", time2(candidates.count()))
    }

    if (mode == "ngram3") {
      // A/B: window-ranked prefix (no collect_list regroup + re-explode)
      val d = t("documents")
      val src = graft.util.Par.ensure(d.select(col("lang").as("blk"),
        col("doc_id").as("id"), col("text")))
      val sized = src.select(col("blk"), col("id"),
          graft.functions.GraftFunctions.shingle_hashes(col("text"), 2).as("sh"))
        .withColumn("ns", size(col("sh"))).localCheckpoint()
      val exploded = sized.select(col("blk"), col("id"), col("ns"),
        explode(col("sh")).as("tok"))
      val dfTable = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
      val ceilT = floor((col("ns") * 55 + 99) / lit(100.0)).cast("int")
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy("blk", "id").orderBy(col("df"), col("tok"))
      val pref = exploded.join(dfTable, Seq("tok"))
        .withColumn("__rn", row_number().over(wOrd))
        .filter(col("__rn") <= greatest(col("ns") - ceilT + 1, lit(0)))
        .select(col("blk"), col("tok"), col("id"), col("ns"))
      val a = pref.select(col("blk"), col("tok"), col("id").as("id_a"), col("ns").as("ns_a"))
      val b = pref.select(col("blk"), col("tok"), col("id").as("id_b"), col("ns").as("ns_b"))
      val candidates = a.join(b, Seq("blk", "tok"))
        .filter(col("id_a") < col("id_b"))
        .filter(least(col("ns_a"), col("ns_b")) * 100 >=
                greatest(col("ns_a"), col("ns_b")) * 55)
        .select("blk", "id_a", "id_b").dropDuplicates("id_a", "id_b")
      p("ngram3 candidates windowed (count)", time2(candidates.count()))
      label("ngram full for comparison")
      p("ngram full (count)", time2(
        DedupOps.ngramJaccardPairs(d, "doc_id", "text", "lang", 2, 55).count()))
    }

    if (mode == "hier") {
      val e = t("embeddings")
      val nEmb = e.count()
      val cN = math.max(16, math.sqrt(nEmb.toDouble).ceil.toInt)
      val hc = math.max(4, math.sqrt(cN.toDouble).ceil.toInt)
      val vecs = e.select(col("vec_id").as("id"), col("embedding").as("v"))
      p("hier coarse kmeans", time2(
        SimilarityOps.kmeansCentroids(vecs, hc, 2).collect()))
      var hidx: SimilarityOps.HierIvfIndex = null
      p("hier build total", time {
        hidx = SimilarityOps.buildHierIvfIndex(e, "vec_id", "embedding", hc, hc)
          .materialize()
      })
      p("hier probe", time2(
        SimilarityOps.hierIvfProbe(hidx, e, "vec_id", "embedding", 1, 4, 8).count()))
      hidx.unpersist()
    }

    if (mode == "ivf" || mode == "all") {
      val e = t("embeddings")
      val nEmb = e.count()
      val cN = math.max(16, math.sqrt(nEmb.toDouble).ceil.toInt)
      label("ivf: kmeans only")
      p("ivf kmeans-only", time2(
        SimilarityOps.kmeansCentroids(
          e.select(col("vec_id").as("id"), col("embedding").as("v")), cN, 2).collect()))
      label("ivf: build")
      var idx: SimilarityOps.IvfIndex = null
      p("ivf build (materialize)", time(
        { idx = SimilarityOps.buildIvfIndex(e, "vec_id", "embedding", cN).materialize() }))
      label("ivf: probe")
      p("ivf probe (count)", time2(
        SimilarityOps.ivfProbe(idx, e, "vec_id", "embedding", 1, 8).count()))
      idx.unpersist()
      label("hier ivf: build")
      val hc = math.max(4, math.sqrt(cN.toDouble).ceil.toInt)
      var hidx: SimilarityOps.HierIvfIndex = null
      p("hier build (materialize)", time(
        { hidx = SimilarityOps.buildHierIvfIndex(e, "vec_id", "embedding", hc, hc)
            .materialize() }))
      label("hier ivf: probe")
      p("hier probe (count)", time2(
        SimilarityOps.hierIvfProbe(hidx, e, "vec_id", "embedding", 1, 4, 8).count()))
      hidx.unpersist()
    }

    if (mode == "pq" || mode == "all") {
      val e = t("embeddings")
      label("pq: train")
      var cb: SimilarityOps.PqCodebook = null
      p("pq train (m=8 ksub=64 it=2)", time(
        { cb = SimilarityOps.pqTrainCodebook(e, "vec_id", "embedding", 8, 64, 2) }))
      label("pq: encode")
      val codes = SimilarityOps.pqEncode(e, "vec_id", "embedding", cb).persist()
      p("pq encode (count)", time(codes.count()))
      label("pq: adc scored only (noop)")
      val q = e.select(col("vec_id").as("query_id"),
        graft.functions.GraftFunctions.pq_lut(
          col("embedding"), cb.flat, cb.m, cb.ksub, cb.dsub).as("lut"))
      val adcScored = codes.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("id"))
        .select(col("query_id"), col("id"),
          graft.functions.GraftFunctions.pq_adc(col("codes"), col("lut"), cb.ksub).as("dist"))
      p("pq adc scored-only (noop)", time2(noop(adcScored)))
      label("pq: rerank full")
      p("pq rerank full (count)", time2(
        SimilarityOps.pqRerankTopK(codes, e, e, "vec_id", "embedding", cb, 1, 20).count()))
      codes.unpersist()
    }

    spark.stop()
  }
}
