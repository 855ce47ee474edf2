package graft.tools

import org.apache.spark.sql.functions._
import graft.ops._

/** One-off single-operator timer: `runMain graft.tools.OpTime <op> [sfDir]`.
  * Best-of-2 after a warm run — for iterating on one op without paying the
  * full Bench sweep. */
object OpTime {

  /** Parquet-backed 12M-id state shared by the bigdedup/bloombuild modes
    * (the real state shape — a generated lineage would re-derive 12M
    * formatted strings per evaluation). Written once per JVM into a temp
    * dir deleted at exit (Scratch hygiene — no cross-round /tmp litter). */
  private lazy val bigdedupStateDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("optime_state").toString
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.util.Scratch.deleteRecursively(dir)))
    dir
  }
  @volatile private var stateWritten = false
  private def bigdedupState(spark: org.apache.spark.sql.SparkSession): String = {
    if (!stateWritten) {
      spark.range(3000000L, 15000000L)
        .select(format_string("doc-%012d", col("id")).as("content_id"))
        .write.mode("overwrite").parquet(bigdedupStateDir)
      stateWritten = true
    }
    bigdedupStateDir
  }

  def main(args: Array[String]): Unit = {
    val op = args.headOption.getOrElse("ngram")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — ad-hoc conf override for A/Bs
    val b0 = graft.pipeline.GraftSession.builder("local[32]", 32, "optime")
    val b = sys.env.get("SPARK_GRAFT_EXTRA_CONF").map(_.split(";").toSeq)
      .getOrElse(Nil).filter(_.contains("="))
      .foldLeft(b0) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2); acc.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    def run(): Long = op match {
      case "ngram" =>
        DedupOps.ngramJaccardPairs(t("documents"), "doc_id", "text", "lang", 2, 55).count()
      case "decon" | "decon_raw" => // floored vs raw corpus-side scan
        val docs = t("documents")
        val corpus0 = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        val corpus = if (op == "decon") graft.util.Par.ensure(corpus0) else corpus0
        val evalSet = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        val testShingles = evalSet.select(
            explode(graft.functions.GraftFunctions.shingle_hashes(col("text"), 2)).as("tok"))
          .distinct()
        corpus.select(col("doc_id").as("id"),
            explode(graft.functions.GraftFunctions.shingle_hashes(col("text"), 2)).as("tok"))
          .join(broadcast(testShingles), Seq("tok"))
          .groupBy("id").agg(count(lit(1)).as("n_hits")).count()
      case "clusters" =>
        DedupOps.nearDupClusters(t("documents"), "doc_id", "text").count()
      case "minhash" =>
        DedupOps.minhashNearDups(t("documents"), "doc_id", "text", 2, 8, 4, 60).count()
      case "spans" =>
        DedupOps.spanDedup(t("documents"), "doc_id", "text", 8).count()
      case "lsh" =>
        val n = t("embeddings").count()
        val bits = SimilarityOps.occupancyBits(n)
        SimilarityOps.lshTopK(t("embeddings"), "vec_id", "embedding", 1, bits, 8).count()
      case "embdup" =>
        SimilarityOps.embeddingNearDups(t("embeddings"), "vec_id", "embedding", 0.99).count()
      case "ivf" =>
        val n = t("embeddings").count()
        val c = math.max(16, math.sqrt(n.toDouble).ceil.toInt)
        val t0 = System.nanoTime()
        val idx = SimilarityOps.buildIvfIndex(t("embeddings"), "vec_id", "embedding", c).materialize()
        val t1 = System.nanoTime()
        val r = SimilarityOps.ivfProbe(idx, t("embeddings"), "vec_id", "embedding", 1, 8).count()
        println(f"[optime]   ivf build=${(t1 - t0) / 1e9}%.2fs probe=${(System.nanoTime() - t1) / 1e9}%.2fs")
        idx.unpersist(); r
      case "pipe" =>
        graft.util.Scratch.withTempDir("optime_pipe") { outDir =>
          graft.pipeline.Pipeline.run(spark,
            graft.pipeline.DataGen.sequences(spark, 1000000L, 64), outDir).stats.rowsRouted
        }
      case "pipe0" => // A/B: file sizing disabled (one file per cache partition)
        graft.util.Scratch.withTempDir("optime_pipe0") { outDir =>
          graft.pipeline.Pipeline.run(spark,
            graft.pipeline.DataGen.sequences(spark, 1000000L, 64), outDir,
            graft.pipeline.Pipeline.Config(targetRowsPerFile = 0L)).stats.rowsRouted
        }
      case "bigdedup_bloom" | "bigdedup_plain" |
           "bigdedup_bloom16" | "bigdedup_plain16" => // Bench's large-state A/B
        val st = new graft.pipeline.StateStore("optime-dedup-state-never-touched")
        def knownDf = spark.read.parquet(bigdedupState(spark))
        val inN = if (op.endsWith("16")) 16000000L else 4000000L
        val incoming = graft.pipeline.DataGen.sequences(spark, inN, 64)
        val thresh = if (op.startsWith("bigdedup_bloom")) 10000000L else -1L
        st.dedup(incoming, knownDf, bloomPruneThreshold = thresh).count()
      case "bloombuild" | "bloombuild_stat" => // isolate the filter build cost
        val ids = spark.read.parquet(bigdedupState(spark))
        if (op == "bloombuild_stat")
          ids.stat.bloomFilter("content_id", 12000000L, 0.01)
        else {
          import spark.implicits._
          val zero = org.apache.spark.util.sketch.BloomFilter.create(12000000L, 0.01)
          ids.select(col("content_id")).as[String].rdd.coalesce(4)
            .treeAggregate(zero)(
              (f, s) => { f.putBinary(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)); f },
              (a, b) => { a.mergeInPlace(b); a })
        }
        1L
      case other => sys.error(s"unknown op: $other")
    }
    run() // warm
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); val n = run()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"[optime] $op best=${times.map(_._1).min}%.2fs rows=${times.head._2} all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    spark.stop()
  }
}
