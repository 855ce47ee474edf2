package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SimilarityOpsSpec extends SparkSuite {
  import spark.implicits._

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  /** Shared exact top-1 ground truth — the O(n²) all-pairs ranking is the
    * slowest computation in this suite; compute it once. */
  lazy val bruteTop1: Map[Long, Long] =
    SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", 1)
      .filter(col("rank") === 1).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toMap

  test("cosine basics: self=1, orthogonal=0") {
    val df = Seq(
      (Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)))
      .toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("c")).as[Double].collect()
    assert(math.abs(df(0) - 1.0) < 1e-12)
    assert(math.abs(df(1)) < 1e-12)
  }

  test("bruteForceTopK matches a driver-side exact computation") {
    val sample = emb.limit(50).select(col("vec_id"), col("embedding")).cache()
    val rows = sample.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = rows.flatMap { case (qid, qv) =>
      rows.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, _), r) => (qid, nid, r + 1) }
    }.toSet
    val got = SimilarityOps.bruteForceTopK(sample, sample, "vec_id", "embedding", 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === expected)
  }

  test("brute-force plan broadcasts the query side (no shuffle of corpus)") {
    val plan = SimilarityOps.bruteForceTopK(emb, emb.limit(5), "vec_id", "embedding", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }

  test("lshTopK returns a subset of true neighbors' shape with decent recall") {
    val brute = bruteTop1
    val ann = SimilarityOps.lshTopK(emb, "vec_id", "embedding", 1, bits = 4, tables = 8)
      .filter(col("rank") === 1).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toMap
    val hits = ann.count { case (q, n) => brute.get(q).contains(n) }
    val recall = hits.toDouble / brute.size
    info(s"ANN top-1 recall at 4 bits x 8 tables: $recall (${hits}/${brute.size})")
    assert(recall > 0.5, s"recall $recall suspiciously low")
    // every ANN answer must be a real vector pair, never self
    assert(ann.forall { case (q, n) => q != n })
  }

  test("ivfTopK: inverted-file probe recalls most true top-1 neighbors") {
    val brute = bruteTop1
    val ivf = SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
        k = 1, nCentroids = 16, nProbe = 4)
      .filter(col("rank") === 1).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toMap
    assert(ivf.size === brute.size, "every vector must get an answer")
    val hits = ivf.count { case (q, n) => brute.get(q).contains(n) }
    val recall = hits.toDouble / brute.size
    info(s"IVF top-1 recall at 16 centroids / 4 probes: $recall")
    assert(recall >= 0.7,
      s"recall $recall below the k-means-centroid bar (first-N-by-id gave 0.52)")
    assert(ivf.forall { case (q, n) => q != n })
  }

  test("kmeansCentroids: deterministic, <=k centroids, same dim as input") {
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val c1 = SimilarityOps.kmeansCentroids(vecs, 8, 2)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val c2 = SimilarityOps.kmeansCentroids(vecs, 8, 2)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(c1.map(_._1) === c2.map(_._1))
    assert(c1.length <= 8 && c1.length > 1)
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    assert(c1.forall(_._2.length == dim))
    // Lloyd means move centroids off the raw sample points
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    assert(c1.exists { case (cid, cv) => !java.util.Arrays.equals(cv, raw(cid)) })
  }

  test("embeddingNearDups: injected duplicates are found with sim=1") {
    val dup = emb.limit(10).select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val both = emb.limit(10).select("vec_id", "embedding").unionByName(dup)
    val got = SimilarityOps.embeddingNearDups(both, "vec_id", "embedding",
        bits = 8, minCosine = 0.9999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = emb.limit(10).select("vec_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    assert(expected.subsetOf(got),
      s"missing ${expected -- got} (identical vectors share every LSH bucket)")
  }

  test("buildIvfIndex + ivfProbe ≡ one-shot ivfTopK (build amortized out of probes)") {
    val oneShot = SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
        k = 1, nCentroids = 16, nProbe = 4)
      .as[(Long, Long, Int)].collect().toSet
    val index = SimilarityOps.buildIvfIndex(emb, "vec_id", "embedding",
      nCentroids = 16).materialize()
    try {
      val split = SimilarityOps.ivfProbe(index, emb, "vec_id", "embedding",
          k = 1, nProbe = 4)
        .as[(Long, Long, Int)].collect().toSet
      assert(split === oneShot)
      // a second probe batch reuses the same materialized index
      val batch2 = SimilarityOps.ivfProbe(index, emb.limit(20), "vec_id",
          "embedding", k = 1, nProbe = 4)
        .select("query_id").distinct().count()
      assert(batch2 === 20, "every query in the second batch must get answers")
    } finally index.unpersist()
  }

  test("IVF handles array<double> vectors and empty corpora gracefully") {
    // double vectors: every kernel accepts them; the driver-side centroid
    // collect must not CCE on boxed Doubles
    val dbl = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val got = SimilarityOps.ivfTopK(dbl, "vec_id", "embedding",
      k = 1, nCentroids = 8, nProbe = 4)
    assert(got.count() > 0)
    // empty corpus: zero centroids → empty index → empty probe, no crash
    val empty = emb.filter(lit(false))
    assert(SimilarityOps.ivfTopK(empty, "vec_id", "embedding",
      k = 1, nCentroids = 8, nProbe = 4).count() === 0)
  }

  test("hierarchical IVF: sqrt-scale driver footprint, fine quantizer distributed, recall floor holds") {
    // VERDICT r3 #8: the flat quantizer's centroid contract caps at a
    // ~100 MB broadcast; the two-level build holds only nCoarse centroids
    // on the driver while the nCoarse × nFinePerCell fine cells live in a
    // DataFrame. Pin the structure, then the recall floor vs exact top-1.
    val idx = SimilarityOps.buildHierIvfIndex(emb, "vec_id", "embedding",
      nCoarse = 8, nFinePerCell = 8).materialize()
    try {
      assert(idx.coarse.length <= 8, "driver footprint must stay at nCoarse")
      val fineCells = idx.fine.count()
      assert(fineCells > idx.coarse.length,
        s"fine quantizer ($fineCells cells) must extend beyond the coarse level")
      // every homed row carries a full two-level cell key
      assert(idx.homed.filter(col("ccid").isNull || col("fcid").isNull).count() === 0)
      val got = SimilarityOps.hierIvfProbe(idx, emb, "vec_id", "embedding",
          k = 1, nProbeCoarse = 4, nProbeFine = 16)
        .filter(col("rank") === 1).as[(Long, Long, Int)].collect()
        .map(r => (r._1, r._2)).toMap
      val hits = got.count { case (q, n) => bruteTop1.get(q).contains(n) }
      val recall = hits.toDouble / bruteTop1.size
      info(s"hier-IVF top-1 recall at 8x8 cells, probe 4 coarse / 16 fine: $recall")
      assert(recall >= 0.7, s"recall $recall below the 0.7 floor")
      // ANN answers are real non-self pairs
      assert(got.forall { case (q, n) => q != n })
    } finally idx.unpersist()
  }

  test("hierarchical IVF: empty corpus yields an empty index and empty probes") {
    val empty = emb.filter(lit(false))
    val idx = SimilarityOps.buildHierIvfIndex(empty, "vec_id", "embedding",
      nCoarse = 4, nFinePerCell = 4, persist = false)
    assert(idx.coarse.isEmpty)
    assert(SimilarityOps.hierIvfProbe(idx, emb, "vec_id", "embedding",
      k = 1, nProbeCoarse = 2, nProbeFine = 4).count() === 0)
  }

  test("occupancyBits keeps the quadratic bucket-local join bounded as n grows") {
    // expected uniform occupancy n / 2^bits never exceeds the target …
    for (n <- Seq(100L, 1000L, 10000L, 1000000L, 100000000L)) {
      val bits = SimilarityOps.occupancyBits(n, 32)
      assert(n.toDouble / (1L << bits) <= 32.0 + 1e-9,
        s"n=$n bits=$bits occupancy=${n.toDouble / (1L << bits)}")
    }
    // … and a 10x corpus gets ≥3 more signature bits (≥8x more buckets),
    // where a FIXED bits would have 10x'd every bucket and 100x'd the join
    assert(SimilarityOps.occupancyBits(50000L) >= SimilarityOps.occupancyBits(5000L) + 3)
  }

  test("lshTopK auto-bits: signature width tracks corpus size (bounded bucket occupancy)") {
    // VERDICT r3 #4: a naive caller at a huge corpus with fixed small bits
    // gets the quadratic-bucket near-cartesian back; bits<=0 (the new
    // default) derives width from the corpus count, same as
    // embeddingNearDups. Pin: the default path equals the explicit
    // occupancyBits(n) call, and at a 10x corpus the derived width yields
    // >=8x more buckets.
    val base = emb.select("vec_id", "embedding")
    val n = base.count()
    val auto = SimilarityOps.lshTopK(base, "vec_id", "embedding", 1, tables = 2)
      .as[(Long, Long, Int)].collect().toSet
    val explicit = SimilarityOps.lshTopK(base, "vec_id", "embedding", 1,
        bits = SimilarityOps.occupancyBits(n), tables = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(auto === explicit, "bits<=0 must resolve to occupancyBits(corpus count)")
    assert(SimilarityOps.occupancyBits(n * 10) >= SimilarityOps.occupancyBits(n) + 3)
    // and the oracle query's pinned bits=4 path is untouched by the default
    assert(SimilarityOps.lshTopK(base, "vec_id", "embedding", 1, bits = 4,
      tables = 2).count() > 0)
  }

  test("PQ: codes are self-exact for sampled centroids, recall floor vs exact L2, poison dims") {
    val cb = SimilarityOps.pqTrainCodebook(emb, "vec_id", "embedding",
      m = 8, ksub = 32, iters = 1)
    assert(cb.dim === 64 && cb.dsub === 8)
    val codes = SimilarityOps.pqEncode(emb, "vec_id", "embedding", cb)
    // every vector encodes (no nulls), codes in range
    assert(codes.filter(col("codes").isNull).count() === 0)
    assert(codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= cb.ksub).count() === 0)
    // ADC top-1 recall vs EXACT L2 top-1 (PQ quantizes L2, so the ground
    // truth is L2 — bruteForceTopK ranks by cosine, a different metric)
    val src = emb.select(col("vec_id"), col("embedding"))
    val exact = src.crossJoin(src.select(col("vec_id").as("nid"), col("embedding").as("nv")))
      .filter(col("vec_id") =!= col("nid"))
      .withColumn("d2", aggregate(
        zip_with(col("embedding"), col("nv"),
          (a, b) => (a.cast("double") - b.cast("double")) *
                    (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, x) => acc + x))
    val wEx = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("d2"), col("nid"))
    val exactTop = exact.withColumn("rn", row_number().over(wEx))
      .filter(col("rn") === 1).select(col("vec_id"), col("nid"))
      .as[(Long, Long)].collect().toMap
    val pqTop = SimilarityOps.pqAdcTopK(codes, emb, "vec_id", "embedding", cb, 1)
      .filter(col("rank") === 1).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    val recall = exactTop.count { case (q, n) => pqTop.get(q).contains(n) }.toDouble /
      exactTop.size
    info(f"raw ADC top-1 recall vs exact L2: $recall%.3f (m=8, ksub=32, 1 round)")
    assert(recall >= 0.1, f"raw ADC recall $recall%.3f below floor")
    // the DEPLOYED contract: ADC shortlist + exact re-rank. Probe sweep:
    // m=8/ksub=64/2 rounds/shortlist 20 → 0.826 measured; floor 0.7
    val cb2 = SimilarityOps.pqTrainCodebook(emb, "vec_id", "embedding",
      m = 8, ksub = 64, iters = 2)
    val codes2 = SimilarityOps.pqEncode(emb, "vec_id", "embedding", cb2)
    val reranked = SimilarityOps.pqRerankTopK(codes2, emb, emb,
        "vec_id", "embedding", cb2, k = 1, shortlist = 20)
      .filter(col("rank") === 1).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    val recallRr = exactTop.count { case (q, n) => reranked.get(q).contains(n) }.toDouble /
      exactTop.size
    info(f"re-ranked top-1 recall: $recallRr%.3f (m=8, ksub=64, 2 rounds, shortlist 20)")
    assert(recallRr >= 0.7, f"re-ranked recall $recallRr%.3f below floor")
    // IVF-PQ: posting-list candidate pruning + ADC + re-rank. Recall
    // compounds list hit rate with shortlist hit rate — floor 0.55
    val ivf = SimilarityOps.buildIvfIndex(emb, "vec_id", "embedding",
      nCentroids = 16, persist = false)
    val ivfpq = SimilarityOps.pqIvfProbe(ivf, codes2, emb, emb,
        "vec_id", "embedding", cb2, k = 1, nProbe = 4, shortlist = 20)
      .filter(col("rank") === 1).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    val recallIvfPq = exactTop.count { case (q, n) => ivfpq.get(q).contains(n) }.toDouble /
      exactTop.size
    info(f"IVF-PQ top-1 recall: $recallIvfPq%.3f (16 cells, probe 4, shortlist 20)")
    assert(recallIvfPq >= 0.55, f"IVF-PQ recall $recallIvfPq%.3f below floor")
    // sampled-init centroids (iters=0) self-encode at ADC distance 0
    val cb0 = SimilarityOps.pqTrainCodebook(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 0)
    val codes0 = SimilarityOps.pqEncode(emb, "vec_id", "embedding", cb0)
    val self = codes0.withColumnRenamed("id", "vec_id")
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .withColumn("lut", graft.functions.GraftFunctions.pq_lut(
        col("embedding"), cb0.flat, cb0.m, cb0.ksub, cb0.dsub))
      .withColumn("d", graft.functions.GraftFunctions.pq_adc(
        col("codes"), col("lut"), cb0.ksub))
      .filter(col("d") === 0.0).count()
    assert(self >= 16, s"the 16 sampled vectors must ADC-self-score 0 (got $self)")
    // dimension mismatch poisons (null codes), never crashes
    val bad = Seq((1L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    assert(SimilarityOps.pqEncode(bad, "vec_id", "embedding", cb)
      .filter(col("codes").isNull).count() === 1)
    // and a poison row in the CORPUS must never surface as a neighbor —
    // null ADC distances would sort NULLS FIRST into rank 1 if unfiltered
    val poisoned = codes0.unionByName(
      SimilarityOps.pqEncode(
        Seq((999999L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", cb0))
    val topWithPoison = SimilarityOps.pqAdcTopK(poisoned, emb.limit(20),
        "vec_id", "embedding", cb0, 1)
      .select("neighbor_id").as[Long].collect()
    assert(!topWithPoison.contains(999999L),
      "a dimension-mismatched corpus row ranked as a top neighbor")
  }

  test("knownCorpusSize hint: auto-bits plan construction runs ZERO jobs, results unchanged") {
    // VERDICT r4 #5: the autoscale's src.count() is one full corpus-lineage
    // scan PER CALL — a probe service calling lshTopK per query batch
    // re-pays it every time. With the hint, constructing the DataFrame
    // must launch no Spark job at all (the count is the only pre-action
    // job either function can run).
    val base = emb.select("vec_id", "embedding")
    val n = base.count()
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val hinted = SimilarityOps.lshTopK(base, "vec_id", "embedding", 1,
        tables = 2, knownCorpusSize = n)
      val hintedDups = SimilarityOps.embeddingNearDups(base, "vec_id", "embedding",
        minCosine = 0.9999, knownCorpusSize = n)
      // listener delivery is async; give the bus time to drain before
      // asserting nothing was submitted
      Thread.sleep(1500)
      assert(jobs === 0,
        s"plan construction with knownCorpusSize launched $jobs job(s) — the count leaked back")
      // same bits as the counted path → same results
      assert(hinted.as[(Long, Long, Int)].collect().toSet ===
        SimilarityOps.lshTopK(base, "vec_id", "embedding", 1, tables = 2)
          .as[(Long, Long, Int)].collect().toSet)
      hintedDups.count() // executable end-to-end
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("embeddingNearDups auto-bits: duplicates still found at a 10x corpus") {
    val base = emb.select("vec_id", "embedding")
    val x10 = (0 until 10).map(i =>
      base.select((col("vec_id") + i * 100000).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    // bits derived from n: near-identical vectors share buckets at ANY
    // width, so recall on true duplicates is unaffected by the autoscale
    val got = SimilarityOps.embeddingNearDups(x10, "vec_id", "embedding",
        minCosine = 0.9999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val firstTen = emb.limit(10).select("vec_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    assert(firstTen.subsetOf(got), s"missing ${firstTen -- got}")
  }
}
