package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class StateStoreSpec extends SparkSuite {
  import spark.implicits._

  val now = Parse.BaseEpoch
  val future = now + 3600
  val past = now - 3600

  test("empty store loads an empty state with the right schema") {
    val st = new StateStore(tmpDir("st"))
    val df = st.load(spark, now)
    assert(df.count() === 0)
    assert(df.schema === Schemas.knownContent)
  }

  test("commit + load round-trips; expired entries dropped at load (S10)") {
    val st = new StateStore(tmpDir("st"))
    val ids = Seq("a", "b", "c").toDF("doc_id")
    st.commit(spark, ids, "doc_id", expirationEpochSec = future, commitEpochSec = now)
    assert(st.load(spark, now).count() === 3)
    // as of a time past expiration, all entries are expired → dropped
    assert(st.load(spark, future + 1).count() === 0)
  }

  test("snapshots are append-only deltas; pointer advances atomically") {
    val st = new StateStore(tmpDir("st"))
    st.commit(spark, Seq("a").toDF("doc_id"), "doc_id", future, now)
    st.commit(spark, Seq("b", "c").toDF("doc_id"), "doc_id", future, now)
    assert(st.currentSnapshot === Some(1))
    assert(st.load(spark, now).select("content_id").as[String].collect().sorted
      === Array("a", "b", "c"))
  }

  test("compact folds deltas into one snapshot, preserving content") {
    val st = new StateStore(tmpDir("st"))
    st.commit(spark, Seq("a").toDF("doc_id"), "doc_id", future, now)
    st.commit(spark, Seq("b").toDF("doc_id"), "doc_id", future, now)
    st.compact(spark)
    assert(st.currentSnapshot === Some(2))
    assert(st.load(spark, now).select("content_id").as[String].collect().sorted
      === Array("a", "b"))
    // old delta dirs are gone
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(st.dir, "snapshot-0")))
  }

  test("dedup is a left-anti join on the id") {
    val st = new StateStore(tmpDir("st"))
    st.commit(spark, Seq("a", "b").toDF("doc_id"), "doc_id", future, now)
    val incoming = Seq("a", "b", "c", "d").toDF("doc_id")
    val fresh = st.dedup(incoming, st.load(spark, now))
    assert(fresh.as[String].collect().sorted === Array("c", "d"))
  }

  test("expired known ids are re-admitted (expiry-reload path)") {
    val st = new StateStore(tmpDir("st"))
    st.commit(spark, Seq("a").toDF("doc_id"), "doc_id", expirationEpochSec = past,
      commitEpochSec = past - 10)
    val fresh = st.dedup(Seq("a", "b").toDF("doc_id"), st.load(spark, now))
    assert(fresh.as[String].collect().sorted === Array("a", "b"))
  }

  test("lineage columns recorded per commit") {
    val st = new StateStore(tmpDir("st"))
    st.commit(spark, Seq("a", "b").toDF("doc_id"), "doc_id", future, now)
    val state = st.load(spark, now)
    assert(state.filter(col("partition_id").isNull || col("committed_at").isNull).count() === 0)
  }

  test("dedup withinBatch=true collapses in-run repeats (reference contains_key+insert)") {
    val st = new StateStore(tmpDir("st"))
    val incoming = Seq("a", "a", "b", "b", "b", "c").toDF("doc_id")
    val fresh = st.dedup(incoming, st.load(spark, now), withinBatch = true)
    assert(fresh.as[String].collect().sorted === Array("a", "b", "c"))
    // default path documents the divergence: repeats pass through
    val loose = st.dedup(incoming, st.load(spark, now))
    assert(loose.count() === 6)
  }

  test("bloom-pruned dedup ≡ plain anti-join (prune is lossless by construction)") {
    val st = new StateStore(tmpDir("st_bloom"))
    val knownIds = (0 until 500).map(i => f"doc-$i%012d")
    st.commit(spark, knownIds.toDF("doc_id"), "doc_id", future, now)
    val incoming = (0 until 1000).map(i => f"doc-$i%012d").toDF("doc_id")
    val known = st.load(spark, now)
    val plain = st.dedup(incoming, known, bloomPruneThreshold = -1L)
      .as[String].collect().toSet
    // threshold 0 forces the bloom path at any state size
    val pruned = st.dedup(incoming, known, bloomPruneThreshold = 0L)
      .as[String].collect().toSet
    assert(plain === (500 until 1000).map(i => f"doc-$i%012d").toSet)
    assert(pruned === plain)
    // and the pruned plan actually probes a bloom filter scan-side — use a
    // parquet-backed incoming (a LocalRelation gets its deterministic
    // filters constant-folded away at optimize time, hiding the probe)
    val inDir = tmpDir("st_bloom_in")
    incoming.write.mode("overwrite").parquet(inDir)
    val plan = st.dedup(spark.read.parquet(inDir), known, bloomPruneThreshold = 0L)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloommightcontain"), s"plan:\n$plan")
  }

  test("bloom-pruned dedup ≡ plain anti-join for LONG ids (builder/probe hash domains match)") {
    // ADVICE r3: the builder inserted UTF-8 bytes of the string cast while
    // the probe hashed raw longs for integral id columns — ~every known
    // long id false-negatived and passed dedup as a duplicate. The builder
    // now putLong()s integral ids, matching mightContainLong.
    val st = new StateStore(tmpDir("st_bloom_long"))
    val known = spark.range(0, 500).select(col("id").as("content_id"))
    val incoming = spark.range(0, 1000).select(col("id").as("doc_id"))
    val plain = st.dedup(incoming, known, bloomPruneThreshold = -1L)
      .as[Long].collect().toSet
    val pruned = st.dedup(incoming, known, bloomPruneThreshold = 0L)
      .as[Long].collect().toSet
    assert(plain === (500L until 1000L).toSet)
    assert(pruned === plain,
      "a hash-domain drift between bloom builder and probe silently passes duplicates")
    // int ids take the same putLong/mightContainLong path
    val knownInt = spark.range(0, 500).select(col("id").cast("int").as("content_id"))
    val incomingInt = spark.range(0, 1000).select(col("id").cast("int").as("doc_id"))
    assert(st.dedup(incomingInt, knownInt, bloomPruneThreshold = 0L).count() === 500)
  }

  test("MIXED-type ids (string state, long incoming) fall back to the plain join under bloom settings") {
    // The real store persists content_id as STRING (commit casts), so a
    // caller deduping long incoming ids against it mixes types. There is
    // no single hash domain in which a bloom provably mirrors the join's
    // type-coercion equality, so the prune must decline — not guess and
    // risk a false negative that passes duplicates.
    val st = new StateStore(tmpDir("st_bloom_mixed"))
    st.commit(spark, spark.range(0, 500).select(col("id").as("doc_id")),
      "doc_id", future, now) // commits as string content_id
    val incoming = spark.range(0, 1000).select(col("id").as("doc_id"))
    val known = st.load(spark, now)
    assert(known.schema("content_id").dataType ===
      org.apache.spark.sql.types.StringType)
    val plain = st.dedup(incoming, known, bloomPruneThreshold = -1L)
      .as[Long].collect().toSet
    val viaBloomSettings = st.dedup(incoming, known, bloomPruneThreshold = 0L)
      .as[Long].collect().toSet
    assert(plain === (500L until 1000L).toSet,
      "join-time coercion must dedup long incoming against string state")
    assert(viaBloomSettings === plain,
      "mixed-type dedup with bloom settings must not diverge from the plain join")
    // and no bloom probe appears in the plan (the prune declined)
    val plan = st.dedup(incoming, known, bloomPruneThreshold = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("bloommightcontain"), s"plan:\n$plan")
  }

  test("bloom path keeps NULL-id rows (plain anti-join semantics) and tolerates null state ids") {
    // ADVICE r3: both filter(might) and filter(!might) are NULL for a null
    // id — the bloom path silently dropped exactly the malformed rows the
    // plain anti-join keeps (a null key never matches). Null ids now route
    // down the definitely-fresh branch explicitly, and null STATE ids are
    // skipped by the builder instead of NPE-ing the treeAggregate.
    val st = new StateStore(tmpDir("st_bloom_null"))
    val known = Seq(Some("a"), Some("b"), None).toDF("content_id")
    val incoming = Seq(Some("a"), Some("c"), None, None).toDF("doc_id")
    val plain = st.dedup(incoming, known, bloomPruneThreshold = -1L)
      .as[Option[String]].collect().sortBy(_.getOrElse(""))
    val pruned = st.dedup(incoming, known, bloomPruneThreshold = 0L)
      .as[Option[String]].collect().sortBy(_.getOrElse(""))
    assert(plain.toSeq === Seq(None, None, Some("c")))
    assert(pruned.toSeq === plain.toSeq,
      "the bloom prune must not drop null-id rows the plain anti-join keeps")
  }

  test("liveRowCount: memoized per snapshot, incremental across commits, survives compact") {
    val st = new StateStore(tmpDir("st_count"))
    assert(st.liveRowCount(spark) === 0)
    st.commit(spark, Seq("a", "b", "c").toDF("doc_id"), "doc_id", future, now)
    assert(st.liveRowCount(spark) === 3)
    assert(st.liveRowCount(spark) === 3) // cached (same snapshot)
    st.commit(spark, Seq("d", "e").toDF("doc_id"), "doc_id", future, now)
    assert(st.liveRowCount(spark) === 5) // incremental: only the new delta counted
    st.compact(spark)
    assert(st.liveRowCount(spark) === 5) // history rewritten → full recount path
  }

  test("bloom_might_contain: zero false negatives over every inserted id") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(1000, 0.01)
    (0 until 1000).foreach(i =>
      bf.putBinary(f"doc-$i%012d".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val probes = (0 until 2000).map(i => f"doc-$i%012d").toDF("doc_id")
    val hits = probes.filter(
      graft.functions.GraftFunctions.bloom_might_contain(col("doc_id"), bf))
      .as[String].collect().toSet
    val inserted = (0 until 1000).map(i => f"doc-$i%012d").toSet
    assert(inserted.subsetOf(hits), "a Bloom filter must never false-negative")
    val fpRate = (hits -- inserted).size.toDouble / 1000
    assert(fpRate < 0.05, s"false-positive rate $fpRate far above configured 1%")
    // non-id types are rejected at analysis time
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.5).toDF("x").select(
        graft.functions.GraftFunctions.bloom_might_contain(col("x"), bf)).collect()
    }
  }

  test("merge: re-arrival updates expiration via last-writer-wins (MERGE upsert)") {
    val st = new StateStore(tmpDir("st"))
    st.commit(spark, Seq("a", "b").toDF("doc_id"), "doc_id",
      expirationEpochSec = now + 100, commitEpochSec = now)
    // 'a' re-arrives with a LONGER expiration (the reference overwrites
    // known_blobs[id]); 'b' keeps the short one
    st.merge(spark, Seq("a").toDF("doc_id"), "doc_id",
      expirationEpochSec = now + 10000, commitEpochSec = now + 1)
    // at now+200: b's only version expired; a's LATEST version is alive
    val live = st.loadResolved(spark, now + 200)
    assert(live.select("content_id").as[String].collect() === Array("a"))
    // exactly one resolved row per id before expiry too
    val resolved = st.loadResolved(spark, now)
    assert(resolved.count() === 2)
    assert(resolved.filter(col("content_id") === "a")
      .select(col("expiration").cast("long")).as[Long].head() === now + 10000)
  }

  test("merge then compact drops shadowed versions, preserving resolution") {
    val st = new StateStore(tmpDir("st"))
    st.commit(spark, Seq("a", "b").toDF("doc_id"), "doc_id", now + 100, now)
    st.merge(spark, Seq("a").toDF("doc_id"), "doc_id", now + 10000, now + 1)
    st.compact(spark)
    // compaction keeps one row per id — the last writer's
    val all = spark.read.parquet(s"${st.dir}/snapshot-${st.currentSnapshot.get}")
    assert(all.count() === 2)
    assert(all.filter(col("content_id") === "a")
      .select(col("expiration").cast("long")).as[Long].head() === now + 10000)
    assert(st.loadResolved(spark, now + 200)
      .select("content_id").as[String].collect() === Array("a"))
  }

  test("loadAsOf never reads orphan snapshot dirs beyond the committed pointer") {
    val st = new StateStore(tmpDir("st"))
    st.commit(spark, Seq("a").toDF("doc_id"), "doc_id", future, now)
    // simulate a crashed commit: snapshot dir written, pointer never swapped
    Seq("zombie").toDF("doc_id")
      .select(col("doc_id").as("content_id"),
        timestamp_seconds(lit(future)).as("expiration"),
        timestamp_seconds(lit(now)).as("committed_at"),
        lit(0).as("partition_id"), lit(1).as("snapshot_id"))
      .write.parquet(s"${st.dir}/snapshot-1")
    assert(st.loadAsOf(spark, now, 99).select("content_id").as[String].collect()
      === Array("a"))
    assert(st.load(spark, now).select("content_id").as[String].collect()
      === Array("a"))
  }

  test("time travel: loadAsOf(k) sees exactly snapshots 0..k") {
    val st = new StateStore(tmpDir("st"))
    st.commit(spark, Seq("a").toDF("doc_id"), "doc_id", future, now)
    st.commit(spark, Seq("b").toDF("doc_id"), "doc_id", future, now)
    st.commit(spark, Seq("c").toDF("doc_id"), "doc_id", future, now)
    assert(st.loadAsOf(spark, now, 0).select("content_id").as[String].collect().sorted
      === Array("a"))
    assert(st.loadAsOf(spark, now, 1).select("content_id").as[String].collect().sorted
      === Array("a", "b"))
    assert(st.loadAsOf(spark, now, 2).select("content_id").as[String].collect().sorted
      === Array("a", "b", "c"))
  }
}
