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
}
