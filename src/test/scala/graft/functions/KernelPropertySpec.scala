package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Property tests for the pure codegen kernels — no SparkSession: the
 * kernels are plain JVM functions over UnsafeArrayData/UTF8String, so they
 * can be hammered with seeded ScalaCheck generators against independent
 * naive reimplementations. Deterministic seeds (no wall-clock randomness):
 * a failure prints the seed index for exact replay.
 */
class KernelPropertySpec extends AnyFunSuite {

  private val N = 300 // cases per property

  private def sample[A](g: Gen[A], i: Int): A =
    g.apply(Gen.Parameters.default, rng.Seed(0xC0FFEEL + i)).getOrElse(
      sys.error(s"gen failed at seed $i"))

  private def longs(xs: Seq[Long]) = UnsafeArrayData.fromPrimitiveArray(xs.toArray)
  private def floats(xs: Seq[Float]) = UnsafeArrayData.fromPrimitiveArray(xs.toArray)

  test("jaccardCounts ≡ Set intersection/union sizes on arbitrary distinct arrays") {
    val genSet = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L)).map(_.distinct))
    for (i <- 1 to N) {
      val a = sample(genSet, 2 * i)
      val b = sample(genSet, 2 * i + 1)
      val packed = Hashing.jaccardCounts(longs(a), longs(b))
      val inter = (packed >>> 32).toInt
      val union = (packed & 0xFFFFFFFFL).toInt
      assert(inter === a.toSet.intersect(b.toSet).size, s"seed $i: $a vs $b")
      assert(union === a.toSet.union(b.toSet).size, s"seed $i: $a vs $b")
    }
  }

  test("docIdNum ≡ naive byte-level digit parse for arbitrary strings") {
    // the kernel's contract is BYTE-level: the id region is UTF-8 bytes
    // 4..15, all of which must be digits (partial digit prefixes like
    // 'doc-7garbage' are malformed, not id 7). For pure-ASCII ids this
    // coincides with substring(5,12).cast(long) — FunctionsSpec pins that
    // on generated ids — but a multibyte prefix shifts CHAR positions vs
    // byte positions, so the independent oracle here is byte-indexed too.
    def naive(s: String): Long = {
      val bytes = s.getBytes("UTF-8").take(16).drop(4)
      if (bytes.isEmpty || bytes.exists(b => b < '0' || b > '9')) -1L
      else bytes.foldLeft(0L)((acc, b) => acc * 10 + (b - '0'))
    }
    val genId = Gen.oneOf(
      Gen.chooseNum(0L, 999999999999L).map(n => f"doc-$n%012d"),
      Gen.asciiPrintableStr.map(_.take(24)),
      Gen.listOfN(8, Gen.oneOf('d', 'o', 'c', '-', '0', '9', '中', 'x'))
        .map(_.mkString))
    for (i <- 1 to N) {
      val s = sample(genId, i)
      assert(Hashing.docIdNum(UTF8String.fromString(s)) === naive(s), s"seed $i: '$s'")
    }
  }

  test("quantizeI8 ≡ naive floor(x·127/max|x|) incl. zero/negative edges") {
    val genVec = Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-8.0f, 8.0f)))
    for (i <- 1 to N) {
      val v = sample(genVec, i) ++ (if (i % 7 == 0) Seq(0f, 0f) else Nil)
      val got = Hashing.quantizeI8(floats(v), isFloat = true).toIntArray()
      val maxAbs = if (v.isEmpty) 0.0 else v.map(x => math.abs(x.toDouble)).max
      val want =
        if (maxAbs > 0) v.map(x => math.floor(x.toDouble * 127.0 / maxAbs).toInt)
        else v.map(_ => 0)
      assert(got.toSeq === want, s"seed $i: $v")
    }
  }

  test("nearestCentroids ≡ naive (cosine desc, cid asc) top-n") {
    val genDim = Gen.chooseNum(2, 12)
    for (i <- 1 to N) {
      val dim = sample(genDim, 3 * i)
      val k = sample(Gen.chooseNum(1, 8), 3 * i + 1)
      val n = sample(Gen.chooseNum(1, 4), 3 * i + 2)
      def vec(seed: Int) = sample(
        Gen.listOfN(dim, Gen.chooseNum(-4.0f, 4.0f)), seed)
      val v = vec(1000 + i)
      val cents = (0 until k).map(c => ((c * 7 + 3).toLong, vec(2000 + i * 10 + c)))
      val flat = cents.flatMap(_._2).toArray
      val got = Hashing.nearestCentroids(floats(v), isFloat = true, flat, dim,
        cents.map(_._1).toArray, n).toLongArray()
      // naive: same fold order for dot/norms, full sort, NaN skipped
      def dot(a: Seq[Float], b: Seq[Float]) =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val vn = math.sqrt(dot(v, v))
      val want = cents
        .map { case (cid, cv) => (cid, dot(v, cv) / (vn * math.sqrt(dot(cv, cv)))) }
        .filterNot(_._2.isNaN)
        .sortWith { case ((c1, s1), (c2, s2)) => s1 > s2 || (s1 == s2 && c1 < c2) }
        .take(n).map(_._1)
      assert(got.toSeq === want, s"seed $i: v=$v cents=$cents")
    }
  }

  test("intArrayJson ≡ mkString JSON for arbitrary int arrays") {
    val genArr = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Int.MinValue, Int.MaxValue)))
    for (i <- 1 to N) {
      val a = sample(genArr, i)
      val got = Hashing.intArrayJson(
        UnsafeArrayData.fromPrimitiveArray(a.toArray)).toString
      assert(got === a.mkString("[", ",", "]"), s"seed $i")
    }
  }

  test("affine mix family regression pin (streams used by the retry-ledger oracle)") {
    // q_retry_ledger's DuckDB oracle hard-codes streams 101-103 of the
    // affine family; pin concrete values so an accidental constant change
    // fails HERE with a diffable number, not as a driver-side hash mismatch
    val P = 1000000007L
    def mix(id: Long, s: Int) =
      ((id % P) * (2654435761L % P + 2L * s + 1L) + (1013904223L + 7919L * s)) % P
    assert(mix(0L, 101) === 14704035L)   // B_101 mod P
    assert(mix(1L, 101) === 669139985L)  // (A_101 + B_101) mod P
    assert(mix(0L, 103) === 14719873L)
  }
}
