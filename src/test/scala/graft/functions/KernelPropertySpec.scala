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

  test("cdcChunks ≡ naive boundary-split; concatenation is lossless") {
    val genText = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "g", "中文", "x9", "longword"))
        .map(_.mkString(" ")))
    def naivePoly(s: String): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i); acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
    def naive(text: String, avg: Int): Seq[String] = {
      val ws = if (text.trim == "") Array("")
        else text.trim.split("\\s+", -1) // fixture has plain spaces only
      val out = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer(ws(0)))
      for (i <- 1 until ws.length) {
        if (naivePoly(ws(i)) % avg == 0) out += scala.collection.mutable.ArrayBuffer(ws(i))
        else out.last += ws(i)
      }
      out.map(_.mkString(" ")).toSeq
    }
    for (i <- 1 to N; avg <- Seq(2, 8)) {
      val text = sample(genText, i)
      val got = {
        val a = Hashing.cdcChunks(UTF8String.fromString(text), avg)
        (0 until a.numElements()).map(j => a.getUTF8String(j).toString)
      }
      assert(got === naive(text, avg), s"seed $i avg $avg: '$text'")
      // losslessness vs the NORMALIZED INPUT (independent of naive — a
      // shared word-dropping bug in both would fail here)
      val normalized =
        if (text.trim == "") "" else text.trim.split("\\s+", -1).mkString(" ")
      assert(got.mkString(" ") === normalized, s"seed $i avg $avg reassembly")
    }
  }

  test("topNgramScore ≡ naive sliding-count max for arbitrary word lists") {
    val genText = Gen.chooseNum(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "中")).map(_.mkString(" ")))
    def naive(text: String, n: Int): Long = {
      val ws = if (text.trim == "") Array("") else text.trim.split("\\s+", -1)
      if (ws.length < n) return 0L
      val grams = ws.sliding(n).map(_.mkString(" ")).toSeq
      grams.groupBy(identity).map { case (g, occ) =>
        occ.size.toLong * g.codePointCount(0, g.length)
      }.max
    }
    for (i <- 1 to N; n <- Seq(2, 3)) {
      val text = sample(genText, i)
      assert(Hashing.topNgramScore(UTF8String.fromString(text), n) === naive(text, n),
        s"seed $i n=$n: '$text'")
    }
  }

  test("bpeEncode: round-trip lossless and token count <= codepoint count, arbitrary merges") {
    val genWords = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "ab", "bab", "abcabc", "x", "中a中")))
    val genMerges = Gen.chooseNum(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a a", "a b", "b a", "ab c", "中 a")))
    for (i <- 1 to N) {
      val words = sample(genWords, 2 * i)
      val merges = sample(genMerges, 2 * i + 1).distinct
      val text = words.mkString(" ")
      val a = Hashing.bpeEncode(UTF8String.fromString(text), merges.mkString("\n"))
      val toks = (0 until a.numElements()).map(j => a.getUTF8String(j).toString)
      assert(toks.mkString("") === words.mkString(""),
        s"seed $i: tokens must concatenate to the words ('$text', $merges)")
      assert(toks.length <= text.replace(" ", "").codePointCount(0, text.replace(" ", "").length),
        s"seed $i: more tokens than code points")
    }
  }

  test("pqEncode/pqLut/pqAdc consistency: self-distance of a centroid vector is 0, adc = lut sum") {
    val dim = 8; val m = 2; val dsub = 4; val ksub = 3
    val genVec = Gen.listOfN(dim, Gen.chooseNum(-5f, 5f))
    for (i <- 1 to 100) {
      val cents = (0 until ksub).map(c => sample(genVec, 3 * i + c))
      val flat = new Array[Float](m * ksub * dsub)
      for (c <- 0 until ksub; s <- 0 until m; d <- 0 until dsub)
        flat(((s * ksub) + c) * dsub + d) = cents(c)(s * dsub + d)
      // a centroid vector encodes to its own index per sub and self-ADC 0
      val v = floats(cents(i % ksub))
      val codes = Hashing.pqEncode(v, true, flat, m, ksub, dsub)
      val lut = Hashing.pqLut(v, true, flat, m, ksub, dsub)
      assert(Hashing.pqAdc(codes, lut, ksub) === 0.0, s"seed $i self-distance")
      // adc ≡ sum of lut entries at the codes
      val manual = (0 until m).map(s2 =>
        lut.getDouble(s2 * ksub + codes.getInt(s2))).sum
      assert(Hashing.pqAdc(codes, lut, ksub) === manual, s"seed $i adc sum")
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
