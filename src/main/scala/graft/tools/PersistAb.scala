package graft.tools
import graft.pipeline._
object PersistAb {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "persist-ab")
    val n = 1000000L
    def time(f: => Any): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def run(persist: Boolean): Double =
      graft.util.Scratch.withTempDir("pab") { out =>
        time(Pipeline.run(spark, DataGen.sequences(spark, n, 64), out,
          Pipeline.Config(persistRouted = persist)))
      }
    run(true) // warm
    var bp = Double.MaxValue; var br = Double.MaxValue
    for (i <- 1 to 3) {
      bp = math.min(bp, run(true))
      br = math.min(br, run(false))
      println(f"ROUND $i persist=$bp%.2f recompute=$br%.2f")
    }
    spark.stop()
  }
}
