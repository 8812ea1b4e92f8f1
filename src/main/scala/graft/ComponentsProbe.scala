package graft

import org.apache.spark.sql.SparkSession

/** Dev harness for P17 (`Dedup.connectedComponents`): wall time and
  * convergence on the two extreme graph shapes. Near-dup graphs are cliques
  * and stars (diameter 1-2); the adversarial shape is a long PATH, where
  * naive min-label propagation needs diameter rounds — pointer jumping must
  * hold rounds at O(log diameter) or the operator would never finish on a
  * pathological duplicate chain. The operator throws when maxIter (25) is
  * hit, so mere completion on the 100k-path IS the O(log d) evidence
  * (naive would need 100,000 rounds). Results recorded in BASELINE.md.
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // shape 1: 25k cliques of 4 (150k edges) — the LSH-bucket dup shape
    val cliques = (for (c <- 0 until 25000; i <- 0 until 4; j <- i + 1 until 4)
      yield (c * 10L + i, c * 10L + j)).toDF("a", "b")
    val comps1 = time("cliques 100k vertices / 150k edges") {
      val out = graft.spark.Dedup.connectedComponents(cliques)
      val n = out.select("component").distinct().count()
      require(n == 25000, s"expected 25000 components, got $n")
      n
    }

    // shape 2: ONE path of 100k vertices — diameter 10^5; naive propagation
    // needs 10^5 rounds, pointer jumping ~log2(10^5) = 17
    val path = (0 until 99999).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val comps2 = time("path 100k vertices (diameter 10^5)") {
      val out = graft.spark.Dedup.connectedComponents(path)
      val comps = out.select("component").distinct().collect()
      require(comps.length == 1 && comps.head.getLong(0) == 0L,
        s"path must collapse to component 0, got ${comps.length}")
      comps.length
    }
    println(s"cliques components=$comps1, path components=$comps2 " +
      "(completing under maxIter=25 is the O(log diameter) evidence)")
    spark.stop()
  }
}
