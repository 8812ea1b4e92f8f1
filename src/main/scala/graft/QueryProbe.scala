package graft

/** Dev harness: steady-state wall time of one registry query.
  * `java -cp ... graft.QueryProbe <queryName> [sfDir] [runs] [cpus]`
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = if (args.length > 3) args(3).toInt else 32
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // "_scan:<path>" = scan+decompress baseline of a pages parquet (no kernel):
    // sizes how much of the extract pass is the read itself
    val fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name.startsWith("_scan:")) {
        val p = name.stripPrefix("_scan:")
        (s, _) => s.read.parquet(p)
          .agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.length(
              org.apache.spark.sql.functions.col("html"))))
      } else SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
