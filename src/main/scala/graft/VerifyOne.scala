package graft

/** Dev harness: dump ONE registry query's result to parquet for a targeted
  * DuckDB cross-check (the single-query slice of what [[Verify]] does).
  * `runMain graft.VerifyOne <queryName> <sfDir> <outDir>`
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args.take(3)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    println(s"wrote $outDir/$name")
    spark.stop()
  }
}
