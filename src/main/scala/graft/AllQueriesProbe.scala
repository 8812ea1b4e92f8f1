package graft

/** Round-7 full-coverage measurement: min-of-N noop-sink wall time for EVERY
  * registry query (guide §1.4) — the per-operator numbers OPTIMIZATION_r07.md
  * reports. `runMain graft.AllQueriesProbe [sfDir] [runs] [cpus]`
  */
object AllQueriesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      var failed = false
      val times = (0 to runs).map { i => // run 0 = warm-up, dropped
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable => failed = true; println(s"$name FAILED: $e") }
        (System.nanoTime() - t0) / 1e9
      }.drop(1)
      spark.sparkContext.setJobDescription(null)
      // a failing query must not masquerade as a fast one: its near-zero
      // fail-fast wall time is excluded from the ranking entirely
      val line =
        if (failed) f"$name%-28s FAILED"
        else f"$name%-28s min=${times.min}%7.3f s  (${times.map(t => f"$t%.3f").mkString(",")})"
      println(line)
      line
    }
    println("==== summary (slowest first) ====")
    results.filter(_.contains("min="))
      .sortBy(l => -l.split("min=")(1).trim.split(" ")(0).toDouble)
      .take(15).foreach(println)
    results.filterNot(_.contains("min=")).foreach(println)
    spark.stop()
  }
}
