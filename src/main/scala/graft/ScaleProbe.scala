package graft

import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, Schemas}

/** Dev harness: extraction throughput across parallelism levels against the
  * materialized bench pages table (expects graft.Bench ran once to create it).
  * Not part of the driver contract; used to tune the scaling path.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val pagesPath = "target/bench_pages"
    val levels = if (args.nonEmpty) args(0).split(",").toSeq.map(_.toInt) else Seq(4, 8, 16, 32)
    val paths: Seq[Boolean] =
      if (args.length > 1) args(1).split(",").toSeq.map(_ == "op") else Seq(false, true)
    for (cpus <- levels) {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      graft.spark.plans.ExtractPlan.install(spark)
      def pass(op: Boolean): Double = {
        val t0 = System.nanoTime()
        val df =
          if (op) graft.spark.plans.ExtractPlan.extract(
            spark.read.schema(Schemas.pagesSchema).parquet(pagesPath), numBuckets = cpus * 4)
          else ExtractJob.extractDF(
            spark.read.schema(Schemas.pagesSchema).parquet(pagesPath).as[Schemas.Page],
            numBuckets = cpus * 4)
        df.agg(count(lit(1)), sum(length(col("text")))).head()
        (System.nanoTime() - t0) / 1e9
      }
      for (op <- paths) {
        pass(op) // warm-up
        val s1 = pass(op)
        val s2 = pass(op)
        val label = if (op) "GraftExtractExec" else "mapPartitions   "
        println(f"CPUS=$cpus%2d $label sec=${math.min(s1, s2)}%.2f (runs: $s1%.2f, $s2%.2f)")
      }
      spark.stop()
    }
  }
}
