package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, Schemas, SnapshotLog}

/** Round-7 scratch probe: what does the extract turn's write plan look like
  * against the accumulated extracted table (bench_extra_pipeline from
  * BenchExtra)? Attribution for the two concurrent ~3s jobs per turn.
  */
object PlanProbe7 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val table = "target/bench_extra_pipeline/extracted"
    val log = new SnapshotLog(table)
    val pages = spark.read.schema(Schemas.pagesSchema)
      .parquet("target/bench_pages").as[Schemas.Page]
    val batch = pages.filter(pmod(hash(col("url")), lit(3)) === 1)
    val done = log.scan(spark, Schemas.extractedSchema).select("url")
    val pending = batch.join(done, Seq("url"), "left_anti").as[Schemas.Page]
    val extracted = ExtractJob.extractDF(pending, cpus * 4)
      .drop("ok")
      .repartition(cpus * 4, col("bucket"))
    println(extracted.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
