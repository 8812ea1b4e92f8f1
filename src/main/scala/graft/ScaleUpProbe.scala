package graft

import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, Schemas, Synth}

/** Dev harness: does extraction throughput HOLD as the corpus grows?
  * Materializes `mult` copies of the sf0.1 documents as pages parquet
  * (same construction as graft.Bench) and measures the 32-core extract pass.
  * Usage: `java ... graft.ScaleUpProbe [mult] [cpus]` (defaults 400, 32 —
  * 2M docs / ~28 GB payload, 10x the driver bench corpus).
  */
object ScaleUpProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 400
    val cpus = if (args.length > 1) args(1).toInt else 32
    val docRep = 40
    val sfDir = "/root/testdata/sf0.1"
    val pagesPath = s"target/scaleup_pages_$mult"

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    if (!new java.io.File(s"$pagesPath/_SUCCESS").exists()) {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "lang")
      val reps = spark.range(mult).select(col("id").as("rep"))
      base.crossJoin(reps)
        .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"), col("text"), col("lang"))
        .repartition(256)
        .as[(Long, String, String)]
        .map { case (id, text, lang) =>
          val big = Array.fill(docRep)(text).mkString(" ")
          Synth.pageFromDocument(id, big, lang)
        }
        .write.mode("overwrite").parquet(pagesPath)
    }

    def pass(): (Long, Long, Double) = {
      val pages = spark.read.schema(Schemas.pagesSchema).parquet(pagesPath).as[Schemas.Page]
      val t0 = System.nanoTime()
      val row = ExtractJob.extractDF(pages, numBuckets = cpus * 4)
        .agg(count(lit(1)), sum(col("n_bytes")), sum(length(col("text"))))
        .head()
      ((row.getLong(0)), row.getLong(1), (System.nanoTime() - t0) / 1e9)
    }
    pass() // warm-up
    val runs = (1 to 3).map(_ => pass())
    val (docs, bytes, sec) = runs.minBy(_._3)
    println(f"scaleup mult=$mult cpus=$cpus docs=$docs payloadMB=${bytes / 1e6}%.0f " +
      f"sec=$sec%.2f docsPerSec=${docs / sec}%.0f mbPerSec=${bytes / 1e6 / sec}%.0f " +
      f"(runs: ${runs.map(r => f"${r._3}%.2f").mkString(", ")})")
    spark.stop()
  }
}
