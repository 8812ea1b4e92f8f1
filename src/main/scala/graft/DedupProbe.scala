package graft

import org.apache.spark.sql.functions._
import graft.spark.{Dedup, Functions}

/** Dev harness: decompose t07 (MinHash LSH near-dup) wall time into its
  * stages at a given parallelism, to decide whether the shingle+MinHash UDF
  * dominates enough to justify a codegen Expression (VERDICT r2 #6).
  * `runMain graft.DedupProbe [sfDir] [cpus]`
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = Dedup.withInjectedNearDups(spark, docs, "doc_id", "text")

    def time(label: String)(body: => Unit): Unit = {
      body // warm-up
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${secs.min}%6.2f s  (${secs.map(s => f"$s%.2f").mkString(", ")})")
    }

    time("scan+count(text)") {
      corpus.select(sum(length(col("text")))).head(): Unit
    }
    time("shingle+minhash sigs") {
      corpus.select(Functions.minHashUdf(col("text")).as("sig"))
        .select(expr("bit_xor(element_at(sig, 1))")).head(): Unit
    }
    time("sigs+bands") {
      corpus.select(Functions.minHashUdf(col("text")).as("sig"))
        .withColumn("bands", Functions.bandsFromSigUdf(col("sig")))
        .select(expr("bit_xor(element_at(bands, 1))")).head(): Unit
    }
    time("full minHashPairs") {
      Dedup.minHashPairs(corpus, "doc_id", "text", minJaccard = 0.5).count(): Unit
    }
    spark.stop()
  }
}
