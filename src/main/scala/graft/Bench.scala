package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, Synth}

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Two measurements (BASELINE.md targets):
  *   1. per-query wall times over SPARK_GRAFT_SF_DIR at the high parallelism;
  *   2. extraction throughput (docs/sec + MB/sec of payload parsed) on a
  *      multiplied synthetic pages corpus at local[N] and local[N/4] — the
  *      sandbox stand-in for the N-vs-4N-executor scaling criterion
  *      (BASELINE.json north_rule; driver instruction). Efficiency =
  *      (thru_high / thru_low) / (cpus_high / cpus_low).
  */
object Bench {

  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Extraction throughput on `mult` copies of the documents corpus.
    * Returns (docs, bytes, seconds).
    */
  private def extractBench(spark: SparkSession, sfDir: String, mult: Int): (Long, Long, Double) = {
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val reps = spark.range(mult).select(col("id").as("rep"))
    val docs = base.crossJoin(reps)
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"), col("text"), col("lang"))
    val pages = docs.as[(Long, String, String)]
      .map { case (id, text, lang) => Synth.pageFromDocument(id, text, lang) }
    val t0 = System.nanoTime()
    val row = ExtractJob.extractDF(pages, numBuckets = 256)
      .agg(count(lit(1)), sum(col("n_bytes")), sum(length(col("text"))))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    (row.getLong(0), row.getLong(1), sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusHigh = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cpusLow = math.max(2, cpusHigh / 4)
    val mult = sys.env.getOrElse("SPARK_GRAFT_BENCH_MULT", "8").toInt

    // headline queries at high parallelism
    val headline = Seq(
      "x05_extract_all", "x02_html_extract", "s05_search_multi", "a02_lineage",
      "a03_host_stats", "q1_agg", "t01_fingerprint", "t02_dedup_exact",
      "t07_neardup_pairs", "e01_embed_topk", "j01_semi_join")
    var spark = newSession(cpusHigh)
    val queryTimes = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }

    // scaling: same extraction job at cpusHigh and cpusLow on identical input
    val (docsH, bytesH, secH) = extractBench(spark, sfDir, mult)
    spark.stop()
    spark = newSession(cpusLow)
    val (_, _, secL) = extractBench(spark, sfDir, mult)
    spark.stop()

    val thruHigh = docsH / secH
    val thruLow = docsH / secL
    val mbH = bytesH / 1e6 / secH
    val efficiency = (thruHigh / thruLow) / (cpusHigh.toDouble / cpusLow)

    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum + secH
    println(
      s"""{"metric":"extract_docs_per_sec","value":${f"$thruHigh%.1f"},"unit":"docs/sec",""" +
      s""""queries":$qs,"sf":"$sfDir","total_sec":${f"$total%.2f"},""" +
      s""""extract":{"docs":$docsH,"payload_mb":${f"${bytesH / 1e6}%.1f"},""" +
      s""""cpus_high":$cpusHigh,"cpus_low":$cpusLow,""" +
      s""""sec_high":${f"$secH%.2f"},"sec_low":${f"$secL%.2f"},""" +
      s""""docs_per_sec_high":${f"$thruHigh%.1f"},"docs_per_sec_low":${f"$thruLow%.1f"},""" +
      s""""mb_per_sec_high":${f"$mbH%.1f"},""" +
      s""""scaling_efficiency":${f"$efficiency%.3f"}}}""")
  }
}
