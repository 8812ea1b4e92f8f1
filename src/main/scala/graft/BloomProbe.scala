package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, Schemas, SnapshotLog}

/** Round-7 measurement harness for the resume anti-join's three regimes
  * (OPTIMIZATION_r07.md §9): evaluates the pending set under each FORCED
  * regime over the same fixture and reports wall time AND total shuffle
  * write bytes/records — bytes are the claim that matters (payload exchange
  * O(pages) → O(pages ∩ done)) and, unlike seconds, are host-weather-
  * independent. Not part of the frozen driver bench.
  *
  * `sbt "runMain graft.BloomProbe"` — expects target/bench_pages from a
  * prior Bench run (or synthesizes a smaller stand-in).
  */
object BloomProbe {

  private final class ShuffleMeter extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten): Unit
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bloom-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val pagesPath = "target/bench_pages"
    val pages =
      if (new java.io.File(pagesPath).isDirectory)
        spark.read.schema(Schemas.pagesSchema).parquet(pagesPath).as[Schemas.Page]
      else {
        println("target/bench_pages missing — synthesizing a 40k stand-in")
        spark.createDataset(graft.spark.Synth.corpus(40000))
      }

    // done = the first url-hash third extracted; pending ground truth = the
    // other two thirds, so the maybe-subset is ~1/3 of the pages payload
    val workDir = new java.io.File("target/bloom_probe")
    SparkEntry.deleteRecursively(workDir)
    val table = s"$workDir/extracted"
    ExtractJob.run(spark, pages.filter(pmod(hash(col("url")), lit(3)) === 0),
      table, numBuckets = cpus * 4)
    val log = new SnapshotLog(table)
    val nPages = pages.count()
    println(s"fixture: pages=$nPages doneRows=" +
      s"${SnapshotLog.rowCountOf(log.metaAt(log.currentSnapshot().get))}")

    def measure(confs: (String, String)*): Unit = {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // warm-up pass (page cache, JIT, bloom-build outside the timing of
        // run 1), then two measured passes; the meter counts measured only
        ExtractJob.pendingPages(spark, pages, log)._1
          .write.mode("overwrite").format("noop").save()
        val meter = new ShuffleMeter
        spark.sparkContext.addSparkListener(meter)
        val secs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val (df, tag) = ExtractJob.pendingPages(spark, pages, log)
          df.write.mode("overwrite").format("noop").save()
          val s = (System.nanoTime() - t0) / 1e9
          (s, tag)
        }
        Thread.sleep(1000) // listener bus drains async
        spark.sparkContext.removeSparkListener(meter)
        val tag = secs.head._2
        println(f"regime=$tag%-10s min=${secs.map(_._1).min}%6.2f s  " +
          f"shuffleMB/run=${meter.bytes.get / 2 / 1e6}%9.1f  " +
          f"shuffleRows/run=${meter.records.get / 2}%10d  " +
          f"passes=${secs.map(s => f"${s._1}%.2f").mkString("[", ",", "]")}")
      } finally confs.foreach { case (k, _) => spark.conf.unset(k) }
    }

    measure() // broadcast (default budgets): reference point, no pages shuffle
    measure("graft.extract.broadcastDoneRows" -> "0") // bloom middle regime
    measure("graft.extract.broadcastDoneRows" -> "0", // sort-merge fallback
      "graft.extract.bloomDoneRows" -> "0")
    spark.stop()
  }
}
