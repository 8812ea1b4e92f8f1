package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, Pipelines, Schemas, SnapshotLog}

/** Round-7 measurement harness (guide §1: measure first, isolate with the
  * noop sink). NOT part of the frozen driver bench — Bench.scala is hashed;
  * extra measurements live here and feed OPTIMIZATION_r07.md.
  *
  * Reproduces the bench's pipeline phase (same pages table, same three
  * url-hash thirds, same numBuckets) but times each SUB-STEP of a turn and
  * counts the Spark jobs it launches, so the [6, 23, 35] s per-turn cost in
  * BENCH_r06's bonus-start artifact can be attributed to a specific step
  * instead of guessed at.
  *
  * `sbt "runMain graft.BenchExtra"` — expects target/bench_pages from a prior
  * Bench run (or materializes a smaller stand-in).
  */
object BenchExtra {

  private final class JobCounter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      val desc = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("") +
        " | " + Option(js.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("") +
        s" | stages=${js.stageInfos.size}:" +
        js.stageInfos.map(si => s"${si.numTasks}(${si.name.take(40)})").mkString(",")
      starts.put(js.jobId, (System.nanoTime(), desc)): Unit
    }
    override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
        println(f"      job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val pagesPath = "target/bench_pages"
    require(new java.io.File(pagesPath).isDirectory,
      s"$pagesPath missing — run graft.Bench first to materialize it")

    val counter = new JobCounter
    spark.sparkContext.addSparkListener(counter)

    val workDir = new java.io.File("target/bench_extra_pipeline")
    SparkEntry.deleteRecursively(workDir)
    val table = s"$workDir/extracted"; val dd = s"$workDir/deduped"
    val pages = spark.read.schema(Schemas.pagesSchema)
      .parquet(pagesPath).as[Schemas.Page]
    val turns = 3

    def timed[T](label: String)(body: => T): T = {
      val j0 = counter.jobs.get()
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(label)
      val r = body
      spark.sparkContext.setJobDescription(null)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"    $label%-28s ${sec}%7.3f s  jobs=${counter.jobs.get() - j0}%d")
      r
    }

    (0 until turns).foreach { t =>
      println(s"turn $t:")
      val turnT0 = System.nanoTime()
      val batch = pages.filter(pmod(hash(col("url")), lit(turns)) === t)
      // --- the incrementalDedup body, step by step ---
      val log = new SnapshotLog(table)
      val extracted = timed("extract.run")(
        ExtractJob.run(spark, batch, table, numBuckets = cpus * 4))
      val to = timed("currentSnapshot")(log.currentSnapshot())
      val from = Pipelines.readWatermark(dd)
      if (to.isEmpty || from == to) ()
      else {
        val fresh = timed("scanIncremental")(from match {
          case Some(f) => log.scanIncremental(spark, Schemas.extractedSchema, f, to)
          case None => log.scan(spark, Schemas.extractedSchema, asOf = to)
        })
        val (_, n) = timed("appendDeduped")(
          Pipelines.appendDeduped(spark, fresh, dd))
        // THE pipeline's own watermark write, not a copy (a hand-copied
        // path/protocol would silently de-sync the probe from the pipeline
        // if either changed — round-7 review)
        timed("writeWatermark")(Pipelines.writeWatermark(dd, to.get))
        println(f"  appended=$n")
      }
      println(f"  turn total ${(System.nanoTime() - turnT0) / 1e9}%7.3f s")
    }
    spark.stop()
  }
}
