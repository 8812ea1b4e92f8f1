package graft

import org.apache.spark.sql.SparkSession
import graft.spark.{Schemas, SnapshotLog, Synth}

/** Dev harness for the CONTINUOUS pipeline CLI (`SubmitMain stream`, C20 +
  * C21): exercises the exact process surface an operator cron's — three
  * invocations of the real subcommand against one checkpoint root —
  * and records
  *
  *   - turn 1: initial drain (full pages table -> extracted -> deduped);
  *   - turn 2: nothing new -> both stages no-op (no snapshot movement);
  *   - turn 3: new pages appended (incl. duplicate payloads) -> exactly the
  *     fresh extracts flow through, duplicates dropped at the dedup stage;
  *
  * asserting snapshot heads, row counts, and digest-uniqueness after each
  * turn. Each timed invocation constructs its OWN SparkSession (any active
  * one is stopped first, and SubmitMain stops its session on exit), so
  * cross-invocation state lives only in the checkpoint and the snapshot
  * logs — cross-process offset recovery is exactly what this exercises.
  * One JVM though: timings include session construction, not JVM startup.
  * Results recorded in BASELINE.md. This is the process-level twin of
  * SnapshotStreamSpec's in-JVM composition test.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    // what `spark-submit --master local[8]` would set: SubmitMain's builder
    // deliberately names no master of its own
    System.setProperty("spark.master", "local[8]")
    def sess(): SparkSession = {
      val s = SparkSession.builder()
        .master("local[8]")
        .appName("graft-stream-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "stream_probe").toAbsolutePath
    val pagesDir = s"$root/pages"
    val extDir = s"$root/extracted"
    val dedupDir = s"$root/deduped"
    val ck = s"$root/ck"
    val fixture = Synth.corpus(400)
    def appendPages(ps: Seq[Schemas.Page]): Unit = {
      val spark = sess()
      import spark.implicits._
      val log = new SnapshotLog(pagesDir)
      val d = log.stageUniqueDataDir()
      spark.createDataset(ps).repartition(4).write.mode("overwrite").parquet(d)
      log.commitOptimistic(d): Unit
    }
    def run(): Long = {
      // stop any active session first so the timed invocation builds its
      // own, as the CLI would in its own process (still one JVM, so the
      // timings exclude JVM startup but include SparkSession construction)
      SparkSession.getActiveSession.foreach(_.stop())
      val t0 = System.nanoTime()
      SubmitMain.main(Array("stream", pagesDir, extDir, dedupDir, ck, "8"))
      (System.nanoTime() - t0) / 1000000L
    }
    def dedupCount(): Long = new SnapshotLog(dedupDir)
      .scan(sess(), graft.spark.Pipelines.dedupedSchema).count()

    // turn 1: 300 pages, 20 of them duplicate payloads under new urls
    appendPages(fixture.take(280) ++
      fixture.take(20).map(p => p.copy(url = p.url + "?dup")))
    val t1 = run()
    val n1 = dedupCount()
    println(s"turn1: ${t1} ms, deduped rows = $n1 (300 pages, 20 known dups)")
    assert(n1 <= 280, s"duplicates must not land: $n1")

    // turn 2: nothing new — both stages must be no-ops
    val headBefore = new SnapshotLog(dedupDir).currentSnapshot()
    val t2 = run()
    assert(new SnapshotLog(dedupDir).currentSnapshot() == headBefore,
      "no-op turn moved the head")
    println(s"turn2: ${t2} ms, no new pages -> no snapshot movement")

    // turn 3: 100 fresh pages + 10 repeats of turn-1 payloads
    appendPages(fixture.slice(280, 380) ++
      fixture.slice(30, 40).map(p => p.copy(url = p.url + "?again")))
    val t3 = run()
    val n3 = dedupCount()
    println(s"turn3: ${t3} ms, deduped rows = $n3 (+100 fresh, 10 repeats)")
    assert(n3 - n1 <= 100, s"repeats must not land: $n1 -> $n3")
    val spark = sess()
    val dupFp = new SnapshotLog(dedupDir)
      .scan(spark, graft.spark.Pipelines.dedupedSchema)
      .groupBy("fp").count().filter(org.apache.spark.sql.functions.col("count") > 1)
      .count()
    assert(dupFp == 0, s"$dupFp digests duplicated")
    println(s"digest-unique across $n3 rows; extracted head = " +
      s"${new SnapshotLog(extDir).currentSnapshot()}, deduped head = " +
      s"${new SnapshotLog(dedupDir).currentSnapshot()}")
    spark.stop()
  }
}
