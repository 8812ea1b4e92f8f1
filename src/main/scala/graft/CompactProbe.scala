package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.SnapshotLog

/** Dev harness for the size-binned compaction rewrite (C8, round-5 shape):
  * a table of SKEWED file sizes (a handful of large files among many tiny
  * ones — the organic shape after mixed append cadences) is compacted to a
  * small target, and the probe records
  *
  *   - output balance: max/median output file size (the round-4
  *     `coalesce(targetFiles)` rewrite binned by FILE COUNT, so size skew
  *     passed straight through to the outputs);
  *   - rewrite parallelism: max concurrently-RUNNING tasks during the
  *     rewrite, measured by a task listener — must be ≥ min(cores, bins),
  *     where `coalesce(targetFiles)` by construction capped it at one task
  *     per OUTPUT file over the whole table.
  *
  * Results recorded in BASELINE.md.
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft_compact_probe").toString
    val log = new SnapshotLog(dir)

    // skewed stage: 4 large files (400k rows each) + 60 tiny ones (2k rows)
    // committed across two appends — manifest sizes drive the binning
    def stage(id: Long)(write: String => Unit): Unit = {
      write(log.stageDataDir(id)); log.commit(id): Unit
    }
    stage(0L) { d =>
      (0 until 4).foreach { i =>
        spark.range(i * 400000L, (i + 1) * 400000L)
          .select(col("id"), (col("id") % 97).as("v"))
          .coalesce(1).write.mode("overwrite").parquet(s"$d/big-$i")
      }
    }
    stage(1L) { d =>
      (0 until 60).foreach { i =>
        spark.range(1600000L + i * 2000L, 1600000L + (i + 1) * 2000L)
          .select(col("id"), (col("id") % 97).as("v"))
          .coalesce(1).write.mode("overwrite").parquet(s"$d/small-$i")
      }
    }
    val schema = log.scan(spark, spark.range(1)
      .select(col("id"), (col("id") % 97).as("v")).schema).schema
    val inSizes = log.metaAt(log.currentSnapshot().get).flatMap(_.size).sorted
    println(s"input: ${inSizes.size} files, " +
      f"min ${inSizes.head / 1024}%d KB / median ${inSizes(inSizes.size / 2) / 1024}%d KB / " +
      f"max ${inSizes.last / 1024}%d KB")

    @volatile var running = 0
    @volatile var maxRunning = 0
    val listener = new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit = synchronized {
        running += 1; maxRunning = math.max(maxRunning, running)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        running -= 1
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val id = log.compact(spark, schema, targetFiles = 8)
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    val outSizes = log.metaAt(id.get).flatMap(_.size).sorted
    val total = log.scan(spark, schema).count()
    require(total == 1720000L, s"row count drifted: $total")
    println(s"compacted -> ${outSizes.size} files in " + f"$wall%.1f s; " +
      f"output min ${outSizes.head / 1024}%d KB / median ${outSizes(outSizes.size / 2) / 1024}%d KB / " +
      f"max ${outSizes.last / 1024}%d KB " +
      f"(balance max/median ${outSizes.last.toDouble / outSizes(outSizes.size / 2)}%.2f)")
    println(s"max concurrent rewrite tasks: $maxRunning " +
      s"(bins=${outSizes.size}, cores=8 -> required >= ${math.min(8, outSizes.size)})")
    require(maxRunning >= math.min(8, outSizes.size),
      s"rewrite parallelism $maxRunning below min(cores, bins)")

    // cleanup (shared recursive delete — no third copy of the walk idiom)
    new graft.spark.GraftIo(dir, new org.apache.hadoop.conf.Configuration())
      .delete(new org.apache.hadoop.fs.Path(dir), recursive = true): Unit
    spark.stop()
  }
}
