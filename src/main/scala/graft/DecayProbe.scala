package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{ManifestEntry, ManifestFileIndex, Pipelines, SnapshotLog}

/** Round-7 layout-decay evidence (round-6 VERDICT item 5): every pipeline
  * turn appends `DedupClusterParts` files whose fp64 ranges each span ~the
  * full digest domain (survivor digests are uniform), so the file count —
  * and the membership probe's `planned` file set — grows linearly with
  * turns until an operator runs `compact(sortBy = fp64)`. This probe
  * measures that decay and the compact's effect so BASELINE.md can state a
  * cadence rule from numbers instead of a guess.
  *
  * Sequence: seed a clustered corpus, run append turns of fresh batches,
  * sample (files, probe-planned files, all-dup turn seconds) every few
  * turns, then `compact(sortBy = fp64)` and re-sample.
  *
  * `runMain graft.DecayProbe [cpus] [baseRows] [batchRows] [turns]`
  */
object DecayProbe {

  private def extractedRange(spark: SparkSession, lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      concat(lit("https://decay/"), col("id")).as("url"),
      (col("id") % 32).cast("int").as("bucket"),
      lit("html").as("kind"),
      array(concat(lit("decay text body "), col("id"))).as("pages"),
      concat(lit("decay text body "), col("id")).as("text"),
      (col("id") + 10L).as("n_bytes"),
      col("id").as("checksum"))

  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 16
    val baseRows = if (args.length > 1) args(1).toLong else 400000L
    val batchRows = if (args.length > 2) args(2).toInt else 2000
    val turns = if (args.length > 3) args(3).toInt else 24
    require(batchRows <= Pipelines.DefaultProbeFilterLimit)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dd = "target/decay_probe"
    SparkEntry.deleteRecursively(new java.io.File(dd))
    try {
      val dlog = new SnapshotLog(dd)
      val stage = dlog.stageUniqueDataDir()
      extractedRange(spark, 0L, baseRows)
        .withColumn("fp", md5(col("text").cast("binary")))
        .withColumn("fp64", Pipelines.fp64Of(col("fp")))
        .repartitionByRange(8, col("fp64"))
        .write.mode("overwrite").parquet(stage)
      dlog.commitOptimistic(stage, statsColumns = Seq("bucket", "fp64"))

      // one fixed all-dup probe batch (committed texts, strided across the
      // seed range) — its turn time isolates probe cost from append cost
      val stride = math.max(1L, baseRows / batchRows)
      val probeIds = (0 until batchRows).map(i => (i * stride) % baseRows)
      val probeBatch = extractedRange(spark, 0L, baseRows)
        .filter(col("checksum").isin(probeIds.distinct.map(Long.box): _*))
        .localCheckpoint(true)

      def plannedFiles(): (Int, Int) = {
        val meta = dlog.metaAt(dlog.currentSnapshot().get)
        val idx = new ManifestFileIndex(dd,
          meta.map(m => ManifestEntry(m.path, m.size.getOrElse(0L), m.stats)))
        import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, Literal}
        val fpLits = probeBatch
          .withColumn("fp", md5(col("text").cast("binary")))
          .select(Pipelines.fp64Of(col("fp")).as("fp64")).distinct()
          .collect().map(_.getLong(0)).sorted.map(Literal(_)).toIndexedSeq
        val s16 = math.max(1, fpLits.length / 16)
        val lits16 = fpLits.indices.by(s16).take(16).map(fpLits)
        val planned16 = idx.listFiles(Nil, Seq(In(
          AttributeReference("fp64", org.apache.spark.sql.types.LongType)(),
          lits16))).map(_.files.size).sum
        (meta.size, planned16)
      }

      def dupTurnSec(): Double = {
        Pipelines.appendDeduped(spark, probeBatch, dd) // warm
        val t0 = System.nanoTime()
        val (_, n) = Pipelines.appendDeduped(spark, probeBatch, dd)
        require(n == 0L)
        (System.nanoTime() - t0) / 1e9
      }

      val (files0, p160) = plannedFiles() // one sweep, like every later sample
      println(f"turn  0: files=$files0%4d planned16=$p160%4d dup_turn=${dupTurnSec()}%6.3f s")
      (1 to turns).foreach { t =>
        val lo = baseRows + (t - 1).toLong * batchRows
        Pipelines.appendDeduped(spark, extractedRange(spark, lo, lo + batchRows), dd)
        if (t % 4 == 0) {
          val (files, p16) = plannedFiles()
          println(f"turn $t%2d: files=$files%4d planned16=$p16%4d dup_turn=${dupTurnSec()}%6.3f s")
        }
      }
      val t0 = System.nanoTime()
      dlog.compact(spark, Pipelines.dedupedSchema,
        targetFiles = 8 + turns * batchRows / 50000,
        statsColumns = Seq("bucket", "fp64"), sortBy = Seq("fp64"))
      val compactSec = (System.nanoTime() - t0) / 1e9
      val (files, p16) = plannedFiles()
      println(f"post-compact (${compactSec}%.1f s): files=$files%4d planned16=$p16%4d dup_turn=${dupTurnSec()}%6.3f s")
    } finally {
      SparkEntry.deleteRecursively(new java.io.File(dd))
      spark.stop()
    }
  }
}
