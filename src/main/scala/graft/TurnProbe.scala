package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{ManifestEntry, ManifestFileIndex, Pipelines, Schemas, SnapshotLog}

/** Scale evidence for the round-6 inverted dedup probe: per-turn cost of the
  * steady-state pipeline turn (a batch that is entirely duplicates — probe
  * runs, nothing commits) as the accumulated deduped corpus grows 1× → 4× →
  * 16× → 64×, against the ROUND-5 shape (batch anti-joined against the
  * corpus's full digest column) timed over the same corpus.
  *
  * The claim under test: the inverted probe is O(batch) per turn — seconds
  * stay near-flat as the corpus grows, because the corpus side never
  * shuffles and, on a digest-clustered layout, the manifest's per-file fp64
  * bounds prune the scan to the files that can hold a batch digest at all —
  * while the round-5 anti-join is O(corpus) per turn (the full digest column
  * rides a sort-merge exchange every time). Also prints the file-skipping
  * the batch's IN probe plans, from the same ManifestFileIndex the query
  * uses.
  *
  * The corpus is seeded as ONE range-clustered commit per mult — the exact
  * layout `compact(sortBy = fp64)` maintains on a real table — with per-file
  * (bucket, fp64) bounds, so the probe runs against the documented long-term
  * layout rather than a lucky fresh one.
  *
  * `runMain graft.TurnProbe [cpus] [baseRows] [batchRows]` — results recorded
  * in BASELINE.md.
  */
object TurnProbe {

  /** Distributed builder of extracted-schema rows with deterministic texts. */
  private def extractedRange(spark: SparkSession, lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      concat(lit("https://turn/"), col("id")).as("url"),
      (col("id") % 32).cast("int").as("bucket"),
      lit("html").as("kind"),
      array(concat(lit("probe text body "), col("id"))).as("pages"),
      concat(lit("probe text body "), col("id")).as("text"),
      (col("id") + 10L).as("n_bytes"),
      col("id").as("checksum"))

  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 16
    val baseRows = if (args.length > 1) args(1).toLong else 400000L
    val batchRows = if (args.length > 2) args(2).toInt else 2000
    // past the probe-filter limit a turn takes the big-batch regime, whose
    // all-dup pass DOES write (and abort) an empty clustered stage — the
    // turn_new numbers would silently measure a different shape than the
    // probe-only cost this harness claims (round-6 review, fifth pass)
    require(batchRows <= graft.spark.Pipelines.DefaultProbeFilterLimit,
      s"batchRows=$batchRows would leave the small-batch regime " +
        s"(limit ${graft.spark.Pipelines.DefaultProbeFilterLimit}) and " +
        "change what turn_new measures")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rmrf(f: java.io.File): Unit = SparkEntry.deleteRecursively(f)

    for (mult <- Seq(1, 4, 16, 64)) {
      val total = baseRows * mult
      // CWD-relative (run from the repo root like every sbt runMain); the
      // largest corpus is multiple GB, so each iteration cleans up after
      // itself in the finally below
      val dd = s"target/turn_probe_$mult"
      rmrf(new java.io.File(dd))
      try {
      val dlog = new SnapshotLog(dd)
      val stage = dlog.stageUniqueDataDir()
      extractedRange(spark, 0L, total)
        .withColumn("fp", md5(col("text").cast("binary")))
        .withColumn("fp64", Pipelines.fp64Of(col("fp")))
        .repartitionByRange(8 * mult, col("fp64"))
        .write.mode("overwrite").parquet(stage)
      dlog.commitOptimistic(stage, statsColumns = Seq("bucket", "fp64"))

      // steady-state turn: every batch text already committed, spread across
      // the whole id range so its digests land in many distinct files
      val stride = math.max(1L, total / batchRows)
      val batchIds = (0 until batchRows).map(i => (i * stride) % total)
      val batch = extractedRange(spark, 0L, total)
        .filter(col("checksum").isin(batchIds.distinct.map(Long.box): _*))
        .persist()
      require(batch.count() == batchIds.distinct.size.toLong)

      def time3(body: => Long): (Double, Seq[Double], Long) = {
        var last = 0L
        last = body // warm-up
        val secs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); last = body
          (System.nanoTime() - t0) / 1e9
        }
        (secs.min, secs, last)
      }

      // round-6 shape: the full turn through the public API. An all-dup
      // batch probes, counts zero survivors, and commits nothing — since
      // the persist-then-count change it writes no stage either, so
      // turn_new is the probe evaluation plus fixed job overhead
      val (newSec, newSpread, appended) =
        time3(Pipelines.appendDeduped(spark, batch, dd)._2)
      require(appended == 0L, s"steady-state turn must append nothing, got $appended")

      // round-5 shape on the same corpus: anti-join the batch's digest reps
      // against the corpus digest column (the build side of a left-anti can
      // never broadcast -> sort-merge join, full corpus digest shuffle)
      val (oldSec, oldSpread, oldSurv) = time3 {
        val reps = batch
          .withColumn("fp", md5(col("text").cast("binary")))
          .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
            .Window.partitionBy(col("fp")).orderBy(col("url"))))
          .filter(col("rn") === 1).drop("rn")
        val corpus = dlog.scan(spark, Pipelines.dedupedSchema).select("fp")
        reps.join(corpus, Seq("fp"), "left_anti").count()
      }
      require(oldSurv == 0L, s"old-shape survivors must be 0, got $oldSurv")

      // file skipping the batch's fp64 IN probe plans, via the same
      // ManifestFileIndex the scan uses (strict subset = pruning is live)
      val meta = dlog.metaAt(dlog.currentSnapshot().get)
      val idx = new ManifestFileIndex(dd,
        meta.map(m => ManifestEntry(m.path, m.size.getOrElse(0L), m.stats)))
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, Literal}
      // digests derived through the SAME fp/fp64 definition the probe pushes
      // (a hand-rolled MD5 copy here would silently diverge from fp64Of and
      // fake the published skipping numbers — round-6 review)
      // sorted: distinct().collect() order is partition-scheduling dependent
      // and planned16's take(16) must sample the SAME digests every run for
      // the BASELINE.md numbers to be reproducible
      val fpLits = batch
        .withColumn("fp", md5(col("text").cast("binary")))
        .select(Pipelines.fp64Of(col("fp")).as("fp64")).distinct()
        .collect().map(_.getLong(0)).sorted.map(Literal(_)).toIndexedSeq
      def plannedFor(lits: Seq[Literal]): Int =
        idx.listFiles(Nil, Seq(In(
          AttributeReference("fp64", org.apache.spark.sql.types.LongType)(),
          lits))).map(_.files.size).sum
      // the full batch's digests are md5-uniform, so at batch >> files every
      // file's range is hit — manifest skipping is the SMALL-batch win
      // (interactive upserts, low-rate streaming ticks); the big-batch win is
      // the shuffle-free corpus side. Both planned counts ride the artifact.
      val planned = plannedFor(fpLits)
      // deterministic AND unbiased 16-digest sample: a plain take(16) of the
      // sorted array picks the 16 SMALLEST digests — range-ADJACENT on a
      // range-clustered table, overstating file skipping (round-6 review,
      // fourth pass); an even stride over the sorted order keeps both
      val stride16 = math.max(1, fpLits.length / 16)
      val planned16 = plannedFor(
        fpLits.indices.by(stride16).take(16).map(fpLits))

      println(f"mult=$mult%2d rows=$total%8d files=${meta.size}%4d " +
        f"planned=$planned%4d planned16=$planned16%3d  turn_new=${newSec}%6.3f s " +
        f"(${newSpread.map(s => f"$s%.3f").mkString(",")})  " +
        f"antijoin_old=${oldSec}%6.3f s " +
        f"(${oldSpread.map(s => f"$s%.3f").mkString(",")})")
      batch.unpersist()
      } finally rmrf(new java.io.File(dd))
    }
    spark.stop()
  }
}
