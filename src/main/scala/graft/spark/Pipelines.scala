package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed incremental flow — what a 100 TB operator actually runs per
  * arriving page batch, wired end-to-end (round-5 VERDICT item 7; the parts
  * existed separately since round 4):
  *
  * {{{
  *   extract only PENDING pages into the extracted table   [resume anti-join]
  *     -> TAIL exactly the appended slice                  [segment-set diff,
  *                                                          zero re-read]
  *     -> exact-dedup the slice against the deduped        [anti-join on
  *        corpus's existing digests                         16-byte digests]
  *     -> append survivors to the deduped table            [one optimistic
  *                                                          commit]
  * }}}
  *
  * No step touches the full corpus: the expensive inputs move once, at their
  * own arrival. Dedup semantics are FIRST-COMMITTED-WINS per text digest
  * (the only order a stream of batches can honor), with the min-url row as
  * the in-batch representative — deterministic under any partitioning.
  * PipelineSpec pins the composed result equal to the from-scratch run over
  * the union corpus.
  */
object Pipelines {

  /** Deduped-corpus schema: extracted rows + their 32-hex md5 text digest
    * (kept as a column so the next batch's anti-join probes a skinny
    * projection instead of re-hashing the accumulated corpus).
    */
  val dedupedSchema: org.apache.spark.sql.types.StructType =
    Schemas.extractedSchema.add("fp", org.apache.spark.sql.types.StringType)

  final case class IncrementalResult(
      extractedSnapshot: Option[Long],
      dedupedSnapshot: Option[Long],
      appendedRows: Long)

  /** One batch turn of the pipeline. Returns what was committed where (None
    * everywhere = nothing pending: the batch was already fully processed).
    *
    * CRASH-SAFE BY WATERMARK: the deduped table records the extract snapshot
    * it has consumed up to (`meta/_extract_watermark`, written only AFTER the
    * deduped commit). The slice to dedup is watermark→current — NOT "what
    * this call just extracted": a driver that died between the extract
    * commit and the deduped commit makes the rerun's extract a no-op, and
    * anchoring on the extract result would have dropped that slice from the
    * deduped corpus forever (round-5 review). Re-running an already-deduped
    * slice (crash between deduped commit and watermark write) is idempotent:
    * its digests are already in the table, the anti-join drops every row.
    * A force re-extract (replace commit) breaks the watermark lineage and
    * fails loudly — rebuild the deduped table alongside.
    */
  def incrementalDedup(
      spark: SparkSession,
      pages: Dataset[Schemas.Page],
      tableDir: String,
      dedupedDir: String,
      numBuckets: Int = 32): IncrementalResult = {
    val log = new SnapshotLog(tableDir)
    val extracted = ExtractJob.run(spark, pages, tableDir, numBuckets)
    val to = log.currentSnapshot()
    val from = readWatermark(dedupedDir)
    if (to.isEmpty || from == to) return IncrementalResult(extracted, None, 0L)
    val fresh = from match {
      case Some(f) => log.scanIncremental(spark, Schemas.extractedSchema, f, to)
      case None => log.scan(spark, Schemas.extractedSchema, asOf = to)
    }
    val (dedupId, n) = appendDeduped(spark, fresh, dedupedDir)
    writeWatermark(dedupedDir, to.get)
    IncrementalResult(extracted, dedupId, n)
  }

  private def wmPath(io: GraftIo) =
    new org.apache.hadoop.fs.Path(io.root, "meta/_extract_watermark")

  /** Highest extract snapshot the deduped table has consumed (None = fresh). */
  def readWatermark(dedupedDir: String): Option[Long] = {
    val io = new GraftIo(dedupedDir, SnapshotLog.defaultHadoopConf())
    val p = wmPath(io)
    if (io.exists(p)) Some(io.readString(p).trim.toLong) else None
  }

  private def writeWatermark(dedupedDir: String, v: Long): Unit = {
    val io = new GraftIo(dedupedDir, SnapshotLog.defaultHadoopConf())
    io.mkdirs(new org.apache.hadoop.fs.Path(io.root, "meta"))
    io.writeAtomic(wmPath(io), v.toString)
  }

  /** Exact-dedup `fresh` extracted rows against the deduped table and append
    * the survivors. The shuffle carries (digest, url) for the in-batch
    * representative pick and the anti-join probes the table's digest column
    * only — text bytes never shuffle (Dedup.exactGroups' shape, composed
    * against a persistent corpus).
    */
  def appendDeduped(spark: SparkSession, fresh: DataFrame,
      dedupedDir: String): (Option[Long], Long) = {
    val dlog = new SnapshotLog(dedupedDir)
    appendDedupedWith(spark, fresh, dlog, (stage, base) =>
      Some(dlog.commitOptimistic(stage, statsColumns = Seq("bucket"),
        requireParent = Some(base.getOrElse(-1L)))))
  }

  /** Streaming twin of the dedup-append stage: tail the EXTRACTED table's
    * append commits (C20 source) and dedup-append each micro-batch into the
    * deduped table with an IDEMPOTENT conditional commit — `(appId, batchId)`
    * rides the deduped manifest, so `foreachBatch`'s at-least-once replay
    * appends exactly once (C21), and the conditional parent pins the commit
    * to the snapshot the anti-join probed (an overlapping writer fails the
    * batch loudly; the stream's retry re-derives — same position as the
    * batch pipeline). The extract-watermark file is NOT used here: the
    * stream's checkpoint offsets are the watermark.
    */
  def startStreamingDedup(
      spark: SparkSession,
      extractedTableDir: String,
      dedupedDir: String,
      checkpointDir: String,
      appId: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val app = appId.getOrElse(s"streaming-dedup:$checkpointDir")
    spark.readStream
      .format("graft-snapshots")
      .schema(Schemas.extractedSchema)
      .load(extractedTableDir)
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val dlog = new SnapshotLog(dedupedDir)
        if (!dlog.txnVersion(app).exists(_ >= batchId)) {
          appendDedupedWith(spark, df, dlog, (stage, base) =>
            dlog.commitIdempotent(stage, app, batchId,
              statsColumns = Seq("bucket"),
              requireParent = Some(base.getOrElse(-1L)))): Unit
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Shared body of the batch and streaming dedup-append: derive survivors
    * against the CURRENT deduped snapshot, stage them, and hand the staged
    * dir plus the derivation snapshot to `commitFn` (conditional-OCC for the
    * batch path, conditional-idempotent for the streaming path).
    */
  private def appendDedupedWith(spark: SparkSession, fresh: DataFrame,
      dlog: SnapshotLog,
      commitFn: (String, Option[Long]) => Option[Long]): (Option[Long], Long) = {
    // the anti-join is derived from THIS snapshot: the commit below is
    // conditional on it still being the parent, so an overlapping pipeline
    // turn deduping the same slice cannot land the same rows twice (one
    // loses loudly and its rerun re-derives — round-5 review pass 3; plain
    // OCC would have happily committed both appends)
    val base = dlog.currentSnapshot()
    val existing = dlog.scan(spark, dedupedSchema, asOf = base).select("fp")
    val withFp = fresh.withColumn("fp", md5(col("text").cast("binary")))
    // in-batch representative: min url per digest — deterministic under any
    // partitioning (first-seen would depend on scan order)
    val reps = withFp
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("fp")).orderBy(col("url"))))
      .filter(col("rn") === 1).drop("rn")
    // first-committed-wins: a digest already in the corpus drops the new row
    val survivors = reps.join(existing, Seq("fp"), "left_anti")
      .select(dedupedSchema.fieldNames.toIndexedSeq.map(col): _*)
    val stage = dlog.stageUniqueDataDir()
    survivors.write.mode("overwrite").parquet(stage)
    // parquet footer count — the slice was just written, no second scan
    val n = spark.read.schema(dedupedSchema).parquet(stage).count()
    if (n == 0L) {
      dlog.abortStage(stage)
      (None, 0L)
    } else
      try (commitFn(stage, base), n)
      catch { case e: Throwable => dlog.abortStage(stage); throw e }
  }
}
