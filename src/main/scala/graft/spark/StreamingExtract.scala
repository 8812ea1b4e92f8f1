package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming variant of the extract pipeline — an EXTENSION beyond
  * the reference's semantics (SURVEY.md §2.7: the reference is incremental
  * batch, which ExtractJob's snapshot-resume covers; this adds the
  * `Trigger.AvailableNow` file-stream shape for pipelines that land pages
  * continuously).
  *
  * Same kernel, same narrow plan: `readStream` over the pages directory ->
  * map-side mapPartitions extraction -> parquet sink with exactly-once file
  * tracking via the checkpoint (the streaming analog of the snapshot log).
  * AvailableNow drains everything present and stops — a resumable batch with
  * streaming bookkeeping; restarting after new files land processes only the
  * new files (per-file lineage in the checkpoint replaces the url anti-join).
  */
object StreamingExtract {

  /** Stable idempotence appId for a checkpointed streaming pipeline:
    * GENERATED once and persisted as `graft-app-id` INSIDE the checkpoint
    * dir, so every restart — however the operator spells the checkpoint path
    * (trailing slash, relative vs absolute, `//` from interpolation) —
    * resolves to the identity the previous run committed under. Round 5
    * derived the appId from the checkpoint-path STRING: equivalent spellings
    * reached the same Spark checkpoint but a DIFFERENT appId, so a
    * crash-replayed batch missed its txn watermark and appended twice —
    * exactly-once silently broken (round-5 ADVICE, medium). First-start races
    * settle on the marker's CAS ([[GraftIo.casPromoteFile]]): the loser
    * adopts the winner's id.
    *
    * UPGRADE NOTE (round-6 ADVICE, low): a checkpoint created by the
    * round-5 path-string scheme has no marker, so its first restart under
    * this code mints a fresh id and the replayed in-flight batch misses the
    * old txn watermark — upgrade such a stream only after it has DRAINED
    * (no in-flight batch), or pre-seed `graft-app-id` in the checkpoint dir
    * with the legacy `<kind>:<checkpointDir>` string before restarting.
    */
  def resolveAppId(checkpointDir: String, kind: String): String = {
    val io = new GraftIo(checkpointDir, SnapshotLog.defaultHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(io.root, "graft-app-id")
    if (!io.exists(marker)) {
      io.mkdirs(io.root)
      val tmp = new org.apache.hadoop.fs.Path(io.root,
        s"graft-app-id.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      io.writeDirect(tmp, s"$kind:${java.util.UUID.randomUUID()}")
      if (!io.casPromoteFile(tmp, marker)) io.delete(tmp): Unit
    }
    io.readString(marker).trim
  }

  /** Start the stream; caller awaits termination. Deterministic output rows
    * (same kernel), nondeterministic file layout (as with any sink).
    */
  def start(
      spark: SparkSession,
      pagesDir: String,
      outDir: String,
      checkpointDir: String,
      numBuckets: Int = 32): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(Schemas.pagesSchema)
      .parquet(pagesDir)
      .as[Schemas.Page]
    val extracted = ExtractJob.extractDFTyped(pages, numBuckets).drop("ok")
    extracted.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Read back the streaming sink output. */
  def readOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.schema(Schemas.extractedSchema).parquet(outDir)

  /** TABLE→TABLE streaming extract — the composed shape a continuously-fed
    * corpus actually runs: tail the pages table's append commits
    * (`graft-snapshots` source, offsets = snapshot ids), run the extract
    * kernel map-side, and append each micro-batch to the destination
    * SNAPSHOT TABLE with an idempotent commit. `foreachBatch` is
    * at-least-once (a crash between the sink action and the checkpoint write
    * replays the batch), so exactly-once lands on
    * [[SnapshotLog.commitIdempotent]]: the destination manifest records
    * `(appId, batchId)` and a replayed batch is recognized and skipped —
    * Delta's `txnAppId`/`txnVersion` composition, re-derived.
    *
    * The E9 success-ratio gate holds per micro-batch, mirroring the batch
    * job: a batch under the threshold aborts its stage and fails the stream
    * BEFORE the commit, so the destination table never references a bad
    * batch.
    *
    * `appId` must be stable across restarts of the same logical pipeline
    * (default: a generated id persisted inside the checkpoint dir —
    * [[resolveAppId]]).
    */
  def startTableToTable(
      spark: SparkSession,
      sourceTableDir: String,
      destTableDir: String,
      checkpointDir: String,
      numBuckets: Int = 32,
      appId: Option[String] = None): StreamingQuery = {
    import spark.implicits._
    val app = appId.getOrElse(resolveAppId(checkpointDir, "streaming-extract"))
    val pages = spark.readStream
      .format("graft-snapshots")
      .schema(Schemas.pagesSchema)
      .load(sourceTableDir)
      .as[Schemas.Page]
    val extracted = ExtractJob.extractDFTyped(pages, numBuckets)
    extracted.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val destLog = new SnapshotLog(destTableDir)
        // cheap pre-check: a replayed batch skips even the stage write (the
        // authoritative check still runs inside the commit CAS loop)
        if (!destLog.txnVersion(app).exists(_ >= batchId)) {
          val batch = df.persist() // gate + write must not run the kernel twice
          try {
            val total = batch.count()
            if (total > 0L) {
              val ok = batch.filter(col("ok")).count()
              if (ok.toDouble / total < ExtractJob.SuccessRatio)
                throw ExtractJob.GateFailed(ok, total)
              val stage = destLog.stageUniqueDataDir()
              try {
                batch.drop("ok").repartition(numBuckets, col("bucket"))
                  .write.mode("overwrite").parquet(stage)
                destLog.commitIdempotent(stage, app, batchId,
                  statsColumns = Seq("bucket")): Unit
              } catch {
                case e: Throwable => destLog.abortStage(stage); throw e
              }
            }
          } finally batch.unpersist(): Unit
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
