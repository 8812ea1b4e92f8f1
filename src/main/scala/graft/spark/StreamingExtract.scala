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
}
