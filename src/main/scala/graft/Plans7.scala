package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, Pipelines, Schemas, SnapshotLog}

/** Round-7 plan evidence: `explain("formatted")` before/after for every
  * path this optimization round touched, written to plans/r07/. The
  * "before" plans are the ROUND-6 DataFrame constructions reproduced
  * verbatim (the old code built exactly these expressions), planned by the
  * same binary — so each pair isolates the plan-shape change itself.
  *
  * `sbt "runMain graft.Plans7"` — builds its own small fixture tables under
  * target/, CWD-relative.
  */
object Plans7 {

  private def dump(name: String, df: DataFrame): Unit = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    Files.createDirectories(Paths.get("plans/r07"))
    Files.writeString(Paths.get(s"plans/r07/$name.txt"), plan)
    println(s"wrote plans/r07/$name.txt (${plan.length} chars)")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val work = new java.io.File("target/plans_r07")
    SparkEntry.deleteRecursively(work)

    // ---- fixture: a pages batch + an extracted table with two commits ----
    val pagesAll = spark.createDataset(graft.spark.Synth.corpus(4000)).toDF()
    val table = s"$work/extracted"
    ExtractJob.run(spark, pagesAll.filter(pmod(hash(col("url")), lit(2)) === 0)
      .as[Schemas.Page], table, numBuckets = 8)
    val log = new SnapshotLog(table)
    val batch = pagesAll.filter(pmod(hash(col("url")), lit(2)) === 1)
      .as[Schemas.Page]

    // 1. extract resume anti-join: r6 let the planner pick (SortMergeJoin —
    //    the full pages payload shuffled on url); r7 broadcasts the counted
    //    done side under the budget
    val done = log.scan(spark, Schemas.extractedSchema).select("url")
    // auto-broadcast off for this pair: at bench/production scale the done
    // side's size ESTIMATE (ManifestFileIndex reports whole-table bytes)
    // exceeds any threshold, which is exactly why r6 planned the SortMerge —
    // the r7 change is the explicit hint under a counted-row budget
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    dump("extract_resume_before", ExtractJob.extractDF(
      batch.join(done, Seq("url"), "left_anti").as[Schemas.Page], 8)
      .drop("ok").repartition(8, col("bucket")))
    dump("extract_resume_after", ExtractJob.extractDF(
      batch.join(broadcast(done), Seq("url"), "left_anti").as[Schemas.Page], 8)
      .drop("ok").repartition(8, col("bucket")))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    // 1b. bloom middle regime (round 7, "not yet optimized" item 2): between
    //     the broadcast budget and the sort-merge fallback, bloom-negative
    //     pages are PROVEN pending and stay scan-local (no Exchange in that
    //     union branch); only the maybe-subset anti-joins the done set.
    //     The batch is dumped parquet-backed so the UDF filter stays visible
    //     (ConvertToLocalRelation pre-evaluates it over a local fixture).
    {
      val pagesPath = s"$work/pages_parquet"
      batch.toDF().write.mode("overwrite").parquet(pagesPath)
      val batchFs = spark.read.schema(Schemas.pagesSchema).parquet(pagesPath)
      val bf = done.stat.bloomFilter("url", 4000L, 0.01)
      val bfB = spark.sparkContext.broadcast(bf)
      val maybeDone =
        udf((u: String) => u != null && bfB.value.mightContainString(u))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      dump("extract_resume_bloom_after",
        batchFs.filter(!maybeDone(col("url")))
          .unionByName(batchFs.filter(maybeDone(col("url")))
            .join(done, Seq("url"), "left_anti")))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }

    // 2. incremental scan: r6 handed bare paths to spark.read.parquet
    //    (InMemoryFileIndex — a driver listing job re-stats every file);
    //    r7 plans from the manifest (ManifestFileIndex, zero fs calls)
    ExtractJob.run(spark, pagesAll.as[Schemas.Page], table, numBuckets = 8)
    dump("scan_incremental_before", spark.read
      .schema(Schemas.extractedSchema)
      .parquet(log.filesAddedBetween(0L, 1L): _*))
    dump("scan_incremental_after", log.scanIncremental(
      spark, Schemas.extractedSchema, 0L, Some(1L)))

    // ---- fixture: a deduped corpus for the probe pair ----
    val dd = s"$work/deduped"
    def extractedDF(lo: Int, hi: Int) =
      spark.createDataset((lo until hi).map { i =>
        val t = s"plans text body $i"
        Schemas.Extracted(s"https://plans/$i", i % 8, "html", Seq(t), t,
          10L + i, i.toLong)
      }).toDF()
    Pipelines.appendDeduped(spark, extractedDF(0, 400), dd)
    val probeBatch = extractedDF(390, 410)

    // 3. dedup probe survivors: r6 windowed the FULL batch rows (text rides
    //    the exchange) then anti-joined; r7 derives winners skinny and
    //    re-attaches survivors by digest semi-join
    val dlog = new SnapshotLog(dd)
    val beforeProbe = {
      import org.apache.spark.sql.expressions.Window
      val withFp = probeBatch
        .withColumn("fp", md5(col("text").cast("binary")))
        .withColumn("fp64", Pipelines.fp64Of(col("fp")))
      val reps = withFp
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("fp")).orderBy(col("url"))))
        .filter(col("rn") === 1).drop("rn")
      val corpus = dlog.scan(spark, Pipelines.dedupedSchema)
      val fps = reps.select("fp64").filter(col("fp64").isNotNull).distinct()
        .limit(8193).collect().map(_.getLong(0))
      val present = corpus.filter(col("fp64").isin(fps.toIndexedSeq: _*)).select("fp")
      reps.join(broadcast(present), Seq("fp"), "left_anti")
        .select(Pipelines.dedupedSchema.fieldNames.toIndexedSeq.map(col): _*)
    }
    dump("pipeline_dedup_turn_before", beforeProbe)
    val (survivors, reps) = Pipelines.probeSurvivors(spark, probeBatch, dd)
    dump("pipeline_dedup_turn_after", survivors)
    reps.unpersist()

    // 4. key-set DELETE locate: r6 semi-joined the FULL table scan against
    //    the key set; r7 pushes a bounded IN into the scan (manifest stats
    //    prune files at planning time)
    val delDir = s"$work/del_table"
    val delLog = new SnapshotLog(delDir)
    spark.range(400).select(col("id"), (col("id") % 7).as("b"))
      .repartitionByRange(4, col("id"))
      .write.mode("overwrite").parquet(delLog.stageDataDir(0L))
    delLog.commit(0L, statsColumns = Seq("id"))
    val delSchema = spark.range(1).select(col("id"), (col("id") % 7).as("b")).schema
    val drops = spark.range(2).select((col("id") + 100L).as("id"))
    dump("delete_locate_before", delLog.scan(spark, delSchema)
      .withColumn("__graft_file", input_file_name())
      .join(drops.select("id").distinct(), Seq("id"), "left_semi")
      .select(col("__graft_file").as("f")))
    val (afterLocate, _) = delLog.keyedLocateFiles(spark, delSchema, 0L, drops, "id")
    dump("delete_locate_after", afterLocate)

    // 5. t11 signature derivation: r6 instantiated four shingle trees whose
    //    lambdas re-tokenized per element; r7 materializes token + shingle
    //    arrays once per row (visible as the extra Project aliases feeding
    //    all four signature expressions)
    val sfDir = "/root/testdata/sf0.001"
    def wsToks(c: org.apache.spark.sql.Column) =
      split(regexp_replace(c,
        "(\\A[ \\t\\n\\x0B\\f\\r]+)|([ \\t\\n\\x0B\\f\\r]+\\z)", ""), "\\s+")
    def triShinglesOf(t: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))
    val docsDF = spark.read.parquet(s"$sfDir/documents.parquet")
    dump("t11_minhash_twin_before", {
      val sigs = (0 until 4).map(j =>
        array_min(transform(triShinglesOf(wsToks(col("text"))), sh =>
          md5(concat(sh, lit("#" + j))))).as(s"sig$j"))
      docsDF.filter(size(wsToks(col("text"))) >= 3)
        .select(col("doc_id") +: sigs: _*).orderBy("doc_id")
    })
    dump("t11_minhash_twin_after", SparkEntry.queries("t11_minhash_twin")(spark, sfDir))
    // 6. t13: 16 vote aggregates each re-deriving the per-token hash array,
    //    hamming filter after the groupBy; r7 materializes the array once
    //    and filters join-side (Filter below the HashAggregate in the plan)
    dump("t13_simhash_twin_after", SparkEntry.queries("t13_simhash_twin")(spark, sfDir))
    // 7. verifyJaccard consumers (t09/t12/t15/t17): per-doc shingle UDF
    //    attached by the id-joins, per-pair UDF is set arithmetic only
    dump("t09_jaccard_verify_after", SparkEntry.queries("t09_jaccard_verify")(spark, sfDir))

    SparkEntry.deleteRecursively(work)
    spark.stop()
  }
}
