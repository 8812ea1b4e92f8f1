package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.Extract

/** §3.1 — the flagship extract pipeline, Spark-native:
  *
  * {{{
  * read pages snapshot -> left_anti(done urls)            [resume, C2]
  *   -> bucket col = pmod(xxhash64(url), B)               [no shuffle]
  *   -> typed mapPartitions(extract kernel E1-E8)         [map-side; task = reference batch]
  *   -> repartition(B, bucket)                            [the one wide exchange,
  *                                                          carries extracted text only]
  *   -> write data files; success-ratio gate (A1, via observe — no second scan)
  *   -> atomic snapshot commit (C1); per-bucket lineage -> metrics (A3)
  * }}}
  *
  * Correspondences to the reference: a partition is the analog of the 5-file
  * batch mapped on a 16-thread pool (`extractor.py:97-128`); the gate is
  * `processed/total >= 0.9` (`extractor.py:131-136`); resume skips done urls
  * ("Skipping 20 already processed PDFs", `extraction_errors.log:1`); commit
  * granularity is a snapshot instead of a JSON batch file (`extractor.py:119-122`).
  *
  * Scale notes (100 TB / 1000 executors): the kernel is map-side, so the raw
  * payload bytes move exactly once (scan). The single wide exchange shuffles
  * extracted rows — typically 3-10x smaller than the input and free of the
  * html column — keyed on pmod(xxhash64(url), B), which is uniform by
  * construction (no host skew can reach it). B is a knob (buckets == shuffle
  * partitions at scale). AQE coalesces the small lineage shuffle. The kernel
  * is CPU-bound per row and embarrassingly parallel — throughput scales with
  * cores until the parquet scan saturates.
  */
object ExtractJob {

  final val SuccessRatio = 0.9 // extractor.py:136

  final case class GateFailed(ok: Long, total: Long) extends RuntimeException(
    s"extraction success ratio ${if (total == 0) 0.0 else ok.toDouble / total} < $SuccessRatio ($ok/$total)")

  /** Pure transform: pages -> extracted rows (no table/commit side effects).
    * The single relational seam around the kernel.
    *
    * Deliberately NARROW: the kernel runs map-side on the scan partitions, so
    * raw html payloads are never shuffled — at 100 TB that exchange would be
    * the whole job's cost. The bucket is just a column here; the (much
    * smaller) extracted rows get co-located by bucket at write time in run().
    *
    * Runs through the custom Catalyst operator (plans.ExtractPlan): same
    * kernel and same narrow shape as [[extractDFTyped]], but InternalRow in /
    * UnsafeRow out — no Dataset-encoder round trip per row. Measured 1.8x
    * faster at local[32] on the bench corpus (4.7 s -> 2.4 s for 200k docs);
    * the encoder path's allocation rate also destabilized GC at high core
    * counts. Equality with the typed path is asserted in PipelineSpec.
    */
  def extractDF(pages: Dataset[Schemas.Page], numBuckets: Int): DataFrame = {
    val spark = pages.sparkSession
    graft.spark.plans.ExtractPlan.install(spark)
    graft.spark.plans.ExtractPlan.extract(pages.toDF(), numBuckets)
      .withColumn("checksum", xxhash64(col("url"), col("text")))
  }

  /** The typed-Dataset reference implementation of [[extractDF]] (encoder
    * round trip per row). Kept as (a) the independent implementation the
    * custom operator is equality-tested against, and (b) the path for
    * Structured Streaming, where injected planner strategies are not part of
    * the incremental planner contract.
    */
  def extractDFTyped(pages: Dataset[Schemas.Page], numBuckets: Int): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .withColumn("bucket", pmod(xxhash64(col("url")), lit(numBuckets)).cast("int"))
      .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
      .mapPartitions { it =>
        it.map { case (url, _, html, text, _, bucket) =>
          val r = Extract.extract(html, text)
          Schemas.ExtractedRaw(
            url = url, bucket = bucket, kind = r.kind, pages = r.pages,
            text = r.text, n_bytes = if (html == null) 0L else html.length.toLong,
            ok = r.ok)
        }
      }
      .toDF()
      .withColumn("checksum", xxhash64(col("url"), col("text")))
  }

  /** Full job against a snapshot-logged table: resume, extract pending, gate,
    * commit, lineage. Returns the committed snapshot id (None = nothing pending).
    *
    * CONTRACT: `pages` must be DETERMINISTIC — a committed-file scan or any
    * plan whose re-evaluation yields the same rows. The bloom resume regime
    * (round 7) evaluates it once per union branch; a row that flips sides
    * between evaluations (sampling, a fresh nondeterministic shuffle,
    * rand()-derived columns) would be extracted twice or never. Round 6's
    * single anti-join merely re-planned such inputs; since round 7 they are
    * a correctness error. (Same contract as [[Pipelines.appendDeduped]].)
    *
    * `force = true` is the reference's `extractDocuments=true` re-extract mode
    * (claim.py:34: unconditionally re-runs extraction over ALL files,
    * overwriting the batch JSONs): the resume anti-join is skipped and the
    * commit REPLACES the table contents instead of appending — needed whenever
    * the kernel changes and the corpus must be re-derived.
    */
  def run(
      spark: SparkSession,
      pages: Dataset[Schemas.Page],
      tableDir: String,
      numBuckets: Int = 32,
      force: Boolean = false): Option[Long] = {
    import spark.implicits._
    val log = new SnapshotLog(tableDir)
    val t0 = System.nanoTime()

    // C2 resume: pending = pages \ done (per-url, finer than the reference's
    // all-or-nothing JSON-folder probe at claim.py:17-20).
    //
    // The join strategy is chosen DELIBERATELY (round 7). Left alone, the
    // planner picked a SortMergeJoin here — the ManifestFileIndex's exact
    // sizeInBytes is the WHOLE table's bytes, so the url projection never
    // estimated under the broadcast threshold — and a sort-merge LeftAnti
    // SHUFFLES THE FULL PAGES PAYLOAD (url, html, text) on url before the
    // kernel ever runs: the exact payload exchange this job's design forbids
    // (plan-audited; measured as two concurrent ~3 s stages per bench
    // pipeline turn, growing with the table). AQE could only downgrade the
    // join AFTER the pages side's shuffle map stage had already materialized,
    // which is where the cost lives. The done side's true row count comes
    // straight from the manifest (per-file `#n=` counts recorded at commit
    // from the same footer open the stats pay for — zero Spark jobs, round
    // 7); a table holding any legacy pre-count entry degrades to a
    // metadata-only count job (column-pruned parquet count = footer row
    // counts, no data pages). Below the budget the done urls broadcast and
    // the payload never leaves its scan partitions.
    //
    // MIDDLE REGIME (guide §3.2, round 7): past the broadcast budget but
    // under `graft.extract.bloomDoneRows`, a Bloom filter over the done urls
    // (~1.2 GB per billion keys at 1% fpp — `graft.extract.bloomFpp`) splits
    // the pages scan: bloom-NEGATIVE rows are PROVEN pending (no false
    // negatives) and flow to the kernel scan-local, only the maybe-subset —
    // true matches plus fpp — anti-joins the done set, so the payload
    // exchange shrinks from O(pages) to O(pages ∩ done). The cost is a
    // second pages scan (one branch each), the §8 trade: scans are local
    // columnar reads, the shuffle is the network. `pages` must be
    // deterministic between the two branch evaluations — every caller hands
    // a committed-file scan.
    //
    // Above the bloom budget (a 100 TB resume against billions of done
    // urls) the sort-merge anti-join IS the correct plan — at that overlap
    // the batch payload must co-partition with the done set — so the
    // fallback stays, loudly shaped. All three budgets are confs, not
    // constants tuned to this sandbox.
    val pending = if (force) pages else pendingPages(spark, pages, log)._1

    val snapshotId = log.nextSnapshotId()
    val obs = Observation(s"gate-$snapshotId")
    // the one wide exchange: co-locate extracted rows (post-kernel, html
    // already dropped) by bucket for the data-file layout
    val extracted = extractDF(pending, numBuckets)
      .observe(obs, count(lit(1)).as("total"), count(when(col("ok"), 1)).as("ok"))
      .drop("ok")
      .repartition(numBuckets, col("bucket"))

    val stage = log.stageDataDir(snapshotId)
    extracted.write.mode("overwrite").parquet(stage)

    val gate = obs.get
    val total = gate("total").asInstanceOf[Long]
    if (total == 0L) { log.abort(snapshotId); return None } // nothing pending
    val ok = gate("ok").asInstanceOf[Long]
    if (ok.toDouble / total < SuccessRatio) { // A1 gate before commit
      log.abort(snapshotId)
      throw GateFailed(ok, total)
    }

    // bucket min/max ride the manifest: a later `bucket = k` read (resume
    // repair, per-bucket audit) plans only the files whose range covers k
    if (force) log.commitReplace(snapshotId, statsColumns = Seq("bucket"))
    else log.commit(snapshotId, statsColumns = Seq("bucket"))

    // A3 lineage: per-bucket doc/byte counts + order-insensitive checksum
    // (bit_xor of per-row xxhash64 — partition-internal order cannot matter)
    val wallMs = (System.nanoTime() - t0) / 1000000L
    lineageRows(spark.read.schema(Schemas.extractedSchema).parquet(stage),
      snapshotId, wallMs)
      .write.mode("append").parquet(s"$tableDir/metrics")
    Some(snapshotId)
  }

  /** The resume pending-set derivation (see run()'s regime walkthrough).
    * Returns the frame plus the regime actually chosen ("broadcast" |
    * "bloom" | "shuffle") so tests can pin that a forced conf really
    * selected its branch — a silently-renamed conf key would otherwise turn
    * the regime tests into three copies of the broadcast test.
    */
  private[graft] def pendingPages(spark: SparkSession,
      pages: Dataset[Schemas.Page], log: SnapshotLog)
      : (Dataset[Schemas.Page], String) = {
    import spark.implicits._
    val meta = log.currentSnapshot().map(log.metaAt).getOrElse(Seq.empty)
    val done = log.scanEntries(spark, Schemas.extractedSchema, meta)
      .select("url")
    val doneRows = SnapshotLog.rowCountOf(meta).getOrElse(done.count())
    val budget = spark.conf.get(
      "graft.extract.broadcastDoneRows", "4000000").toLong
    val bloomBudget = spark.conf.get(
      "graft.extract.bloomDoneRows", "100000000").toLong
    if (doneRows <= budget)
      (pages.join(broadcast(done), Seq("url"), "left_anti").as[Schemas.Page],
        "broadcast")
    else if (doneRows <= bloomBudget) {
      val fpp = spark.conf.get("graft.extract.bloomFpp", "0.01").toDouble
      val bf = buildUrlBloom(spark, log, meta, doneRows, fpp)
      val bfB = spark.sparkContext.broadcast(bf)
      // null url ⇒ NOT maybe: SQL null matches nothing in an anti-join,
      // so such a row is pending — routing it through the proven-pending
      // branch preserves that without the UDF touching null. The
      // broadcast is reclaimed by the ContextCleaner when run() returns.
      val maybeDone =
        udf((u: String) => u != null && bfB.value.mightContainString(u))
      val proven = pages.filter(!maybeDone(col("url")))
      val checked = pages.toDF().filter(maybeDone(col("url")))
        .join(done, Seq("url"), "left_anti")
      (proven.toDF().unionByName(checked).as[Schemas.Page], "bloom")
    } else
      (pages.join(done, Seq("url"), "left_anti").as[Schemas.Page], "shuffle")
  }

  /** Build the done-url Bloom filter at the REQUESTED capacity. Spark 4's
    * `stat.bloomFilter` routes through `BloomFilterAggregate`, which
    * silently clamps the filter to the runtime-filter caps
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`,
    * defaults 4M items / 8 MB) — measured: a 10M-key build came back at
    * exactly 67,108,864 bits with ~10% fp instead of the requested 1%, and
    * at the regime's 10^8 top end the filter would saturate toward fp ≈ 1
    * (every page "maybe done" — the whole payload back in the anti-join
    * shuffle, plus a wasted scan). The middle regime only ever runs ABOVE
    * the 4M broadcast budget, so the default caps bind across its entire
    * range. The caps are raised in an ISOLATED throwaway session
    * (`newSession` — own SQLConf, shared SparkContext): they also govern
    * the optimizer's AUTOMATIC runtime-filter injection, and raising them
    * on the caller's session for the duration of a multi-second build
    * would let any concurrently planned query (the streaming twin shares
    * the session) size its own injected blooms with this unbounded budget.
    */
  private def buildUrlBloom(spark: SparkSession, log: SnapshotLog,
      meta: Seq[SnapshotLog.FileMeta], doneRows: Long,
      fpp: Double): org.apache.spark.util.sketch.BloomFilter = {
    val items = math.max(doneRows, 1L)
    val bits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(items, fpp)
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      math.max(items, 4000000L).toString)
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
      math.max(bits, 67108864L).toString)
    log.scanEntries(s, Schemas.extractedSchema, meta).select("url")
      .stat.bloomFilter("url", items, fpp)
  }

  /** The per-bucket lineage aggregation — ONE definition shared by run()'s
    * organic append and [[backfillMetrics]]' repair, so the two row shapes
    * can never drift field-by-field.
    */
  private def lineageRows(extracted: DataFrame, snapshotId: Long,
      wallMs: Long): DataFrame =
    extracted
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(col("n_bytes")).as("byte_count"),
        expr("bit_xor(checksum)").as("checksum"))
      .select(
        lit(snapshotId).as("snapshot_id"), col("bucket"), col("doc_count"),
        col("byte_count"), col("checksum"), lit(wallMs).as("wall_ms"))

  /** Read the extracted table (current snapshot). */
  def readExtracted(spark: SparkSession, tableDir: String): DataFrame =
    new SnapshotLog(tableDir).scan(spark, Schemas.extractedSchema)

  /** PARTIAL re-extract: re-run the kernel over only the pages whose url is
    * in `urls` and MERGE the fresh rows into the table
    * ([[SnapshotLog.upsertMatching]]) — the scale-correct form of the
    * reference's force re-extract for "the kernel was fixed for these
    * documents": `force = true` replaces the WHOLE table (claim.py:34's
    * all-or-nothing), this touches only the files holding the named urls
    * plus one staged update set. Urls absent from the table are inserted
    * (they are new extractions); urls absent from `pages` are simply not in
    * the update set (nothing to re-run). The A1 success gate holds over the
    * re-extracted subset exactly as over a batch. Returns the committed
    * snapshot, or None when `urls` selects no page.
    */
  def reextract(
      spark: SparkSession,
      pages: Dataset[Schemas.Page],
      tableDir: String,
      urls: DataFrame,
      numBuckets: Int = 32): Option[Long] = {
    import spark.implicits._
    val subset = pages.toDF()
      .join(urls.select("url").distinct(), Seq("url"), "left_semi")
      .as[Schemas.Page]
    val fresh = extractDF(subset, numBuckets).persist()
    try {
      val total = fresh.count()
      if (total == 0L) return None
      val ok = fresh.filter(col("ok")).count()
      if (ok.toDouble / total < SuccessRatio) throw GateFailed(ok, total)
      Some(new SnapshotLog(tableDir).upsertMatching(spark,
        Schemas.extractedSchema, fresh.drop("ok"), "url",
        statsColumns = Seq("bucket"), clusterBy = Seq("bucket"),
        clusterParts = numBuckets))
    } finally fresh.unpersist(): Unit
  }

  /** Re-derive lineage rows for committed snapshots MISSING from the metrics
    * table — run() commits the snapshot before appending metrics (the commit
    * must never depend on a second write landing), so a crash in between
    * leaves a committed snapshot with no lineage row and the resume rerun
    * (a no-op) never writes it. Everything needed is re-derivable from table
    * metadata: the snapshot's own rows are its segment-set difference vs its
    * parent (the incremental scan; a replace commit's lineage is its full
    * content). Backfilled rows carry wall_ms = -1 (the wall time died with
    * the crashed driver). Idempotent; returns the snapshots repaired.
    */
  def backfillMetrics(spark: SparkSession, tableDir: String): Seq[Long] = {
    val log = new SnapshotLog(tableDir)
    val metricsPath = s"$tableDir/metrics"
    val have: Set[Long] =
      if (!new java.io.File(metricsPath).isDirectory) Set.empty
      else spark.read.parquet(metricsPath)
        .select("snapshot_id").distinct().collect().map(_.getLong(0)).toSet
    // POINTER-BOUNDED: a residual manifest past the current pointer is a
    // crashed writer's in-flight attempt (the retryable pre-swap window),
    // not a committed snapshot — backfilling it would duplicate lineage the
    // moment that writer's retry commits for real
    val current = log.currentSnapshot().getOrElse(-1L)
    val committed = log.snapshots().filter(_ <= current)
    val missing = committed.filterNot(have)
    missing.flatMap { id =>
      val parent = log.parentOf(id)
      val files: Option[Seq[String]] =
        if (parent < 0) Some(log.filesAt(id)) // first commit: content = lineage
        else if (log.isAppendOf(id, parent)) Some(log.filesAddedBetween(parent, id))
        else if (log.isRewriteOf(id, parent)) None
        // row-level rewrite (delete / upsert / compact): its fresh files are
        // SURVIVORS of parent rows re-filed (plus, for an upsert, merged
        // rows not separable from them at file granularity) — every one of
        // those rows already has lineage under an ancestor, so backfilling
        // the path diff would double-count them (round-5 ADVICE). Upsert's
        // live path records its own lineage at run time; a crashed one stays
        // unattributed rather than inflated.
        else if (log.snapshots().contains(parent)) {
          // parent manifest still present but the child is not a pure segment
          // append: either a replace (fresh paths, difference = full content)
          // or a legacy-inline MIGRATION append, whose segment folds the
          // parent's carried-over rows in — those rows already have lineage
          // from the parent's own run, so only the path-set difference is
          // this snapshot's lineage (full content would double-count them)
          val carried = log.filesAt(parent).toSet
          Some(log.filesAt(id).filterNot(carried))
        } else if (log.isSelfContained(id))
          // parent expired: only a true replace (references nothing but its
          // own segment AND staged every file itself) is still decidable —
          // its full content IS its lineage. A compact is the same shape but
          // carries the `cp` tag, caught above; pre-round-6 compacts are
          // untagged and stay ambiguous (documented limitation).
          Some(log.filesAt(id))
        else None
        // append snapshot with an EXPIRED parent: its own rows are no longer
        // attributable (the diff needs the parent's list) — skip rather than
        // write lineage silently inflated with the parent's rows
      files match {
        case Some(fs) if fs.nonEmpty =>
          lineageRows(
            spark.read.schema(Schemas.extractedSchema).parquet(fs: _*),
            id, wallMs = -1L)
            .write.mode("append").parquet(metricsPath)
          Some(id) // only ids actually written count as repaired
        case _ => None
      }
    }
  }
}
