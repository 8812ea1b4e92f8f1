package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data deduplication operators over a (id, text) corpus — the layer a
  * 100 TB pretraining pipeline runs right after extraction.
  *
  * Scale shapes (the whole point of each design):
  *   - exact dedup: one hash-shuffle on a 16-byte digest, never on the text;
  *   - MinHash/LSH: candidate generation is explode(bands) + self-join on the
  *     band key — cost O(docs x bands) rows, never O(docs^2); the quadratic
  *     verify step runs only inside tiny band buckets;
  *   - SimHash: 64-bit signature per doc; near-dup = small Hamming distance,
  *     bucketed by the signature's high bits.
  */
object Dedup {

  /** Exact dedup: representative (min id) per md5(text) group. The shuffle
    * carries only (digest, id) — text stays columnar in the scan.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(md5(col(textCol).cast("binary")).as("fp"), col(idCol).as("id"))
      .groupBy("fp")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n"))

  /** Near-duplicate candidate pairs via MinHash LSH: docs sharing any of the 16
    * band keys, verified by MinHash-estimated Jaccard >= `minJaccard`.
    * Returns (a, b, jaccard_permille) with a < b, deduped across bands.
    *
    * PRECONDITION: `idCol` is unique per row (every corpus here keys docs by
    * id). The signature relation is keyed by id and pairs re-attach to it by
    * two id-joins — duplicate ids would fan those joins out into duplicate
    * (a, b) output rows. Pre-dedupe ids (or run [[exactGroups]]) first if the
    * input can violate this.
    *
    * `maxBucketSize` is the 100-TB skew guard: a boilerplate page duplicated
    * 10^9 times puts every copy in ONE band bucket, and the in-bucket self-join
    * is quadratic — 10^18 candidate rows from a single key. Buckets larger than
    * the cap are dropped from the LSH join (their members are by construction
    * exact or extreme near-dups, which the cheap [[exactGroups]] pre-pass owns);
    * [[oversizedBuckets]] returns exactly what was dropped so a pipeline can
    * route those buckets to the exact-dedup path instead of losing them.
    */
  def minHashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5,
      maxBucketSize: Int = 10000): DataFrame = {
    // Materialize the (small) pair set eagerly, then release the signature
    // cache — otherwise every call leaks a MEMORY_AND_DISK relation for the
    // session lifetime. localCheckpoint blocks are owned by the returned DF's
    // RDD and reclaimed by the ContextCleaner when it is dereferenced.
    val (pairs, sigs) = minHashPairsPlan(docs, idCol, textCol, minJaccard, maxBucketSize)
    val out = pairs.localCheckpoint(true)
    sigs.unpersist(false)
    out
  }

  /** The LAZY pair plan plus the persisted signature relation backing it —
    * plan-audit/EXPLAIN use: the CALLER owns the cache lifecycle and must
    * `unpersist` the returned signatures once done (round 3 returned only the
    * plan from a `materialize = false` flag, so the audit caller had no
    * handle and repeated calls leaked cache entries for the session).
    */
  def minHashPairsPlan(
      docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5,
      maxBucketSize: Int = 10000): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // one shingling pass; persisted because the plan reads it four times (both
    // band-join sides + both signature re-attach joins)
    // (LRU-evicted, MEMORY_AND_DISK — signatures are ~0.5KB/doc, never the text)
    val sigs = docs.select(
      col(idCol).cast("long").as("id"),
      Functions.minHashUdf(col(textCol)).as("sig"))
      .withColumn("bands", Functions.bandsFromSigUdf(col("sig")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // SKINNY band join: the exploded rows carry (band, key, id) ONLY — the
    // 0.5 KB signature must not ride through 16 band-join rows (8 KB/doc of
    // shuffle at 100 TB where 12 B/row suffices). Signatures re-attach to the
    // deduped candidate PAIRS afterwards via two id-joins against the
    // persisted relation; jac(a,b) is band-independent, so verifying once per
    // distinct pair is value-identical to the per-band-then-max form.
    val banded = sigs.select(col("id"), posexplode(col("bands")).as(Seq("band", "key")))
    // cap pathological buckets BEFORE the self-join: the count agg carries only
    // (band, key) and is map-side-combined; the hot-key list (rare by
    // construction — every member is a near-identical mass duplicate) then
    // prunes both join sides via a broadcast anti-join
    val hot = banded.groupBy("band", "key").count()
      .filter(col("count") > maxBucketSize)
      .select("band", "key")
    val pruned = banded.join(broadcast(hot), Seq("band", "key"), "left_anti")
    val l = pruned.select(col("band"), col("key"), col("id").as("a"))
    val r = pruned.select(col("band"), col("key"), col("id").as("b"))
    val jacUdf = udf((a: Seq[Long], b: Seq[Long]) =>
      graft.kernel.TextStats.minHashJaccard(a.toArray, b.toArray))
    val cand = l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct() // collapse multi-band discoveries BEFORE fetching signatures
    val pairs = cand
      .join(sigs.select(col("id").as("a"), col("sig").as("sig_a")), Seq("a"))
      .join(sigs.select(col("id").as("b"), col("sig").as("sig_b")), Seq("b"))
      .select(col("a"), col("b"), jacUdf(col("sig_a"), col("sig_b")).as("jac"))
      .filter(col("jac") >= minJaccard)
      .select(col("a"), col("b"), (col("jac") * 1000).cast("long").as("jac_permille"))
    (pairs, sigs)
  }

  /** The LSH band buckets larger than `maxBucketSize` — what [[minHashPairs]]
    * drops. A 100-TB pipeline unions these members into the exact-dedup path
    * (they are mass duplicates by construction) so nothing is silently lost.
    * Returns (band, key, count).
    */
  def oversizedBuckets(docs: DataFrame, idCol: String, textCol: String,
      maxBucketSize: Int = 10000): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        Functions.lshBandsUdf(col(textCol)).as("bands"))
      .select(posexplode(col("bands")).as(Seq("band", "key")))
      .groupBy("band", "key").count()
      .filter(col("count") > maxBucketSize)

  /** SimHash near-dups: all pairs within `maxHamming`, multi-probe bucketed.
    *
    * The 64-bit signature is split into `maxHamming + 1` blocks; by
    * pigeonhole, a pair with Hamming distance <= maxHamming differs in at
    * most maxHamming blocks, so it agrees EXACTLY on at least one — probing
    * every (probe#, block-value) bucket therefore has perfect recall at the
    * requested distance (the block count is DERIVED from the parameter so the
    * guarantee always tracks it; the round-2 fixed four-block split silently
    * lost recall for maxHamming > 3). Cost is maxHamming+1 bucket rows per
    * doc, still O(docs), never all-pairs. Same mass-duplicate bucket cap as
    * [[minHashPairs]]; duplicate discoveries across probes collapse in the
    * final (a, b) aggregate.
    *
    * The signature subtree is persisted for the call (it feeds the hot-bucket
    * aggregate AND both self-join sides — unpersisted, the corpus would be
    * scanned and simhashed 3x, the round-2 scale audit's finding); the
    * returned pair set is materialized eagerly and the cache released, the
    * same lifecycle as [[minHashPairs]] ([[simHashPairsPlan]] is the audit
    * variant: lazy plan + cache handle, caller unpersists). Same unique-id
    * precondition as [[minHashPairs]].
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    val (pairs, sigs) = simHashPairsPlan(docs, idCol, textCol, maxHamming, maxBucketSize)
    val out = pairs.localCheckpoint(true)
    sigs.unpersist(false)
    out
  }

  /** Lazy simhash pair plan + the persisted signature relation (audit use;
    * caller owns the cache — see [[minHashPairsPlan]]).
    */
  def simHashPairsPlan(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): (DataFrame, DataFrame) = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming $maxHamming outside [0, 15]: blocks of < 4 bits bucket too coarsely")
    val nBlocks = maxHamming + 1
    val sigs = docs.select(col(idCol).cast("long").as("id"),
      Functions.simHashUdf(col(textCol)).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocks = array((0 until nBlocks).map { b =>
      val lo = b * 64 / nBlocks
      val width = (b + 1) * 64 / nBlocks - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      shiftrightunsigned(col("sim"), lo).bitwiseAND(lit(mask))
    }: _*)
    val banded = sigs.select(col("id"), col("sim"),
      posexplode(blocks).as(Seq("probe", "bucket")))
    val hot = banded.groupBy("probe", "bucket").count()
      .filter(col("count") > maxBucketSize).select("probe", "bucket")
    val pruned = banded.join(broadcast(hot), Seq("probe", "bucket"), "left_anti")
    val l = pruned.select(col("probe"), col("bucket"), col("id").as("a"), col("sim").as("sim_a"))
    val r = pruned.select(col("probe"), col("bucket"), col("id").as("b"), col("sim").as("sim_b"))
    val hamUdf = udf((x: Long, y: Long) => graft.kernel.TextStats.hammingDist(x, y))
    val pairs = l.join(r, Seq("probe", "bucket"))
      .filter(col("a") < col("b"))
      .withColumn("hamming", hamUdf(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .groupBy("a", "b")
      .agg(min("hamming").as("hamming"))
    (pairs, sigs)
  }

  /** Connected components over a near-dup pair graph — the step that turns
    * PAIRS into duplicate CLUSTERS so a pipeline keeps one representative
    * per cluster (pairs alone under-dedup: a ~ b, b ~ c must collapse to one
    * kept doc even when a ~ c was never emitted). Min-label propagation:
    * every vertex starts labeled with itself; each round a vertex takes the
    * min of its own and its neighbors' labels; at fixpoint the label is the
    * component's min vertex id.
    *
    * Scale shape: two shuffles per round (neighbor-min, then a POINTER-JUMP
    * that replaces each label by its label's label — path compression), both
    * hash-partitioned on id. Neighbor-min alone needs DIAMETER rounds (a
    * 10^6-vertex chain = 10^6 shuffles); with pointer jumping the label
    * distance halves each round, so convergence is O(log diameter) — near-
    * dup graphs (cliques/stars from LSH buckets) finish in 1-3 rounds and
    * even a path of 2^20 needs ~20. Each round's labels are
    * localCheckpoint'd: iterative self-referential plans otherwise stack
    * lineage until planning itself dominates. Converges exactly (stops when
    * no label decreased; labels only ever decrease) and FAILS LOUDLY if
    * `maxIter` is hit first — a silently-unconverged component map would
    * under-dedup downstream. Result = (id, component) for every vertex that
    * appears in `edges`.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val bidir = edges.select(col("a").cast("long").as("s"), col("b").cast("long").as("d"))
      .union(edges.select(col("b").cast("long").as("s"), col("a").cast("long").as("d")))
      .localCheckpoint(true) // edges reused every round — cut the upstream plan once
    var labels = bidir.select(col("s").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      // every branch re-aliases its columns: union/self-join over plans that
      // share a checkpointed ancestor otherwise reuse attribute ids and trip
      // Catalyst's union-constraint resolution
      val neighborMin = bidir
        .join(labels, bidir("s") === labels("id"))
        .select(col("d").as("id"), col("component").as("component"))
      val propagated = labels
        .select(col("id").as("id"), col("component").as("component"))
        .union(neighborMin)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      // pointer jump: component <- label(component). Every component value is
      // itself a vertex id (labels are min-folded vertex ids), so the lookup
      // always hits; min() keeps the invariant that labels only decrease.
      val jump = propagated.select(col("id").as("cid"), col("component").as("cc"))
      val next = propagated.join(jump, propagated("component") === jump("cid"))
        .select(propagated("id"),
          least(propagated("component"), jump("cc")).as("component"))
        .localCheckpoint(true)
      converged = next
        .join(labels.select(col("id").as("id"), col("component").as("prev")), Seq("id"))
        .filter(col("component") < col("prev"))
        .isEmpty // labels only ever decrease; no decrease anywhere = fixpoint
      labels = next
      i += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "raise maxIter (graph diameter exceeds 2^maxIter after compression)")
    labels
  }

  /** Exact n-gram Jaccard for a candidate pair set (verification pass after
    * LSH). The shingle set is derived ONCE PER DOC and attached to the pairs
    * by the two id-joins (round 7): a doc in k candidate pairs was
    * previously re-tokenized and re-hashed 2k times by the per-pair UDF —
    * the dominant cost of the verify stage at any pair volume. Same values:
    * jaccard(shingles(a), shingles(b)) factored across the join.
    */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = docs.select(col(idCol).cast("long").as("id"),
      Functions.shinglesUdf(col(textCol)).as("sh"))
    pairs
      .join(t.withColumnRenamed("id", "a").withColumnRenamed("sh", "sha"), Seq("a"))
      .join(t.withColumnRenamed("id", "b").withColumnRenamed("sh", "shb"), Seq("b"))
      .withColumn("jaccard_exact", Functions.jaccardSetsUdf(col("sha"), col("shb")))
      .drop("sha", "shb")
  }

  /** A corpus with synthetic near-duplicates injected (id + offset, last word
    * dropped) — guarantees the near-dup operators have visible output on the
    * driver testdata; deterministic.
    */
  def withInjectedNearDups(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, offset: Long = 1000000L): DataFrame = {
    val mutated = docs.select(
      (col(idCol) + offset).as(idCol),
      dropLastWord(col(textCol)).as(textCol))
    docs.select(col(idCol), col(textCol)).unionByName(mutated)
  }

  /** Drop the last word: strip the final " word" suffix. \z (absolute end)
    * rather than $: Java's $ also matches BEFORE a final line terminator,
    * RE2's (the DuckDB oracles' '$') does not — \z makes the two engines
    * agree even on text ending in a newline. ONE definition, shared by the
    * injected-near-dup corpus and the t15 chained-level corpus, so an
    * engine-parity fix here can never miss a copy.
    */
  def dropLastWord(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, """\s+\S+\z""", "")
}
