package graft

import org.apache.spark.sql.functions._
import graft.spark.{Dedup, Functions}

/** Dev harness: decompose t07 (MinHash LSH near-dup) wall time into its
  * stages at a given parallelism, to decide whether the shingle+MinHash UDF
  * dominates enough to justify a codegen Expression (VERDICT r2 #6).
  * `runMain graft.DedupProbe [sfDir] [cpus]`
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = Dedup.withInjectedNearDups(spark, docs, "doc_id", "text")

    def time(label: String)(body: => Unit): Unit = {
      body // warm-up
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${secs.min}%6.2f s  (${secs.map(s => f"$s%.2f").mkString(", ")})")
    }

    time("scan+count(text)") {
      corpus.select(sum(length(col("text")))).head(): Unit
    }
    time("shingle+minhash sigs") {
      corpus.select(Functions.minHashUdf(col("text")).as("sig"))
        .select(expr("bit_xor(element_at(sig, 1))")).head(): Unit
    }
    time("sigs+bands") {
      corpus.select(Functions.minHashUdf(col("text")).as("sig"))
        .withColumn("bands", Functions.bandsFromSigUdf(col("sig")))
        .select(expr("bit_xor(element_at(bands, 1))")).head(): Unit
    }
    time("full minHashPairs") {
      Dedup.minHashPairs(corpus, "doc_id", "text", minJaccard = 0.5).count(): Unit
    }

    // scale-up hold: does the pair pass stay linear as the corpus grows?
    // (LSH candidate generation is O(docs x bands); a super-linear trend here
    // would mean a quadratic bucket leak.) Each replica salts EVERY token with
    // its replica id, so cross-replica word-trigram overlap is exactly zero:
    // the within-replica similarity structure is preserved verbatim and the
    // true pair count is exactly mult x the base corpus's.
    val saltUdf = udf((text: String, rep: Long) => {
      val toks = text.split("\\s+")
      val suffix = "·" + rep
      val b = new StringBuilder(text.length + toks.length * suffix.length)
      var i = 0
      while (i < toks.length) {
        if (b.nonEmpty) b += ' '
        b ++= toks(i); b ++= suffix
        i += 1
      }
      b.toString
    })
    for (mult <- Seq(1, 2, 5, 10)) {
      val reps = spark.range(mult).select(col("id").as("rep"))
      val bigger = corpus.crossJoin(reps)
        .select((col("doc_id") + col("rep") * 100000000L).as("doc_id"),
          saltUdf(col("text"), col("rep")).as("text"))
        .localCheckpoint(true) // materialize: time the PAIR pass, not synthesis
      val nDocs = bigger.count()
      val t0 = System.nanoTime()
      val n = Dedup.minHashPairs(bigger, "doc_id", "text", minJaccard = 0.5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"minHashPairs x$mult%-2d docs=$nDocs%8d pairs=$n%9d  $sec%6.2f s")
    }
    spark.stop()
  }
}
