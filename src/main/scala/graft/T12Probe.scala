package graft

import org.apache.spark.sql.functions._

/** Round-7 scratch: stage decomposition of t12/t13 (md5-family twins). */
object T12Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def wsToks(c: org.apache.spark.sql.Column) =
      split(regexp_replace(c,
        "(\\A[ \\t\\n\\x0B\\f\\r]+)|([ \\t\\n\\x0B\\f\\r]+\\z)", ""), "\\s+")
    def triShinglesOf(t: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.select(col("doc_id"), lower(col("text")).as("text"))
      .filter(size(wsToks(col("text"))) >= 5)
    val corpus = graft.spark.Dedup.withInjectedNearDups(spark, base, "doc_id", "text")

    def time(label: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime(); val n = body
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    time("corpus count")(corpus.count())
    val banded = corpus
      .withColumn("__toks", wsToks(col("text")))
      .select(col("doc_id"), triShinglesOf(col("__toks")).as("sh"))
      .select(col("doc_id"), posexplode(array((0 until 4).map(j =>
        array_min(transform(col("sh"), x => md5(concat(x, lit("#" + j)))))): _*))
        .as(Seq("band", "key")))
    time("banded count")(banded.count())
    val cand = banded.select(col("band"), col("key"), col("doc_id").as("a"))
      .join(banded.select(col("band"), col("key"), col("doc_id").as("b")),
        Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    time("cand distinct count")(cand.count())
    val verified = graft.spark.Dedup.verifyJaccard(cand, corpus, "doc_id", "text")
      .filter(col("jaccard_exact") >= 0.5)
    time("verified count")(verified.count())
    // join-only twin: same attach joins, trivial expression instead of the UDF
    val t = corpus.select(col("doc_id").cast("long").as("id"), col("text").as("t"))
    val joined = cand
      .join(t.withColumnRenamed("id", "a").withColumnRenamed("t", "ta"), Seq("a"))
      .join(t.withColumnRenamed("id", "b").withColumnRenamed("t", "tb"), Seq("b"))
      .filter(length(col("ta")) + length(col("tb")) >= 0)
    time("attach-only count")(joined.count())
    spark.stop()
  }
}
