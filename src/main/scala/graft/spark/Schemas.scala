package graft.spark

import java.sql.Timestamp

/** §1.2 data model: fixed schemas declared once and validated on read.
  *
  * `pages` follows BASELINE.json `input_hint`:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  * `extracted` and `metrics` follow SURVEY.md §1.2; `pages`/`text` are the two
  * nullable read-path columns mirroring the reference's list-or-str tolerance
  * (`/root/reference/app/services/search.py:128-131`).
  */
object Schemas {

  /** Input row (Common-Crawl-style page). */
  final case class Page(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** Kernel output row before checksum/lineage decoration. */
  final case class ExtractedRaw(
      url: String,
      bucket: Int,
      kind: String,
      pages: Seq[String],
      text: String,
      n_bytes: Long,
      ok: Boolean)

  /** Persisted extraction row. */
  final case class Extracted(
      url: String,
      bucket: Int,
      kind: String,
      pages: Seq[String],
      text: String,
      n_bytes: Long,
      checksum: Long)

  /** Per-bucket lineage row (north_rule: bucket id, doc count, byte count,
    * checksum; plus snapshot id + wall time).
    */
  final case class MetricsRow(
      snapshot_id: Long,
      bucket: Int,
      doc_count: Long,
      byte_count: Long,
      checksum: Long,
      wall_ms: Long)

  import org.apache.spark.sql.types._

  val pagesSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  val extractedSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("pages", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Fail fast on schema drift (unlike the tolerant reference read path —
    * SURVEY.md §1.2 keeps the *semantic* tolerance via the two nullable columns,
    * not via dynamic typing).
    */
  def validatePages(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    for (f <- pagesSchema.fields) {
      require(have.get(f.name).contains(f.dataType),
        s"pages schema drift: expected ${f.name}: ${f.dataType}, found ${have.get(f.name)}")
    }
    df
  }
}
