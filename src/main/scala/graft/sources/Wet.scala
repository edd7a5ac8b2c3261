package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WET-style multi-record text ingestion — the CommonCrawl-extract shape
  * a web-corpus pipeline starts from: one file holds many records, each
  * a `WARC/1.0` header block, a blank line, then the extracted text.
  *
  * Spark-first: the record split rides the text source's `lineSep`
  * option (each record becomes one row at scan time — no whole-file
  * driver reads, no RDD plumbing), and header parsing is a narrow
  * codegen'd projection of regexp extracts, so the parse stays inside
  * whole-stage codegen and scales like any other scan.
  *
  * This is a deliberately minimal public-format reader (URI, type,
  * declared length, content) — enough to feed the documents-table
  * operators; it is NOT a full WARC implementation (no HTTP headers,
  * no gzip member handling — archives are assumed pre-decompressed,
  * which is how WET extracts ship).
  */
object Wet {

  private val Delim = "WARC/1.0"

  /** All records with parsed header fields; `content` is the body after
    * the first blank line (empty when a record has no body).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", Delim).text(path)
      .filter(trim(col("value")) =!= "")
      .select(split(col("value"), "\\r?\\n\\r?\\n", 2).as("hb"))
      .select(
        regexp_extract(element_at(col("hb"), 1), "WARC-Type:\\s*(\\S+)", 1)
          .as("rec_type"),
        regexp_extract(element_at(col("hb"), 1),
          "WARC-Target-URI:\\s*(\\S+)", 1).as("url"),
        regexp_extract(element_at(col("hb"), 1),
          "Content-Length:\\s*(\\d+)", 1).cast("long").as("declared_len"),
        // regexp trim: Spark's trim() strips spaces only — record
        // bodies end in CRLF, which must not count as content.
        regexp_replace(regexp_replace(
            coalesce(element_at(col("hb"), 2), lit("")),
            "^\\s+", ""), "\\s+$", "").as("content"))

  /** The text-extract records only (the ones a training pipeline keeps),
    * shaped like a documents-table staging frame.
    */
  def conversions(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col("rec_type") === "conversion" && col("url") =!= "")
      .select(col("url"), col("content"),
        length(col("content")).as("n_chars"))
}
