package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation primitives a crawl-scale training-data pipeline
  * needs before any text op runs: URL canonicalization (the dedup /
  * partition key for crawl data), outlink extraction, and corpus-level
  * boilerplate line removal (CCNet/RefinedWeb-style line dedup).
  *
  * All three are pure narrow projections or equi-join shapes — no
  * driver-side state, nothing that grows with corpus size.
  */
object WebText {

  /** Tracking parameters dropped during URL canonicalization. */
  val trackingParams: Seq[String] = Seq("fbclid", "gclid")

  /** Canonicalize a URL column for use as a crawl dedup key:
    *  - scheme and authority lowercased, leading `www.` dropped
    *  - default ports removed (`:80` for http, `:443` for https)
    *  - path: duplicate slashes collapsed, `/./` segments resolved,
    *    trailing slash dropped (root stays `/`)
    *  - query: `utm_*` and click-tracking params removed, the rest
    *    sorted by name for order-independence
    *  - fragment dropped.
    *
    * Built from `parse_url` + codegen'd string functions — stays inside
    * whole-stage codegen, no UDF.
    */
  def urlNormalize(u: Column): Column = {
    val scheme = lower(parse_url(u, lit("PROTOCOL")))
    val rawAuth = regexp_replace(
      lower(coalesce(parse_url(u, lit("AUTHORITY")), lit(""))), "^(www\\.)+", "")
    val auth = when(scheme === "http", regexp_replace(rawAuth, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawAuth, ":443$", ""))
      .otherwise(rawAuth)
    val collapsed = regexp_replace(
      regexp_replace(coalesce(parse_url(u, lit("PATH")), lit("")), "/{2,}", "/"),
      "/\\./", "/")
    val path = when(collapsed === "" || collapsed === "/", lit("/"))
      .otherwise(regexp_replace(collapsed, "/$", ""))
    val qs = array_join(sort_array(keptParams(u)), "&")
    concat(scheme, lit("://"), auth, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Query params surviving canonicalization (unsorted). */
  def keptParams(u: Column): Column =
    filter(split(coalesce(parse_url(u, lit("QUERY")), lit("")), "&"), p =>
      (p =!= "") &&
        (substring(p, 1, 4) =!= "utm_") &&
        !element_at(split(p, "="), 1).isin(trackingParams: _*))

  /** Normalized host of a URL (authority after canonicalization). */
  def urlHost(u: Column): Column = {
    val scheme = lower(parse_url(u, lit("PROTOCOL")))
    val rawAuth = regexp_replace(
      lower(coalesce(parse_url(u, lit("AUTHORITY")), lit(""))), "^(www\\.)+", "")
    when(scheme === "http", regexp_replace(rawAuth, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawAuth, ":443$", ""))
      .otherwise(rawAuth)
  }

  /** hrefs of `<a>` tags in an HTML column, in document order. Tags
    * without an href (anchors, named targets) don't match.
    */
  def extractHrefs(html: Column): Column =
    regexp_extract_all(html, lit("(?i)<a\\s[^>]*href\\s*=\\s*[\"']([^\"']*)[\"']"), lit(1))

  /** Destination host of a link: absolute http(s) URLs resolve through
    * urlHost; everything else (relative paths, fragments) stays on the
    * page's own host.
    */
  def resolveDstHost(href: Column, srcHost: Column): Column =
    when(lower(href).startsWith("http://") || lower(href).startsWith("https://"),
      urlHost(href)).otherwise(srcHost)

  /** Corpus-level boilerplate line removal (the line-dedup step of
    * CCNet / RefinedWeb): a line whose trimmed form appears in at least
    * `minDocs` DISTINCT documents is boilerplate and is dropped from
    * every document; remaining lines are reassembled in original order.
    *
    * Scale shape: one narrow posexplode, one count-distinct aggregate on
    * the line key, then an anti-join against the FILTERED frame — the
    * set of boilerplate lines is small by definition, so AQE broadcasts
    * it at runtime and the big side never shuffles for the join.
    * Documents whose every line was boilerplate survive with empty text.
    *
    * Returns (idCol, clean_text, n_kept, n_dropped).
    */
  def stripBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val boiler = lines
      .groupBy(trim(col("line")).as("k"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("k"))
    val kept = lines
      .join(boiler, trim(col("line")) === col("k"), "left_anti")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("line")))).as("ps"))
    df.select(col(idCol), size(split(col(textCol), "\n")).as("__n_total"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(array_join(transform(col("ps"), p => p("line")), "\n"), lit(""))
          .as("clean_text"),
        coalesce(size(col("ps")), lit(0)).cast("long").as("n_kept"),
        (col("__n_total") - coalesce(size(col("ps")), lit(0))).cast("long")
          .as("n_dropped"))
  }
}
