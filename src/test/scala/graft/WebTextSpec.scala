package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WebText

/** Edge cases of the web-corpus curation ops that the cross-engine
  * oracles (x_url_normalize / x_anchor_extract / x_boilerplate_lines)
  * can't reach with the synthesized corpus: all-params-dropped URLs,
  * root paths, href-less documents, and documents whose every line is
  * boilerplate.
  */
class WebTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def norm1(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(WebText.urlNormalize(col("u")).as("n"))
      .head().getString(0)
  }

  test("urlNormalize: root path, default port, tracking-only query, fragment") {
    assert(norm1("HTTPS://WWW.Site.COM:443/?utm_source=a&utm_medium=b#top") ===
      "https://site.com/")
    assert(norm1("http://Host.org:80") === "http://host.org/")
  }

  test("urlNormalize: non-default port and non-http scheme keep their port") {
    assert(norm1("http://h.io:8080/a") === "http://h.io:8080/a")
    assert(norm1("ftp://h.io:80/a") === "ftp://h.io:80/a")
  }

  test("urlNormalize: params sorted, tracking dropped, path cleaned") {
    assert(norm1("https://a.net//x//y/./z/?b=2&fbclid=q&a=1") ===
      "https://a.net/x/y/z?a=1&b=2")
  }

  test("extractHrefs: document order, quote styles, no-href tags skipped") {
    import spark.implicits._
    val links = Seq("<a href='u1'>x</a><A name=\"n\">y</A><a id=\"i\" href=\"u2\">z</a>")
      .toDF("h").select(WebText.extractHrefs(col("h")).as("l"))
      .head().getSeq[String](0)
    assert(links === Seq("u1", "u2"))
    val none = Seq("<p>no anchors <b>here</b></p>").toDF("h")
      .select(WebText.extractHrefs(col("h")).as("l")).head().getSeq[String](0)
    assert(none.isEmpty)
  }

  test("stripBoilerplateLines: order kept, all-boilerplate doc survives empty") {
    import spark.implicits._
    // "common" appears in 3 distinct docs (threshold 3); doc 3 is ONLY
    // boilerplate and must survive with empty text; doc 1 keeps its two
    // unique lines in original order either side of the dropped one.
    val df = Seq(
      (1L, "alpha\ncommon\nbeta"),
      (2L, "common\ngamma"),
      (3L, "common"),
      (4L, "delta delta")).toDF("id", "text")
    val out = WebText.stripBoilerplateLines(df, "id", "text", minDocs = 3L)
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (1L, "alpha\nbeta", 2L, 1L),
      (2L, "gamma", 1L, 1L),
      (3L, "", 0L, 1L),
      (4L, "delta delta", 1L, 0L)))
  }
}
