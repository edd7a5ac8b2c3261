package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Log, RunLog}

/** The JSON-lines logger (reference etl/log.py writer half) and its
  * roundtrip through the run-log reader + the local-zone run stamp
  * (reference load.py `_now_iso_ec`).
  */
class LogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("nowIsoLocal renders Ecuador time with the reference's -05:00 offset") {
    val clock = java.time.Clock.fixed(
      java.time.Instant.parse("2024-06-01T12:34:56Z"), java.time.ZoneOffset.UTC)
    assert(Log.nowIsoLocal(clock = clock) == "2024-06-01T07:34:56-05:00")
    // Regex the reference's strftime guarantees.
    assert(Log.nowIsoLocal().matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}-05:00"""))
  }

  test("eventLine carries {time, level, name, message} plus flat extras") {
    val line = Log.eventLine("INFO", "extract", "done",
      Map("rows" -> 1234, "file" -> "foo.csv", "ok" -> true),
      time = "2024-01-01T00:00:00-05:00")
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    implicit val fmts: org.json4s.DefaultFormats.type = org.json4s.DefaultFormats
    assert((parsed \ "level").extract[String] == "INFO")
    assert((parsed \ "name").extract[String] == "extract")
    assert((parsed \ "message").extract[String] == "done")
    assert((parsed \ "rows").extract[Long] == 1234L)
    assert((parsed \ "file").extract[String] == "foo.csv")
    assert((parsed \ "ok").extract[Boolean])
    // Standard fields win a key collision, like the reference formatter.
    val clash = Log.eventLine("INFO", "n", "m", Map("level" -> "SNEAKY"),
      time = "t")
    assert((org.json4s.jackson.JsonMethods.parse(clash) \ "level")
      .extract[String] == "INFO")
  }

  test("logger file sink roundtrips through RunLog.readLogDf; noise lands in raw") {
    val dir = Files.createTempDirectory("graft-log").toString
    val path = s"$dir/etl.log"
    val logger = Log.get("runner", logfile = Some(path), sink = _ => ())
    logger.info("Extraction completed", Map("rows" -> 10L))
    logger.warning("Schema drift", Map("missing" -> Seq("lat", "lon")))
    // A non-JSON line a crashing process might interleave.
    val w = new java.io.PrintWriter(new java.io.FileWriter(path, true))
    try w.println("2024-01-01 PLAIN TEXT PANIC") finally w.close()
    logger.error("failed")

    // Cache before filtering on the corrupt-record column — Spark
    // disallows querying it straight off the raw file scan.
    val df = RunLog.readLogDf(spark, path).cache()
    import spark.implicits._
    assert(df.count() == 4)
    assert(df.filter($"raw".isNotNull).count() == 1)
    val levels = df.filter($"raw".isNull).select("level")
      .as[String].collect().sorted.toSeq
    assert(levels == Seq("ERROR", "INFO", "WARNING"))
    val rows = df.filter($"message" === "Extraction completed")
      .select("rows").as[Long].head()
    assert(rows == 10L)
  }

  test("runner stamps the audit run row in the local zone") {
    val base = Files.createTempDirectory("graft-stamp").toString
    val cfg = graft.config.DatasetConfig(
      dataset = "t", padMissing = true, order = Seq("codigo"),
      ids = graft.config.IdStrategy(compositeKey = Seq("codigo")))
    import spark.implicits._
    Runner.run(spark, Map("r" -> Seq("A1").toDF("Código")), cfg,
      base + "/t", base + "/a", "run_s")
    val stamp = graft.operators.Audit.readRuns(spark, base + "/a")
      .select("stamp_local").as[String].head()
    assert(stamp.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}-05:00"""))
  }
}
