package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Wet

class WetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def wetFile(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-wet-")
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val body =
      "WARC/1.0\r\n" +
        "WARC-Type: warcinfo\r\n" +
        "Content-Length: 10\r\n" +
        "\r\n" +
        "isPartOf: test-crawl\r\n" +
        "\r\n" +
        "WARC/1.0\r\n" +
        "WARC-Type: conversion\r\n" +
        "WARC-Target-URI: http://example.com/a\r\n" +
        "Content-Length: 11\r\n" +
        "\r\n" +
        "hello world\r\n" +
        "\r\n" +
        "WARC/1.0\r\n" +
        "WARC-Type: conversion\r\n" +
        "WARC-Target-URI: http://example.org/b\r\n" +
        "Content-Length: 21\r\n" +
        "\r\n" +
        "second record\ntwo lines\r\n"
    val f = dir.resolve("chunk.wet")
    java.nio.file.Files.writeString(f, body)
    f.toString
  }

  test("read splits records at the WARC header and parses the fields") {
    val df = Wet.read(spark, wetFile())
    val rows = df.select("rec_type", "url", "declared_len")
      .as[(String, String, Long)].collect().sortBy(_._2)
    assert(rows.length == 3)
    assert(rows.map(_._1).count(_ == "conversion") == 2)
    assert(rows.map(_._2).toSet ==
      Set("", "http://example.com/a", "http://example.org/b"))
    assert(rows.find(_._2 == "http://example.com/a").get._3 == 11L)
  }

  test("conversions keeps only text extracts, shaped for the doc table") {
    val docs = Wet.conversions(spark, wetFile())
      .as[(String, String, Int)].collect().sortBy(_._1)
    assert(docs.length == 2)
    val a = docs.head
    assert(a._1 == "http://example.com/a" && a._2 == "hello world" &&
      a._3 == "hello world".length)
    assert(docs(1)._2.contains("second record") &&
      docs(1)._2.contains("two lines"))
    // The warcinfo record never leaks into the corpus staging frame.
    assert(!docs.exists(_._2.contains("isPartOf")))
  }

  test("header parsing stays inside whole-stage codegen (no UDF, no RDD)") {
    val plan = Wet.read(spark, wetFile()).queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    // Non-AQE plans print the codegen span as "*(n)".
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"), plan)
  }
}
