package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder
import graft.sources.Tables

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Per-file (min, max) of a long column from the parquet FOOTER stats —
    * the exact metadata any engine's file skipping reads.
    */
  private def footerRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(st.getPath, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val stats = reader.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == column)
            .map(_.getStatistics)
          (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
            stats.map(_.genericGetMax.asInstanceOf[Long]).max)
        } finally reader.close()
      }
  }

  /** Mean per-file coverage of the column's global range: ~1/numFiles when
    * tightly clustered, ~1.0 when the files are unclustered in that dim.
    */
  private def meanCoverage(dir: String, column: String): Double = {
    val rs = footerRanges(dir, column)
    val gMin = rs.map(_._1).min
    val gMax = rs.map(_._2).max
    val span = (gMax - gMin).toDouble.max(1.0)
    rs.map { case (a, b) => (b - a).toDouble / span }.sum / rs.size
  }

  test("z-order clusters BOTH dims; lexicographic sort only the first") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString

    ZOrder.writeClustered(li, Seq("l_partkey", "l_suppkey"), s"$base/z", 16)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"), col("l_suppkey"))
      .write.mode("overwrite").parquet(s"$base/lex")

    // Lexicographic: the secondary dim is uniform within every file.
    assert(meanCoverage(s"$base/lex", "l_suppkey") > 0.8,
      "baseline unexpectedly clustered on the secondary dim")
    // Z-order: BOTH dims narrow per file — the multi-dim skipping claim.
    val zp = meanCoverage(s"$base/z", "l_partkey")
    val zs = meanCoverage(s"$base/z", "l_suppkey")
    assert(zp < 0.45, s"z-order l_partkey coverage $zp not selective")
    assert(zs < 0.45, s"z-order l_suppkey coverage $zs not selective")
    // And it is lossless.
    assert(spark.read.parquet(s"$base/z").count() == li.count())
  }

  test("interleave is the textbook Morton code on small ints") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), 8).as("z"))
      .as[Long].collect().toSeq
    // bit i of a → bit 2i; bit i of b → bit 2i+1.
    def morton(a: Long, b: Long): Long =
      (0 until 8).foldLeft(0L)((acc, i) =>
        acc | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1)))
    assert(out == Seq(morton(0, 0), morton(1, 0), morton(0, 1),
      morton(1, 1), morton(3, 5)))
  }
}
