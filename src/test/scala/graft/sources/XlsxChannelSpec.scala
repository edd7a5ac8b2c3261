package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The no-staging remote read path: a commons-compress ZipFile over a
  * seekable Hadoop input stream must parse identically to the local-file
  * open. Exercised against LocalFileSystem (the same FSDataInputStream
  * surface an object store presents).
  */
class XlsxChannelSpec extends AnyFunSuite {

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft-xlsx-ch").toString
    val p = s"$dir/wb.xlsx"
    graft.XlsxFixture.writeXlsx(p, Seq(
      "2023" -> Seq(Seq("Código", "Valor"), Seq("A1", "10"), Seq("A2", "20")),
      "2024" -> Seq(Seq("Código", "Valor"), Seq("B1", "30"))))
    p
  }

  test("channel-backed zip parses bit-identically to the local-file open") {
    val p = fixture()
    val conf = new org.apache.hadoop.conf.Configuration()
    val hp = new org.apache.hadoop.fs.Path("file://" + p)
    val fs = hp.getFileSystem(conf)
    val ch = new HadoopSeekableByteChannel(fs.open(hp), fs.getFileStatus(hp).getLen)
    val zf = org.apache.commons.compress.archivers.zip.ZipFile.builder()
      .setSeekableByteChannel(ch).get()
    try {
      assert(Xlsx.sheetNames(zf) == Xlsx.sheetNames(p))
      assert(Xlsx.sheetNames(zf) == Seq("2023", "2024"))
      val viaChannel = Xlsx.readSheetRows(zf, "2023").map(_.toSeq)
      val viaFile = Xlsx.readSheetRows(p, "2023").map(_.toSeq)
      assert(viaChannel == viaFile)
    } finally zf.close()
    assert(!ch.isOpen, "closing the archive must close the channel")
  }

  test("partial positioned reads survive a short-read filesystem") {
    val p = fixture()
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(p))
    // Wrap the raw bytes in a channel that returns AT MOST 7 bytes per
    // read — commons-compress must still assemble every part.
    val short = new java.nio.channels.SeekableByteChannel {
      private var pos = 0L
      override def read(dst: java.nio.ByteBuffer): Int = {
        if (pos >= bytes.length) return -1
        val n = math.min(7, math.min(dst.remaining(), bytes.length - pos.toInt))
        dst.put(bytes, pos.toInt, n); pos += n; n
      }
      override def write(src: java.nio.ByteBuffer): Int = throw new UnsupportedOperationException
      override def position(): Long = pos
      override def position(newPosition: Long): java.nio.channels.SeekableByteChannel = {
        pos = newPosition; this
      }
      override def size(): Long = bytes.length.toLong
      override def truncate(size: Long): java.nio.channels.SeekableByteChannel =
        throw new UnsupportedOperationException
      override def isOpen: Boolean = true
      override def close(): Unit = ()
    }
    val zf = org.apache.commons.compress.archivers.zip.ZipFile.builder()
      .setSeekableByteChannel(short).get()
    try assert(Xlsx.readSheetRows(zf, "2024").map(_.toSeq) ==
      Xlsx.readSheetRows(p, "2024").map(_.toSeq))
    finally zf.close()
  }
}
