package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe small-state files on any Hadoop-compatible FS — the shared
  * mechanic behind [[Ingest]]'s watermark state and [[Catalog]]'s resource
  * fingerprints (reference etl/load.py:534-606 `_promote_state_atomic`).
  *
  * Write protocol: content → `.tmp`, current → `.old`, `.tmp` → current,
  * drop `.old`. Every step is a single FS metadata op, so a crash leaves
  * one of: the previous complete state, only `.old` (healed by the next
  * read/write), or the new complete state — never a torn file.
  */
private[sources] object StateFiles {

  /** Recover from a crash between "state → .old" and ".tmp → state":
    * only `.old` exists, and it holds the previous complete state.
    */
  def heal(fs: FileSystem, p: Path): Unit = {
    val old = suffixed(p, ".old")
    if (!fs.exists(p) && fs.exists(old)) fs.rename(old, p)
  }

  def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }

  /** Atomic replace of `p` with `content` via the tmp→old→final swap. */
  def atomicWrite(fs: FileSystem, p: Path, content: Array[Byte]): Unit =
    atomicWriteWith(fs, p) { out => out.write(content) }

  /** Same swap, with the content streamed by `write` (callers with
    * non-byte-array payloads, e.g. java.util.Properties).
    */
  def atomicWriteWith(fs: FileSystem, p: Path)(
      write: java.io.OutputStream => Unit): Unit = {
    val tmp = suffixed(p, ".tmp")
    val old = suffixed(p, ".old")
    heal(fs, p)
    val out = fs.create(tmp, true)
    try write(out) finally out.close()
    // Hadoop rename/delete report failure by RETURNING false.
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"atomicWrite: $what failed for $p")
    if (fs.exists(old)) must(fs.delete(old, false), "delete stale .old")
    if (fs.exists(p)) must(fs.rename(p, old), "rename state -> .old")
    must(fs.rename(tmp, p), "rename .tmp -> state")
    if (fs.exists(old)) must(fs.delete(old, false), "delete .old")
  }

  private def suffixed(p: Path, s: String): Path =
    new Path(p.getParent, p.getName + s)
}
