package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Load

/** Shrinking-batch retry semantics (reference load.py `_shrink_sequence`
  * / `_upsert_with_retries`) against injected flaky sinks — the offline
  * stand-in for the reference's PostgREST client.
  */
class LoadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("shrinkSequence is byte-compatible with the reference") {
    assert(Load.shrinkSequence(1000) == Seq(1000, 250, 100, 50))
    assert(Load.shrinkSequence(600) == Seq(600, 250, 100, 50))
    assert(Load.shrinkSequence(501) == Seq(501, 250, 100, 50))
    assert(Load.shrinkSequence(300) == Seq(300, 100, 50))
    assert(Load.shrinkSequence(101) == Seq(101, 100, 50))
    assert(Load.shrinkSequence(100) == Seq(100, 50))
    assert(Load.shrinkSequence(50) == Seq(50))
    assert(Load.shrinkSequence(30) == Seq(30, 50))
    // Reference quirk preserved: non-positive sizes clamp to 1, then 50.
    assert(Load.shrinkSequence(0) == Seq(1, 50))
  }

  test("oversize batches shrink until they fit; every row lands exactly once") {
    LoadSinks.reset()
    val df = (0 until 500).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
    val res = Load.writeWithRetries(df, LoadSinks.maxBatch50, batchSize = 1000,
      maxRetries = 1, backoffSeq = Seq(2, 5), sleeper = LoadSinks.recordSleep)
    assert(res.rowsWritten == 500 && res.failedBatches == 0 && res.rowsFailed == 0)
    assert(LoadSinks.landed.size() == 500, "all rows land despite oversize rejections")
    // 1000 → 250 → 100 all rejected (maxRetries=1 → one backoff sleep per
    // failed attempt chain), 50 succeeds. Sleeps only use backoffSeq head
    // because each chain gives up after retry #1.
    assert(LoadSinks.sleeps.get() > 0)
  }

  test("transient failures retry with the reference backoff ladder and succeed in place") {
    LoadSinks.reset()
    LoadSinks.failFirst.set(2) // first two write calls throw, then healthy
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
    val res = Load.writeWithRetries(df, LoadSinks.transient, batchSize = 1000,
      maxRetries = 3, backoffSeq = Seq(2, 5, 10), sleeper = LoadSinks.recordSleep)
    assert(res.rowsWritten == 100 && res.failedBatches == 0)
    assert(LoadSinks.landed.size() == 100)
    // Two failed attempts → backoff_seq[0], backoff_seq[1] (load.py:437-439).
    assert(LoadSinks.sleepLog.toString == "2,5,")
  }

  test("a poisoned row fails only its smallest-size batch; the rest of the load survives") {
    LoadSinks.reset()
    val df = (0 until 300).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
    val res = Load.writeWithRetries(df, LoadSinks.poison(ids = Set(123L)),
      batchSize = 100, maxRetries = 0, backoffSeq = Nil, sleeper = LoadSinks.recordSleep)
    // The poison row drags down its batch at every size, ending as one
    // failed 50-row batch — everything else lands (reference semantics:
    // the final undersized batch is the casualty unit).
    assert(res.failedBatches == 1 && res.rowsFailed == 50)
    assert(res.rowsWritten == 250)
    assert(LoadSinks.landed.size() == 250 && !LoadSinks.landed.containsKey(123L))
  }

  test("retried batches stay idempotent: re-sent rows overwrite, never duplicate") {
    LoadSinks.reset()
    LoadSinks.failEveryOther.set(true) // odd-numbered calls fail AFTER landing rows
    val df = (0 until 120).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
    val res = Load.writeWithRetries(df, LoadSinks.partialThenFail, batchSize = 60,
      maxRetries = 2, backoffSeq = Seq(1), sleeper = LoadSinks.recordSleep)
    assert(res.failedBatches == 0)
    assert(LoadSinks.landed.size() == 120, "partial writes + retry must not lose or dup rows")
  }
}

/** Static (local-mode-shared) flaky sinks + instrumentation. */
object LoadSinks {
  val landed = new ConcurrentHashMap[Long, String]()
  val sleeps = new AtomicInteger(0)
  val sleepLog = new java.lang.StringBuffer()
  val failFirst = new AtomicInteger(0)
  val failEveryOther = new java.util.concurrent.atomic.AtomicBoolean(false)
  val maxSeenBatch = new AtomicInteger(0)
  private val calls = new AtomicInteger(0)

  def reset(): Unit = {
    landed.clear(); sleeps.set(0); sleepLog.setLength(0)
    failFirst.set(0); failEveryOther.set(false); calls.set(0)
    maxSeenBatch.set(0)
  }

  val recordSleep: Int => Unit = s => { sleeps.incrementAndGet(); sleepLog.append(s"$s,") }

  private def land(rows: Seq[Row]): Unit =
    rows.foreach(r => landed.put(r.getLong(0), r.getString(1)))

  /** Healthy sink that just records rows and the largest batch seen. */
  val collecting: Load.BatchWriter = rows => {
    maxSeenBatch.getAndUpdate(m => math.max(m, rows.size))
    land(rows)
  }

  /** Rejects payloads over 50 rows (the oversize/413 shape). */
  val maxBatch50: Load.BatchWriter = rows => {
    if (rows.size > 50) throw new RuntimeException(s"payload too large: ${rows.size}")
    land(rows)
  }

  /** Fails the first `failFirst` calls, healthy afterwards. */
  val transient: Load.BatchWriter = rows => {
    if (failFirst.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new RuntimeException("transient sink error")
    land(rows)
  }

  /** Fails any batch containing a poisoned id. */
  def poison(ids: Set[Long]): Load.BatchWriter = rows => {
    if (rows.exists(r => ids.contains(r.getLong(0))))
      throw new RuntimeException("constraint violation")
    land(rows)
  }

  /** Lands the rows, THEN fails every other call — models a sink that
    * commits but times out on the acknowledgement, the case that makes
    * idempotence mandatory.
    */
  val partialThenFail: Load.BatchWriter = rows => {
    land(rows)
    if (failEveryOther.get() && calls.incrementAndGet() % 2 == 1)
      throw new RuntimeException("ack timeout after commit")
  }
}
