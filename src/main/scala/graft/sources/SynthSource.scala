package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-documents DataSource V2 connector — the
  * custom-connector tier of the engine (the Spark-native analog of the
  * reference's CKAN resource reader: an external source behind a
  * planned, prunable scan instead of a driver-side download loop).
  *
  * `spark.read.format("graft-synth").option("rows", N).option("partitions", P)`
  * yields (doc_id, lang, source, text) rows generated deterministically
  * from doc_id (splittable xxhash-style mix — no RNG state), so the same
  * options always produce the same table on any cluster.
  *
  * Scale features, spec-asserted:
  *  - PARTITION PLANNING: P independent InputPartitions, each generating
  *    only its doc_id slice (the 100 TB story: generation parallelizes
  *    with no driver materialization).
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): doc_id range/equality
  *    predicates narrow the generated ranges themselves — pushed filters
  *    don't just drop rows, they avoid CREATING them.
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): only requested
  *    fields are synthesized (text is the expensive one).
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val langs = Array("en", "es", "fr", "de", "zh")
  private val vocab = Array("data", "spark", "table", "row", "scan", "join",
    "hash", "merge", "filter", "batch", "query", "plan", "shuffle", "agg")

  /** Deterministic 64-bit mix (splitmix64 finalizer). */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def textFor(id: Long): String = {
    val n = 8 + math.floorMod(mix(id), 25).toInt
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(math.floorMod(mix(id * 31 + i), vocab.length).toInt))
      i += 1
    }
    sb.toString
  }

  def langFor(id: Long): String = langs(math.floorMod(mix(id + 7), langs.length).toInt)
  def sourceFor(id: Long): String = "src" + math.floorMod(mix(id + 13), 20)

  /** Rows actually generated — test observability for pushdown claims. */
  val generated = new java.util.concurrent.atomic.LongAdder
}

private class SynthTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions)
}

private class SynthScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo = 0L // inclusive
  private var hi = rows // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = SynthSource.schema
  private var pushedAgg: Option[Aggregation] = None
  private var descending = false

  /** LIMIT pushdown: rows are generated in doc_id order, so LIMIT n over
    * [lo, hi) is exactly [lo, lo+n) — the other hi−lo−n rows are never
    * created. A TOP-N ordered by doc_id is equally closed-form: ASC is
    * the same prefix; DESC is the suffix [hi−n, hi) emitted in reverse.
    * Both report fully-pushed, so Spark plans no Limit/TakeOrdered over
    * more than n rows.
    */
  private var limited = false
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + math.max(0, limit).toLong)
    limited = true
    true
  }
  override def isPartiallyPushed(): Boolean = false
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    val onDocId = orders.length == 1 && docIdRef(orders.head.expression)
    if (!onDocId) return false
    if (orders.head.direction == SortDirection.ASCENDING) {
      hi = math.min(hi, lo + math.max(0, limit).toLong)
    } else {
      lo = math.max(lo, hi - math.max(0, limit).toLong)
      descending = true
    }
    limited = true
    true
  }

  /** AGGREGATE PUSHDOWN (`SupportsPushDownAggregates`): ungrouped
    * COUNT/MIN/MAX over doc_id are CLOSED-FORM on a generated [lo, hi)
    * range — count = hi−lo, min = lo, max = hi−1 — so the scan answers
    * them from arithmetic alone, generating ZERO rows (spec-asserted via
    * the `generated` counter). Complete pushdown: Spark plans no partial
    * aggregation at all. Filters push BEFORE aggregates in the V2
    * pushdown order, so a doc_id range narrows [lo, hi) first and the
    * closed form stays exact.
    */
  private def docIdRef(e: Any): Boolean = e match {
    case n: NamedReference => n.fieldNames.sameElements(Array("doc_id"))
    case _ => false
  }
  private def supported(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case c: Count => !c.isDistinct && docIdRef(c.column)
    case m: Min => docIdRef(m.column)
    case m: Max => docIdRef(m.column)
    case _ => false
  }
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(supported)
    if (ok) pushedAgg = Some(agg)
    ok
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall(supported)

  /** doc_id range/equality predicates narrow [lo, hi); everything else
    * stays residual (returned for Spark to re-apply post-scan).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case EqualTo("doc_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new SynthAggScan(lo, hi, agg)
    case None =>
      // A pushed limit/top-N leaves ≤ n rows: one partition keeps the
      // fully-pushed ordering contract (partition concatenation order IS
      // the output order).
      val parts = if (limited) 1 else partitions
      new SynthScan(lo, hi, parts, required, pushed, descending)
  }
}

/** One-partition, one-row scan answering a completely-pushed ungrouped
  * COUNT/MIN/MAX from the range arithmetic — no row is ever generated.
  */
private class SynthAggScan(lo: Long, hi: Long, agg: Aggregation)
    extends Scan with Batch {
  private val n = math.max(0L, hi - lo)
  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.toIndexedSeq.zipWithIndex.map {
      case (_: CountStar | _: Count, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth-agg [$lo,$hi) ${agg.aggregateExpressions.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory = {
    val values: IndexedSeq[Any] = agg.aggregateExpressions.toIndexedSeq.map {
      case _: CountStar => n
      case _: Count => n
      case _: Min => if (n > 0) lo else null
      case _: Max => if (n > 0) hi - 1 else null
      case other => throw new IllegalStateException(s"unsupported pushed agg $other")
    }
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean = { val r = !done; done = true; r }
          override def get(): InternalRow = InternalRow.fromSeq(values)
          override def close(): Unit = ()
        }
    }
  }
}

private case class SynthPartition(lo: Long, hi: Long) extends InputPartition

private class SynthScan(lo: Long, hi: Long, partitions: Int,
    required: StructType, pushed: Array[Filter], descending: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required

  /** RUNTIME filtering (`SupportsRuntimeFiltering`): a DPP-style filter
    * derived from a selective join build side arrives AT EXECUTION as
    * In/EqualTo on doc_id, and narrows the generated range before input
    * partitions are re-planned — best-effort by contract (the join still
    * filters rows), so collapsing the In-set to its [min, max] envelope
    * is sound and keeps generation range-shaped.
    */
  private var rlo = Long.MinValue
  private var rhi = Long.MaxValue // exclusive
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("doc_id", vs) if vs.nonEmpty =>
      val ids = vs.collect { case v: java.lang.Long => v.longValue() }
      if (ids.length == vs.length) { rlo = ids.min; rhi = ids.max + 1 }
    case EqualTo("doc_id", v: java.lang.Long) => rlo = v; rhi = v + 1
    case _ => // unsupported runtime filter: keep the full range
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth [$lo,$hi) pushed=${pushed.mkString(",")} cols=${required.fieldNames.mkString(",")}"

  /** EXACT statistics (`SupportsReportStatistics`): the generator knows
    * its row count after pushdown, so the optimizer sizes joins against
    * this source correctly — a narrowed slice broadcast-joins instead of
    * shuffling (spec-asserted).
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    private val width = required.fieldNames.map {
      case "doc_id" => 8L
      case "lang" => 3L
      case "source" => 6L
      case "text" => 240L
    }.sum.max(1L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * width)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val elo = math.max(lo, rlo)
    val ehi = math.min(hi, rhi)
    val n = math.max(0L, ehi - elo)
    if (n == 0) return Array.empty
    val p = math.min(partitions.toLong, n).toInt
    Array.tabulate(p) { i =>
      SynthPartition(elo + n * i / p, elo + n * (i + 1) / p)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // locals only: the anonymous factory must not capture the Scan
    val fields = required.fieldNames
    val desc = descending
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val SynthPartition(plo, phi) = partition.asInstanceOf[SynthPartition]
        new PartitionReader[InternalRow] {
          private var id = if (desc) phi else plo - 1
          override def next(): Boolean =
            if (desc) { id -= 1; id >= plo } else { id += 1; id < phi }
          override def get(): InternalRow = {
            SynthSource.generated.increment()
            InternalRow.fromSeq(fields.toIndexedSeq.map {
              case "doc_id" => id
              case "lang" => UTF8String.fromString(SynthSource.langFor(id))
              case "source" => UTF8String.fromString(SynthSource.sourceFor(id))
              case "text" => UTF8String.fromString(SynthSource.textFor(id))
            })
          }
          override def close(): Unit = ()
        }
      }
    }
  }
}
