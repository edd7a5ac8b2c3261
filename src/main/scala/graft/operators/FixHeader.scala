package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.normColname

/** Header-row detection and promotion — the Spark analog of the reference's
  * `_fix_header` (reference etl/transform.py:76-118): messy spreadsheet-like
  * extracts often carry the real column names in one of the first rows,
  * with placeholder/"unnamed" columns from the reader.
  *
  * Scope: per-resource frames (one spreadsheet/CSV extract), mirroring the
  * reference's per-sheet pandas use. Detection reads only `lookahead` rows
  * driver-side; the promotion itself is a distributed filter+rename.
  * Requires a total ordering column when the input spans multiple files —
  * for single-file resources the implicit read order used here matches the
  * reference's semantics.
  */
object FixHeader {

  private def isUnnamed(c: String): Boolean =
    c.isEmpty || c.toLowerCase.startsWith("unnamed") || c.matches("_c\\d+")

  /** Scores a candidate header row exactly like the reference:
    * non-empty strings ×2 + non-nulls − numeric-likes ×0.5. The
    * cell-level form is shared with the xlsx connector's per-sheet
    * header detection (sources/XlsxSource.scala).
    */
  private[graft] def scoreCells(vals: Seq[String]): Double = {
    var strNonEmpty = 0; var nonNull = 0; var numericLike = 0
    vals.foreach { v0 =>
      if (v0 != null) {
        nonNull += 1
        val v = v0.trim
        if (v.nonEmpty) {
          if (scala.util.Try(v.toDouble).isSuccess) numericLike += 1
          else strNonEmpty += 1
        }
      }
    }
    strNonEmpty * 2.0 + nonNull - numericLike * 0.5
  }

  private def score(r: Row): Double =
    scoreCells((0 until r.length).map(i =>
      if (r.isNullAt(i)) null else r.get(i).toString))

  def apply(df: DataFrame, lookahead: Int = 5): DataFrame = {
    if (df.isEmpty) return df
    val propUnnamed =
      df.columns.count(isUnnamed).toDouble / math.max(df.columns.length, 1)

    val withId = df.withColumn("__rid", monotonically_increasing_id())
    val head = withId.orderBy(col("__rid")).limit(lookahead).collect()
    val scores = head.map(r => score(r))
    val bestIdx = scores.indices.maxBy(i => scores(i))

    var out =
      if (propUnnamed >= 0.5 || bestIdx > 0) {
        val hdrRow = head(bestIdx)
        val hdrRid = hdrRow.getAs[Long]("__rid")
        val dataCols = df.columns
        val newNames = dataCols.zipWithIndex.map { case (c, i) =>
          val v = Option(hdrRow.get(hdrRow.fieldIndex(c))).map(_.toString.trim).getOrElse("")
          if (v.nonEmpty) normColname(v) else s"col_${i + 1}"
        }
        withId.filter(col("__rid") > hdrRid).drop("__rid")
          .toDF(newNames.toIndexedSeq: _*)
      } else withId.drop("__rid")

    // Drop ALL entirely-null columns (reference transform.py:104-108 drops
    // them unconditionally, named or not) in one agg pass.
    val counts = out
      .select(out.columns.map(c => count(col(c)).as(c)).toIndexedSeq: _*).head()
    val drop = out.columns.zipWithIndex.collect {
      case (c, i) if counts.getLong(i) == 0L => c
    }
    out = out.drop(drop.toIndexedSeq: _*)
    Transform.normalizeColumnNames(out)
  }

  /** String-typed view of a frame (spreadsheet extracts arrive untyped). */
  def asStrings(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).cast(StringType).as(c)).toIndexedSeq: _*)
}
