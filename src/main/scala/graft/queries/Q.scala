package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator/query: the Spark implementation plus (when
  * SQL-expressible) a semantically identical DuckDB oracle. Keeping both
  * sides adjacent is what keeps aliases/null-handling/rounding in sync —
  * the driver hash-compares values column-by-column.
  *
  * Float discipline: additive aggregates go through `decimal` casts on BOTH
  * sides (exact, order-independent) and are cast back to double at the end,
  * so shuffle/partial-agg order can never flip a bit.
  */
case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Decimal-exact sum rendered back as double — Spark side helper. */
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** DuckDB-side normalized token list for a `text` column — the oracle
    * twin of SketchHash.tokenize / normText-plus-split. THE single
    * canonical spelling: the formula appears in several oracles, and a
    * tokenization tweak must reach all of them at once.
    */
  val duckToks: String =
    raw"string_split(regexp_replace(lower(strip_accents(trim(text))), '\s+', ' ', 'g'), ' ')"
}
