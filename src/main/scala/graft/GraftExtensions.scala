package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL-function surface of the graft engine.
  *
  * Two registration paths:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (cluster-wide)
  *  - runtime: `GraftExtensions.register(spark)` (per-session, used in tests)
  *
  * Exposes the custom Catalyst expressions to `spark.sql(...)` users:
  * strip_accents, uuid5, shingles, minhash_sig, simhash, vec_dot,
  * nfc_normalize, tokens, norm_token_count, cdc_chunks, pair_combos,
  * substr_windows —
  * and the custom aggregates space_saving, top_k_pairs, vec_min (the
  * analyzer wraps a bare AggregateFunction from a registry builder into
  * its AggregateExpression, so they work in GROUP BY queries).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // Whole-operator extension: the native as-of join planner strategy.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def intLit(e: Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        "graft SQL function: this argument must be a literal integer")
    e.eval(null) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"graft SQL function: expected an integer literal, got $other")
    }
  }

  private def boolLit(e: Expression): Boolean = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        "graft SQL function: this argument must be a literal boolean")
    e.eval(null) match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"graft SQL function: expected a boolean literal, got $other")
    }
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "strip_accents" -> { exprs => StripAccents(exprs.head) },
    "uuid5" -> { exprs => UuidV5(exprs(0), exprs(1)) },
    // shingles(text, n, word): word=true → word n-grams, else char n-grams
    "shingles" -> { exprs =>
      Shingles(exprs(0), intLit(exprs(1)),
        word = exprs.length < 3 || boolLit(exprs(2)))
    },
    "minhash_sig" -> { exprs => MinhashSig(exprs(0), intLit(exprs(1))) },
    "simhash" -> { exprs => SimHash(exprs.head) },
    "vec_dot" -> { exprs => VecDot(exprs(0), exprs(1)) },
    "nfc_normalize" -> { exprs => NfcNormalize(exprs.head) },
    // normalized whitespace tokenizer + its count twin
    "tokens" -> { exprs => Tokens(exprs.head) },
    "norm_token_count" -> { exprs => NormTokenCount(exprs.head) },
    // cdc_chunks(text[, window, mask_bits, min_len, max_len])
    "cdc_chunks" -> { exprs =>
      CdcChunks(exprs.head,
        window = if (exprs.length > 1) intLit(exprs(1)) else 16,
        maskBits = if (exprs.length > 2) intLit(exprs(2)) else 5,
        minLen = if (exprs.length > 3) intLit(exprs(3)) else 32,
        maxLen = if (exprs.length > 4) intLit(exprs(4)) else 128)
    },
    // pair_combos(array<struct<id,sz>>) → exploded candidate pairs
    "pair_combos" -> { exprs => PairCombos(exprs.head) },
    // substr_windows(text, n): ALL n-token windows in order (positions
    // via posexplode — the ExactSubstr dedup unit)
    "substr_windows" -> { exprs => SubstrWindows(exprs(0), intLit(exprs(1))) },
    // aggregates — the analyzer wraps these into AggregateExpressions
    "space_saving" -> { exprs => SpaceSavingAgg(exprs(0), intLit(exprs(1))) },
    "count_min" -> { exprs =>
      CountMinAgg(exprs(0), intLit(exprs(1)), intLit(exprs(2))) },
    "top_k_pairs" -> { exprs => TopKAgg(exprs(0), exprs(1), intLit(exprs(2))) },
    "vec_min" -> { exprs => VecMinAgg(exprs(0), intLit(exprs(1))) })

  /** Runtime registration into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
}
