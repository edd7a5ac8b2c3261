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
  * nfc_normalize.
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
    "nfc_normalize" -> { exprs => NfcNormalize(exprs.head) })

  /** Runtime registration into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
}
