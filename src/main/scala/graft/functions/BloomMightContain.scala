package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd probe of a broadcast `util.sketch.BloomFilter` over a
  * string column — the native replacement for the Scala-UDF probe in
  * `TextDedup.bloomGate` (r9 ADVICE: Spark ships no public Column
  * function for broadcast-Bloom probes, and the internal
  * `BloomFilterMightContain` pairs only with `BloomFilterAggregate`'s
  * xxhash64 longs + its conf-capped bit budget, not with the uncapped
  * `stat.bloomFilter` build this gate uses). The probe hashes the
  * UTF8String's bytes directly (`mightContainBinary` — the exact bytes
  * `putString` hashed on the build side, minus the String round-trip),
  * and NULL probes return false (a null key is never "in the corpus"),
  * so the expression is non-nullable and the filter's whole-stage
  * codegen span stays unbroken.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null &&
      bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = !${childGen.isNull} &&
          ((org.apache.spark.util.sketch.BloomFilter) $bc.value())
            .mightContainBinary(${childGen.value}.getBytes());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
