package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The 8 big-endian unsigned 32-bit lanes of sha256(input) as
  * array<long> — bit-identical to the portable-hash formula
  * `conv(substring(sha2(s, 256), 1 + 8*j, 8), 16, 10)::long` for
  * j = 0..7 (hex chars 8j+1..8j+8 ARE bytes 4j..4j+3), without the hex
  * round-trip that formula pays per lane: sha2 hex-encodes the digest
  * to a 64-char string, then every lane substrings it and conv()
  * re-parses the hex back to a long — 9 string allocations and 8
  * base-16 parses per digest, all in the per-shingle-occurrence hot
  * path of the portable MinHash family. Here the digest bytes are read
  * directly. Oracle impact: none — the VALUES are unchanged
  * (Sha256LanesSpec pins lane-by-lane equality with the hex formula).
  */
case class Sha256Lanes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Sha256Lanes.lanes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sha256Lanes.lanes($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha256Lanes =
    copy(child = newChild)
}

object Sha256Lanes {

  // MessageDigest.getInstance walks the provider list per call; one
  // digest per thread, reset between uses, is the standard amortization
  // (same values — SHA-256 is stateless across reset()).
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  private def digest(s: UTF8String): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(s.getBytes)
  }

  def lanes(s: UTF8String): ArrayData = {
    val d = digest(s)
    val out = new Array[Long](8)
    var j = 0
    while (j < 8) {
      out(j) = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
        ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  def lane0(s: UTF8String): Long = {
    val d = digest(s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** Lane 0 alone ([[Sha256Lanes]] for the single-lane call sites:
  * `conv(substring(sha2(s, 256), 1, 8), 16, 10)::long`) — returns the
  * long directly, no array allocation.
  */
case class Sha256Lane(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Sha256Lanes.lane0(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sha256Lanes.lane0($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha256Lane =
    copy(child = newChild)
}
