package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent/diacritic stripping as a native Catalyst expression (codegen'd).
  *
  * Mirrors the reference's `_strip_accents` (reference etl/transform.py:49-51:
  * NFKD-normalize then drop combining marks) and DuckDB's `strip_accents`,
  * so transform output can be oracle-checked. ASCII inputs short-circuit
  * without normalization, which keeps the common case allocation-free.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  def strip(s: UTF8String): UTF8String = {
    // ASCII fast path: bytes == chars means no multi-byte code points.
    if (s.numBytes == s.numChars) return s
    val norm = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Unicode NFC normalization as a native Catalyst expression (codegen'd).
  *
  * Composed text (NFC) is the canonical storage form a curation pipeline
  * wants before hashing/dedup — decomposed lookalikes ("e" + U+0301 vs
  * "é") otherwise defeat exact dedup and fingerprinting. Matches DuckDB's
  * `nfc_normalize` (both implement Unicode canonical composition), so
  * NFC-cleaned output is oracle-checkable. ASCII inputs short-circuit:
  * `Normalizer.isNormalized` is O(n) with no allocation for the common
  * case.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: single-byte code points are all NFC already.
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Deterministic UUIDv5 (RFC 4122 name-based, SHA-1) as a Catalyst expression.
  *
  * Matches the reference's surrogate-id generation
  * (reference etl/transform.py:367-370: `uuid.uuid5(uuid.uuid5(NAMESPACE_URL,
  * namespace), seed)`). `namespace` is the URL string; the double-derivation
  * is performed here so outputs are byte-identical with the reference scheme.
  */
case class UuidV5(namespace: Expression, child: Expression)
    extends BinaryExpression {

  override def left: Expression = namespace
  override def right: Expression = child
  override def dataType: DataType = StringType

  override def nullSafeEval(ns: Any, name: Any): Any =
    UuidV5.uuid5(ns.asInstanceOf[UTF8String], name.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, c) => s"graft.functions.UuidV5.uuid5($n, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UuidV5 =
    copy(namespace = newLeft, child = newRight)
}

object UuidV5 {
  private val NamespaceUrl: java.util.UUID =
    java.util.UUID.fromString("6ba7b811-9dad-11d1-80b4-00c04fd430c8")

  private def uuidBytes(u: java.util.UUID): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits)
    bb.putLong(u.getLeastSignificantBits)
    bb.array()
  }

  private def v5(ns: java.util.UUID, name: Array[Byte]): java.util.UUID = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(uuidBytes(ns))
    md.update(name)
    val d = md.digest()
    d(6) = ((d(6) & 0x0f) | 0x50).toByte // version 5
    d(8) = ((d(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val bb = java.nio.ByteBuffer.wrap(d, 0, 16)
    new java.util.UUID(bb.getLong, bb.getLong)
  }

  /** Namespace-UUID cache: one entry per distinct namespace string. */
  private val nsCache = new java.util.concurrent.ConcurrentHashMap[String, java.util.UUID]()

  def uuid5(namespace: UTF8String, name: UTF8String): UTF8String = {
    val nsStr = namespace.toString
    val nsUuid = nsCache.computeIfAbsent(
      nsStr, s => v5(NamespaceUrl, s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    UTF8String.fromString(v5(nsUuid, name.getBytes).toString)
  }
}
