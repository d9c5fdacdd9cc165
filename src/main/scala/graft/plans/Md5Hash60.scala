package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression for the portable 60-bit md5 hash
  * ([[graft.functions.PortableHash.md5Hash60]]): the first 60 bits of the
  * md5 digest after the top nibble — bit-identical to
  * `conv(substring(md5(c), 2, 15), 16, 10)` and to DuckDB's
  * `('0x' || substring(md5(s), 2, 15))::BIGINT`, but computed directly from
  * the digest bytes.
  *
  * Why (SURVEY.md §7.3 preference order (b)): the built-in formulation
  * materializes a 32-char hex UTF8String per row, substrings it, and
  * re-parses the result as base-16 — three allocations and a radix parse
  * per shingle/token, on the hottest path of the portable dedup family
  * (minhash shingles, simhash tokens are O(corpus tokens) rows). This
  * expression reuses a thread-local MessageDigest and masks the digest
  * bytes straight into a long, inside whole-stage codegen.
  */
case class Md5Hash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5h60"

  protected override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Hash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Hex chars 2..16 of the digest as a long: the low nibble of byte 0
    * followed by bytes 1..7 — 60 bits, always positive in a signed long. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0x0FL) << 56) |
      ((d(1) & 0xFFL) << 48) | ((d(2) & 0xFFL) << 40) |
      ((d(3) & 0xFFL) << 32) | ((d(4) & 0xFFL) << 24) |
      ((d(5) & 0xFFL) << 16) | ((d(6) & 0xFFL) << 8) |
      (d(7) & 0xFFL)
  }
}
