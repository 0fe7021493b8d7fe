package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native membership test for [[graft.operators.BloomJoin]]'s word-array
  * bloom filter: all `numHashes` double-hashed positions set.
  *
  * Why an Expression and not `numHashes` AND'ed SQL conjuncts: the filter
  * array arrives as a SCALAR SUBQUERY, and each textual reference to it in
  * a conjunct is a separate subquery instance in the plan (5 conjuncts ×
  * filter+scan hosting = 10 subquery sites at the default numHashes). One
  * expression = one subquery reference, and the probe loop runs fused in
  * whole-stage codegen with an early exit on the first cleared bit —
  * mirroring Spark's own BloomFilterMightContain shape, for our
  * cross-engine-checkable filter layout.
  *
  * Children: (bloom array<bigint>, h1 long, h2 long, numBits long,
  * numHashes int); h1/h2 must be pre-modded into [0, numBits) so the
  * double-hash arithmetic stays far below Long overflow.
  */
case class BloomMightContain(children: Seq[Expression]) extends Expression {
  require(children.length == 5,
    s"graft_bloom_check expects (bloom, h1, h2, numBits, numHashes), got ${children.length} args")

  private def bloom = children(0)
  private def h1 = children(1)
  private def h2 = children(2)
  private def numBits = children(3)
  private def numHashes = children(4)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (bloom.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && h1.dataType == LongType && h2.dataType == LongType &&
      numBits.dataType == LongType && numHashes.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<bigint>, bigint, bigint, bigint, int), " +
        s"got ${children.map(_.dataType).mkString(", ")}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_bloom_check"

  override def eval(input: InternalRow): Any = {
    val b = bloom.eval(input)
    val v1 = h1.eval(input)
    val v2 = h2.eval(input)
    val nb = numBits.eval(input)
    val nh = numHashes.eval(input)
    if (b == null || v1 == null || v2 == null || nb == null || nh == null) null
    else {
      val arr = b.asInstanceOf[ArrayData]
      val hh1 = v1.asInstanceOf[Long]
      val hh2 = v2.asInstanceOf[Long]
      val bits = nb.asInstanceOf[Long]
      val n = nh.asInstanceOf[Int]
      var i = 0
      var ok = true
      while (ok && i < n) {
        val pos = (hh1 + i.toLong * hh2) % bits
        if (((arr.getLong((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 0L) ok = false
        i += 1
      }
      ok
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = bloom.genCode(ctx)
    val c1 = h1.genCode(ctx)
    val c2 = h2.genCode(ctx)
    val nb = numBits.genCode(ctx)
    val nh = numHashes.genCode(ctx)
    val i = ctx.freshName("i")
    val pos = ctx.freshName("pos")
    ev.copy(code =
      code"""
        ${b.code}
        ${c1.code}
        ${c2.code}
        ${nb.code}
        ${nh.code}
        boolean ${ev.isNull} = ${b.isNull} || ${c1.isNull} || ${c2.isNull} ||
          ${nb.isNull} || ${nh.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = true;
          for (int $i = 0; ${ev.value} && $i < ${nh.value}; $i++) {
            long $pos = (${c1.value} + (long) $i * ${c2.value}) % ${nb.value};
            if (((${b.value}.getLong((int) ($pos >>> 6)) >>> (int) ($pos & 63L)) & 1L) == 0L) {
              ${ev.value} = false;
            }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomMightContain =
    copy(children = newChildren)
}

/** Registration, mirroring [[VectorExpressions]]. */
object BloomExpressions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_check", exprs => BloomMightContain(exprs), "built-in")
  }

  def mightContain(spark: SparkSession, bloom: Column, h1: Column, h2: Column,
      numBits: Long, numHashes: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_bloom_check",
      bloom, h1, h2,
      org.apache.spark.sql.functions.lit(numBits),
      org.apache.spark.sql.functions.lit(numHashes))
  }
}
