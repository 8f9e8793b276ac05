package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Pmod}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive/Athena-compatible bucket hash, re-derived from the published
  * algorithm in the reference (`s3/_write_dataset.py:21-73`:
  * `_get_bucket_number` / `_get_value_hash` / `_simulate_overflow`):
  *
  *   hash = 0; for each value: hash = (31 * hash + valueHash(v)) mod 2^31
  *   valueHash(int)    = v in int32 ? v : (v >> 32) ^ v, then -v-1 if < 0
  *   valueHash(string) = java-style byte hash with 31-bit unsigned overflow
  *   valueHash(bool)   = 0 | 1
  *
  * Spark's own `bucketBy` uses Murmur3 and is NOT layout-compatible with
  * Athena/Hive bucketed tables, hence this native expression. It is
  * codegen'd (no UDF boxing) so bucketed writes stay in WholeStageCodegen
  * — at 100 TB the hash is evaluated once per row in the shuffle-write
  * stage.
  *
  * Null contributes 0 (Hive semantics); the reference rejects nulls
  * outright, which a dataframe engine cannot.
  */
object AthenaHashImpl {
  final val Mask31: Long = 0x7FFFFFFFL

  def hashLong(v: Long): Long = {
    val folded =
      if (v >= Int.MinValue.toLong && v <= Int.MaxValue.toLong) v
      else (v >> 32) ^ v
    val nonneg = if (folded < 0) -folded - 1 else folded
    nonneg & Mask31 // reduce once; combine() is a mod-2^31 homomorphism
  }

  def hashBoolean(v: Boolean): Long = if (v) 1L else 0L

  def hashUTF8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xffL)) & Mask31
      i += 1
    }
    h
  }

  def combine(h: Long, vh: Long): Long = (31L * h + vh) & Mask31
}

/** `athena_bucket_hash(c1, c2, …)` — the 31-bit combined hash; bucket id
  * is `pmod(hash, numBuckets)` (see [[AthenaBucketHash.bucketExpr]]).
  */
case class AthenaBucketHash(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.filterNot(c => c.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType |
           BooleanType => true
      case _ => false
    })
    if (bad.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"athena_bucket_hash supports int/bigint/string/boolean, got: " +
          bad.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    var h = 0L
    children.foreach { c =>
      val v = c.eval(input)
      val vh: Long =
        if (v == null) 0L
        else c.dataType match {
          case LongType => AthenaHashImpl.hashLong(v.asInstanceOf[Long])
          case IntegerType => AthenaHashImpl.hashLong(v.asInstanceOf[Int].toLong)
          case ShortType => AthenaHashImpl.hashLong(v.asInstanceOf[Short].toLong)
          case ByteType => AthenaHashImpl.hashLong(v.asInstanceOf[Byte].toLong)
          case BooleanType => AthenaHashImpl.hashBoolean(v.asInstanceOf[Boolean])
          case StringType => AthenaHashImpl.hashUTF8(v.asInstanceOf[UTF8String])
          case dt => throw new IllegalStateException(s"unsupported $dt")
        }
      h = AthenaHashImpl.combine(h, vh)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val impl = AthenaHashImpl.getClass.getName.stripSuffix("$")
    val h = ctx.freshName("athenaHash")
    val childCodes = children.map { c =>
      val code = c.genCode(ctx)
      val vh = ctx.freshName("vh")
      val hashCall = c.dataType match {
        case LongType | IntegerType | ShortType | ByteType =>
          s"$impl.hashLong((long) ${code.value})"
        case BooleanType => s"$impl.hashBoolean(${code.value})"
        case StringType => s"$impl.hashUTF8(${code.value})"
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
      code"""${code.code}
            |long $vh = ${code.isNull} ? 0L : $hashCall;
            |$h = $impl.combine($h, $vh);"""
    }
    val body = childCodes.foldLeft(code"long $h = 0L;")(_ + _)
    ev.copy(
      code = code"""$body
                   |long ${ev.value} = $h;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

object AthenaBucketHash {
  /** Catalyst expression for the bucket id of `cols` under `numBuckets`. */
  def bucketExpr(numBuckets: Int, cols: Seq[Expression]): Expression =
    Pmod(AthenaBucketHash(cols), Literal(numBuckets.toLong))

  /** Register `athena_bucket_hash` in a session's function registry so it
    * is usable from SQL and `call_function`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "athena_bucket_hash", exprs => AthenaBucketHash(exprs), "built-in")
}
