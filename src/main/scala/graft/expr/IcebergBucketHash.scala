package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg `bucket[N]` hash (iceberg.apache.org/spec Appendix B):
  * 32-bit Murmur3 (x86 variant, seed 0) over the type-specific byte
  * serialization — int/long/date/timestamp widen to a LITTLE-endian
  * 64-bit long, strings hash their UTF-8 bytes, binary hashes raw bytes.
  * The bucket id is `(hash & Int.MaxValue) % N` (NOT `pmod(hash, N)` —
  * the AND-then-mod is how the spec defines it and the two differ for
  * negative hashes unless N divides 2^31).
  *
  * Spark's own `hash()`/`bucketBy` use Murmur3 with seed 42 and a
  * different long serialization, so they are NOT layout-compatible with
  * Iceberg bucket partitioning — hence this native expression (codegen'd;
  * evaluated once per row in the write stage).
  */
object IcebergBucketImpl {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    var h1 = 0 // seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val i4 = i * 4
      var k1 = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** int/long/date/timestamp serialization: 64-bit little-endian. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b)
  }

  def hashUTF8(s: UTF8String): Int = hashBytes(s.getBytes)
}

/** `iceberg_bucket_hash(c)` — the raw 32-bit hash; bucket id is
  * `(hash & Int.MaxValue) % N` (see [[graft.io.IcebergTransforms]]). */
case class IcebergBucketHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket_hash does not support ${dt.simpleString}")
    }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType | TimestampType | TimestampNTZType =>
      IcebergBucketImpl.hashLong(v.asInstanceOf[Long])
    case IntegerType | DateType =>
      IcebergBucketImpl.hashLong(v.asInstanceOf[Int].toLong)
    case ShortType => IcebergBucketImpl.hashLong(v.asInstanceOf[Short].toLong)
    case ByteType => IcebergBucketImpl.hashLong(v.asInstanceOf[Byte].toLong)
    case StringType => IcebergBucketImpl.hashUTF8(v.asInstanceOf[UTF8String])
    case BinaryType => IcebergBucketImpl.hashBytes(v.asInstanceOf[Array[Byte]])
    case dt => throw new IllegalStateException(s"unsupported $dt")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = IcebergBucketImpl.getClass.getName.stripSuffix("$")
    val call = child.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        (c: String) => s"$impl.hashLong($c)"
      case IntegerType | DateType | ShortType | ByteType =>
        (c: String) => s"$impl.hashLong((long) $c)"
      case StringType => (c: String) => s"$impl.hashUTF8($c)"
      case BinaryType => (c: String) => s"$impl.hashBytes($c)"
      case dt => throw new IllegalStateException(s"unsupported $dt")
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object IcebergBucketHash {
  /** Register `iceberg_bucket_hash` so transform columns can be built via
    * `call_function` (the same pattern as `athena_bucket_hash`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "iceberg_bucket_hash",
      exprs => IcebergBucketHash(exprs.head), "built-in")
}
