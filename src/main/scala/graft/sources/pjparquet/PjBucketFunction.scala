package graft.sources.pjparquet

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DataTypes, IntegerType, LongType, StructType}

import graft.core.PJException

/** The `bucket(n, col)` V2 catalog function behind the declared bucket
  * partition transform (Iceberg's `bucket` parity, with Spark's own hash):
  * `bucket(n, v) = pmod(hash(v), n)` where `hash` is Murmur3 with Spark's
  * fixed seed 42 — BIT-IDENTICAL to the SQL expression
  * `pmod(hash(col), n)` the write-side generated partition column
  * computes, so the value Spark's storage-partitioned join machinery
  * evaluates through this function always matches the directory a row was
  * physically routed to. Registered by [[PjCatalog]] (a `FunctionCatalog`)
  * so `V2ExpressionUtils` can bind the scan-reported
  * `KeyGroupedPartitioning(bucket(n, col))` into a `TransformExpression`;
  * two pjparquet scans bind to the same `canonicalName`, which is exactly
  * the SPJ compatibility check.
  */
object PjBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, col): pmod(murmur3_hash(col, seed=42), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2)
      throw new PJException(
        s"pjparquet: bucket expects (numBuckets INT, col), got $inputType")
    if (inputType.fields(0).dataType != IntegerType)
      throw new PJException(
        "pjparquet: bucket's first argument must be an INT literal, got " +
          inputType.fields(0).dataType.simpleString)
    new PjBucketBound(inputType.fields(1).dataType)
  }
}

final class PjBucketBound(valueType: DataType)
    extends ScalarFunction[java.lang.Long] {

  override def inputTypes(): Array[DataType] = Array(DataTypes.IntegerType, valueType)

  override def resultType(): DataType = LongType

  override def name(): String = "bucket"

  override def canonicalName(): String = s"pjparquet.bucket(${valueType.catalogString})"

  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): java.lang.Long = {
    val n = input.getInt(0)
    val v = input.get(1, valueType)
    java.lang.Long.valueOf(PjBucketBound.bucketOf(v, valueType, n))
  }
}

object PjBucketBound {
  /** `pmod(hash(v), n)` — the SQL `hash` is Murmur3 seed 42 truncated to
    * int, so the int-domain pmod here reproduces it exactly.
    */
  def bucketOf(v: Any, dt: DataType, n: Int): Long = {
    val h = Murmur3HashFunction.hash(v, dt, 42L).toInt
    ((h % n + n) % n).toLong
  }
}
