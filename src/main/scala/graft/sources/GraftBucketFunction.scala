package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The lake's shard function exposed as a Spark V2 catalog function, so the
  * `bucket(n, cols…)` transform a [[GraftTable]] reports is RESOLVABLE: with
  * `spark.sql.sources.v2.bucketing.enabled`, Catalyst turns the reported
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * into a `TransformExpression` over this function, and a join of two graft
  * lakes bucketed the same way plans WITHOUT a shuffle (storage-partitioned
  * join — the V2 analogue of Hive bucketed joins).
  *
  * The hash MUST equal the write path's (`CdcApply.bucketOf` /
  * `LakeTable.bucketOfValues`): Spark's own `XxHash64` (seed 42, the
  * `functions.xxhash64` default) over the bucket columns, floor-mod the
  * bucket count. `produceResult` is exercised when Spark shuffles a
  * NON-graft join side into graft's partitioning
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`), so a wrong hash here
  * would silently mis-join — BucketFunctionSpec pins equality against
  * `LakeTable.bucketOfValues` across the key types the engine stores.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, keyCols…) — xxhash64(cols, seed 42) floor-mod " +
    "numBuckets; the graft lake shard function (write path: CdcApply.bucketOf)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket(numBuckets, keyCols…) takes at least 2 arguments, got $inputType")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket's first argument is the int bucket count, got $inputType")
    new GraftBoundBucket(inputType)
  }
}

final class GraftBoundBucket(inputType: StructType)
    extends ScalarFunction[Integer] with Serializable {
  override def inputTypes(): Array[DataType] = inputType.fields.map(_.dataType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  /** Join-compatibility identity: two scans report co-partitioned only when
    * their bound functions share this name (and the bucket count). */
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false

  // the hash expression reads the key columns (ordinals 1..n of the
  // argument row; ordinal 0 is the bucket count)
  @transient private lazy val hash: Expression =
    XxHash64((1 until inputType.fields.length).map(i =>
      BoundReference(i, inputType.fields(i).dataType, nullable = true)), 42L)

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val h = hash.eval(input).asInstanceOf[Long]
    Int.box((((h % n) + n) % n).toInt)
  }
}
