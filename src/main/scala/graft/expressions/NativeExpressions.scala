package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the production (non-oracle) hash paths —
 * single-pass, allocation-free inner loops with whole-stage-codegen via a
 * static helper call (no UDF serialization, no per-row closure dispatch):
 *
 *  - [[XxMinHash64]]: MinHash signature over byte-level k-shingles of a
 *    string in ONE pass — no shingle array materialization at all, unlike
 *    the declarative `transform(sequence(...))` formulation which allocates
 *    O(len) UTF8Strings per row per hash function.
 *  - [[FloatVectorCosine]]: cosine similarity of two float vectors in one
 *    fused loop (dot + both norms), reading ArrayData directly — the
 *    `zip_with`+`aggregate` formulation allocates an intermediate array and
 *    evaluates three separate folds.
 *
 * Registered as SQL functions `graft_minhash64(text, k, n)` and
 * `graft_cosine_f32(a, b)` by [[GraftFunctions.register]] /
 * [[GraftExtensions]] (for `spark.sql.extensions` on spark-submit).
 */
object NativeKernels {

  /** MinHash over byte-level k-shingles; hash family = xxhash64 seeded by
    * the hash index. Returns UnsafeArrayData of n minima (Long.MaxValue for
    * strings shorter than k). */
  def minhash64(s: UTF8String, k: Int, n: Int): ArrayData = {
    val bytes = s.getBytes // may copy; single allocation per row
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val limit = bytes.length - k
    var i = 0
    while (i <= limit) {
      var j = 0
      while (j < n) {
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, k, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Fused cosine: dot(a,b) / (|a||b|) in double precision, index order. */
  def cosineF32(a: ArrayData, b: ArrayData): Double = {
    val len = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < len) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }
}

case class XxMinHash64(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(k > 0 && numHashes > 0, "k and numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash64"

  override protected def nullSafeEval(input: Any): Any =
    NativeKernels.minhash64(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NativeKernels.minhash64($c, $k, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): XxMinHash64 =
    copy(child = newChild)
}

case class FloatVectorCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeKernels.cosineF32(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.NativeKernels.cosineF32($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorCosine =
    copy(left = newLeft, right = newRight)
}
