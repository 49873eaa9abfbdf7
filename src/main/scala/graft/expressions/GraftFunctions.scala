package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * Registration of the native expressions as SQL functions, two ways:
 *
 *  - `GraftFunctions.register(spark)` — runtime registration on a live
 *    session (used by tests and the CLI);
 *  - `GraftExtensions` — `SparkSessionExtensions` injector for
 *    `--conf spark.sql.extensions=graft.expressions.GraftExtensions` on
 *    spark-submit, so SQL users get the functions without any code.
 *
 * Usage: `graft_minhash64(text, k, numHashes)` → array<bigint>,
 *        `graft_cosine_f32(vecA, vecB)` → double.
 */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash64"),
      new ExpressionInfo(classOf[XxMinHash64].getName, "graft_minhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_minhash64(text, k, numHashes)")
        XxMinHash64(args.head, intArg(args(1), "k"), intArg(args(2), "numHashes"))
      }),
    (FunctionIdentifier("graft_cosine_f32"),
      new ExpressionInfo(classOf[FloatVectorCosine].getName, "graft_cosine_f32"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine_f32(a, b)")
        FloatVectorCosine(args.head, args(1))
      }),
    (FunctionIdentifier("graft_rhpsig64"),
      new ExpressionInfo(classOf[RhpSignature64].getName, "graft_rhpsig64"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_rhpsig64(vec, planes, seed)")
        val seed = args(2) match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"seed must be an integer literal, got $other")
        }
        RhpSignature64(args.head, intArg(args(1), "planes"), seed)
      }),
    (FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[BitInterleave64].getName, "graft_zvalue"),
      (args: Seq[Expression]) => {
        require(args.length >= 2 && args.length <= 4,
          "graft_zvalue(lane0, lane1[, lane2[, lane3]]) — bigint lanes in [0, 65535]")
        BitInterleave64(args)
      })
  )

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
