package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NativeExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def registered(): Unit = GraftFunctions.register(spark)

  test("graft_minhash64 matches a sequential Scala reference") {
    registered()
    import spark.implicits._
    val s = "the quick brown fox"
    val got = Seq(s).toDF("t")
      .select(call_function("graft_minhash64", col("t"), lit(4), lit(3)))
      .head().getSeq[Long](0)
    // reference: xxhash64(seed=j) over byte 4-shingles
    val bytes = s.getBytes("UTF-8")
    val want = (0 until 3).map { j =>
      (0 to bytes.length - 4).map { i =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, 4, j)
      }.min
    }
    assert(got == want)
  }

  test("graft_minhash64: identical strings share signatures, null-safe") {
    registered()
    import spark.implicits._
    val df = Seq(
      (1L, "spark native cdc merge engine"),
      (2L, "spark native cdc merge engine"),
      (3L, "completely different words entirely"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val sigs = df.select(col("id"),
        call_function("graft_minhash64", col("t"), lit(5), lit(8)).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(4L) == null)
    // short string (< k): all minima stay at sentinel
    val short = Seq("ab").toDF("t")
      .select(call_function("graft_minhash64", col("t"), lit(5), lit(2)))
      .head().getSeq[Long](0)
    assert(short == Seq(Long.MaxValue, Long.MaxValue))
  }

  test("graft_cosine_f32 equals the declarative zip_with/aggregate cosine") {
    registered()
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(0.5f, -0.25f, 0.125f), Array(0.5f, -0.25f, 0.125f))
    ).toDF("a", "b")
    val declarative = graft.operators.SimilarityOps.cosine(col("a"), col("b"))
    val rows = df.select(
        round(call_function("graft_cosine_f32", col("a"), col("b")), 6).as("nat"),
        declarative.as("dec"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("functions also work through plain SQL (extension-style registration)") {
    registered()
    import spark.implicits._
    Seq(("hello world hello")).toDF("t").createOrReplaceTempView("nat_t")
    val n = spark.sql(
      "SELECT size(graft_minhash64(t, 4, 6)) AS n FROM nat_t").head().getInt(0)
    assert(n == 6)
  }

  test("graft_zvalue SQL function: interleave + null safety + arity check") {
    registered()
    import spark.implicits._
    val got = Seq((65535L, 0L), (0L, 65535L), (1L, 1L))
      .toDF("a", "b")
      .selectExpr("graft_zvalue(a, b) AS z").as[Long].collect().toSeq
    assert(got == Seq(0x55555555L, 0xAAAAAAAAL, 3L))
    val n = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .selectExpr("graft_zvalue(a, b) AS z").collect().head
    assert(n.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT graft_zvalue(1L)").collect()
    }
  }
}
