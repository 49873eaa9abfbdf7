package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("d").select(c).head().get(0)

  test("tokens / counts") {
    val df = Seq("  The quick  Brown fox ").toDF("t")
    assert(df.select(tokenCount(col("t"))).head().getInt(0) == 4)
    assert(df.select(tokens(col("t"))).head().getSeq[String](0) ==
      Seq("the", "quick", "brown", "fox"))
  }

  test("subword tokenization splits letter runs, digit runs, marks") {
    val df = Seq("ab12,cd!").toDF("t")
    // ab | 12 | , | cd | !
    assert(df.select(subwordTokenCount(col("t"))).head().getInt(0) == 5)
  }

  test("normalization strips punctuation and collapses whitespace") {
    val df = Seq("Hello,   World! 42").toDF("t")
    assert(df.select(normalized(col("t"))).head().getString(0) == "hello world 42")
  }

  test("slugify matches reference slug behavior (Slug.scala:34-99 shape)") {
    val df = Seq("  Cours de Test -- v2! ").toDF("t")
    assert(df.select(slugify(col("t"))).head().getString(0) == "cours-de-test-v2")
  }

  test("char and word shingles") {
    val df = Seq("abcdef").toDF("t")
    assert(df.select(charShingles(col("t"), 4)).head().getSeq[String](0) ==
      Seq("abcd", "bcde", "cdef"))
    val dfw = Seq("a b c d").toDF("t")
    assert(dfw.select(wordShingles(col("t"), 2)).head().getSeq[String](0) ==
      Seq("a b", "b c", "c d"))
  }

  test("language id picks dominant stopword lexicon deterministically") {
    val df = Seq(
      ("the cat is in the house and it is big", "en"),
      ("le chat est dans la maison et il est grand", "fr"),
      ("el gato es grande y la casa es bonita", "es"),
      ("der hund und die katze sind zu haus", "de"),
      ("zzz qqq xxx", "und")).toDF("t", "want")
    val got = df.select(col("want"), langId(col("t")).as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("rolling hash matches a sequential Scala reference fold") {
    val s = "hello world 42"
    val expected = s.foldLeft(0L)((acc, ch) =>
      java.lang.Math.floorMod(acc * 31L + ch.toLong, 2147483647L))
    val got = Seq(s).toDF("t").select(rollingHash(col("t"))).head().getLong(0)
    assert(got == expected)
  }

  test("quality score is bounded and favors clean english text") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and it is a fine day for running in the park",
      "@@@ ### !!! %%% ^^^").toDF("t")
    val scores = df.select(qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(scores.forall(x => x >= 0.0 && x <= 1.0))
    assert(scores(0) > scores(1))
  }
}
