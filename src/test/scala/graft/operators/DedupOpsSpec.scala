package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class DedupOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "The quick brown fox, jumps over the lazy dog near the river bank today!"), // normalized dup of 0
    (3L, "the quick brown fox jumps over the lazy cat near the river bank today"), // near dup (1 word)
    (4L, "completely different content about spark query engines and distributed merge joins"),
    (5L, "totally unrelated text describing neural network training corpus pipelines at scale")
  ).toDF("doc_id", "text")

  test("exact dedup keeps smallest id per normalized-content group") {
    val out = DedupOps.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 3L, 4L, 5L))
  }

  test("minhash+LSH finds exact and near dups, not unrelated docs") {
    val pairs = DedupOps.minhashDedupPairs(docs, "doc_id", "text",
        shingleK = 5, numHashes = 8, bands = 4, wordShingleW = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("simhash64: near-dups land within small hamming distance") {
    val h = DedupOps.withSimhash64(docs, "text", "h")
      .select("doc_id", "h")
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(1L)) == 0) // identical text
    assert(ham(h(0L), h(3L)) <= 16) // one word changed
    assert(ham(h(0L), h(4L)) > 16) // unrelated
  }

  test("simhashPairs chunk join is complete vs brute force (pigeonhole)") {
    val withH = DedupOps.withSimhash(docs, "text", 16, "h")
      .select("doc_id", "h")
    val viaChunks = DedupOps.simhashPairs(withH, "doc_id", "h",
        bits = 16, chunks = 4, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val all = withH.as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(viaChunks == brute)
  }

  test("ngram jaccard blocking finds near dups within buckets") {
    val withLang = docs.withColumn("lang", lit("en"))
    val pairs = DedupOps.ngramJaccardPairs(withLang, "doc_id", "text",
        Seq("lang"), w = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.contains((0L, 4L)))
  }

  test("df cap bounds candidate pairs on a hot-shingle corpus, verify exact") {
    // 60 docs all sharing one ubiquitous template shingle ("click here now"),
    // plus 2 genuine near-dups. Without the cap the hot shingle alone
    // contributes C(60,2)=1770 candidate pairs; with it, only the near-dups
    // (sharing rare shingles) surface — and their jaccard is still exact.
    val hot = (0 until 60).map { i =>
      (i.toLong, s"click here now unique${i}a token${i}b filler${i}c word${i}d extra${i}e more${i}f")
    }
    val docs2 = (hot :+
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa") :+
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))

    def candCount(dfCap: Int): Long = {
      // count candidates the same way the operator builds them
      val d = DedupOps.withWordShingleSet(docs2, "text", 3, "_sh")
        .select(col("lang"), col("doc_id").as("_id"), explode(col("_sh")).as("_s"))
      val base = if (dfCap > 0) {
        val dfc = d.groupBy("lang", "_s").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= dfCap)
        d.join(dfc, Seq("lang", "_s"))
      } else d
      base.as("a").join(base.as("b"),
          col("a.lang") === col("b.lang") && col("a._s") === col("b._s") &&
            col("a._id") < col("b._id"))
        .select("a._id", "b._id").distinct().count()
    }
    val uncapped = candCount(0)
    val capped = candCount(10)
    assert(uncapped >= 1770, s"hot shingle should explode candidates: $uncapped")
    assert(capped < 100, s"df cap must bound candidates: $capped")

    // capped operator still finds the genuine near-dup pair, with the SAME
    // exact jaccard as the exhaustive baseline
    val cappedPairs = DedupOps.ngramJaccardPairs(docs2, "doc_id", "text",
        Seq("lang"), w = 3, threshold = 0.5, dfCap = 10)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val exhaustive = DedupOps.ngramJaccardPairs(docs2, "doc_id", "text",
        Seq("lang"), w = 3, threshold = 0.5, dfCap = 0)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(cappedPairs.contains(
      exhaustive.find(p => p._1 == 100L && p._2 == 101L).get))
    assert(cappedPairs.subsetOf(exhaustive))
  }

  test("minhash jaccard estimate correlates with true jaccard") {
    // identical docs share every band; disjoint docs share none
    val sig = DedupOps.withMinhashSignature(docs, "text", 5, 8, "sig")
      .select(col("doc_id"), col("sig"))
    val cands = DedupOps.lshCandidates(sig, "doc_id", "sig", bands = 4, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 1L)))
    assert(!cands.contains((4L, 5L)))
  }
}
