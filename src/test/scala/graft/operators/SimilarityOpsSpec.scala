package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilarityOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic synthetic embeddings: 10 clusters x 20 vectors, dim 16;
  // cluster centers are axis-ish, members = center + small hash jitter
  private val dim = 16
  private lazy val vecs = {
    def jitter(id: Int, i: Int): Float = {
      val h = scala.util.hashing.MurmurHash3.productHash((id, i))
      (math.abs(h % 1000) / 1000.0f - 0.5f) * 0.2f
    }
    (0 until 200).map { id =>
      val c = id % 10
      val v = (0 until dim).map { i =>
        (if (i == c) 1.0f else if (i == (c + 1) % dim) 0.5f else 0.0f) + jitter(id, i)
      }.toArray
      (id.toLong, v)
    }
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
  }

  private lazy val bruteTruth: Map[Long, Seq[Long]] = vecs.take(20).map { case (qid, qv) =>
    qid -> vecs.filter(_._1 != qid)
      .map { case (id, v) => (id, cosine(qv, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
  }.toMap

  test("bruteForceTopK matches an in-memory exact reference") {
    val queries = df.filter(col("vec_id") < 20)
    val got = SimilarityOps.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.sortBy(_._2).map(_._3).toSeq }
    assert(got == bruteTruth)
  }

  test("native-expression scoring equals declarative brute force") {
    graft.expressions.GraftFunctions.register(spark)
    val queries = df.filter(col("vec_id") < 20)
    val nat = SimilarityOps.bruteForceTopK(df, queries, "vec_id", "embedding", 5,
        native = true)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.sortBy(_._2).map(_._3).toSeq }
    assert(nat == bruteTruth)
  }

  test("lshTopK achieves high recall vs brute force with multi-probe") {
    val queries = df.filter(col("vec_id") < 20)
    val got = SimilarityOps.lshTopK(df, queries, "vec_id", "embedding",
        dim = dim, planes = 6, k = 5, multiProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val hits = bruteTruth.map { case (q, truth) =>
      truth.count(got.getOrElse(q, Set.empty).contains).toDouble / truth.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.5, s"LSH recall@5 = $recall")
  }

  test("adaptive plane count grows with corpus size and stays usable") {
    // planesFor: bucket occupancy target holds as N scales
    assert(SimilarityOps.planesFor(1000) == 4)
    assert(SimilarityOps.planesFor(100000) == 11)
    assert(SimilarityOps.planesFor(10000000) == 18)
    assert(SimilarityOps.planesFor(100000000000L) == 24) // clamp
    assert(SimilarityOps.planesFor(10) == 4) // floor
    // IVF sizing follows sqrt(N)
    assert(SimilarityOps.cellsFor(100) == 10)
    assert(SimilarityOps.cellsFor(1000000) == 1000)
    assert(SimilarityOps.cellsFor(1) == 8) // floor
    assert(SimilarityOps.cellsFor(100000000000L) == 65536) // clamp
    // planes <= 0 derives from the corpus (200 vecs -> 4 planes) and still
    // returns useful neighbors
    val queries = df.filter(col("vec_id") < 20)
    val got = SimilarityOps.lshTopK(df, queries, "vec_id", "embedding",
        dim = dim, planes = 0, k = 5, multiProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val hits = bruteTruth.map { case (q, truth) =>
      truth.count(got.getOrElse(q, Set.empty).contains).toDouble / truth.size
    }
    assert(hits.sum / hits.size >= 0.5)
  }

  test("multi-table LSH candidate generation recalls most true near-dup pairs") {
    // the q27 shape: L tables of k hyperplanes, candidates = collide in any
    // table, then exact verify — recall measured against the brute-force
    // all-pairs truth at cosine >= 0.4
    val tables = 6; val k = 3
    val sig = (t: Int) => {
      val h = (p: Int, i: Int) => {
        val x = scala.util.hashing.MurmurHash3.productHash((p, i))
        (math.abs(x % 65536) - 32768).toDouble
      }
      (id: Long, v: Array[Float]) =>
        (0 until k).map { pp =>
          val p = t * k + pp
          val proj = (0 until dim).map(i => v(i) * h(p, i)).sum
          if (proj >= 0) 1L << pp else 0L
        }.sum
    }
    val truth = (for {
      (a, va) <- vecs; (b, vb) <- vecs if a < b
      if cosine(va, vb) >= 0.4
    } yield (a, b)).toSet
    // note: iterate bucket VALUES — a for/flatMap over the groupBy Map that
    // yields tuples would rebuild a Map and silently dedup by first element
    val cands = (0 until tables).flatMap { tt =>
      vecs.groupBy(v => sig(tt)(v._1, v._2)).valuesIterator.flatMap { grp =>
        val ids = grp.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size)
          yield (ids(i), ids(j))
      }
    }.toSet
    val recall = truth.count(cands.contains).toDouble / math.max(truth.size, 1)
    assert(truth.size > 50, s"need a meaningful truth set: ${truth.size}")
    assert(recall >= 0.6, s"multi-table LSH candidate recall = $recall")
    // and the candidate set is far from all-pairs
    assert(cands.size < vecs.size.toLong * (vecs.size - 1) / 2)
  }

  /** The scale contract behind lshTopK(planes <= 0): deriving the plane
    * count from the corpus size must keep within-bucket candidate-pair
    * counts near-LINEAR in N — a fixed plane count grows them ~N²/2^planes
    * (the round-1 scale bug q29's pinned catalog variant documents). */
  test("planesFor keeps candidate pairs bounded on a growing corpus") {
    def corpus(n: Int) = (0 until n).map { id =>
      def jitter(i: Int): Float = {
        val h = scala.util.hashing.MurmurHash3.productHash((id, i, 7))
        (math.abs(h % 1000) / 1000.0f - 0.5f)
      }
      (id.toLong, (0 until dim).map(jitter).toArray)
    }
    def pairsWithDerivedPlanes(n: Int): (Long, Int) = {
      val vs = corpus(n)
      val p = SimilarityOps.planesFor(n)
      val sigs = vs.toDF("vec_id", "embedding")
        .select(col("vec_id"),
          SimilarityOps.rhpSignature(col("embedding"), dim, p).as("s"))
        .groupBy("s").count().as[(Long, Long)].collect()
      (sigs.map { case (_, d) => d * (d - 1) / 2 }.sum, p)
    }
    val (pairsSmall, pSmall) = pairsWithDerivedPlanes(500)
    val (pairsBig, pBig) = pairsWithDerivedPlanes(5000)
    assert(pBig > pSmall, "plane count must grow with the corpus")
    // 10x the corpus must cost well under 100x (quadratic) the pairs —
    // near-linear growth with generous slack for occupancy skew
    assert(pairsBig.toDouble <= 30.0 * math.max(pairsSmall, 1L),
      s"candidate pairs grew superlinearly: $pairsSmall -> $pairsBig " +
      s"(planes $pSmall -> $pBig)")
  }

  test("ivfTopK achieves high recall with nProbe=3") {
    val queries = df.filter(col("vec_id") < 20)
    val got = SimilarityOps.ivfTopK(df, queries, "vec_id", "embedding",
        dim = dim, cells = 8, k = 5, nProbe = 3, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val hits = bruteTruth.map { case (q, truth) =>
      truth.count(got.getOrElse(q, Set.empty).contains).toDouble / truth.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.6, s"IVF recall@5 = $recall")
  }

  /** Production embedding shapes: dim 768 with thousands of cells/planes.
    * The centroid-literal formulation built cells x dim plan nodes (tens of
    * millions at this shape — driver planning alone went quadratic) and
    * the declarative RHP signature built dim x planes hash nodes that
    * overwhelmed codegen; the broadcast-matrix IVF kernel and the fused
    * RHP kernel keep both plans O(1) nodes. Timed so a regression back to
    * tree-building shows up as a wall-clock cliff, and recall-checked so
    * the kernels stay semantically right, not just fast. */
  test("dim-768 embeddings with 4k cells and 24 planes stay fast and correct") {
    val wideDim = 768
    def wideVec(id: Int): Array[Float] = {
      val c = id % 8
      (0 until wideDim).map { i =>
        val h = scala.util.hashing.MurmurHash3.productHash((id, i, 13))
        val jitter = (math.abs(h % 1000) / 1000.0f - 0.5f) * 0.2f
        (if (i % 8 == c) 1.0f else 0.0f) + jitter
      }.toArray
    }
    val wide = (0 until 400).map(id => (id.toLong, wideVec(id)))
    val wideDf = wide.toDF("vec_id", "embedding")
    val queries = wideDf.filter(col("vec_id") < 10)
    def wideCosine(a: Array[Float], b: Array[Float]): Double = cosine(a, b)
    val truth = wide.take(10).map { case (qid, qv) =>
      qid -> wide.filter(_._1 != qid)
        .map { case (id, v) => (id, wideCosine(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    }.toMap

    val t0 = System.nanoTime()
    val ivf = SimilarityOps.ivfTopK(wideDf, queries, "vec_id", "embedding",
        dim = wideDim, cells = 4096, k = 5, nProbe = 8, iters = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val ivfSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val lsh = SimilarityOps.lshTopK(wideDf, queries, "vec_id", "embedding",
        dim = wideDim, planes = 24, k = 5, multiProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val lshSec = (System.nanoTime() - t1) / 1e9

    info(f"dim-768: ivf(4096 cells) $ivfSec%.1f s, lsh(24 planes) $lshSec%.1f s")
    // 4096 cells over 400 vectors: most cells empty, each vector near-alone —
    // nProbe=8 still must find some true neighbors; with 24 planes over 400
    // vectors most buckets are singletons, so only sanity-check non-failure
    val ivfHits = truth.map { case (q, t) =>
      t.count(ivf.getOrElse(q, Set.empty).contains).toDouble / t.size }
    assert(ivfHits.sum / ivfHits.size >= 0.2,
      s"wide IVF recall collapsed: ${ivfHits.sum / ivfHits.size}")
    assert(ivfSec < 120 && lshSec < 120,
      s"wide-shape ANN regressed to tree-building: ivf $ivfSec s, lsh $lshSec s")
  }

  test("native RHP signature is bit-identical to the declarative tree") {
    // same vectors, both paths forced explicitly — planes>16 triggers the
    // kernel inside rhpSignature, the declarative helper pins the truth
    val native = df.select(col("vec_id"),
        SimilarityOps.rhpSignature(col("embedding"), dim, 20).as("s"))
      .as[(Long, Long)].collect().toMap
    val declarative = df.select(col("vec_id"),
        SimilarityOps.rhpSignatureDeclarative(col("embedding"), dim, 20).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(native == declarative,
      "fused RHP kernel diverges from the declarative signature")
  }
}
