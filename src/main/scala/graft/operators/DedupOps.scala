package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._

/**
 * Corpus deduplication operators for training-data pipelines: exact
 * (checksum groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard
 * verification. All are declarative DataFrame plans — the heavy lifting
 * (shingle explode → per-doc min-hash → band bucket join) shuffles only on
 * compact keys, never on document text, so the plans survive a 100 TB corpus:
 *  - shingling/minhashing is per-row (codegen, no shuffle);
 *  - LSH banding turns the O(n²) pair space into a groupBy on (band, sig)
 *    buckets, shuffling only (doc_id, band, sig) triples;
 *  - the verify join rejoins text for candidate pairs only.
 *
 * Reference analogue: the reference dedups by Redis checksum lookup per event
 * (DeDupEngine.scala:23-42, DeDupHelper.scala:7-10) — a point-lookup design
 * that cannot batch; here the same semantics are a set-level hash groupBy.
 */
object DedupOps {

  /** Exact dedup on normalized-content checksum: keeps the row with the
    * smallest `idCol` per checksum group (deterministic canonical winner).
    * One hash-partitioned window, map-side combinable. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("_ck")).orderBy(col(idCol))
    docs.withColumn("_ck", contentChecksum(col(textCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_ck")
  }

  /** Per-doc MinHash signature: `numHashes` independent min-hash values over
    * character `k`-shingles. Hash family h_j(s) = md5(j || ':' || s) compared
    * lexicographically — md5 so an external SQL oracle can reproduce it
    * exactly; the xxhash64 family below is the faster production path. */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val sh = charShingles(text, k)
    array((0 until numHashes).map { j =>
      array_min(transform(sh, s => md5(concat(lit(j.toString + ":"), s))))
    }: _*)
  }

  /** Production minhash: xxhash64 family (8 bytes/hash, codegen'd native
    * expression — no md5 hex strings on the hot path). */
  def minhashSignature64(text: Column, k: Int, numHashes: Int): Column = {
    val sh = charShingles(text, k)
    array((0 until numHashes).map { j =>
      array_min(transform(sh, s => xxhash64(lit(j), s)))
    }: _*)
  }

  /** LSH candidate pairs from minhash signatures banded into `bands` bands
    * of `rowsPerBand` hashes. Docs sharing any band signature are candidates.
    * Scale: the explode produces `bands` rows/doc of (band, sig, id) — the
    * only shuffled payload; bucket self-join happens post-aggregation on
    * compact arrays. Returns (id_a, id_b) with id_a < id_b, distinct. */
  def lshCandidates(
      docs: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = docs.select(
      col(idCol).as("_id"),
      posexplode(array((0 until bands).map { b =>
        md5(array_join(slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand), "|"))
      }: _*)).as(Seq("_band", "_sig")))
    // all ids per bucket, sorted — tiny arrays; avoids a self-join shuffle
    val buckets = banded.groupBy("_band", "_sig")
      .agg(sort_array(collect_list("_id")).as("_ids"))
      .filter(size(col("_ids")) > 1)
    buckets.select(explode(pairsOf(col("_ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()
  }

  /** All ordered pairs (a<b) from a sorted array — pure expression. */
  private def pairsOf(ids: Column): Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + 2, size(ids)),
        b => struct(a.as("_1"), b.as("_2")))))

  /** Exact Jaccard similarity of two word-shingle sets (verification step
    * after LSH candidate generation). */
  def jaccard(aShingles: Column, bShingles: Column): Column = {
    val inter = size(array_intersect(aShingles, bShingles)).cast("double")
    val uni = size(array_union(aShingles, bShingles)).cast("double")
    round(inter / greatest(uni, lit(1.0)), 6)
  }

  /** MinHash+LSH near-duplicate pairs with exact shingle-Jaccard verify:
    * the full pipeline — shingle → minhash → band → bucket → verify-join.
    * Returns (id_a, id_b, jaccard) for pairs with jaccard >= threshold. */
  def minhashDedupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 8, bands: Int = 4,
      wordShingleW: Int = 3, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = docs.select(col(idCol), col(textCol))
      .withColumn("_sig", minhashSignature(col(textCol), shingleK, numHashes))
    val cands = lshCandidates(withSig, idCol, "_sig", bands, rowsPerBand)
    val shingled = docs.select(
      col(idCol).as("_sid"),
      array_distinct(wordShingles(col(textCol), wordShingleW)).as("_sh"))
    cands
      .join(shingled.withColumnRenamed("_sid", "id_a")
        .withColumnRenamed("_sh", "_sha"), "id_a")
      .join(shingled.withColumnRenamed("_sid", "id_b")
        .withColumnRenamed("_sh", "_shb"), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("_sha"), col("_shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash over whitespace tokens with `bits` bit positions (<= 16 keeps
    * the hash oracle-reproducible via md5 hex digits; the 64-bit xxhash64
    * variant below is the production path). Bit b of token t comes from
    * md5(t)'s leading 4 hex digits; simhash bit b is set iff the weighted
    * majority of tokens set it. */
  def simhash(text: Column, bits: Int): Column = {
    require(bits <= 16, "md5-4-hex-digit variant supports <= 16 bits")
    val toks = tokens(text)
    // per-token 16-bit value from the first 4 hex digits of md5
    val tokVal = (t: Column) => {
      val hex = substring(md5(t), 1, 4)
      aggregate(split(hex, ""), lit(0L),
        (acc, ch) => acc * 16 + (instr(lit("0123456789abcdef"), ch) - 1))
    }
    val vals = transform(toks, tokVal)
    simhashOf(vals, bits)
  }

  /** Production 64-bit simhash via xxhash64 token hashes. */
  def simhash64(text: Column): Column =
    simhashOf(transform(tokens(text), t => xxhash64(t)), 64)

  /** Majority-vote simhash from an array of per-token hash values. Bit
    * extraction uses `(v >> b) & 1` (mask, not mod — arithmetic shift of a
    * negative 64-bit hash sign-extends). */
  private def simhashOf(vals: Column, bits: Int): Column =
    (0 until bits).map { b =>
      val s = aggregate(vals, lit(0L), (acc, v) =>
        acc + when(shiftrightunsigned(v, b).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L)))
      when(s > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SimHash near-dup pairs: docs whose simhashes differ in <= maxHamming
    * bits. Candidate generation splits the hash into `chunks` chunks — by
    * pigeonhole any pair within hamming distance < chunks shares at least
    * one exact chunk, so the join key is (chunkIdx, chunkValue), never O(n²). */
  def simhashPairs(
      docs: DataFrame, idCol: String, hashCol: String,
      bits: Int, chunks: Int, maxHamming: Int): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val chunkBits = bits / chunks
    val mask = (1L << chunkBits) - 1
    val banded = docs.select(
      col(idCol).as("_id"), col(hashCol).as("_h"),
      posexplode(array((0 until chunks).map { c =>
        shiftrightunsigned(col(hashCol), c * chunkBits).bitwiseAND(lit(mask))
      }: _*)).as(Seq("_chunk", "_cv")))
    val buckets = banded.groupBy("_chunk", "_cv")
      .agg(sort_array(collect_list(struct(col("_id"), col("_h")))).as("_xs"))
      .filter(size(col("_xs")) > 1)
    buckets
      .select(explode(pairsOf2(col("_xs"))).as("p"))
      .select(col("p.a._id").as("id_a"), col("p.b._id").as("id_b"),
        bit_count(col("p.a._h").bitwiseXOR(col("p.b._h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  private def pairsOf2(xs: Column): Column =
    flatten(transform(xs, (a, i) =>
      transform(slice(xs, i + 2, size(xs)),
        b => struct(a.as("a"), b.as("b")))))

  /** n-gram Jaccard near-dup within explicit blocking buckets: docs are
    * compared only within the same `bucketCols` group (e.g. (lang, source)),
    * the classic blocking strategy when a domain partition exists. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      bucketCols: Seq[String], w: Int, threshold: Double): DataFrame = {
    val d = docs.select(
      (bucketCols.map(col) :+ col(idCol).as("_id") :+
        array_distinct(wordShingles(col(textCol), w)).as("_sh")): _*)
    val grouped = d.groupBy(bucketCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("_id"), col("_sh")))).as("_xs"))
      .filter(size(col("_xs")) > 1)
    grouped
      .select(explode(pairsOf2(col("_xs"))).as("p"))
      .select(col("p.a._id").as("id_a"), col("p.b._id").as("id_b"),
        jaccard(col("p.a._sh"), col("p.b._sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
