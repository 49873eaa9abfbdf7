package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** Property-style invariants (SURVEY.md §5): the final table is a pure
  * function of the change SET ordered by lsn — independent of delivery
  * order, segmentation, batch size, bucket count, or salting. */
class CdcPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replay(dir: String, segsPerBatch: Int, nBuckets: Int,
                     salt: Int = 0): Map[(String, Int), CdcOracle.Turn] = {
    val lake = new LakeTable(spark, TestSpark.tmpDir("prop-lake"))
    new CdcDriver(spark, dir, lake, segsPerBatch, nBuckets, salt, quiet = true).run()
    CdcOracle.tableState(lake.read())
  }

  test("final state is invariant to delivery permutation and segmentation") {
    // pBad: malformed events ride along in every permutation — quarantine
    // routing must not perturb the merge's permutation invariance
    val cfg = ChangelogGen.Config(
      nEvents = 1200, nConvs = 15, turnsPerConv = 5,
      pUpdate = 0.4, pDelete = 0.1, pDup = 0.1, pBad = 0.1, segSize = 300)
    val d1 = TestSpark.tmpDir("prop-cl1")
    ChangelogGen.write(spark, d1, cfg)
    val events = spark.read.parquet(d1).drop("seg")

    // deterministic pseudo-random permutation, re-segmented differently
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(events.collect().toList)
    val d2 = TestSpark.tmpDir("prop-cl2")
    shuffled.zipWithIndex.groupBy(_._2 / 200).foreach { case (seg, rows) =>
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map(_._1)), events.schema)
        .write.parquet(s"$d2/seg=$seg")
    }

    val s1 = replay(d1, segsPerBatch = 2, nBuckets = 8)
    val s2 = replay(d2, segsPerBatch = 3, nBuckets = 16)
    val s3 = replay(d2, segsPerBatch = 1, nBuckets = 4, salt = 4)
    assert(s1.nonEmpty)
    assert(s1 == s2)
    assert(s1 == s3)
    assert(s1 == CdcOracle.fold(events))
  }

  for ((pDup, pDelete) <- Seq((0.0, 0.0), (0.3, 0.0), (0.1, 0.3), (0.5, 0.5)))
      test(s"fold-oracle equality across duplicate/delete mixes dup=$pDup del=$pDelete") {
        val cfg = ChangelogGen.Config(
          nEvents = 800, nConvs = 10, turnsPerConv = 4,
          pUpdate = 0.3, pDelete = pDelete, pDup = pDup, segSize = 200)
        val d = TestSpark.tmpDir(s"prop-mix-$pDup-$pDelete")
        ChangelogGen.write(spark, d, cfg)
        val lake = new LakeTable(spark, TestSpark.tmpDir("prop-mix-lake"))
        new CdcDriver(spark, d, lake, 2, 8, quiet = true).run()
        assert(CdcOracle.tableState(lake.read()) ==
          CdcOracle.fold(spark.read.parquet(d)))
      }
}
