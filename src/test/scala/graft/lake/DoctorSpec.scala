package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.{CdcDriver, CdcOracle}
import graft.changelog.ChangelogGen

/** Metadata-only maintenance advisor: health stats and advice derive from
  * the snapshot's manifest refs alone, applySafe runs only the
  * non-destructive actions, and the advice converges (a doctored table
  * re-examines healthy). */
class DoctorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def build(name: String, mor: Boolean): LakeTable = {
    val dir = TestSpark.tmpDir(s"doc-cl-$name")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 4000, nConvs = 30, turnsPerConv = 6,
      pUpdate = 0.4, pDelete = 0.1, pDup = 0.1, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir(s"doc-lake-$name"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = mor, morCompactChain = 0).run()
    lake
  }

  test("healthy table yields no advice") {
    val lake = build("healthy", mor = false)
    val r = Doctor.examine(lake,
      Doctor.Thresholds(keepSnapshots = 1000)).get
    assert(r.advice.isEmpty && r.nBuckets == 8 && r.rows > 0)
  }

  test("MoR chains -> fold advice; applySafe folds; re-examine healthy") {
    val lake = build("mor", mor = true)
    val t = Doctor.Thresholds(chainMax = 1, keepSnapshots = 1000)
    val before = CdcOracle.tableState(lake.read())
    val r = Doctor.examine(lake, t).get
    assert(r.maxChain > 1 && r.chainedBuckets.nonEmpty)
    val fold = r.advice.find(_.action == "fold")
    assert(fold.isDefined, s"expected fold advice, got ${r.advice}")

    val ran = Doctor.applySafe(lake, r, t)
    assert(ran.exists(_.startsWith("fold:")))
    assert(CdcOracle.tableState(lake.read()) == before) // state untouched
    val r2 = Doctor.examine(lake, t).get
    assert(r2.advice.forall(_.action != "fold"), s"still advised: ${r2.advice}")
    assert(r2.maxChain == 1)
  }

  test("bucket pressure -> aligned rebucket advice (never auto-run)") {
    val lake = build("pressure", mor = false)
    val t = Doctor.Thresholds(rowsPerBucketTarget = 10,
      maxBuckets = 256, keepSnapshots = 1000)
    val r = Doctor.examine(lake, t).get
    val adv = r.advice.find(_.action == "rebucket")
    assert(adv.isDefined, s"expected rebucket advice, got ${r.advice}")
    val newN = adv.get.args.toInt
    assert(newN % 8 == 0 && newN > 8 && newN <= 256,
      s"suggested $newN is not an aligned growth of 8")
    // advisory only: applySafe must not change the layout
    Doctor.applySafe(lake, r, t)
    assert(lake.currentSnapshot.get.nBuckets == 8)
  }

  test("retention pressure -> expire advice, skew -> salt advice") {
    val lake = build("retain", mor = false)
    val nSnaps = lake.snapshots.size
    assert(nSnaps > 2)
    val r = Doctor.examine(lake,
      Doctor.Thresholds(keepSnapshots = 2, skewFactor = 0.5)).get
    assert(r.advice.exists(_.action == "expire"))
    assert(r.advice.exists(_.action == "salt") && r.hotBuckets.nonEmpty)
    // both advisory: nothing is expired by applySafe
    Doctor.applySafe(lake, r, Doctor.Thresholds(keepSnapshots = 2))
    assert(lake.snapshots.size == nSnaps)
  }

  test("dead-letter backlog and live branches surface as advisory signals") {
    val lake = build("ops", mor = false)
    val t = Doctor.Thresholds(keepSnapshots = 1000)
    assert(Doctor.examine(lake, t).get.advice.isEmpty) // clean to start

    // quarantine an epoch: a check that future events violate
    lake.addCheck("lsn_cap", "_lsn < 900000")
    import spark.implicits._
    val bad = Seq(("convX", 0, "user", 999999L))
      .toDF("conv_id", "turn_idx", "role", "_lsn")
      .withColumn("op", org.apache.spark.sql.functions.lit("U"))
      .withColumn("_src_part", org.apache.spark.sql.functions.lit(0))
      .withColumn("_src_off", org.apache.spark.sql.functions.col("_lsn"))
    val epoch = lake.currentSnapshot.get.epoch + 1
    graft.cdc.CdcApply.apply(lake, bad, epoch = epoch, nBuckets = 8)
    Branch.create(lake, "audit")

    val r = Doctor.examine(lake, t).get
    assert(r.quarantinedEpochs == Seq(epoch))
    assert(r.liveBranches == Seq("audit"))
    assert(r.advice.exists(_.action == "requeue"))
    assert(r.advice.exists(_.action == "branch"))
    // age escalation: within the bound the advice is routine...
    assert(!r.advice.find(_.action == "requeue").get.reason
      .contains("age bound"))
    // ...past the bound (forced to 0 here) it escalates loudly
    val aged = Doctor.examine(lake,
      t.copy(quarantineMaxAgeMs = 0L)).get
    assert(aged.advice.find(_.action == "requeue").get.reason
      .contains("age bound"))
    // both advisory: applySafe runs neither
    assert(Doctor.applySafe(lake, r, t).isEmpty)

    // resolve both; the doctor goes quiet again
    lake.dropCheck("lsn_cap")
    graft.cdc.Requeue.requeue(lake, epoch)
    Branch.discard(lake, "audit")
    assert(Doctor.examine(lake, t).get.advice.isEmpty)
  }

  test("size-aware: byte-skewed buckets advise even when rows are balanced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lake = new LakeTable(spark, TestSpark.tmpDir("doc-bytes"))
    val nB = 8
    // 64 convs, one row each — rows/bucket are balanced; the convs landing
    // in ONE bucket carry ~200 KB of random text (compression-resistant),
    // the rest a few bytes. A rows-only doctor sees a healthy table.
    val fatBucket = LakeTable.bucketOfValue("conv00", nB)
    val rng = new scala.util.Random(7)
    val rows = (0 until 64).map { i =>
      val id = f"conv$i%02d"
      val fat = LakeTable.bucketOfValue(id, nB) == fatBucket
      val text = if (fat) rng.alphanumeric.take(200000).mkString else "x"
      (id, 0, "user", text, i.toLong)
    }
    val df = rows.toDF("conv_id", "turn_idx", "role", "text", "_lsn")
      .withColumn("op", lit("U"))
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", col("_lsn"))
    graft.cdc.CdcApply.apply(lake, df, epoch = 1, nBuckets = nB)

    // rows threshold sky-high: only BYTE evidence can advise here
    val r = Doctor.examine(lake, Doctor.Thresholds(
      rowsPerBucketTarget = 1000000, bytesPerBucketTarget = 1024,
      skewFactor = 3.0, keepSnapshots = 1000)).get
    assert(r.bytes > 0, "manifest refs must carry footer byte stats")
    assert(r.maxBytesPerBucket > r.meanBytesPerBucket * 3)
    val reb = r.advice.find(_.action == "rebucket")
    assert(reb.isDefined && reb.get.reason.contains("bytes"),
      s"expected byte-keyed rebucket advice, got ${r.advice}")
    assert(reb.get.args.toInt % nB == 0)
    assert(r.hotBuckets.headOption.contains(fatBucket),
      s"the fat bucket must rank hottest: ${r.hotBuckets}")
    assert(r.advice.exists(_.action == "salt"))
  }

  test("empty lake reports empty") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("doc-empty"))
    assert(Doctor.examine(lake).isEmpty)
  }
}
