package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply
import graft.lake.LakeTable
import graft.model.Schemas

/** The V2 catalog must be (a) semantically invisible — any SQL over
  * `graft.`path`` equals the same query over `lake.read()`, CoW and MoR —
  * and (b) physically lake-aware: filters prune INPUT PARTITIONS at plan
  * time, and a join of two equally-bucketed lakes on the bucket key plans
  * as a storage-partitioned join with ZERO shuffle bytes. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    // partition keys (bucket cols) may be a strict SUBSET of the join keys
    // — e.g. join on (conv_id, turn_idx), bucketed on conv_id
    s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    s
  }

  private def batch(rows: Seq[(String, Int, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "_lsn")
      .withColumn("op", lit("U"))
      .withColumn("role",
        when(col("turn_idx") % 2 === 0, "user").otherwise("assistant"))
      .withColumn("text", concat(lit("t-"), col("_lsn")))
      .withColumn("tool", lit(null).cast("string"))
      .withColumn("ts", to_timestamp(lit("2024-03-01T00:00:00")))
      .withColumn("_src_part", (col("_lsn") % 4).cast("int"))
      .withColumn("_src_off", col("_lsn"))
  }

  private def seed(name: String, mor: Boolean, nConvs: Int = 32,
                   nBuckets: Int = 8): (LakeTable, String) = {
    val dir = TestSpark.tmpDir(name)
    val lake = new LakeTable(spark, dir)
    val w1 = (0 until nConvs).flatMap(c =>
      (0 until 4).map(t => (f"conv$c%02d", t, (c * 4 + t).toLong)))
    CdcApply.apply(lake, batch(w1), epoch = 1, nBuckets = nBuckets, mor = mor)
    // second wave touches a few conversations so MoR grows real chains
    val w2 = (0 until 4).flatMap(c =>
      (0 until 4).map(t => (f"conv$c%02d", t, (1000 + c * 4 + t).toLong)))
    CdcApply.apply(lake, batch(w2), epoch = 2, nBuckets = nBuckets, mor = mor)
    (lake, dir)
  }

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  /** lake.read() keeps engine columns; the catalog surfaces them as
    * metadata columns instead — drop them for SELECT * comparisons. */
  private def pub(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(_.startsWith("_")).toIndexedSeq: _*)

  private def shuffleBytesDuring(body: => Unit): Long = {
    val marker = s"graft-drain-marker-${System.nanoTime()}"
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (s.stageInfo.name.startsWith(marker)) done.set(true)
        else bytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      spark.sparkContext.setCallSite(marker)
      try spark.sparkContext.parallelize(1 to 1, 1).count()
      finally spark.sparkContext.clearCallSite()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!done.get() && System.nanoTime() < deadline) Thread.sleep(10)
      bytes.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def graftScansOf(df: DataFrame): Seq[GraftScan] = {
    df.collect() // finalize adaptive plan
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.collect { case g: GraftScan => g }
  }

  test("catalog SQL equals lake.read() — CoW and MoR, schema is public") {
    for (mor <- Seq(false, true)) {
      val (lake, dir) = seed(s"cat-parity-$mor", mor)
      val viaSql = spark.sql(s"SELECT * FROM graft.`$dir`")
      assert(rowsOf(viaSql) == rowsOf(pub(lake.read())),
        s"mor=$mor catalog read diverges from lake.read()")
      assert(!viaSql.schema.fieldNames.contains("_tombstone"))
      assert(!viaSql.schema.fieldNames.contains("_lsn"),
        "_lsn is a metadata column, not part of SELECT *")
      assert(!viaSql.schema.fields.exists(
        _.metadata.contains(Schemas.FieldIdKey)),
        "field ids must not leak through the catalog schema")
      // …but _lsn IS selectable on demand (Iceberg metadata-column style)
      val withLsn = spark.sql(
        s"SELECT conv_id, turn_idx, _lsn FROM graft.`$dir`")
      assert(rowsOf(withLsn) ==
        rowsOf(lake.read().select("conv_id", "turn_idx", "_lsn")),
        s"mor=$mor metadata-column _lsn read diverges")
    }
  }

  test("filters prune input partitions and files at plan time") {
    val (lake, dir) = seed("cat-prune", mor = false)
    val all = graftScansOf(spark.sql(s"SELECT text FROM graft.`$dir`"))
      .map(_.planInputPartitions().length).sum
    val one = spark.sql(
      s"SELECT text FROM graft.`$dir` WHERE conv_id = 'conv03'")
    val pruned = graftScansOf(one).map(_.planInputPartitions().length).sum
    assert(all == 8, s"expected 8 bucket partitions, got $all")
    assert(pruned == 1,
      s"bucket-key equality should prune to 1 partition, got $pruned")
    assert(rowsOf(one) ==
      rowsOf(lake.read().filter(col("conv_id") === "conv03").select("text")))
  }

  test("join of two equally-bucketed lakes is storage-partitioned: " +
       "zero shuffle bytes, same result as the DataFrame join") {
    val (lakeA, dirA) = seed("cat-spj-a", mor = false)
    val (lakeB, dirB) = seed("cat-spj-b", mor = false, nConvs = 16)
    val sql =
      s"""SELECT a.conv_id, a.turn_idx, a.text, b.text AS text_b
         |FROM graft.`$dirA` a JOIN graft.`$dirB` b
         |  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx""".stripMargin
    val expected = rowsOf(
      lakeA.read().as("a").join(
        lakeB.read().select(col("conv_id"), col("turn_idx"),
          col("text").as("text_b")).as("b"),
        Seq("conv_id", "turn_idx"))
        .select(col("conv_id"), col("turn_idx"), col("a.text"), col("text_b")))
    var got: Set[String] = null
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val shuffled =
      try shuffleBytesDuring { got = rowsOf(spark.sql(sql)) }
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(got == expected, "storage-partitioned join changed the result")
    assert(shuffled == 0L,
      s"co-bucketed lake join wrote $shuffled shuffle bytes — SPJ did not engage")
  }

  test("VERSION AS OF pins the snapshot; TIMESTAMP AS OF resolves by commit time") {
    val (lake, dir) = seed("cat-asof", mor = false)
    val ids = lake.snapshots.map(_.snapshotId)
    val v1 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF ${ids.head}")
    assert(rowsOf(v1) == rowsOf(pub(lake.readAt(ids.head))))
    // now() is past the last commit's mtime
    val nowMicros = System.currentTimeMillis() * 1000L
    val tt = spark.sql(
      s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF " +
      s"timestamp_micros(${nowMicros}L)")
    assert(rowsOf(tt) == rowsOf(pub(lake.read())))
  }

  test("writeTo(...).append() upserts through the maintenance merge") {
    val (lake, dir) = seed("cat-write", mor = false)
    import spark.implicits._
    val rows = Seq(("conv00", 0, "assistant", "rewritten", null: String),
                   ("convZZ", 0, "user", "brand new", null: String))
      .toDF("conv_id", "turn_idx", "role", "text", "tool")
      .withColumn("ts", to_timestamp(lit("2024-04-01T00:00:00")))
    rows.writeTo(s"graft.`$dir`").append()
    val after = lake.read()
    assert(after.filter(col("conv_id") === "convZZ").count() == 1)
    assert(after.filter(col("conv_id") === "conv00" && col("turn_idx") === 0)
      .select("text").head().getString(0) == "rewritten")
  }

  test("DELETE FROM through the catalog rides the engine's tombstone merge") {
    val (lake, dir) = seed("cat-delete", mor = false)
    val before = lake.currentSnapshot.get
    spark.sql(s"DELETE FROM graft.`$dir` " +
      "WHERE conv_id IN ('conv01', 'conv02') OR turn_idx >= 3")
    val after = lake.read()
    assert(rowsOf(pub(after)) == rowsOf(pub(
      lake.readAt(before.snapshotId).filter(
        !(col("conv_id").isin("conv01", "conv02") || col("turn_idx") >= 3)))),
      "catalog DELETE kept/removed the wrong rows")
    // a real DML commit: snapshot advanced, history intact (rollback-able)
    val snap = lake.currentSnapshot.get
    assert(snap.snapshotId > before.snapshotId && snap.epoch == before.epoch)
    assert(lake.snapshots.exists(_.snapshotId == before.snapshotId))
    // untranslatable condition (function call) is refused at analysis,
    // not guessed at runtime
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM graft.`$dir` WHERE length(text) > 2")
    }
    assert(e.getMessage != null)
    // bare DELETE FROM t = tombstone-everything DML (still time-travelable)
    spark.sql(s"DELETE FROM graft.`$dir`")
    assert(lake.read().count() == 0)
    assert(lake.readAt(before.snapshotId).count() > 0,
      "history must survive a full delete")
  }

  test("DELETE string literals survive both parser escape modes") {
    // a backslash is an escape char under the default parser but a plain
    // character under legacy escapedStringLiterals — the predicate
    // round-trip (V2PredicateSql) must delete the right row either way
    val dir = TestSpark.tmpDir("cat-del-esc")
    val lake = new LakeTable(spark, dir)
    val ids = Seq("path\\to\\conv", "it's-quoted", "plain")
    CdcApply.apply(lake,
      batch(ids.zipWithIndex.map { case (id, i) => (id, 0, i.toLong) }),
      epoch = 1, nBuckets = 4)
    assert(lake.read().count() == 3)
    val key = "spark.sql.parser.escapedStringLiterals"
    val orig = spark.conf.get(key, "false")
    try {
      spark.conf.set(key, "true")
      spark.sql(s"DELETE FROM graft.`$dir` WHERE conv_id = 'path\\to\\conv'")
      assert(rowsOf(lake.read().select("conv_id")) ==
        Set("[it's-quoted]", "[plain]"),
        "legacy-mode DELETE removed the wrong row(s)")
      spark.conf.set(key, "false")
      spark.sql(s"DELETE FROM graft.`$dir` WHERE conv_id = 'it\\'s-quoted'")
      assert(rowsOf(lake.read().select("conv_id")) == Set("[plain]"),
        "default-mode DELETE removed the wrong row(s)")
    } finally spark.conf.set(key, orig)
  }

  test("metadata suffix tables: files/snapshots/lineage through plain SQL") {
    val (lake, dir) = seed("cat-meta", mor = false)
    val snaps = spark.sql(s"SELECT * FROM graft.`$dir`.`snapshots`")
    assert(snaps.count() == lake.snapshots.size)
    assert(snaps.columns.contains("epoch"))
    val files = spark.sql(
      s"SELECT count(*) AS n, sum(rows) AS r FROM graft.`$dir`.`files`").head()
    assert(files.getLong(0) == lake.currentSnapshot.get.files.size)
    assert(files.getLong(1) == lake.read().count())
    val lin = spark.sql(s"SELECT * FROM graft.`$dir`.`lineage`")
    assert(lin.count() > 0 && lin.columns.sameElements(
      Array("src_part", "min_off", "max_off")))
    // a metadata name that is NOT over a lake stays a missing-table error
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir/nope`.`files`").collect()
    }
  }

  test("changes suffix table is the snapshot-diff feed, span-addressable") {
    val (lake, dir) = seed("cat-changes", mor = false)
    val ids = lake.snapshots.map(_.snapshotId)
    // default span: the LAST commit's delta — wave 2 rewrote convs 0-3
    val last = spark.sql(
      s"SELECT action, count(*) AS n FROM graft.`$dir`.`changes` " +
      "GROUP BY action")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last == Map("updated" -> 16L), s"unexpected last-commit delta: $last")
    // before/after images ride along (Debezium envelope)
    val img = spark.sql(
      s"SELECT pre_text, post_text FROM graft.`$dir`.`changes` " +
      "WHERE conv_id = 'conv00' AND turn_idx = 0").head()
    assert(img.getString(0) == "t-0" && img.getString(1) == "t-1000")
    // explicit span from the empty table: everything live is `inserted`
    val full = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$dir`.`changes` " +
      s"VERSION AS OF '-1..${ids.last}' WHERE action = 'inserted'").head()
    assert(full.getLong(0) == lake.read().count())
    // single-version span = that commit vs its parent
    val first = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$dir`.`changes` " +
      s"VERSION AS OF '${ids.head}'").head()
    assert(first.getLong(0) == lake.readAt(ids.head).count())
  }

  test("bucket function equals the write path's bucketing") {
    import org.apache.spark.sql.types._
    for ((values, types) <- Seq(
      (Seq[Any]("conv42"), Seq(StringType)),
      (Seq[Any]("a", 7), Seq(StringType, IntegerType)),
      (Seq[Any](123L), Seq(LongType)))) {
      val n = 64
      val fields = StructField("n", IntegerType) +:
        types.zipWithIndex.map { case (t, i) => StructField(s"c$i", t) }
      val bound = GraftBucketFunction.bind(StructType(fields))
        .asInstanceOf[GraftBoundBucket]
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        (Int.box(n) +: values.map {
          case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
          case o => o.asInstanceOf[AnyRef]
        }).toArray[Any])
      assert(bound.produceResult(row) ==
        LakeTable.bucketOfValues(values, n),
        s"bucket mismatch for $values")
    }
  }
}
