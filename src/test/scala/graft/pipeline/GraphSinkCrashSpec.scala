package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-window resume test (ADVICE r1, high): a crash AFTER a bucket's
  * parquet commit but BEFORE its manifest rename must NOT duplicate that
  * bucket's rows on resume. With dynamic partition overwrite the
  * re-written bucket REPLACES the stale files, so resumed output equals
  * a clean one-shot write exactly.
  */
class GraphSinkCrashSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graphsink-crash")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sampleTriples() = {
    val spark2 = spark
    import spark2.implicits._
    (0 until 500).map { i =>
      (s"c${i % 37}", i, new java.sql.Timestamp(1700000000000L + i * 1000L),
        s"subj$i", "mentions", s"obj${i % 11}")
    }.toDF("conv_id", "turn_idx", "ts", "subj", "pred", "obj")
  }

  test("resume after crash between data commit and manifest rename does not duplicate rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_crash").toString
    val triples = sampleTriples()
    val nBuckets = 8

    // full write (all manifests committed)
    GraphSink.writeTriples(spark, triples, dir, nBuckets)
    val clean = spark.read.parquet(s"$dir/triples")
      .groupBy(col("conv_bucket")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    // simulate the crash window: bucket data IS committed, manifest is NOT
    val manifests = new java.io.File(s"$dir/_manifests").listFiles()
      .filter(_.getName.startsWith("bucket-")).sortBy(_.getName)
    val victim = manifests.head
    val victimBucket = victim.getName.stripPrefix("bucket-").stripSuffix(".json").toInt
    assert(victim.delete())

    // resume: bucket `victimBucket` is pending again and gets re-written
    GraphSink.writeTriples(spark, triples, dir, nBuckets)

    val resumed = spark.read.parquet(s"$dir/triples")
      .groupBy(col("conv_bucket")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(resumed == clean,
      s"resume duplicated rows: victim=$victimBucket clean=$clean resumed=$resumed")
    // manifest restored and row count correct
    val m = spark.read.json(s"$dir/_manifests")
      .where(col("bucket") === victimBucket).select(col("rows")).first().getLong(0)
    assert(m == clean(victimBucket))
  }

  test("day(ts) secondary partition: layout gains day dirs, content and resume unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_day").toString
    // spread ts across 3 days so the day split is non-trivial
    val triples = sampleTriples()
      .withColumn("ts",
        expr("timestamp_millis(1700000000000 + CAST(turn_idx AS BIGINT) * 43200000)"))
    val m1 = GraphSink.writeTriples(spark, triples, dir, 8, dayPartition = true)
    assert(m1.buckets == 8 && m1.rows == 500)

    // physical layout: day=* under each conv_bucket dir
    val bucketDirs = new java.io.File(s"$dir/triples").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("conv_bucket="))
    assert(bucketDirs.length == 8)
    assert(bucketDirs.forall(_.listFiles().exists(_.getName.startsWith("day="))),
      "every bucket must be day-partitioned")

    // content round-trips; the day partition column matches to_date(ts)
    val back = spark.read.parquet(s"$dir/triples")
    assert(back.count() == 500)
    assert(back.where(col("day") =!= to_date(col("ts"))).count() == 0)

    // resume semantics unchanged: manifests are per bucket, all skipped
    val m2 = GraphSink.writeTriples(spark, triples, dir, 8, dayPartition = true)
    assert(m2.buckets == 0 && m2.skippedBuckets == 8 && m2.rows == 0)
    assert(spark.read.parquet(s"$dir/triples").count() == 500)

    // resuming the committed day layout FLAT must refuse loudly — mixed
    // partition depths under one triples root break every reader
    val e = intercept[IllegalArgumentException] {
      GraphSink.writeTriples(spark, triples, dir, 8, dayPartition = false)
    }
    assert(e.getMessage.contains("day_partition"))
  }

  test("day layout: drifted resume of a pending bucket leaves no stale day dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_drift").toString
    // 3-day spread so each bucket holds several day dirs
    val triples = sampleTriples()
      .withColumn("ts",
        expr("timestamp_millis(1700000000000 + CAST(turn_idx AS BIGINT) * 43200000)"))
    GraphSink.writeTriples(spark, triples, dir, 8, dayPartition = true)

    // crash window: one bucket's data committed, manifest lost
    val victim = new java.io.File(s"$dir/_manifests").listFiles()
      .filter(_.getName.startsWith("bucket-")).map(_.getName)
      .map(_.stripPrefix("bucket-").stripSuffix(".json").toInt).min
    assert(new java.io.File(s"$dir/_manifests/bucket-$victim.json").delete())

    // the resumed run sees DRIFTED input (ts shifted +30 days — a day
    // set disjoint from the crashed run's). ADVICE r4: dynamic overwrite
    // alone only replaces the day leaves present in the NEW data, so the
    // old day dirs would survive inside the "replaced" bucket and get
    // blessed into the manifest by the read-back fingerprint. The
    // up-front delete of uncommitted bucket dirs must prevent that.
    val drifted = triples.withColumn("ts",
      expr("timestamp_millis(unix_millis(ts) + 2592000000)"))
    GraphSink.writeTriples(spark, drifted, dir, 8, dayPartition = true)

    val oldDays = GraphSink.bucketed(triples, 8)
      .where(col("conv_bucket") === victim)
      .select(GraphSink.utcDay(col("ts")).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val onDisk = new java.io.File(s"$dir/triples/conv_bucket=$victim").listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName.stripPrefix("day=")).toSet
    assert(oldDays.nonEmpty && onDisk.intersect(oldDays).isEmpty,
      s"stale pre-drift day dirs survived the resume: ${onDisk.intersect(oldDays)}")

    // the victim bucket's rows and manifest now describe ONLY the
    // drifted input — no duplicate rows from the crashed run
    val expect = GraphSink.bucketed(drifted, 8).where(col("conv_bucket") === victim).count()
    val got = spark.read.parquet(s"$dir/triples")
      .where(col("conv_bucket") === victim).count()
    assert(got == expect, s"victim bucket rows $got != drifted input $expect")
    val m = spark.read.json(s"$dir/_manifests")
      .where(col("bucket") === victim).select(col("rows")).first().getLong(0)
    assert(m == expect)
  }

  test("readTriplesDayRange is layout-agnostic: flat scan == pruned day read") {
    val triples = sampleTriples()
      .withColumn("ts",
        expr("timestamp_millis(1700000000000 + CAST(turn_idx AS BIGINT) * 43200000)"))
    val flat = java.nio.file.Files.createTempDirectory("graft_range_flat").toString
    val day = java.nio.file.Files.createTempDirectory("graft_range_day").toString
    GraphSink.writeTriples(spark, triples, flat, 8)
    GraphSink.writeTriples(spark, triples, day, 8, dayPartition = true)
    val Seq(fromD, toD) = Seq("2023-11-15", "2023-11-16")
    val onFlat = GraphSink.readTriplesDayRange(spark, flat, fromD, toD)
      .select("conv_id", "turn_idx", "subj", "pred", "obj")
    val onDay = GraphSink.readTriplesDayRange(spark, day, fromD, toD)
      .select("conv_id", "turn_idx", "subj", "pred", "obj")
    assert(onFlat.count() > 0, "range must be non-vacuous")
    assert(onFlat.exceptAll(onDay).count() == 0 && onDay.exceptAll(onFlat).count() == 0,
      "flat-layout fallback diverged from the pruned day read")
  }

  test("clean partial-run resume still skips committed buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_partial").toString
    val triples = sampleTriples()
    val m1 = GraphSink.writeTriples(spark, triples, dir, 8)
    assert(m1.buckets == 8 && m1.skippedBuckets == 0)
    val m2 = GraphSink.writeTriples(spark, triples, dir, 8)
    assert(m2.buckets == 0 && m2.skippedBuckets == 8 && m2.rows == 0L)
  }
}
