package graft

import graft.pipeline.{GraphSink, KgPipeline, NerTraining, Transcripts}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end gate for the spark-submit entry point: parquet transcripts
  * + persisted model in, materialized graph + manifests out; a re-run
  * against a completed output is a pure resume (all buckets skipped, no
  * data change); a partially-lost output recovers exactly the missing
  * bucket.
  */
class KgJobSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("kgjob")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val N = 30L

  test("KgJob: transcripts parquet -> materialized graph, resume-safe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kgjob").toString
    val input = s"$dir/transcripts"
    val modelPath = s"$dir/model"
    val output = s"$dir/graph"

    // stage inputs: turn table + persisted model (the deploy-time shape)
    val labeled = Transcripts.generateLabeled(spark, N).cache()
    labeled.map(r => graft.corpus.Turn(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts))
      .write.parquet(input)
    NerTraining.save(NerTraining.trainModel(Transcripts.trainSplit(labeled)), spark, modelPath)

    val m1 = KgJob.run(spark, input, modelPath, output, buckets = 8)
    assert(m1.turns > 0 && m1.triples > 0 && m1.entities > 0 && m1.edges > 0)
    assert(m1.bucketsWritten > 0 && m1.bucketsSkipped == 0)

    // on-disk triples == the in-memory pipeline on the same input+model
    val model = spark.sparkContext.broadcast(NerTraining.load(spark, modelPath))
    val want = KgPipeline.run(spark,
        spark.read.parquet(input).as[graft.corpus.Turn], model)
      .resolvedTriples.select("conv_id", "turn_idx", "subj", "pred", "obj").collect()
      .map(_.toSeq).sortBy(_.toString)
    val got = spark.read.parquet(s"$output/triples")
      .select("conv_id", "turn_idx", "subj", "pred", "obj").collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(got.length == want.length && got.sameElements(want),
      s"materialized (${got.length}) != pipeline (${want.length})")

    // full re-run against a completed output: pure resume, nothing rewritten
    val m2 = KgJob.run(spark, input, modelPath, output, buckets = 8)
    assert(m2.bucketsWritten == 0 && m2.bucketsSkipped == m1.bucketsWritten,
      s"expected pure resume, got $m2")
    assert(spark.read.parquet(s"$output/triples").count() == m1.triples)

    // lose one bucket's manifest (the crash window): the next run must
    // re-materialize exactly that bucket and leave the table identical
    val done = GraphSink.doneBuckets(spark, output)
    val victim = done.head
    val fs = new org.apache.hadoop.fs.Path(output)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$output/_manifests/bucket-$victim.json"), false)
    val m3 = KgJob.run(spark, input, modelPath, output, buckets = 8)
    assert(m3.bucketsWritten == 1 && m3.bucketsSkipped == done.size - 1,
      s"expected single-bucket recovery, got $m3")
    val after = spark.read.parquet(s"$output/triples")
      .select("conv_id", "turn_idx", "subj", "pred", "obj").collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(after.sameElements(want), "resume changed the materialized table")

    // resuming under a DIFFERENT bucket count must refuse loudly: the
    // committed manifest ids index another partition function and a
    // silent resume would lose/duplicate rows across the two layouts
    val e = intercept[IllegalArgumentException] {
      KgJob.run(spark, input, modelPath, output, buckets = 4)
    }
    assert(e.getMessage.contains("n_buckets"), e.getMessage)

    // day-partitioned job run to a fresh output: same triples, day dirs
    // under every bucket, layout recorded for the resume guard. A
    // leftover CC checkpoint is planted under the output first: a
    // SUCCESSFUL job must clean `_cc_checkpoints` up (ADVICE r4 — the
    // frontier is O(|nodes|) dead weight once the manifests commit, and
    // a stale one trips the fingerprint guard on a later reuse)
    val output2 = s"$dir/graph_day"
    val ccDir = new java.io.File(s"$output2/_cc_checkpoints")
    ccDir.mkdirs()
    java.nio.file.Files.writeString(ccDir.toPath.resolve("stale-marker.txt"), "leftover")
    val mDay = KgJob.run(spark, input, modelPath, output2, buckets = 8, dayPartition = true)
    assert(!ccDir.exists(), "_cc_checkpoints must be deleted after a successful job")
    assert(mDay.triples == m1.triples)
    val dayGot = spark.read.parquet(s"$output2/triples")
      .select("conv_id", "turn_idx", "subj", "pred", "obj").collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(dayGot.sameElements(want), "day-partitioned table diverged")
    val bucketDirs = new java.io.File(s"$output2/triples").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("conv_bucket="))
    assert(bucketDirs.nonEmpty &&
      bucketDirs.forall(_.listFiles().exists(_.getName.startsWith("day="))))
    val eDay = intercept[IllegalArgumentException] {
      KgJob.run(spark, input, modelPath, output2, buckets = 8, dayPartition = false)
    }
    assert(eDay.getMessage.contains("day_partition"), eDay.getMessage)
  }
}
