package graft

import graft.pipeline.{GraphSink, NerTraining, Transcripts}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end gates for the incremental maintenance job: applying
  * batches on top of a completed KgJob output must leave the
  * materialized graph BYTE-EQUIVALENT to a full run over the combined
  * corpus (triples including their resolution columns, entities, edges
  * with delta-merged weights, link state), touch only the affected
  * buckets, refuse double-application, and survive kills at every
  * commit point of its staging protocol.
  */
class KgIncrementalJobSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("kgincr")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val N = 60L

  /** Inputs staged once for all tests: per-batch turn parquet + the
    * shared persisted model (one model serves every batch, the deploy
    * shape). Batches split by conv index: B = idx%8==0, C = idx%8==4,
    * A = the rest; every union is conv-disjoint by construction.
    */
  private lazy val staged: (String, String) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kgincr").toString
    val labeled = Transcripts.generateLabeled(spark, N).cache()
    val turns = labeled.map(r =>
      graft.corpus.Turn(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts))
    val idx = expr("CAST(substring(conv_id, 2) AS BIGINT)")
    turns.where(pmod(idx, lit(8)) =!= 0 && pmod(idx, lit(8)) =!= 4)
      .write.parquet(s"$dir/in_a")
    turns.where(pmod(idx, lit(8)) === 0).write.parquet(s"$dir/in_b")
    turns.where(pmod(idx, lit(8)) === 4).write.parquet(s"$dir/in_c")
    turns.where(pmod(idx, lit(8)) =!= 4).write.parquet(s"$dir/in_ab")
    turns.write.parquet(s"$dir/in_abc")
    NerTraining.save(NerTraining.trainModel(Transcripts.trainSplit(labeled)),
      spark, s"$dir/model")
    labeled.unpersist()
    (dir, s"$dir/model")
  }

  private def sortedRows(df: DataFrame, cols: Seq[String]): Seq[String] =
    df.select(cols.map(col): _*).collect().map(_.toSeq.mkString("")).toSeq.sorted

  private val tripleCols = Seq("conv_id", "turn_idx", "subj", "pred", "obj",
    "subj_tag", "obj_tag", "subj_id", "obj_id", "subj_canonical", "obj_canonical")

  private def assertGraphsEqual(got: String, want: String, what: String): Unit = {
    assert(sortedRows(spark.read.parquet(s"$got/triples"), tripleCols) ==
      sortedRows(spark.read.parquet(s"$want/triples"), tripleCols),
      s"$what: triples (incl. resolution columns) diverged")
    val eCols = Seq("entity_id", "canonical", "entity_type", "n_mentions")
    assert(sortedRows(spark.read.parquet(s"$got/entities"), eCols) ==
      sortedRows(spark.read.parquet(s"$want/entities"), eCols),
      s"$what: entities diverged")
    val gCols = Seq("src", "dst", "pred", "weight")
    assert(sortedRows(spark.read.parquet(s"$got/edges"), gCols) ==
      sortedRows(spark.read.parquet(s"$want/edges"), gCols),
      s"$what: edges diverged (delta-merge != full aggregate)")
    val nCols = Seq("node_id", "norm", "tag", "surface", "n_mentions")
    assert(sortedRows(spark.read.parquet(s"$got/_linkstate/nodes"), nCols) ==
      sortedRows(spark.read.parquet(s"$want/_linkstate/nodes"), nCols),
      s"$what: link-state nodes diverged")
    assert(sortedRows(spark.read.parquet(s"$got/_linkstate/labels"), Seq("node_id", "component")) ==
      sortedRows(spark.read.parquet(s"$want/_linkstate/labels"), Seq("node_id", "component")),
      s"$what: link-state labels diverged")
  }

  private def bucketFiles(output: String, buckets: Set[Int]): Map[Int, Set[String]] =
    buckets.map { b =>
      val d = new java.io.File(s"$output/triples/conv_bucket=$b")
      b -> (if (!d.exists()) Set.empty[String]
            else {
              def walk(f: java.io.File): Seq[String] =
                if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
                else Seq(f.getPath)
              walk(d).toSet
            })
    }.toMap

  test("incremental batch == full recompute; untouched buckets stay untouched (day layout)") {
    val (dir, model) = staged
    val out = s"$dir/g1"
    // 32 buckets: a merged component's surfaces appear in most convs at
    // this tiny scale, so only a bucket holding NO conv that mentions a
    // changed surface can survive — sparse (≈1–2 conv) buckets make that
    // population non-empty
    KgJob.run(spark, s"$dir/in_a", model, out, buckets = 32, dayPartition = true)

    val doneBefore = GraphSink.doneBuckets(spark, out)
    val filesBefore = bucketFiles(out, doneBefore)
    val m = KgIncrementalJob.run(spark, out, s"$dir/in_b", model)
    assert(m.newTurns > 0 && m.newTriples > 0 && m.changedSurfaces > 0,
      s"batch B must add turns and trigger at least one entity merge, got $m")
    assert(m.untouchedBuckets > 0,
      s"expected some bucket to survive untouched, got $m — shrink the batch or raise buckets")

    // the untouched buckets' data files are IDENTICAL paths (dynamic
    // overwrite stamps fresh task uuids into every rewritten file name,
    // so an unchanged listing proves the bucket was not rewritten)
    val filesAfter = bucketFiles(out, doneBefore)
    val unchanged = doneBefore.filter(b => filesAfter(b) == filesBefore(b))
    assert(unchanged.nonEmpty, "no bucket survived untouched")
    assert(unchanged.size == m.untouchedBuckets,
      s"metrics claim ${m.untouchedBuckets} untouched buckets; the listings show ${unchanged.size}")

    val want = s"$dir/g1_full"
    KgJob.run(spark, s"$dir/in_ab", model, want, buckets = 32, dayPartition = true)
    assertGraphsEqual(out, want, "A+B incremental vs full")

    // exactly-once ledger: re-applying the same batch refuses loudly
    val e = intercept[IllegalArgumentException] {
      KgIncrementalJob.run(spark, out, s"$dir/in_b", model)
    }
    assert(e.getMessage.contains("already applied"), e.getMessage)
  }

  test("kill at every commit point; only the interrupted batch may resume a mid-write") {
    val (dir, model) = staged
    val out = s"$dir/g2"
    KgJob.run(spark, s"$dir/in_a", model, out, buckets = 8)

    // crash AFTER staging (nothing live mutated): a different batch may
    // proceed — the stale staging is discarded
    intercept[RuntimeException] {
      KgIncrementalJob.run(spark, out, s"$dir/in_b", model, failAfter = Some("staged"))
    }
    // crash mid-write (manifests invalidated, rewrite unfinished):
    intercept[RuntimeException] {
      KgIncrementalJob.run(spark, out, s"$dir/in_b", model, failAfter = Some("invalidated"))
    }
    // ... a DIFFERENT batch must now refuse ...
    val eCross = intercept[IllegalArgumentException] {
      KgIncrementalJob.run(spark, out, s"$dir/in_c", model)
    }
    assert(eCross.getMessage.contains("INCOMPLETE"), eCross.getMessage)
    // ... and the ORIGINAL batch resumes from the snapshot and completes
    val mB = KgIncrementalJob.run(spark, out, s"$dir/in_b", model)
    assert(mB.rewrittenBuckets > 0)

    // crash after triples committed but before the tail: the NEXT
    // invocation first FINISHES the tail (entities/edges/link-state
    // swaps), which publishes C into the applied ledger — so re-running
    // C is then refused as already applied, proving the killed run's
    // application completed exactly once
    intercept[RuntimeException] {
      KgIncrementalJob.run(spark, out, s"$dir/in_c", model, failAfter = Some("triples"))
    }
    val eC = intercept[IllegalArgumentException] {
      KgIncrementalJob.run(spark, out, s"$dir/in_c", model)
    }
    assert(eC.getMessage.contains("already applied"), eC.getMessage)

    val want = s"$dir/g2_full"
    KgJob.run(spark, s"$dir/in_abc", model, want, buckets = 8)
    assertGraphsEqual(out, want, "A+B+C after kills vs full")
  }

  test("apply order commutes: A+C+B equals A+B+C equals full") {
    // Production batches can arrive out of order; conv-disjoint applies
    // must converge to the same graph regardless. The canonical-map
    // diff machinery makes this non-trivial: a later batch can flip a
    // component's min-norm canonical chosen by an earlier one, and the
    // changed-surface rewrite must repair every stale resolution.
    val (dir, model) = staged
    val out = s"$dir/g3"
    KgJob.run(spark, s"$dir/in_a", model, out, buckets = 8)
    KgIncrementalJob.run(spark, out, s"$dir/in_c", model)
    KgIncrementalJob.run(spark, out, s"$dir/in_b", model)
    val want = s"$dir/g3_full"
    KgJob.run(spark, s"$dir/in_abc", model, want, buckets = 8)
    assertGraphsEqual(out, want, "A then C then B vs full A+B+C")
  }
}
