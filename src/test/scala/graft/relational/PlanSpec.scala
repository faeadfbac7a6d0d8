package graft.relational

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape gates (SURVEY.md §4.2 checklist): pushdown +
  * column pruning reach the parquet scan, dimension joins broadcast,
  * hot aggregations stay HashAggregate, semi/anti joins plan as such,
  * and the MinHash rewrite avoids row-exploding generators. These lock
  * in the plans we chose — a regression to a worse plan fails the
  * suite, not just the benchmark.
  */
class PlanSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("plans")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // disable AQE here so the compile-time plan is inspectable
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(name: String): String =
    Catalog.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def scans(name: String): Seq[FileSourceScanExec] =
    Catalog.queries(name)(spark, sfDir).queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }

  test("pricing agg: hash aggregation + pruned scan (5 of 11 columns)") {
    val p = plan("r_pricing_agg")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortAggregate"))
    val scan = scans("r_pricing_agg").head
    assert(scan.requiredSchema.fieldNames.length == 5,
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("dimension chain: three broadcast joins, no sort-merge") {
    val p = plan("r_broadcast_dims")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti") {
    assert(plan("r_semi_join").contains("LeftSemi"))
    assert(plan("r_anti_join").contains("LeftAnti"))
  }

  test("filter pushdown reaches the scan") {
    val scan = scans("r_string_funcs").head
    assert(scan.metadata("PushedFilters").contains("LessThanOrEqual(c_custkey,100)"),
      scan.metadata("PushedFilters"))
  }

  test("BPE token count prunes the events scan to 2 of its columns") {
    val scan = scans("t_token_bpe").head
    assert(scan.requiredSchema.fieldNames.sorted.toSeq == Seq("event_type", "props"),
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("embedding queries prune the embeddings scan (no label/meta columns)") {
    val scan = scans("e_knn_quantized").head
    assert(scan.requiredSchema.fieldNames.sorted.toSeq == Seq("embedding", "vec_id"),
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("ANN LSH plans the bucket-cap anti-join and a native dot product") {
    val p = plan("e_ann_lsh")
    assert(p.contains("LeftAnti"), "bucket cap anti-join missing")
    assert(p.contains("pal_dot"), "native dot-product expression missing")
    assert(!p.contains("ScalaUDF"), "interpreted UDF crept into the ANN path")
  }

  test("minhash avoids row-exploding signature generation and caps buckets") {
    // the signature/banding stage (inspected PRE-checkpoint: the full
    // query localCheckpoints it so the self-join reuses one execution —
    // its plan would show only the materialized scan)
    val bands = CatalogText.minhashBands(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only Generate allowed is the 4-row stack() unpivot — a shingle
    // or signature explosion would appear as explode/posexplode
    assert(!bands.contains("posexplode") && !bands.contains("explode("),
      bands.take(2000))
    // signatures come from the native codegen'd single-pass expression —
    // no shingle arrays, no interpreted lambdas, no shuffle before the
    // band stack
    assert(bands.contains("pal_minhash_sigs"), bands.take(2000))
    assert(!bands.contains("lambdafunction"), bands.take(2000))
    assert(!bands.contains("Exchange"), bands.take(2000))
    // hot LSH buckets are excluded from the self-join via anti-join
    // (the candidateEdges cap pattern — scale guard against quadratic
    // degenerate buckets)
    val p = plan("t_minhash_lsh")
    assert(p.contains("LeftAnti"), p.take(2000))
  }

  test("day-partitioned triples: time-range read prunes to the matching day dirs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan_day").toString
    // 4 UTC days starting 2025-01-01, hourly rows (24 per day)
    val triples = (0 until 96).map { i =>
      (s"c${i % 7}", i, new java.sql.Timestamp(1735689600000L + i.toLong * 3600000L),
        s"s$i", "mentions", s"o${i % 5}")
    }.toDF("conv_id", "turn_idx", "ts", "subj", "pred", "obj")
    graft.pipeline.GraphSink.writeTriples(spark, triples, dir, nBuckets = 4,
      dayPartition = true)

    val ranged = graft.pipeline.GraphSink.readTriplesDayRange(
      spark, dir, "2025-01-02", "2025-01-03")
    // the filter lands on the PARTITION column: the scan's partition
    // filters carry it and no file outside the two days is even listed —
    // the payoff of the second partition level (SURVEY.md §7.5)
    val scan = ranged.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }.head
    assert(scan.partitionFilters.map(_.toString).mkString(",").contains("day"),
      s"no partition filter on day: ${scan.partitionFilters}")
    // selectedPartitions is the post-pruning file set the scan will read
    // (Dataset.inputFiles reports the UNpruned FileIndex — useless here)
    val files = scan.selectedPartitions.toPartitionArray.map(_.filePath.toString)
    assert(files.nonEmpty &&
      files.forall(f => f.contains("day=2025-01-02") || f.contains("day=2025-01-03")),
      s"scan reads files outside the day range: ${files.mkString("\n")}")
    // and the data actually spans both boundary semantics (inclusive)
    assert(ranged.count() == 48, s"expected 2 of 4 days = 48 rows, got ${ranged.count()}")
    assert(ranged.select("day").distinct().count() == 2)
  }

  test("kg surface-node hot aggregation is hash-based") {
    val labeled = graft.pipeline.Transcripts.generateLabeled(spark, 20)
    val model = graft.pipeline.NerTraining.trainAndBroadcast(
      spark, graft.pipeline.Transcripts.trainSplit(labeled))
    val tagged = graft.pipeline.KgPipeline.tagTurns(
      graft.pipeline.Transcripts.generate(spark, 20), model)
    val nodes = graft.pipeline.KgPipeline.surfaceNodes(
      graft.pipeline.KgPipeline.mentionRows(tagged))
    val p = nodes.queryExecution.executedPlan.toString
    // the big (norm, tag, value) pass must be a HashAggregate; only the
    // tiny second-stage min(value) agg may sort
    val firstHash = p.indexOf("HashAggregate")
    assert(firstHash >= 0, p)
  }
}
