package graft

import graft.corpus.Turn
import graft.pipeline.{GraphSink, KgPipeline, NerTraining}
import org.apache.spark.sql.SparkSession

/** Production spark-submit entry point for the full KG-construction job
  * (BASELINE.json north rule: "runs via spark-submit on a multi-executor
  * cluster"; SURVEY.md §3.3). Reads an Iceberg/Parquet transcript table
  * with columns (conv_id, turn_idx, role, text, tool, ts), tags it with
  * a persisted NER model, links + canonicalizes entities, and
  * materializes the graph (triples/entities/edges) with per-bucket
  * lineage manifests. Re-running against the same output directory
  * RESUMES: committed buckets (manifest present) are skipped, pending
  * ones are idempotently rewritten (GraphSink's dynamic-overwrite +
  * rename-commit protocol).
  *
  * Usage (spark-submit supplies master/executor conf; nothing here pins
  * a master so the same jar runs at N and 4N executors unchanged):
  *
  *   spark-submit --class graft.KgJob palladianspark.jar \
  *     --input  hdfs://.../transcripts \
  *     --model  hdfs://.../ner_model \
  *     --output hdfs://.../graph      \
  *     [--buckets 64]
  *
  * Prints one JSON metrics line (rows, convs, buckets written/skipped,
  * entity/edge counts) — the job's observability contract.
  */
object KgJob {

  final case class JobMetrics(
      turns: Long, triples: Long, entities: Long, edges: Long,
      bucketsWritten: Int, bucketsSkipped: Int)

  private val knownFlags = Set("--input", "--model", "--output", "--buckets", "--day-partition")

  def main(args: Array[String]): Unit = {
    // Strict parse (ADVICE r3): a misspelled flag or dangling token must
    // fail loudly, not silently fall back to a default that the resume
    // guard only catches on a later re-run against the same output dir.
    if (args.length % 2 != 0)
      sys.error(s"odd argument list ${args.mkString(" ")}; expected --flag value pairs " +
        s"from ${knownFlags.mkString(", ")}")
    val pairs = args.grouped(2).map { case Array(k, v) => k -> v }.toSeq
    val unknown = pairs.map(_._1).filterNot(knownFlags)
    if (unknown.nonEmpty)
      sys.error(s"unknown option(s) ${unknown.mkString(", ")}; accepted: ${knownFlags.mkString(", ")}")
    val opts = pairs.toMap
    val input = opts.getOrElse("--input", sys.error("--input <transcripts parquet> required"))
    val modelPath = opts.getOrElse("--model", sys.error("--model <ner model parquet> required"))
    val output = opts.getOrElse("--output", sys.error("--output <graph dir> required"))
    val buckets = opts.getOrElse("--buckets", "16").toInt
    val dayPartition = opts.getOrElse("--day-partition", "false").toBoolean
    val spark = SparkSession.builder()
      .appName("graft-kg-construct")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    val m = run(spark, input, modelPath, output, buckets, dayPartition)
    println(
      s"""{"job":"kg_construct","turns":${m.turns},"triples":${m.triples},""" +
        s""""entities":${m.entities},"edges":${m.edges},""" +
        s""""buckets_written":${m.bucketsWritten},"buckets_skipped":${m.bucketsSkipped}}""")
    spark.stop()
  }

  /** The job body, callable from tests with an existing session. Phase
    * walls go to stderr — the observability needed to attribute the
    * job's serial fraction (driver planning/codegen, model load, the CC
    * dispatch count) separately from the scalable work when measuring
    * N-vs-4N (BENCH/job_scaling.json).
    */
  def run(spark: SparkSession, input: String, modelPath: String, output: String,
      buckets: Int = 16, dayPartition: Boolean = false): JobMetrics = {
    import spark.implicits._
    var t = System.nanoTime()
    def phase(name: String): Unit = {
      val now = System.nanoTime()
      System.err.println(f"[kgjob] $name: ${(now - t) / 1e9}%.2f s")
      t = now
    }
    val turns = spark.read.parquet(input).as[Turn]
    val model = spark.sparkContext.broadcast(NerTraining.load(spark, modelPath))
    phase("load_model_broadcast")
    // CC frontier checkpoints live under the job output dir: a killed
    // linking phase resumes the label-propagation loop from its last
    // committed iteration instead of iteration 0 (engaged on the
    // >CC_LOCAL_THRESHOLD loop path; see connectedComponentsLoopDurable)
    val out = KgPipeline.run(spark, turns, model, Some(s"$output/_cc_checkpoints"))
    // this wall covers what run() actually FORCES: the tagging pass
    // (cache fill via the CC-dispatch node count) + blocking join + CC.
    // canonicalize/resolveTriples stay lazy and execute inside the
    // write wall below — the labels state the forced work, not the
    // lazily-attributed stage names
    phase("tag_block_cc")
    // resolvedTriples feeds the triple write AND the edges aggregation —
    // cache it so graph materialization costs one pipeline execution
    out.resolvedTriples.cache()
    val wm = GraphSink.writeTriples(spark, out.resolvedTriples, output, buckets,
      dayPartition = dayPartition)
    phase("resolve_write_triples_manifests")
    GraphSink.writeEntities(out.entities, output)
    GraphSink.writeEdges(out.edges, output)
    // link state makes the output INCREMENTAL-READY: KgIncrementalJob
    // merges later transcript batches against these nodes/labels instead
    // of relinking the whole corpus (alias-scale tables — two small
    // parquet writes). A full run starts the applied-batch ledger empty.
    GraphSink.writeLinkState(spark, out.nodes, out.components, s"$output/_linkstate")
    phase("write_entities_edges_linkstate")
    val nTurns = out.tagged.count()
    val nEntities = out.entities.count()
    val nEdges = out.edges.count()
    val nTriples = out.resolvedTriples.count()
    phase("metrics_counts")
    out.resolvedTriples.unpersist()
    // the CC frontier checkpoint exists only to resume a KILLED linking
    // phase; once the job's final manifests are committed it is dead
    // weight — O(|nodes|) parquet left under every successful output,
    // and a later run reusing the dir with different input would trip
    // the node-set fingerprint guard even after clearing triples +
    // _manifests (ADVICE r4). Delete it at the success point.
    val ccDir = new org.apache.hadoop.fs.Path(s"$output/_cc_checkpoints")
    val hfs = ccDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hfs.exists(ccDir)) hfs.delete(ccDir, true)
    JobMetrics(nTurns, nTriples, nEntities, nEdges, wm.buckets, wm.skippedBuckets)
  }
}
