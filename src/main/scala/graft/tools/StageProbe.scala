package graft.tools

import org.apache.spark.sql.SparkSession

/** Re-runs the bench's scale stages (stream job / stream scale / incr
  * job) k times in one warmed JVM — min-of-k attribution for the
  * min-of-1 bench stages while iterating on their internals (r6).
  * Usage: runMain graft.tools.StageProbe [sjob|stream|incr|all] [k]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val k = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.Kg.built(spark, sfDir).out.resolvedTriples.count()
    System.err.println(f"[stageprobe] corpus built: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    for (round <- 1 to k) {
      if (which == "sjob" || which == "all") {
        val r = graft.streaming.StreamJobScale.run(spark, sfDir)
        System.err.println(f"[stageprobe] round=$round kg_stream_job=${r.sec}%.2f s " +
          s"(rows=${r.rows} batches=${r.batches})")
      }
      if (which == "stream" || which == "all") {
        val t = System.nanoTime()
        val r = graft.streaming.StreamingScale.run(spark)
        System.err.println(f"[stageprobe] round=$round kg_stream_scale=${(System.nanoTime() - t) / 1e9}%.2f s " +
          s"(pairs=${r.pairs} peak=${r.statePeak} batches=${r.batches} medMs=${r.medianBatchMs})")
      }
      if (which == "incr" || which == "all") {
        val r = graft.pipeline.IncrScale.run(spark, sfDir)
        System.err.println(f"[stageprobe] round=$round kg_incr_job=${r.applySec}%.2f s " +
          f"(prior=${r.priorJobSec}%.2f s rewritten=${r.rewrittenBuckets})")
      }
    }
    spark.stop()
  }
}
