package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one (or more) SparkEntry queries k times in a single
  * JVM and print all walls + the minimum — the min-of-k interleaved
  * estimator this host's CPU steal demands (BENCH/BASELINE.md). Usage:
  *   runMain graft.tools.BenchOne <query>[,<query2>...] [k]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("t_lang_ngram").split(',').toSeq
    val k = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", sys.env.getOrElse("BENCH_EVENTLOG", "false"))
      .config("spark.eventLog.dir", sys.env.getOrElse("BENCH_EVENTLOG_DIR", "/tmp/bench_events"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val walls = scala.collection.mutable.Map.empty[String, List[Double]]
    for (round <- 1 to k; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val w = (System.nanoTime() - t0) / 1e9
      walls(name) = w :: walls.getOrElse(name, Nil)
      println(f"[benchone] round=$round $name wall=$w%.3f s")
    }
    for (name <- names)
      println(f"[benchone] MIN $name ${walls(name).min}%.3f s over $k rounds")
    spark.stop()
  }
}
