package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run the bench-scale incremental maintenance stage alone and
  * print its result (phase walls land on stderr via [kgincr]/[kgjob]).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.IncrProbe [batchMod...]
  * Passing several batchMod values (e.g. 1024 128 16) measures apply
  * cost at several batch fractions against the same corpus — the
  * batch-proportionality evidence (each run pays its own prior build).
  */
object IncrProbe {
  def main(args: Array[String]): Unit = {
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
    if (args.headOption.contains("seq")) {
      val n = if (args.length > 1) args(1).toInt else 3
      val (priorSec, walls) = graft.pipeline.IncrScale.runSequential(spark, sfDir, n)
      println(f"[incrprobe] seq priorJobSec=$priorSec%.2f applies=" +
        walls.map(w => f"$w%.2f").mkString(","))
      spark.stop()
      return
    }
    val mods = if (args.isEmpty) Seq(1024) else args.toSeq.map(_.toInt)
    for (mod <- mods) {
      val r = graft.pipeline.IncrScale.run(spark, sfDir, batchMod = mod,
        requireMostlyUntouched = mod >= 256)
      println(f"[incrprobe] batchMod=$mod priorTurns=${r.priorTurns} batchTurns=${r.batchTurns} " +
        f"priorJobSec=${r.priorJobSec}%.2f applySec=${r.applySec}%.2f " +
        f"rewritten=${r.rewrittenBuckets} untouched=${r.untouchedBuckets} " +
        f"changed=${r.changedSurfaces} triples=${r.triples}")
    }
    spark.stop()
  }
}
