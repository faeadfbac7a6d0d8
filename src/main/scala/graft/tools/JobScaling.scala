package graft.tools

import graft.pipeline.{NerTraining, Transcripts}
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Job-level two-parallelism scaling evidence (VERDICT r3 item 4): the
  * FULL production entry — `graft.KgJob.run` end to end, parquet
  * transcripts in, materialized graph + manifests out — on identical
  * input at two `local[k]` levels, one measurement per fresh JVM,
  * interleaved min-of-k across runs (the host-steal discipline of
  * BENCH/BASELINE.md). Complements BENCH/stage_scaling.json, which
  * isolates the throughput-dominant NLP stage: this artifact measures
  * the whole job, serial fractions (driver-side model collect,
  * sub-threshold CC union-find, manifest read-back) included.
  *
  * Modes:
  *   prep <workDir>          generate transcripts parquet + NER model once
  *   run <cores> <workDir>   one timed KgJob at local[cores] (fresh JVM,
  *                           fresh output dir), append to
  *                           BENCH/job_scaling_runs.jsonl
  *   report                  pool runs (byte-identical protocol only),
  *                           min per level, write BENCH/job_scaling.json
  */
object JobScaling {

  /** Corpus size = multiplier x the sf0.1 conv count. The job carries a
    * ~24 s FIXED cost (model load/broadcast ~4 s, Catalyst planning +
    * whole-stage codegen across ~15 actions, manifest commits) that is
    * corpus-size-invariant — measuring at two corpus sizes separates
    * that fixed term from the scalable work (see BENCH/BASELINE.md).
    */
  def nConvs(multiplier: Long): Long = Transcripts.convsForSfDir(
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")) * multiplier

  val BUCKETS = 32 // constant across levels: identical job, identical output layout

  def protocol(turns: Long): String =
    s"graft.KgJob.run end-to-end (read parquet transcripts -> tag -> link " +
      s"-> CC -> resolve -> GraphSink materialize w/ manifests, $BUCKETS buckets) " +
      s"on $turns turns, fresh JVM + fresh output dir per measurement, " +
      "interleaved rounds pooled across runs, min per level"

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"job-scaling-$cores")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def prep(workDir: String, multiplier: Long): Unit = {
    val spark = session(8)
    try {
      import spark.implicits._
      val convs = nConvs(multiplier)
      val labeled = Transcripts.generateLabeled(spark, convs).cache()
      val n = labeled.count()
      labeled.map(r => graft.corpus.Turn(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts))
        .write.mode("overwrite").parquet(s"$workDir/input")
      val model = NerTraining.trainModel(Transcripts.trainSplit(labeled))
      NerTraining.save(model, spark, s"$workDir/model")
      println(s"""{"prep":"done","convs":$convs,"rows":$n,"input":"$workDir/input"}""")
    } finally spark.stop()
  }

  def runOne(cores: Int, workDir: String): Unit = {
    val out = s"$workDir/out_$cores"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val spark = session(cores)
    try {
      val t0 = System.nanoTime()
      val m = graft.KgJob.run(spark, s"$workDir/input", s"$workDir/model", out, BUCKETS)
      val sec = (System.nanoTime() - t0) / 1e9
      val line =
        s"""{"cores":$cores,"sec":${"%.3f".formatLocal(java.util.Locale.ROOT, sec)},""" +
          s""""turns":${m.turns},"triples":${m.triples},"buckets":${m.bucketsWritten},""" +
          s""""protocol":"${protocol(m.turns)}"}"""
      Files.createDirectories(Paths.get("BENCH"))
      // true O(1) append — a read+truncate+rewrite would destroy the
      // accumulated run history on a crash mid-write
      Files.writeString(Paths.get("BENCH/job_scaling_runs.jsonl"), line + "\n",
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      println(line)
    } finally spark.stop()
  }

  def report(): Unit = {
    val lines = Files.readString(Paths.get("BENCH/job_scaling_runs.jsonl"))
      .split('\n').filter(_.nonEmpty).toSeq
    case class Run(cores: Int, sec: Double, turns: Long, protocol: String)
    def parse(l: String): Option[Run] = for {
      c <- """"cores":(\d+)""".r.findFirstMatchIn(l)
      s <- """"sec":([0-9.]+)""".r.findFirstMatchIn(l)
      t <- """"turns":(\d+)""".r.findFirstMatchIn(l)
      p <- """"protocol":"([^"]*)"""".r.findFirstMatchIn(l)
    } yield Run(c.group(1).toInt, s.group(1).toDouble, t.group(1).toLong, p.group(1))
    val runs = lines.flatMap(parse)
    require(runs.nonEmpty, "no parseable runs in BENCH/job_scaling_runs.jsonl")
    // one entry per corpus size; pooling gated on the byte-identical
    // protocol string (which embeds the turn count)
    def pct(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val perCorpus = runs.groupBy(_.turns).toSeq.sortBy(_._1).map { case (turns, rs) =>
      val pooled = rs.filter(_.protocol == protocol(turns))
      val byCores = pooled.groupBy(_.cores).map { case (c, cs) =>
        c -> (cs.map(_.sec).min, cs.length)
      }
      def pair(lo: Int, hi: Int): Option[String] =
        for { (wLo, kLo) <- byCores.get(lo); (wHi, kHi) <- byCores.get(hi) } yield {
          val speedup = wLo / wHi
          s""""local${lo}_to_${hi}":{"speedup":${pct(speedup)},""" +
            s""""efficiency":${pct(speedup / (hi.toDouble / lo))},""" +
            s""""runs_n":$kLo,"runs_n4":$kHi}"""
        }
      val walls = byCores.toSeq.sortBy(_._1).map { case (c, (w, k)) =>
        s""""local$c":{"wall_min":$w,"runs":$k}""" }
      // fixed-vs-scalable decomposition from the (2, 8) mins:
      // T(p) = S + W/p  =>  W = (T2 - T8)/(1/2 - 1/8), S = T2 - W/2
      val model = for { (w2, _) <- byCores.get(2); (w8, _) <- byCores.get(8) } yield {
        val work = (w2 - w8) / 0.375
        val fixed = w2 - work / 2
        s""""fixed_cost_sec":${pct(fixed)},"parallel_work_core_sec":${pct(work)}"""
      }
      // assemble from only the fields that exist — a corpus measured at
      // other core pairs must not produce dangling commas (invalid JSON)
      val fields = Seq(s""""turns":$turns""") ++ walls ++
        Seq(pair(2, 8), pair(8, 32), model).flatten :+
        s""""protocol":"${protocol(turns)}""""
      fields.mkString("{", ",", "}")
    }
    val json =
      s"""{"metric":"job_scaling_efficiency","unit":"ratio",""" +
        s""""corpora":[${perCorpus.mkString(",")}]}"""
    println(json)
    Files.writeString(Paths.get("BENCH/job_scaling.json"), json + "\n")
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "prep" :: workDir :: Nil         => prep(workDir, 2L)
    case "prep" :: workDir :: m :: Nil    => prep(workDir, m.toLong)
    case "run" :: cores :: workDir :: Nil => runOne(cores.toInt, workDir)
    case "report" :: Nil                  => report()
    case other => sys.error(s"usage: prep <dir> [mult] | run <cores> <dir> | report (got: $other)")
  }
}
