package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Paths}

/** Driver-run benchmark. Prints ONE COMPACT JSON line as the final stdout
  * line (driver contract: {"metric","value","unit","queries",...}) and
  * writes the full per-query timing table to BENCH/queries_r5.json.
  *
  * Why the split: the driver captures a bounded TAIL of stdout; r1/r2
  * put all ~104 per-query timings on the contract line, which grew past
  * the capture window and was truncated at the FRONT — BENCH_r01/r02
  * both recorded `parsed: null` (VERDICT r2 "what's wrong" #2). The
  * contract line now carries the headline metrics plus the ~10 most
  * expensive queries (the ones worth grading), staying well under 1 KB;
  * everything else goes to the file artifact.
  *
  * The flagship build (generate → train → tag → link → CC → resolve) is
  * timed first as "kg_flagship_build"; the role classifier train+score
  * is then warmed as its own timed stage "kg_role_train_score" so the
  * alphabetical per-query loop measures STEADY-STATE reads for the
  * kg_role_* family instead of attributing the full uncached train+score
  * cost to whichever sibling sorts first (VERDICT r2 "what's wrong" #3:
  * kg_role_accuracy recorded 15.4 s of someone else's work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // flagship end-to-end (forces the full DAG incl. CC + salted resolve).
    // resolvedTriples.count() runs FIRST: it forces the whole pipeline
    // (filling the tagged/nodes caches), so the remaining two counts read
    // caches instead of racing it to materialize them.
    val t0 = System.nanoTime()
    val built = Kg.built(spark, sfDir)
    val nTriples = built.out.resolvedTriples.count()
    val nTurns = built.out.tagged.count()
    val nEntities = built.out.entities.count()
    val flagshipSec = (System.nanoTime() - t0) / 1e9

    // role-classifier warm-up: train + score, timed as its own stage.
    // Min-of-2 like the flagship: the stage is cheap (~2 s warm) but a
    // min-of-1 wall sat in the steal-noise class the driver artifact
    // keeps tripping on; the re-run evicts ONLY the role caches so both
    // walls time identical work over the same warm corpus caches (and
    // the re-run repopulates the cache for the per-query pass).
    val tR = System.nanoTime()
    Kg.roleScored(spark, sfDir).count()
    val roleSec1 = (System.nanoTime() - tR) / 1e9
    Kg.evictRole(sfDir)
    val tR2 = System.nanoTime()
    Kg.roleScored(spark, sfDir).count()
    val roleSec = math.min(roleSec1, (System.nanoTime() - tR2) / 1e9)

    // per-query pass. Failures are RECORDED, not swallowed (VERDICT r4
    // "what's wrong" #2): a query that starts crashing must surface as
    // an error marker in the graded artifact, never as a weird timing.
    def timeOne(fn: (SparkSession, String) => DataFrame): (Double, Option[String]) = {
      val t = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("").take(120)) }
      ((System.nanoTime() - t) / 1e9, err)
    }
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, err) = timeOne(fn)
      (name, sec, err)
    }
    // outlier re-timing (VERDICT r4 "what's wrong" #1): host CPU steal
    // inflates single-shot walls 2-6x, and the per-query table was the
    // last min-of-1 surface left (r4 recorded four phantom 11-22 s
    // regressions that min-of-3 audits measured at <=1 s). Any query
    // whose wall exceeds 3x the pass median gets ONE warm re-run; the
    // min is the reported wall. Bounded cost: only the outliers re-run,
    // and a genuinely slow query stays slow on its second sample.
    val sorted = firstPass.map(_._2).sorted
    val median = if (sorted.isEmpty) 0.0 else sorted(sorted.length / 2)
    val retimeThreshold = math.max(1.0, 3 * median)
    val results = firstPass.map {
      case (name, sec, None) if sec > retimeThreshold =>
        val (sec2, err2) = timeOne(SparkEntry.queries(name))
        (name, math.min(sec, sec2), err2, Some(sec))
      case (name, sec, err) => (name, sec, err, None)
    }
    val errors = results.collect { case (name, _, Some(msg), _) => name -> msg }
    val nRetimed = results.count(_._4.isDefined)

    // scale exercise (VERDICT r1 item 3): 450k alias nodes / 2M triples
    // force the >threshold code paths — iterative CC loop, salted
    // resolve, block-overflow cap — that the sf corpus is too small to
    // reach; iterations + overflow land in the JSON as evidence
    val tS = System.nanoTime()
    val scale = graft.pipeline.ScaleLinking.run(spark)
    val scaleSec = (System.nanoTime() - tS) / 1e9

    // streaming twin of the scale exercise: 205k docs through the
    // expiring near-dup path on RocksDB state — proves exactly-once
    // pairs, hot-bucket cap, and event-time state expiry at bench scale
    val tStr = System.nanoTime()
    val stream = graft.streaming.StreamingScale.run(spark)
    val streamSec = (System.nanoTime() - tStr) / 1e9

    // the PRODUCTION streaming entry at bench scale: the full corpus
    // through graft.StreamJob (persisted model, published canon map,
    // file drops, --once), gated stream == batch by count+fingerprint.
    // sjob.sec times only the job run, not the untimed staging.
    val sjob = graft.streaming.StreamJobScale.run(spark, sfDir)

    // the INCREMENTAL production entry at bench scale: prior 99.9% of
    // convs through the full KgJob (staging, reported separately), the
    // held-out batch applied via KgIncrementalJob — gated fingerprint-
    // identical to the cached flagship build (must run BEFORE Kg.evict)
    // and required to leave most buckets untouched. The headline wall is
    // the apply alone: the batch-proportional maintenance cost.
    val incr = graft.pipeline.IncrScale.run(spark, sfDir)

    // second COLD flagship build: host CPU steal inflates any single
    // wall 2–6× (BENCH/BASELINE.md), and the flagship number is the
    // BASELINE.json headline — min-of-2 is the documented estimator
    Kg.evict(sfDir)
    val t2 = System.nanoTime()
    val built2 = Kg.built(spark, sfDir)
    // IDENTICAL action set to run 1 — the two walls must measure the
    // same work or the min compares workloads instead of steal windows
    val n2 = built2.out.resolvedTriples.count()
    built2.out.tagged.count()
    val e2 = built2.out.entities.count()
    val flagship2 = (System.nanoTime() - t2) / 1e9
    require(n2 == nTriples && e2 == nEntities,
      s"cold rebuild diverged: triples $n2 != $nTriples or entities $e2 != $nEntities")
    val flagshipMin = math.min(flagshipSec, flagship2)
    val turnsPerSecMin = nTurns / flagshipMin

    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // `all` counts the flagship ONCE (the min) — total and the top-10
    // must not triple-count the two walls; the raw walls go ONLY to the
    // per-query file and the flagship_walls field
    val all = results.map(t => t._1 -> t._2) :+ ("kg_flagship_build" -> flagshipMin) :+
      ("kg_role_train_score" -> roleSec) :+ ("kg_scale_linking" -> scaleSec) :+
      ("kg_stream_scale" -> streamSec) :+ ("kg_stream_job" -> sjob.sec) :+
      ("kg_incr_job" -> incr.applySec)
    val total = all.map(_._2).sum

    // full per-query table -> file artifact (every timing, 3 decimals);
    // retimed outliers keep their first-pass wall as <name>__run1, and
    // any failed query lands in the "errors" object with its message
    Files.createDirectories(Paths.get("BENCH"))
    val run1Walls = results.collect { case (name, _, _, Some(first)) =>
      (name + "__run1") -> first }
    // scale-exercise phase attribution (min-of-1 stage, steal-sensitive:
    // the file artifact carries the split so a fat total is diagnosable)
    val scaleWalls = graft.pipeline.ScaleLinking.lastPhaseWalls
      .map { case (n, sec) => s"kg_scale_linking__$n" -> sec }
    val timingsJson = (all ++ run1Walls ++ scaleWalls :+
        ("kg_incr_job__prior_full_job" -> incr.priorJobSec) :+
        ("kg_flagship_build_run1" -> flagshipSec) :+
        ("kg_flagship_build_run2" -> flagship2)).sortBy(-_._2)
      .map { case (k, v) => s"""  "$k": ${r3(v)}""" }
      .mkString(",\n")
    val errorsJson = errors
      .map { case (k, msg) => s"""    "$k": "${msg.replace("\\", "\\\\").replace("\"", "'")}"""" }
      .mkString("{\n", ",\n", "\n  }")
    val fileJson = s"""{\n  "errors": $errorsJson,\n$timingsJson\n}\n"""
    Files.writeString(Paths.get("BENCH/queries_r5.json"), fileJson)

    // contract line: headline metrics + the 10 slowest queries only
    val top = all.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val contractLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$top,"sf":"$sfDir",""" +
        s""""n_queries":${all.size},"errors":${errors.size},"retimed":$nRetimed,""" +
        s""""queries_file":"BENCH/queries_r5.json",""" +
        s""""turns":$nTurns,"triples":$nTriples,"entities":$nEntities,""" +
        s""""flagship_sec":${r3(flagshipMin)},"turns_per_sec":${r3(turnsPerSecMin)},""" +
        s""""flagship_walls":[${r3(flagshipSec)},${r3(flagship2)}],""" +
        s""""role_train_score_sec":${r3(roleSec)},""" +
        s""""scale_nodes":${scale.nodes},"scale_components":${scale.components},""" +
        s""""scale_cc_iterations":${scale.ccIterations},"scale_overflow_blocks":${scale.overflowBlocks},""" +
        s""""scale_resolved_with_id":${scale.resolvedWithId},"scale_triples":${scale.triples},""" +
        s""""scale_gaz_aliases":${scale.gazAliases},"scale_gaz_resolved":${scale.gazResolved},""" +
        s""""stream_docs":${stream.docs},"stream_pairs":${stream.pairs},""" +
        s""""stream_hot_pairs":${stream.hotPairs},"stream_state_peak":${stream.statePeak},""" +
        s""""stream_state_after_expiry":${stream.stateAfterExpiry},""" +
        s""""stream_batches":${stream.batches},"stream_batch_ms_median":${stream.medianBatchMs},""" +
        s""""sjob_turns":${sjob.turns},"sjob_rows":${sjob.rows},""" +
        s""""sjob_sec":${r3(sjob.sec)},"sjob_turns_per_sec":${r3(sjob.turns / sjob.sec)},""" +
        s""""incr_batch_turns":${incr.batchTurns},"incr_rewritten":${incr.rewrittenBuckets},""" +
        s""""incr_untouched":${incr.untouchedBuckets}}"""
    // the driver parses a bounded (~2 KB) stdout TAIL. The binding
    // invariant is that the LAST copy of the line (printed after
    // spark.stop(), followed only by sbt's ~70-char "[success]" trailer)
    // sits fully inside that tail; the first copy is best-effort
    // insurance and may be front-clipped. The line is ~1.1 KB today —
    // fail LOUDLY at 1300 rather than ship a bench whose artifact
    // records parsed:null (the defect that survived rounds 1–3)
    require(contractLine.length < 1300,
      s"contract line grew to ${contractLine.length} chars — trim fields or move them " +
        "to BENCH/queries_r5.json before the driver's tail capture truncates it")
    // Printed twice: once here (insurance against anything after us
    // truncating the tail) and once AFTER spark.stop() so Spark's
    // shutdown WARN chatter cannot land between the contract line and
    // process exit — the driver parses the LAST json line of a bounded
    // stdout tail.
    println(contractLine)
    spark.stop()
    println(contractLine)
  }
}
