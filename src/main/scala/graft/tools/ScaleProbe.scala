package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnoses which layer breaks thread scaling on this box:
  * (a) raw JVM threads, arithmetic only;
  * (b) raw JVM threads, allocation-heavy (string building);
  * (c) Spark codegen'd arithmetic (range + xxhash64 sum);
  * (d) the NLP kernel (generation + NER tag) via mapPartitions.
  * Usage: runMain graft.tools.ScaleProbe <threads>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] threads=$n $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    if (args.length > 1 && args(1) == "linking") {
      // time the full ScaleLinking exercise (as Bench runs it) k times
      val k = if (args.length > 2) args(2).toInt else 2
      val spark = SparkSession.builder()
        .master(s"local[$n]")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      for (round <- 1 to k) {
        val t0 = System.nanoTime()
        val r = graft.pipeline.ScaleLinking.run(spark)
        println(f"[probe] linking round=$round wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"ccIters=${r.ccIterations} gazAliases=${r.gazAliases} gazResolved=${r.gazResolved}")
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "tagscale") {
      val nConvs = args(2).toLong
      val spark = SparkSession.builder()
        .master(s"local[$n]")
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val labeled = graft.pipeline.Transcripts.generateLabeled(spark, nConvs).cache()
      labeled.count()
      val model = graft.pipeline.NerTraining.trainAndBroadcast(
        spark, graft.pipeline.Transcripts.trainSplit(labeled))
      val turns = labeled.map(r => graft.corpus.Turn(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts))
      for (parts <- Seq(4, 16, 4, 16, 4, 16)) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val t0 = System.nanoTime()
        val c = graft.pipeline.KgPipeline.tagTurns(turns, model).count()
        println(f"[probe] tagscale parts=$parts wall=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
      spark.stop()
      return
    }

    if (args.length > 1 && args(1) == "rawtag") {
      // NLP kernel with raw JVM threads, no Spark: nConvs split across n
      val nConvs = args(2).toLong
      val corpus = (0L until nConvs).flatMap(graft.corpus.TranscriptGen.turnsForConv)
      val train = corpus.filterNot(lt => graft.corpus.TranscriptGen.isEval(lt.turn.conv_id.drop(1).toLong))
      val model = graft.oracle.Oracle.trainNer(train)
      val chunks = corpus.grouped(math.max(1, corpus.size / n)).toArray
      println(s"[probe] corpus=${corpus.size} chunks=${chunks.length}")
      time("raw_tag") {
        val counts = new java.util.concurrent.atomic.AtomicLong()
        val ts = chunks.map { chunk =>
          new Thread(() => {
            var c = 0L
            for (lt <- chunk) c += graft.semantics.NerModel.tag(lt.turn.text, model).length
            counts.addAndGet(c)
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        println(s"[probe] mentions=${counts.get()}")
      }
      return
    }

    if (args.length > 1 && args(1) == "flagship") {
      val nConvs = args(2).toLong
      val spark = SparkSession.builder()
        .master(s"local[$n]")
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      var labeled: org.apache.spark.sql.Dataset[graft.pipeline.LabeledRow] = null
      var model: org.apache.spark.broadcast.Broadcast[graft.semantics.NerModel] = null
      var out: graft.pipeline.KgPipeline.KgOutput = null
      time("p1_gen_cache") {
        labeled = graft.pipeline.Transcripts.generateLabeled(spark, nConvs).cache()
        labeled.count()
      }
      time("p2_train") {
        model = graft.pipeline.NerTraining.trainAndBroadcast(
          spark, graft.pipeline.Transcripts.trainSplit(labeled))
      }
      val turns = labeled.map(r => graft.corpus.Turn(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts))
      var tagged: org.apache.spark.sql.Dataset[graft.pipeline.TaggedRow] = null
      time("p3a_window_only") {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        turns.toDF()
          .withColumn("turn_ord", row_number().over(
            Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))))
          .count()
      }
      time("p3b_tag_nocache") {
        graft.pipeline.KgPipeline.tagTurns(turns, model).count()
      }
      time("p3_tag") {
        tagged = graft.pipeline.KgPipeline.tagTurns(turns, model).cache()
        println("[probe] turns=" + tagged.count())
      }
      time("p4_link_cc_resolve") {
        out = graft.pipeline.KgPipeline.runTagged(spark, tagged)
        println("[probe] triples=" + out.resolvedTriples.count())
      }
      spark.stop()
      return
    }

    // (a) pure arithmetic, constant TOTAL work
    time("jvm_arith") {
      val per = 4000000000L / n
      val ts = (0 until n).map { i =>
        new Thread(() => {
          var x = i.toLong; var k = 0L
          while (k < per) { x = graft.corpus.TranscriptGen.mix64(x); k += 1 }
          if (x == 42) println(x)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
    }

    // (b) allocation-heavy, constant TOTAL work
    time("jvm_alloc") {
      val per = 3000000 / n
      val ts = (0 until n).map { i =>
        new Thread(() => {
          var k = 0; var acc = 0
          while (k < per) {
            val sb = new java.lang.StringBuilder(64)
            var j = 0
            while (j < 20) { sb.append("word").append(j); j += 1 }
            acc += sb.toString.length
            k += 1
          }
          if (acc == -1) println(acc)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
    }

    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // (c) codegen'd arithmetic
    time("spark_hash") {
      spark.range(0, 1500000000L, 1, n).select(max(xxhash64(col("id")))).collect()
    }

    // (d) the NLP kernel
    time("spark_nlp") {
      val labeled = graft.pipeline.Transcripts.generateLabeled(spark, 40000)
      val model = graft.pipeline.NerTraining.trainAndBroadcast(
        spark, graft.pipeline.Transcripts.trainSplit(labeled))
      val turns = labeled.map(r => graft.corpus.Turn(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts))
      println("[probe] tagged=" + graft.pipeline.KgPipeline.tagTurns(turns, model).count())
    }
    spark.stop()
  }
}
