package graft.tools

import graft.pipeline.{Gazetteer, ScaleLinking}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sub-step attribution for the kg_scale_linking salted-gazetteer phase
  * (r6 guide §1.4: isolate each expensive stage with the noop sink so
  * the computation is timed, not the sink). Not part of the bench —
  * numbers are cited in OPTIMIZATION_r06.md.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.GazProbe"
  */
object GazProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", sys.env.getOrElse("GAZ_EVENTLOG", "false"))
      .config("spark.eventLog.dir", sys.env.getOrElse("GAZ_EVENTLOG_DIR", "/tmp/gaz_events"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nEntities = 150000L
    val gazDir = java.nio.file.Files.createTempDirectory("gaz_probe_").toString
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t = System.nanoTime()
      f
      System.err.println(f"[gazprobe] $name: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    try {
      time("alias_table_write") {
        ScaleLinking.syntheticAliasTable(spark, nEntities).write
          .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(gazDir)
      }
      val gaz = spark.read.parquet(gazDir)
      val mentions = ScaleLinking.syntheticGazMentions(spark, 1000000L, nEntities)
      time("mentions_gen_noop") { noop(mentions) }
      time("distinct_surfaces_noop") {
        noop(mentions.select(col("norm"), col("tag")).distinct())
      }
      // sub-stage attribution (each stage recomputes its upstream — the
      // deltas between successive walls attribute the increments)
      val salt = Gazetteer.GAZ_SALT
      val saltValues = sequence(lit(0), lit(salt - 1))
      val keyU = udf((norm: String) => graft.semantics.Linker.blockKeys(norm).headOption.orNull)
      val distinctSurfaces = mentions.select(col("norm"), col("tag")).distinct()
        .withColumn("block_key", keyU(col("norm")))
        .withColumn("salt", explode(saltValues))
      val gazSalted = gaz
        .withColumn("salt", pmod(xxhash64(col("alias")), lit(salt)).cast("int"))
      time("cands_join_noop") {
        noop(distinctSurfaces.join(gazSalted, Seq("block_key", "salt"), "inner"))
      }
      time("disambiguate_salted_count") {
        val n = Gazetteer.disambiguateSalted(mentions, gaz).count()
        System.err.println(s"[gazprobe] resolved = $n")
      }
      time("disambiguate_salted_count_run2") {
        Gazetteer.disambiguateSalted(mentions, gaz).count()
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(gazDir))
    }
    spark.stop()
  }
}
