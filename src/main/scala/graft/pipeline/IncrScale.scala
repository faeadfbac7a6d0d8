package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Bench-scale exercise of the INCREMENTAL production entry
  * (`graft.KgIncrementalJob`): the bench corpus is split into a prior
  * corpus (~99.9% of conversations, materialized once via the full
  * `graft.KgJob`) and a held-out batch (~0.1%), and the batch is applied
  * incrementally to the prior output. The stage then requires the
  * maintained graph's triples to be FINGERPRINT-IDENTICAL to the
  * flagship full-corpus build that Bench already holds in cache —
  * incremental == full at bench scale, not just in the toy-scale spec —
  * and requires the apply to have left most buckets untouched (the whole
  * point: at 10^12 turns a day's batch must cost O(batch + merge blast
  * radius), never O(corpus)).
  *
  * The prior KgJob build is deploy-shape staging and is reported
  * separately (`kg_incr_job__prior_full_job` in the queries file); the
  * stage's headline wall is the APPLY alone.
  */
object IncrScale {

  final case class Result(
      priorTurns: Long, batchTurns: Long,
      priorJobSec: Double, applySec: Double,
      rewrittenBuckets: Int, untouchedBuckets: Int,
      changedSurfaces: Long, triples: Long)

  /** Hash-split on conv_id: ~1/batchMod of conversations form the batch.
    * 256 graph buckets make the untouched population measurable (a ~50
    * conv batch at sf0.1 touches ≲50 of 256 buckets plus the changed-
    * surface blast radius). batchMod is overridable so IncrProbe can
    * measure apply cost at several batch FRACTIONS (the
    * batch-proportionality evidence); Bench pins the default.
    */
  private val BATCH_MOD = 1024
  private val BUCKETS = 256

  def run(spark: SparkSession, sfDir: String, batchMod: Int = BATCH_MOD,
      requireMostlyUntouched: Boolean = true): Result = {
    import spark.implicits._
    val b = graft.Kg.built(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("incr_scale_").toString
    try {
      val turns = b.labeled
        .map(r => graft.corpus.Turn(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts))
      val isBatch = pmod(xxhash64(col("conv_id")), lit(batchMod)) === 0
      turns.where(!isBatch).write.parquet(s"$base/prior")
      turns.where(isBatch).write.parquet(s"$base/batch")
      NerTraining.save(b.model, spark, s"$base/model")

      val t0 = System.nanoTime()
      graft.KgJob.run(spark, s"$base/prior", s"$base/model", s"$base/graph",
        buckets = BUCKETS)
      val priorJobSec = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val m = graft.KgIncrementalJob.run(spark, s"$base/graph", s"$base/batch",
        s"$base/model")
      val applySec = (System.nanoTime() - t1) / 1e9

      if (requireMostlyUntouched)
        require(m.untouchedBuckets > m.rewrittenBuckets,
          s"incremental apply rewrote ${m.rewrittenBuckets} of $BUCKETS buckets and left only " +
            s"${m.untouchedBuckets} untouched — the apply cost is no longer batch-proportional")

      // incremental(prior) ∘ apply(batch) == flagship(full corpus), by
      // count + order-independent fingerprint over the complete
      // resolution output (entity ids and canonicals included). The
      // flagship side reads Bench's cache — run BEFORE Kg.evict.
      val fpExpr = "bit_xor(xxhash64(conv_id, turn_idx, subj, pred, obj, " +
        "subj_tag, obj_tag, subj_id, obj_id, subj_canonical, obj_canonical))"
      def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), expr(fpExpr)).first()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      val got = fingerprint(spark.read.parquet(s"$base/graph/triples"))
      val want = fingerprint(b.out.resolvedTriples)
      require(got == want,
        s"incrementally maintained graph diverged from the full-corpus build at bench " +
          s"scale: incremental (rows, fp) = $got vs flagship $want")

      Result(b.out.tagged.count() - m.newTurns, m.newTurns, priorJobSec, applySec,
        m.rewrittenBuckets, m.untouchedBuckets, m.changedSurfaces, got._1)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(base)).deleteRecursively()
      ()
    }
  }

  /** Sequential multi-batch maintenance (the daily-batch production
    * cadence): prior = corpus minus `nBatches` hash slices, then each
    * slice applied IN SEQUENCE to the same output — the link state,
    * applied-batch ledger, and bucket manifests chain across applies.
    * Gate: after the last apply the graph is fingerprint-identical to
    * the flagship full-corpus build. Returns (priorJobSec, applyWalls).
    */
  def runSequential(spark: SparkSession, sfDir: String,
      nBatches: Int = 3): (Double, Seq[Double]) = {
    import spark.implicits._
    val b = graft.Kg.built(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("incr_seq_").toString
    try {
      val turns = b.labeled
        .map(r => graft.corpus.Turn(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts))
      val slice = pmod(xxhash64(col("conv_id")), lit(BATCH_MOD))
      turns.where(slice >= nBatches).write.parquet(s"$base/prior")
      for (i <- 0 until nBatches)
        turns.where(slice === i).write.parquet(s"$base/batch$i")
      NerTraining.save(b.model, spark, s"$base/model")

      val t0 = System.nanoTime()
      graft.KgJob.run(spark, s"$base/prior", s"$base/model", s"$base/graph",
        buckets = BUCKETS)
      val priorJobSec = (System.nanoTime() - t0) / 1e9

      val walls = (0 until nBatches).map { i =>
        val t = System.nanoTime()
        graft.KgIncrementalJob.run(spark, s"$base/graph", s"$base/batch$i",
          s"$base/model")
        (System.nanoTime() - t) / 1e9
      }

      val fpExpr = "bit_xor(xxhash64(conv_id, turn_idx, subj, pred, obj, " +
        "subj_tag, obj_tag, subj_id, obj_id, subj_canonical, obj_canonical))"
      def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), expr(fpExpr)).first()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      val got = fingerprint(spark.read.parquet(s"$base/graph/triples"))
      val want = fingerprint(b.out.resolvedTriples)
      require(got == want,
        s"after $nBatches sequential applies the graph diverged from the full-corpus " +
          s"build: (rows, fp) = $got vs flagship $want")
      (priorJobSec, walls)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(base)).deleteRecursively()
      ()
    }
  }
}
