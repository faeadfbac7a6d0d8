package graft.streaming

import graft.corpus.Turn
import graft.pipeline.{MentionRow, TaggedRow, TripleRow}
import graft.semantics.{NerModel, TripleAssembler}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Incremental/streaming ingestion (SURVEY.md §2 row 60, optional M7):
  * transcript drops land as parquet files; a Structured Streaming query
  * tags them incrementally with the same broadcast NER model, dedupes
  * re-delivered turns inside the watermark, and maintains per-
  * conversation state (max turn index, mention count) via
  * flatMapGroupsWithState. The reference's only streaming analogue is
  * adaptive feed polling; this is its Spark-native re-expression.
  */
object StreamingIngest {

  final case class ConvState(maxTurn: Int, nMentions: Long)
  /** Expiring-variant state: adds the lifetime max event time (timeout
    * monotonicity — see BucketState.maxTsMs) and the turn indexes already
    * counted (in-horizon re-delivery dedup; bounded by the conversation
    * length, which transcripts bound by construction).
    */
  final case class ConvStateX(maxTurn: Int, nMentions: Long, maxTsMs: Long, seen: Seq[Int])
  final case class ConvUpdate(conv_id: String, max_turn: Int, n_mentions: Long)

  /** File-source stream of turns. */
  def readTurns(spark: SparkSession, inputDir: String): Dataset[Turn] = {
    import spark.implicits._
    spark.readStream
      .schema(spark.createDataset(Seq.empty[Turn]).schema)
      .parquet(inputDir)
      .as[Turn]
  }

  /** Streaming twin of KgPipeline.tagTurns: watermark + in-watermark
    * dedupe of re-delivered (conv_id, turn_idx), then the same
    * mapPartitions tagging stage.
    */
  def tagStream(turns: Dataset[Turn], model: Broadcast[NerModel],
      watermarkDelay: String = "1 hour"): Dataset[TaggedRow] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
      .mapPartitions(tagIter(model))
  }

  /** The per-partition tagging closure shared by the streaming stages. */
  private def tagIter(model: Broadcast[NerModel])(it: Iterator[Turn]): Iterator[TaggedRow] = {
    val m = model.value
    it.map { t =>
      val mentions = NerModel.tag(t.text, m)
      val triples = TripleAssembler.assemble(t.conv_id, t.turn_idx, t.role, t.text, t.tool, mentions)
      TaggedRow(t.conv_id, t.turn_idx, 0, t.role, t.tool, t.ts,
        mentions.map(MentionRow.of).toSeq, triples.map(TripleRow.of).toSeq)
    }
  }

  /** Tumbling windowed mention counts (watermarked aggregation). Takes
    * raw turns and tags inline: a typed mapPartitions drops event-time
    * watermark tracking from its output columns, so the watermark must be
    * defined AFTER tagging (and chaining it behind the dedup stream would
    * be watermark redefinition, disallowed in Spark 4).
    */
  def windowedCounts(turns: Dataset[Turn], model: Broadcast[NerModel]): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions { it =>
        val m = model.value
        it.flatMap(t => NerModel.tag(t.text, m).map(x => (t.ts, x.tag)))
      }
      .toDF("ts", "tag")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "10 minutes"), $"tag")
      .agg(count(lit(1)).as("n"))
  }

  /** Gap-based session windows over the turn stream (SURVEY.md §2 row
    * 56 streaming twin): groups turns into sessions closed by 30 minutes
    * of inactivity per conversation.
    */
  def sessionCounts(turns: Dataset[Turn]): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes"), $"conv_id")
      .agg(count(lit(1)).as("n_turns"))
  }

  /** Streaming CONTENT dedup (dedup-family streaming twin, builder
    * prompt): exact near-real-time deduplication by content hash —
    * re-delivered or copy-pasted turn text inside the watermark is
    * dropped regardless of its (conv_id, turn_idx) identity. The state
    * store holds one key per distinct content hash within the watermark
    * horizon; at 100 TB the horizon bounds state size, and the md5 key
    * (16 bytes) keeps it compact irrespective of document length.
    */
  def dedupByContent(turns: Dataset[Turn]): Dataset[Turn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .withColumn("content_hash", md5($"text"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")
      .as[Turn]
  }

  // ----------------------------------------------- streaming near-dup
  final case class DocBand(doc_id: Long, band: Int, bucket: Long)
  final case class DocBandT(doc_id: Long, band: Int, bucket: Long, ts: java.sql.Timestamp)
  final case class DupCandidate(da: Long, db: Long, band: Int)
  /** Per-(band,bucket) state: member doc ids seen so far (bounded),
    * whether the bucket overflowed the cap, and the max event time seen
    * across ALL batches (`maxTsMs` — the expiry timeout must be computed
    * against it: a late-but-in-horizon row's batch-local max would move
    * the timeout BACKWARD and expire the bucket early, dropping pairs).
    */
  final case class BucketState(members: List[Long], overflowed: Boolean,
      maxTsMs: Long = Long.MinValue)

  /** Signature+banding projection — DELEGATES to the batch path's single
    * definition (CatalogText.minhashBandsOf), so stream/batch banding
    * parity holds by construction rather than by copy.
    */
  private def bandProjection(docs: DataFrame, extra: Seq[String]): DataFrame =
    graft.relational.CatalogText.minhashBandsOf(docs, extra)

  /** Streaming MinHash near-duplicate detection (the approximate-dedup
    * family's streaming twin of t_minhash_lsh): each arriving document is
    * signed per-row (16 minhashes, same zero-shuffle array expressions as
    * the batch path), unpivoted into 4 LSH bands, and matched against the
    * band-bucket STATE — every prior member of the same bucket across all
    * previous micro-batches yields a candidate pair, exactly once.
    *
    * Scale bounds, mirroring the batch path's: state per key is a bounded
    * id list — a bucket that exceeds `maxBucket` members flips to
    * overflowed (members dropped, nothing further emitted for it), so a
    * degenerate hot bucket can never make state or output quadratic.
    *
    * This ts-less overload has NO event-time column, so state cannot be
    * expired and the key count grows with the distinct-bucket count —
    * acceptable only for bounded replays (the memory-sink test harness
    * and batch-parity gates feed (doc_id, text) with no timestamp). The
    * PRODUCTION path is [[nearDupCandidatesExpiring]]: watermark +
    * EventTimeTimeout keep total state bounded on an infinite stream
    * (VERDICT r2 next-round #5).
    *
    * Input: (doc_id bigint, text string). Output: candidate pairs
    * (da < db, band) — downstream exact-Jaccard verification is the same
    * residual join as batch.
    */
  def nearDupCandidates(docs: DataFrame, maxBucket: Int = 64): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandProjection(docs, Seq.empty).as[DocBand]
      .groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, Long), rows: Iterator[DocBand], state: GroupState[BucketState]) => {
          emitPairs(key._1, rows.map(_.doc_id), state, maxBucket)
        })
  }

  /** Production streaming near-dup: same banding/state/cap semantics as
    * [[nearDupCandidates]], plus event-time state EXPIRY — input rows
    * carry a `ts` event-time column, the stream is watermarked, and each
    * bucket's state carries an event-time timeout `idleGapMs` past the
    * newest member. A bucket idle longer than the gap (by watermark time,
    * i.e. guaranteed no straggler can still join it) is REMOVED, so total
    * state is bounded by the buckets active within the horizon — not by
    * the lifetime distinct-bucket count. Two docs more than the gap apart
    * are by definition not in the same dedup horizon; the batch path over
    * a full corpus remains the completeness baseline.
    */
  def nearDupCandidatesExpiring(docs: DataFrame, maxBucket: Int = 64,
      watermarkDelay: String = "1 hour", idleGapMs: Long = 3600000L): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = bandProjection(docs.withWatermark("ts", watermarkDelay), Seq("ts"))
      .select(col("doc_id"), col("band"), col("bucket"), col("ts")).as[DocBandT]
    bands
      .groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, Long), rows: Iterator[DocBandT], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: no future row can legally
            // pair with these members — drop the key entirely
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toArray
            val prevMax = state.getOption.map(_.maxTsMs).getOrElse(Long.MinValue)
            val out = emitPairs(key._1, batch.iterator.map(_.doc_id), state, maxBucket)
            // monotone max over the bucket's whole lifetime, clamped at
            // the watermark (a timeout below it is rejected by Spark)
            val maxTs = math.max(prevMax, batch.iterator.map(_.ts.getTime).max)
            state.update(state.get.copy(maxTsMs = maxTs))
            state.setTimeoutTimestamp(
              math.max(maxTs + idleGapMs, state.getCurrentWatermarkMs() + 1))
            out
          }
        })
  }

  /** Shared per-bucket pair emission: exactly-once per (pair, band),
    * bounded member list, overflow flip past `maxBucket`.
    */
  private def emitPairs(band: Int, docIds: Iterator[Long],
      state: GroupState[BucketState], maxBucket: Int): Iterator[DupCandidate] = {
    val st = state.getOption.getOrElse(BucketState(Nil, overflowed = false))
    var members = st.members
    var over = st.overflowed
    val out = List.newBuilder[DupCandidate]
    // deterministic within-batch order so pair emission is stable
    for (id <- docIds.toArray.sorted if !over && !members.contains(id)) {
      out ++= members.map(m => DupCandidate(math.min(m, id), math.max(m, id), band))
      members ::= id
      if (members.length > maxBucket) { over = true; members = Nil }
    }
    state.update(BucketState(members, over))
    out.result().iterator
  }

  /** Conversation assembly across micro-batches: custom state per conv
    * (flatMapGroupsWithState) emitting running (max_turn, n_mentions).
    * Ts-less bounded-replay variant (test harness); the production path
    * is [[conversationStateExpiring]] — same unbounded-state caveat as
    * the ts-less near-dup overload.
    */
  def conversationState(tagged: Dataset[TaggedRow]): Dataset[ConvUpdate] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (convId: String, rows: Iterator[TaggedRow], state: GroupState[ConvState]) => {
          val prev = state.getOption.getOrElse(ConvState(-1, 0L))
          var maxTurn = prev.maxTurn
          var nMentions = prev.nMentions
          rows.foreach { r =>
            if (r.turn_idx > maxTurn) maxTurn = r.turn_idx
            nMentions += r.mentions.size
          }
          state.update(ConvState(maxTurn, nMentions))
          Iterator.single(ConvUpdate(convId, maxTurn, nMentions))
        })
  }

  /** Production conversation assembly: same running state, plus
    * event-time expiry — a conversation idle past `idleGapMs` (by
    * watermark, so no straggler can still arrive) emits one FINAL
    * ConvUpdate and its state is removed. Total state is bounded by the
    * conversations active within the horizon, not the lifetime
    * conversation count — the same bound the near-dup path carries.
    * Takes RAW turns and tags inline (the windowedCounts pattern):
    * chaining behind tagStream would be watermark redefinition
    * downstream of its dedup stage, which Spark 4 disallows (sharp edge
    * #11) — the watermark must be defined once, here, on the tagged
    * rows' ts. Re-delivered (conv, turn_idx) pairs inside the horizon
    * are deduped INSIDE the state (tagStream's dropDuplicates stage is
    * unreachable from here for the same watermark reason), so replayed
    * drops cannot inflate the final mention counts.
    */
  def conversationStateExpiring(turns: Dataset[Turn], model: Broadcast[NerModel],
      watermarkDelay: String = "1 hour", idleGapMs: Long = 3600000L): Dataset[ConvUpdate] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .mapPartitions(tagIter(model))
      .withWatermark("ts", watermarkDelay)
      .as[TaggedRow]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (convId: String, rows: Iterator[TaggedRow], state: GroupState[ConvStateX]) => {
          if (state.hasTimedOut) {
            val fin = state.get
            state.remove()
            Iterator.single(ConvUpdate(convId, fin.maxTurn, fin.nMentions))
          } else {
            val prev = state.getOption.getOrElse(ConvStateX(-1, 0L, Long.MinValue, Seq.empty))
            var maxTurn = prev.maxTurn
            var nMentions = prev.nMentions
            var maxTs = prev.maxTsMs // lifetime max: a late in-horizon row
            // must never move the timeout backward (premature final +
            // state re-creation would emit a second, partial final)
            var seen = prev.seen
            rows.foreach { r =>
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
              if (!seen.contains(r.turn_idx)) {
                seen = seen :+ r.turn_idx
                if (r.turn_idx > maxTurn) maxTurn = r.turn_idx
                nMentions += r.mentions.size
              }
            }
            state.update(ConvStateX(maxTurn, nMentions, maxTs, seen))
            // clamp at the watermark: rows can legally arrive from files
            // ordered behind the watermark (late within the horizon), and
            // a timeout timestamp below the watermark is rejected
            state.setTimeoutTimestamp(
              math.max(maxTs + idleGapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty // emit ONLY the final update, at expiry
          }
        })
  }

  // -------------------------------------------- streaming graph sink
  /** Streaming triple materialization with exactly-once micro-batches:
    * foreachBatch writes each batch's triples to a batch-scoped
    * directory (directory-atomic) and then commits a manifest JSON
    * {batch, rows, fingerprint} via temp-file rename — the GraphSink
    * protocol applied to the stream. Structured Streaming replays a
    * failed batch WITH THE SAME batchId, so the manifest check makes
    * re-delivery a no-op: a batch is either fully committed (manifest
    * present) or fully re-written (directory overwritten), never
    * duplicated. The triples table is the union of batch=* directories;
    * per-batch manifests are the stream's lineage/metrics channel.
    */
  def sinkTriples(tagged: Dataset[TaggedRow], outDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // the explode/projection is KgPipeline.tripleRows — ONE definition
    // shared with the batch path (and with sinkResolvedTriples below),
    // so a schema change there cannot silently diverge the stream sink
    graft.pipeline.KgPipeline.tripleRows(tagged)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        writeBatch(batch, outDir, batchId)
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .start()
  }

  /** Streaming CANONICAL resolution + exactly-once sink — the streaming
    * completion of the KG job (r4): triples exploded from the tagged
    * stream are resolved against a STATIC canonical map via
    * stream-static broadcast joins. The resolution is literally
    * [[graft.pipeline.KgPipeline.resolveTriplesBroadcast]] — the batch
    * function applied to the streaming plan (its joins/projections are
    * stateless, so they compose in append mode) — stream == batch
    * semantics hold by construction rather than by copy. Batches commit
    * through the same manifest protocol as [[sinkTriples]].
    *
    * Deploy shape: the canonical map is the entity table of the last
    * batch linking run — batch linking refreshes the map, the stream
    * resolves arriving turns against the latest snapshot (entity
    * discovery/merging stays a batch responsibility; a surface unseen
    * by the last linking run resolves to null ids and its canonical
    * falls back to its own normalized form, exactly as in batch).
    */
  def sinkResolvedTriples(tagged: Dataset[TaggedRow], canonMap: DataFrame,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val triples = graft.pipeline.KgPipeline.tripleRows(tagged)
    val resolved = graft.pipeline.KgPipeline.resolveTriplesBroadcast(triples, canonMap)
    // own table dir, manifest prefix, and checkpoint: sharing an outDir
    // with sinkTriples must not collide (a shared checkpoint would
    // resume the OTHER query's offsets, and a shared stream-batch-<id>
    // manifest namespace would silently skip this sink's batches as
    // "already committed")
    resolved.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        writeBatch(batch, outDir, batchId,
          table = "resolved_triples", manifestPrefix = "stream-resolved-batch")
      }
      .option("checkpointLocation", s"$outDir/_checkpoint_resolved")
      .start()
  }

  /** Commit point for a canonical-map snapshot: parquet first, then a
    * `_canon_version` marker via temp-file rename (the same protocol as
    * every other commit in the repo). The version token is DERIVED from
    * the map content (count + order-independent xxhash64 fingerprint),
    * so re-publishing an identical map is a no-op for running streams
    * and a changed map always bumps the token. This is the producer half
    * of the refresh contract: the batch linking job publishes here,
    * [[sinkResolvedTriplesRefreshing]] consumes.
    */
  def publishCanonMap(canonMap: DataFrame, canonDir: String): String = {
    val spark = canonMap.sparkSession
    val cm = canonMap.select(col("norm"), col("tag"), col("entity_id"), col("canonical_norm"))
    cm.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(canonDir)
    val r = spark.read.parquet(canonDir)
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(norm, tag, entity_id, canonical_norm))").as("fp"))
      .collect()(0)
    val version = s"${r.getLong(0)}-${if (r.isNullAt(1)) 0L else r.getLong(1)}"
    val hfs = new org.apache.hadoop.fs.Path(canonDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$canonDir/._canon_version.tmp")
    val dst = new org.apache.hadoop.fs.Path(s"$canonDir/_canon_version")
    if (hfs.exists(dst)) hfs.delete(dst, false)
    val out = hfs.create(tmp, true)
    out.write(version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    require(hfs.rename(tmp, dst), s"canon version commit rename failed: $tmp -> $dst")
    version
  }

  /** Current canon-map version token: the `_canon_version` marker when
    * the producer committed one, else a fingerprint of the file listing
    * (name, length, mtime) so maps published without the marker still
    * refresh on any rewrite.
    */
  def canonSnapshotVersion(spark: SparkSession, canonDir: String): String = {
    val dir = new org.apache.hadoop.fs.Path(canonDir)
    val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$canonDir/_canon_version")
    if (hfs.exists(marker)) {
      val in = hfs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    } else if (!hfs.exists(dir)) "absent"
    else hfs.listStatus(dir).toSeq
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|").hashCode.toString
  }

  /** Driver-side cache of the latest canonical-map snapshot, swapped
    * only when the published version bumps: load + cache the new map,
    * materialize it, then unpersist the old one. Called once per
    * micro-batch — the version probe is one FS stat, not a Spark job.
    */
  final class CanonMapCache(canonDir: String) {
    private var version: String = _
    private var cached: DataFrame = _
    /** The snapshot AND the version it was loaded under (returned as a
      * pair so the caller records the version that matches the data it
      * resolves with — a separate re-probe could race a re-publish).
      */
    def current(spark: SparkSession): (DataFrame, String) = synchronized {
      val v = canonSnapshotVersion(spark, canonDir)
      if (cached == null || v != version) {
        val next = spark.read.parquet(canonDir)
          .select(col("norm"), col("tag"), col("entity_id"), col("canonical_norm"))
          .cache()
        next.count() // materialize before swapping so the old map can go
        if (cached != null) cached.unpersist(blocking = false)
        cached = next
        version = v
        System.err.println(s"[stream] canonical map (re)loaded: version $v")
      }
      (cached, version)
    }
  }

  /** Streaming canonical resolution with BETWEEN-BATCH canon-map refresh
    * (VERDICT r4 "what's missing" #3): unlike [[sinkResolvedTriples]],
    * whose stream-static join pins the snapshot read at plan time for
    * the life of the query, the resolution here runs INSIDE foreachBatch
    * — each micro-batch is a plain DataFrame, so the broadcast join
    * re-plans per batch against whatever snapshot [[CanonMapCache]]
    * currently holds. A long-running stream picks up a re-published
    * canonical map (new entities from the latest batch linking run) at
    * the next micro-batch boundary, without restart.
    *
    * Exactly-once interplay: a batch replayed after a crash may resolve
    * against a NEWER map than the original attempt — harmless, because
    * the manifest check makes a committed batch's replay a no-op, and an
    * UNcommitted batch rewrites its directory wholesale, so every
    * committed batch is internally consistent with exactly one snapshot
    * (recorded in its manifest as canon_version).
    */
  def sinkResolvedTriplesRefreshing(tagged: Dataset[TaggedRow], canonDir: String,
      outDir: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val triples = graft.pipeline.KgPipeline.tripleRows(tagged)
    val cache = new CanonMapCache(canonDir)
    val writer = triples.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val (canon, version) = cache.current(batch.sparkSession)
        val resolved = graft.pipeline.KgPipeline.resolveTriplesBroadcast(batch, canon)
        writeBatch(resolved, outDir, batchId,
          table = "resolved_triples", manifestPrefix = "stream-resolved-batch",
          extraManifest = s""","canon_version":"$version"""")
      }
      .option("checkpointLocation", s"$outDir/_checkpoint_resolved")
    trigger.fold(writer)(writer.trigger).start()
  }

  /** One batch commit (factored out so the idempotence spec can replay
    * a batchId directly): skip if manifested, else overwrite the batch
    * directory and rename-commit the manifest.
    */
  def writeBatch(batch: org.apache.spark.sql.DataFrame, outDir: String, batchId: Long,
      table: String = "triples", manifestPrefix: String = "stream-batch",
      extraManifest: String = ""): Unit = {
    val spark = batch.sparkSession
    // resolve the filesystem FROM outDir (not the default FS): on an
    // hdfs://... or s3a://... sink the default-FS handle would check
    // manifest existence on the wrong filesystem (ADVICE r2)
    val hfs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new org.apache.hadoop.fs.Path(
      s"$outDir/_manifests/$manifestPrefix-$batchId.json")
    if (hfs.exists(manifest)) return // already committed — replay is a no-op
    // manifest stats observed ON the write pass (r6, guide §1/§5): the
    // former separate stats agg executed the batch's ENTIRE lineage a
    // second time — for the resolved sink that is the NLP tagging +
    // resolve join run twice per micro-batch. Observation rides the
    // write job's single execution (same pattern as GraphSink's
    // written-buckets metrics); rows/fingerprint values are unchanged.
    val obs = org.apache.spark.sql.Observation(
      s"stream_write_${batchId}_${System.nanoTime()}")
    val observed = batch.observe(obs,
      count(lit(1)).as("rows"),
      expr("bit_xor(xxhash64(conv_id, turn_idx, subj, pred, obj))").as("fp"))
    observed.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$outDir/$table/batch=$batchId")
    val rows = scala.util.Try(obs.get("rows").asInstanceOf[Long]).getOrElse(0L)
    val fp = scala.util.Try(obs.get("fp").asInstanceOf[Long]).getOrElse(0L)
    val json = s"""{"batch":$batchId,"rows":$rows,"fingerprint":$fp$extraManifest}"""
    hfs.mkdirs(manifest.getParent)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$outDir/_manifests/.$manifestPrefix-$batchId.json.tmp")
    val out = hfs.create(tmp, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    // rename IS the commit point — a silent false return would leave the
    // batch uncommitted while its parquet exists (ADVICE r2); failing
    // loudly lets Structured Streaming retry the batch idempotently
    require(hfs.rename(tmp, manifest),
      s"manifest commit rename failed for batch $batchId: $tmp -> $manifest")
  }

  /** Run one synchronous pass over whatever files exist (memory sink) —
    * the local smoke path; production would use a real sink + trigger.
    */
  def runOnce(spark: SparkSession, inputDir: String, model: Broadcast[NerModel],
      queryName: String): DataFrame = {
    val tagged = tagStream(readTurns(spark, inputDir), model)
    val q = tagged
      .select(col("conv_id"), col("turn_idx"), size(col("mentions")).as("n_mentions"),
        size(col("triples")).as("n_triples"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
