package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity search over the `embeddings` table (builder prompt:
  * brute-force cosine top-k baseline + an LSH-bucketed scale path) and
  * multimodal binary-column plumbing.
  *
  * Exact-float cosine is rows-only (float summation has no cross-engine
  * oracle); the ORACLED variant quantizes to integers (round(x*1000))
  * where dot products are exact in both engines.
  */
object CatalogEmbed {

  private def emb(s: SparkSession, d: String) = s.read.parquet(s"$d/embeddings.parquet")
  private def docs(s: SparkSession, d: String) = s.read.parquet(s"$d/documents.parquet")

  private val quantize = "transform(embedding, x -> round(cast(x as double) * 1000))"

  /** Per-bucket membership cap: buckets above the cap are excluded from
    * the join (with a count) — the candidateEdges pattern, so a
    * degenerate hot bucket cannot go quadratic at scale.
    */
  val MAX_ANN_BUCKET = 256

  /** Hyperplane count scales with corpus size — target ~TARGET_BUCKET
    * vectors per bucket (8 planes for the 500-vector testdata; ~24 for
    * 10^9 vectors). A fixed plane count either over-shards small sets
    * (recall collapse) or under-shards huge ones (quadratic buckets).
    */
  val TARGET_BUCKET = 64
  def planesFor(n: Long): Int =
    math.max(8, math.ceil(math.log(math.max(1.0, n.toDouble / TARGET_BUCKET)) / math.log(2.0)).toInt)

  /** Deterministic ±1 hyperplane weight for (plane p, component i) —
    * splitmix64-style bit mix, computed ONCE at plan build time and
    * shipped as literal arrays. The r1/r2-early version called
    * xxhash64 per (element × plane) inside interpreted higher-order
    * lambdas — ~512 hash calls per ROW, the dominant per-row cost at
    * any scale. A literal sign array turns that into a multiply.
    */
  private def planeSign(p: Int, i: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z ^= z >>> 31; z *= 0xD6E8FEB86659FD93L; z ^= z >>> 27
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  private val MAX_DIM = 512

  /** Sign-bit LSH bucket code over `v` (array<double>) as a Column.
    * Each plane projection is a native codegen'd dot product against a
    * literal sign array — no interpreted higher-order lambdas.
    */
  private def bucketCol(n: Int, dims: Int = MAX_DIM): org.apache.spark.sql.Column =
    bucketColPlanes(0, n, dims)

  /** Sign-bit code over planes [from, from+count) — bands of the banded
    * cosine-dedup use disjoint plane ranges so their codes are
    * independent. `dims` sizes the literal sign arrays: dot_product
    * truncates to the shorter side, so any dims >= the vector width
    * yields IDENTICAL codes — a right-sized literal just avoids shipping
    * and compiling 512 constants per projection when the data is 64-wide
    * (the dominant first-run cost is JVM/codegen warmup either way).
    */
  private def bucketColPlanes(from: Int, count: Int, dims: Int = MAX_DIM): org.apache.spark.sql.Column = {
    val projections = (0 until count).map { j =>
      val signs = lit((0 until dims).map(i => planeSign(from + j, i)).toArray)
      graft.functions.NativeFunctions.dot_product(col("v"), signs)
    }
    projections.zipWithIndex
      .map { case (proj, p) => when(proj > 0, lit(1L << p)).otherwise(lit(0L)) }
      .reduce(_ + _)
  }

  /** LSH ANN over (vec_id, v:array<double>): adaptive-width sign-bit
    * code (planesFor), multi-probe (home bucket + all single-bit flips),
    * per-bucket cap, exact-dot top-k within the probed buckets. Exposed
    * for the recall gate (AnnRecallSpec) to run on fixture data.
    */
  def annLsh(vecs: DataFrame, probeMax: Int = 20, k: Int = 3, nPlanes: Int = 0,
      dims: Int = MAX_DIM): DataFrame = {
    val planes = if (nPlanes > 0) nPlanes else planesFor(vecs.count())
    val bucketed = vecs.withColumn("bucket", bucketCol(planes, dims))
    val candAll = bucketed.where(col("vec_id") >= probeMax)
    val hot = candAll.groupBy(col("bucket")).agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > MAX_ANN_BUCKET)
    val cands = candAll.join(broadcast(hot.select(col("bucket"))), Seq("bucket"), "left_anti")
    val probes = bucketed.where(col("vec_id") < probeMax)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        explode(expr("array_union(array(bucket), " +
          s"transform(sequence(0, ${planes - 1}), p -> bucket ^ shiftleft(1L, p)))")).as("bucket"))
    probes.join(cands, Seq("bucket"))
      .withColumn("dot", round(graft.functions.NativeFunctions.dot_product(col("pv"), col("v")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("dot").desc, col("vec_id"))))
      .where(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("dot"))
      .orderBy(col("probe_id"), col("rk"))
  }

  /** IVF (inverted-file) ANN over (vec_id, v): deterministic coarse
    * quantizer — seeds = the nClusters lowest candidate ids, ONE Lloyd
    * refinement step (assign-to-nearest, per-dimension mean), then each
    * candidate is indexed under its nearest centroid and each probe
    * searches its nProbe nearest centroids' lists with exact dot top-k.
    * The centroid table is tiny (k × dim) and broadcast; the scan cost
    * per probe is ~nProbe/k of the corpus — the IVF scale path the
    * builder prompt asks for beside the LSH one. Deterministic (no RNG):
    * resumable and cross-run stable. Recall gated by DedupAnnSpec.
    */
  private def d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = graft.functions.NativeFunctions.dot_product _
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
  }

  /** IVF coarse quantizer, factored out of annIvf so the refined centroid
    * table can also be DUMPED for the e_ann_ivf oracle: seeds = the
    * nClusters lowest candidate ids, then `iters` Lloyd refinement steps
    * (assign-to-nearest, per-dimension mean). Deterministic (no RNG):
    * seeds are id-ordered, assignment ties break on cluster id, and the
    * per-dim mean is order-independent when components are integers
    * (exact sums) — which is what makes the QUANTIZED variant's k-means
    * cross-engine oracle-able (e_ann_ivf_quant, VERDICT r2 next-round #8).
    */
  def ivfCentroids(vecs: DataFrame, probeMax: Int = 20, nClusters: Int = 16,
      iters: Int = 1): DataFrame = {
    val cands = vecs.where(col("vec_id") >= probeMax)
    var centroids = cands.orderBy(col("vec_id")).limit(nClusters)
      .select(col("vec_id").as("cluster"), col("v").as("cv"))
      // localCheckpoint: the centroid table is k tiny rows but its lineage
      // (seed limit, then per iteration a crossJoin + window + per-dim
      // means) would otherwise re-execute for EVERY downstream branch
      // (next iteration, candidate indexing, probe routing) — measured 3×
      // recompute, ~2/3 of the query's wall
      .localCheckpoint()
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist").asc, col("cluster"))
    for (_ <- 1 to iters) {
      val assigned = cands.crossJoin(broadcast(centroids))
        .withColumn("dist", round(d2(col("v"), col("cv")), 9))
        .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("vec_id"), col("v"), col("cluster"))
      centroids = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        // the mean is snapped to the dyadic grid 2^-12 (floor — no
        // tie-break ambiguity). On quantized integer inputs this makes
        // EVERY downstream quantity exact: |v_i| < 2^10 and |cv_i| < 2^10
        // on the grid keep all products and partial sums of the
        // iteration-2 distances and final dots integer multiples of
        // 2^-24 well below 2^53, so they are order-independent and
        // immune to FMA/SIMD reassociation in either engine — the
        // e_ann_ivf_quant oracle no longer assumes DuckDB sums
        // left-to-right (ADVICE r3). The exact int-sum/count avg is
        // bit-identical cross-engine, so the floor is too.
        .groupBy(col("cluster"), col("dim"))
        .agg((floor(avg(col("x")) * lit(4096)) / lit(4096.0)).as("m"))
        .groupBy(col("cluster"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), e -> e.m)").as("cv"))
        .localCheckpoint()
    }
    centroids
  }

  /** Candidate -> nearest refined centroid (the inverted-file index). */
  def ivfAssign(vecs: DataFrame, centroids: DataFrame, probeMax: Int = 20): DataFrame = {
    val cands = vecs.where(col("vec_id") >= probeMax)
    val wc = Window.partitionBy(col("vec_id")).orderBy(col("dist").asc, col("cluster"))
    cands.crossJoin(broadcast(centroids))
      .withColumn("dist", round(d2(col("v"), col("cv")), 9))
      .withColumn("rk", row_number().over(wc)).where(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("cluster"))
  }

  def annIvf(vecs: DataFrame, probeMax: Int = 20, k: Int = 3,
      nClusters: Int = 16, nProbe: Int = 2, iters: Int = 1): DataFrame = {
    val dot = graft.functions.NativeFunctions.dot_product _
    val centroids = ivfCentroids(vecs, probeMax, nClusters, iters)
    val indexed = ivfAssign(vecs, centroids, probeMax)
    // probes search their nProbe nearest clusters
    val probes = vecs.where(col("vec_id") < probeMax)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist", round(d2(col("pv"), col("cv")), 9))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("dist").asc, col("cluster"))))
      .where(col("crk") <= nProbe)
      .select(col("probe_id"), col("pv"), col("cluster"))
    probes.join(indexed, Seq("cluster"))
      .withColumn("dot", round(dot(col("pv"), col("v")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("dot").desc, col("vec_id"))))
      .where(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("dot"))
      .orderBy(col("probe_id"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs over (vec_id, v): BANDED
    * sign-bit LSH (the minhash-banding idea applied to hyperplane
    * codes) + exact cosine residual >= `minCos`.
    *
    * Why bands: a single wide code trades recall against bucket size —
    * more planes shrink buckets but a true near-dup pair at cosine c
    * lands in the same bucket only with P = (1 - acos(c)/π)^planes,
    * which collapses as planes grow; fewer planes go hot. B independent
    * r-plane codes keep per-band buckets small (capped anyway) while
    * any-band collision recovers recall: 1 - (1 - p^r)^B. With B=4,
    * r=8, pairs at cosine 0.9 are caught with ~76% per the formula and
    * ≥0.999 near c→1; the DedupAnnSpec planted-pair gate pins it.
    * Candidate pairs are deduped ACROSS bands before the exact-cosine
    * join, so each pair is verified once.
    */
  /** (vec_id, band, bucket) band-code assignments — the candidate-pair
    * relation of the banded dedup, also dumped for its oracle.
    */
  def bandedCodes(vecs: DataFrame, bands: Int = 4, rowsPerBand: Int = 8,
      dims: Int = MAX_DIM): DataFrame = {
    // stack() needs named columns — route the band codes through a select
    val coded = vecs.select(
      (col("vec_id") +: (0 until bands).map(b =>
        bucketColPlanes(b * rowsPerBand, rowsPerBand, dims).as(s"bk$b"))): _*)
    coded.select(col("vec_id"), expr(
      s"stack($bands, ${(0 until bands).map(b => s"$b, bk$b").mkString(", ")}) AS (band, bucket)"))
  }

  /** The e_cosine_dupes input: driver embeddings PLUS deterministic
    * planted near-duplicates (ids +100000, ±1% noise) — the testdata's
    * max natural off-diagonal cosine is 0.51, so without planting the
    * operator would be vacuously row-free (r1).
    */
  def dupeInput(s: SparkSession, d: String): DataFrame = {
    val base = emb(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val planted = base.where(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("zip_with(v, sequence(0, size(v) - 1), (x, i) -> " +
          "x + 0.02 * (pmod(xxhash64(i, vec_id), 100) / 100.0 - 0.5))").as("v"))
    base.unionByName(planted)
  }

  def cosineDupes(vecs: DataFrame, minCos: Double = 0.9,
      bands: Int = 4, rowsPerBand: Int = 8, dims: Int = MAX_DIM): DataFrame = {
    val dot = graft.functions.NativeFunctions.dot_product _
    val withNorm = vecs.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val unpivot = bandedCodes(vecs, bands, rowsPerBand, dims)
    val hot = unpivot.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > MAX_ANN_BUCKET)
    val cold = unpivot.join(broadcast(hot.select(col("band"), col("bucket"))),
      Seq("band", "bucket"), "left_anti")
    val cand = cold.as("a").join(cold.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("keep_id"), col("b.vec_id").as("dup_id"))
      .distinct()
    val side = withNorm.select(col("vec_id"), col("v"), col("nrm"))
    cand
      .join(side.select(col("vec_id").as("keep_id"), col("v").as("va"), col("nrm").as("na")), "keep_id")
      .join(side.select(col("vec_id").as("dup_id"), col("v").as("vb"), col("nrm").as("nb")), "dup_id")
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .where(col("cos") >= minCos)
      .select(col("keep_id"), col("dup_id"), col("cos"))
      .orderBy(col("keep_id"), col("dup_id"))
  }

  /** (vec_id, bucket) assignments under the corpus-adaptive plane count —
    * dumped so the e_ann_lsh oracle can re-run the multi-probe bucket
    * join + hot-bucket cap + exact-dot top-k in DuckDB (the sign-plane
    * projection itself is pinned by AnnRecallSpec; everything downstream
    * of it becomes cross-engine checked).
    */
  def annBuckets(vecs: DataFrame, dims: Int = MAX_DIM, nPlanes: Int = 0): DataFrame = {
    val planes = if (nPlanes > 0) nPlanes else planesFor(vecs.count())
    vecs.withColumn("bucket", bucketCol(planes, dims)).select(col("vec_id"), col("bucket"))
  }

  /** The e_ann_lsh ORACLE hardcodes an 8-plane code (its multi-probe SQL
    * flips bits 0..7), so the oracled query pair pins nPlanes=8 EXPLICITLY
    * on the Spark side too — above 16,384 vectors the adaptive
    * planesFor() would otherwise widen the code and silently diverge from
    * the oracle (ADVICE r2). The adaptive default remains the production
    * path and is recall-gated on fixtures by DedupAnnSpec/AnnRecallSpec.
    */
  val ORACLE_ANN_PLANES = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_ann_buckets" -> ((s, d) => annBuckets(emb(s, d)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v")),
      dims = 64, nPlanes = ORACLE_ANN_PLANES)
      .orderBy(col("vec_id"))),

    // IVF oracle inputs: refined centroids (values stringified — Java's
    // shortest-roundtrip double formatting parses back to the identical
    // bits in DuckDB) and the candidate->cluster inverted index
    "e_ivf_centroids" -> ((s, d) => {
      val v = emb(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      ivfCentroids(v).select(col("cluster"),
        concat_ws(",", expr("transform(cv, x -> cast(x as string))")).as("cv_str"))
        .orderBy(col("cluster"))
    }),
    "e_ivf_assign" -> ((s, d) => {
      val v = emb(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      ivfAssign(v, ivfCentroids(v)).select(col("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))
    }),

    // ORACLED: top-5 neighbors per probe by integer-quantized dot product
    "e_knn_quantized" -> ((s, d) => {
      val q = emb(s, d).select(col("vec_id"), expr(quantize).as("q"))
      val probes = q.where(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("q").as("pq"))
      val scored = probes.join(q.where(col("vec_id") >= 5))
        .withColumn("dot", graft.functions.NativeFunctions.dot_product(col("pq"), col("q")))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("probe_id")).orderBy(col("dot").desc, col("vec_id"))))
        .where(col("rk") <= 5)
        .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("dot"))
        .orderBy(col("probe_id"), col("rk"))
    }),

    // exact double cosine top-3 (the real ANN baseline; rows-only)
    "e_knn_cosine" -> ((s, d) => {
      val v = emb(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", sqrt(graft.functions.NativeFunctions.dot_product(col("v"), col("v"))))
      val probes = v.where(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
      probes.join(v.where(col("vec_id") >= 5))
        .withColumn("cos", round(
          graft.functions.NativeFunctions.dot_product(col("pv"), col("v")) /
            (col("pn") * col("nrm")), 6))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))))
        .where(col("rk") <= 3)
        .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cos"))
        .orderBy(col("probe_id"), col("rk"))
    }),

    // LSH-bucketed ANN scale path (rows-only): sign-bit bucket over
    // corpus-adaptive pseudo-random hyperplanes (deterministic ±1 literal
    // sign arrays, native dot-product projections) with MULTI-PROBE —
    // each probe searches its home bucket plus every single-bit-flip
    // neighbor bucket, recovering the recall a wide code alone would
    // lose — and a per-bucket membership cap (counted via anti-join, not
    // silent) so a degenerate hot bucket can never go quadratic at
    // scale. Recall vs the exact KNN baseline is gated by
    // AnnRecallSpec (>= 0.9 on a planted-neighbor fixture).
    "e_ann_lsh" -> ((s, d) => annLsh(emb(s, d)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v")),
      dims = 64, nPlanes = ORACLE_ANN_PLANES)),

    // IVF ANN scale path (rows-only — float k-means has no DuckDB twin);
    // recall gated vs exact KNN by DedupAnnSpec
    "e_ann_ivf" -> ((s, d) => annIvf(emb(s, d)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v")))),

    // integer-quantized IVF with TWO Lloyd iterations, FULLY oracled with
    // no dump dependency: on round(x*1000) integer components every
    // k-means quantity is cross-engine exact — integer sums are
    // order-independent, avg = exact-int-sum / count is one IEEE divide,
    // and the mean is snapped to the 2^-12 dyadic grid so iteration-2
    // distances and final dots are exact multiples of 2^-24 below 2^53
    // (order-independent, reassociation-proof; ADVICE r3) — so DuckDB
    // re-runs seeds → assign → mean → assign → mean →
    // index → probe-route → top-k FROM THE RAW TABLE and must reproduce
    // every neighbor (the quantizer step itself is now oracled, which the
    // float e_ann_ivf cannot be; VERDICT r2 next-round #8)
    "e_ann_ivf_quant" -> ((s, d) => annIvf(emb(s, d)
      .select(col("vec_id"), expr(quantize).as("v")), iters = 2)),

    // ORACLED: embedding label centroids on quantized components
    "e_label_centroids" -> ((s, d) => emb(s, d)
      .select(col("label"), posexplode(expr(quantize)).as(Seq("dim", "qv")))
      .where(col("dim") < 8)
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("qv")), 4).as("centroid"), count(lit(1)).as("n"))
      .orderBy(col("label"), col("dim"))),

    // embedding-cosine near-duplicate detection (builder prompt dedup
    // family): candidate pairs bounded by a capped sign-bit LSH bucket
    // join, exact cosine as the residual predicate — the scale path for
    // embedding dedup (no all-pairs). Rows-only (float math).
    // The input is the embeddings table PLUS planted near-duplicates:
    // the testdata's max off-diagonal cosine is 0.51, so without planted
    // rows this operator had never returned a row (r1: vacuously
    // "correct"). Ten deterministic perturbed copies of vec_id < 10
    // (ids +100000, component noise ±1% from xxhash64) sit at cosine
    // ≈ 0.999 to their sources; finding them proves the path end-to-end.
    "e_cosine_dupes" -> ((s, d) => cosineDupes(dupeInput(s, d), 0.9, dims = 64)),

    // oracle inputs for e_cosine_dupes: the planted-union vectors
    // (stringified) and their band-code assignments — DuckDB re-runs the
    // capped band join + exact-cosine residual from these
    "e_dupe_vecs" -> ((s, d) => dupeInput(s, d)
      .select(col("vec_id"),
        concat_ws(",", expr("transform(v, x -> cast(x as string))")).as("v_str"))
      .orderBy(col("vec_id"))),
    "e_dupe_bands" -> ((s, d) => bandedCodes(dupeInput(s, d), dims = 64)
      .orderBy(col("vec_id"), col("band"))),

    // KNN classifier baseline (SURVEY.md §2 row 41): majority label of
    // the 5 nearest neighbors (quantized dot), ORACLED
    "e_knn_classify" -> ((s, d) => {
      val q = emb(s, d).select(col("vec_id"), col("label"), expr(quantize).as("q"))
      val probes = q.where(col("vec_id") < 20)
        .select(col("vec_id").as("probe_id"), col("q").as("pq"))
      val neighbors = probes.join(q.where(col("vec_id") >= 20))
        .withColumn("dot", graft.functions.NativeFunctions.dot_product(col("pq"), col("q")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("probe_id")).orderBy(col("dot").desc, col("vec_id"))))
        .where(col("rk") <= 5)
      neighbors.groupBy(col("probe_id"), col("label")).agg(count(lit(1)).as("votes"))
        .withColumn("vrk", row_number().over(
          Window.partitionBy(col("probe_id")).orderBy(col("votes").desc, col("label"))))
        .where(col("vrk") === 1)
        .select(col("probe_id"), col("label").as("predicted"), col("votes"))
        .orderBy(col("probe_id"))
    }),

    // Gaussian (numeric) Naive Bayes (SURVEY.md §2 row 41's numeric
    // variant, completing the NB family): per-(label, dim) mean/variance
    // over the train split (vec_id >= 100), log-density scoring of the
    // test split, argmax per vector. Scores rounded to 6 decimals before
    // the argmax so cross-engine float summation cannot flip the class.
    "e_nb_numeric" -> ((s, d) => {
      val comps = emb(s, d)
        .select(col("vec_id"), col("label"),
          posexplode(expr("transform(embedding, x -> cast(x as double))")).as(Seq("dim", "x")))
        .where(col("dim") < 8)
      val train = comps.where(col("vec_id") >= 100)
      val stats = train.groupBy(col("label").as("m_label"), col("dim").as("m_dim"))
        .agg(avg(col("x")).as("mu"), var_samp(col("x")).as("v"))
      val priors = emb(s, d).where(col("vec_id") >= 100)
        .groupBy(col("label").as("m_label")).agg(count(lit(1)).as("n_docs"))
      val trainN = emb(s, d).where(col("vec_id") >= 100).count().toDouble
      val test = comps.where(col("vec_id") < 100)
      val scored = test
        .join(broadcast(stats), test("dim") === stats("m_dim"), "inner")
        .withColumn("ll_dim",
          -(col("x") - col("mu")) * (col("x") - col("mu")) / (lit(2.0) * col("v")) -
            lit(0.5) * log(col("v")))
        .groupBy(col("vec_id"), col("label"), col("m_label"))
        .agg(sum(col("ll_dim")).as("ll"))
        .join(broadcast(priors), "m_label")
        .withColumn("score", round(log(col("n_docs") / lit(trainN)) + col("ll"), 6))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("m_label"))))
        .where(col("rk") === 1)
        .groupBy(col("label"), col("m_label").as("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("predicted"))
    }),

    // multimodal stub (builder prompt): opaque binary payload + typed
    // metadata; "decode" is a deterministic fake feature extractor run as
    // a batched mapPartitions (the real Spark plumbing: schema, batching,
    // partitioning), since no image/audio libs exist in this sandbox.
    "m_multimodal_stub" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val payloads = docs(s, d).where(col("doc_id") < 100)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
          struct(lit("text/fake-image").as("mime"), col("n_chars").as("size")).as("meta"))
      val decoded = payloads
        .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
        .as[(Long, Array[Byte], String)]
        .mapPartitions { it =>
          // STUB decoder: real systems would decode image bytes here; the
          // batch shape, schema and partitioning are the real thing. The
          // fake features are deliberately overflow-free arithmetic over
          // the payload (length scramble + unsigned byte sum) so the
          // whole stub is cross-engine ORACLED — DuckDB recomputes both
          // from the same bytes.
          it.map { case (id, bytes, mime) =>
            val fakeW = 16 + ((bytes.length.toLong * 2654435761L) % 1024).toInt
            val fakeH = 16 + (bytes.foldLeft(0L)((a, b) => a + (b & 0xff)) % 768).toInt
            (id, mime, bytes.length, fakeW, fakeH)
          }
        }
        .toDF("doc_id", "mime", "n_bytes", "fake_width", "fake_height")
      decoded.orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // the multimodal stub's fake decoder recomputed in DuckDB from the
    // same payload bytes (documents are ASCII, so chars == octets)
    "m_multimodal_stub" ->
      """SELECT doc_id, 'text/fake-image' AS mime,
        |  CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(16 + (strlen(text) * 2654435761) % 1024 AS INT) AS fake_width,
        |  CAST(16 + list_sum(list_transform(generate_series(1, length(text)),
        |    i -> ascii(substring(text, i, 1)))) % 768 AS INT) AS fake_height
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // banded near-dup re-run in DuckDB from the vector + band-code dumps:
    // same >256 per-(band,bucket) cap, candidate pairs deduped across
    // bands, same exact-cosine residual on the rebuilt doubles
    "e_cosine_dupes" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(string_split(v_str, ','), x -> CAST(x AS DOUBLE)) AS v
        |  FROM '__OUTDIR__/e_dupe_vecs/*.parquet'),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
        |b AS (SELECT vec_id, band, bucket FROM '__OUTDIR__/e_dupe_bands/*.parquet'),
        |hot AS (SELECT band, bucket FROM b GROUP BY 1, 2 HAVING count(*) > 256),
        |cold AS (SELECT b.* FROM b ANTI JOIN hot
        |  ON b.band = hot.band AND b.bucket = hot.bucket),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS keep_id, c.vec_id AS dup_id
        |  FROM cold a JOIN cold c
        |    ON a.band = c.band AND a.bucket = c.bucket AND a.vec_id < c.vec_id),
        |scored AS (
        |  SELECT cand.keep_id, cand.dup_id,
        |    round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cos
        |  FROM cand JOIN n x ON x.vec_id = cand.keep_id
        |            JOIN n y ON y.vec_id = cand.dup_id)
        |SELECT keep_id, dup_id, cos FROM scored WHERE cos >= 0.9
        |ORDER BY keep_id, dup_id""".stripMargin,
    // IVF ANN re-run in DuckDB from the centroid + inverted-index dumps:
    // same probe routing (2 nearest centroids by 9dp-rounded squared
    // distance, tie on cluster), same per-cluster candidate join, same
    // exact-dot top-3 — the float k-means step is the only part left to
    // the recall gate
    "e_ann_ivf" ->
      """WITH cen AS (
        |  SELECT cluster,
        |    list_transform(string_split(cv_str, ','), x -> CAST(x AS DOUBLE)) AS cv
        |  FROM '__OUTDIR__/e_ivf_centroids/*.parquet'),
        |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |asg AS (SELECT vec_id, cluster FROM '__OUTDIR__/e_ivf_assign/*.parquet'),
        |cand AS (SELECT a.vec_id, a.cluster, v.v FROM asg a JOIN v USING (vec_id)),
        |pr AS (
        |  SELECT p.vec_id AS probe_id, p.v AS pv, c.cluster,
        |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      round(list_dot_product(p.v, p.v) - 2.0 * list_dot_product(p.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), 9) ASC, c.cluster) AS crk
        |  FROM v p CROSS JOIN cen c WHERE p.vec_id < 20),
        |probes AS (SELECT probe_id, pv, cluster FROM pr WHERE crk <= 2),
        |scored AS (
        |  SELECT probe_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(pv, c.v), 6) AS dot
        |  FROM probes p JOIN cand c USING (cluster)),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, dot,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY dot DESC, neighbor_id) AS rk
        |  FROM scored)
        |SELECT probe_id, rk, neighbor_id, dot FROM ranked WHERE rk <= 3
        |ORDER BY probe_id, rk""".stripMargin,
    // the quantized 2-iteration IVF re-run ENTIRELY from the raw table:
    // seeds (16 lowest candidate ids) → assign (9dp-rounded squared
    // distance, tie on cluster) → exact per-dim means snapped to the
    // 2^-12 dyadic grid → second assign/mean round → inverted index →
    // 2-probe routing → exact-dot top-3. No dumps: every quantity is an
    // exact multiple of 2^-24 below 2^53 on integer components, hence
    // order-independent — both engines must agree bit-for-bit.
    "e_ann_ivf_quant" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
        |  FROM embeddings),
        |cand AS (SELECT vec_id, v FROM q WHERE vec_id >= 20),
        |seeds AS (SELECT vec_id AS cluster, v AS cv FROM cand ORDER BY vec_id LIMIT 16),
        |a1 AS (
        |  SELECT vec_id, v, cluster FROM (
        |    SELECT c.vec_id, c.v, s.cluster,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_dot_product(c.v, c.v) - 2.0 * list_dot_product(c.v, s.cv)
        |          + list_dot_product(s.cv, s.cv), 9) ASC, s.cluster) AS rk
        |    FROM cand c CROSS JOIN seeds s)
        |  WHERE rk = 1),
        |c1 AS (
        |  SELECT cluster, list(m ORDER BY dim) AS cv FROM (
        |    SELECT a.cluster, t.i AS dim, floor(avg(a.v[t.i]) * 4096) / 4096 AS m
        |    FROM a1 a, unnest(generate_series(1, len(a.v))) AS t(i)
        |    GROUP BY 1, 2)
        |  GROUP BY 1),
        |a2 AS (
        |  SELECT vec_id, v, cluster FROM (
        |    SELECT c.vec_id, c.v, s.cluster,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_dot_product(c.v, c.v) - 2.0 * list_dot_product(c.v, s.cv)
        |          + list_dot_product(s.cv, s.cv), 9) ASC, s.cluster) AS rk
        |    FROM cand c CROSS JOIN c1 s)
        |  WHERE rk = 1),
        |c2 AS (
        |  SELECT cluster, list(m ORDER BY dim) AS cv FROM (
        |    SELECT a.cluster, t.i AS dim, floor(avg(a.v[t.i]) * 4096) / 4096 AS m
        |    FROM a2 a, unnest(generate_series(1, len(a.v))) AS t(i)
        |    GROUP BY 1, 2)
        |  GROUP BY 1),
        |asg AS (
        |  SELECT vec_id, v, cluster FROM (
        |    SELECT c.vec_id, c.v, s.cluster,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_dot_product(c.v, c.v) - 2.0 * list_dot_product(c.v, s.cv)
        |          + list_dot_product(s.cv, s.cv), 9) ASC, s.cluster) AS rk
        |    FROM cand c CROSS JOIN c2 s)
        |  WHERE rk = 1),
        |pr AS (
        |  SELECT probe_id, pv, cluster FROM (
        |    SELECT p.vec_id AS probe_id, p.v AS pv, s.cluster,
        |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |        round(list_dot_product(p.v, p.v) - 2.0 * list_dot_product(p.v, s.cv)
        |          + list_dot_product(s.cv, s.cv), 9) ASC, s.cluster) AS crk
        |    FROM q p CROSS JOIN c2 s WHERE p.vec_id < 20)
        |  WHERE crk <= 2),
        |scored AS (
        |  SELECT probe_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(pv, c.v), 6) AS dot
        |  FROM pr p JOIN asg c USING (cluster)),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, dot,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY dot DESC, neighbor_id) AS rk
        |  FROM scored)
        |SELECT probe_id, rk, neighbor_id, dot FROM ranked WHERE rk <= 3
        |ORDER BY probe_id, rk""".stripMargin,
    // ANN re-run in DuckDB from the bucket-assignment dump: same
    // multi-probe expansion (home bucket + every single-bit flip of the
    // 8-plane code), same >256 hot-bucket exclusion computed over the
    // candidate side, same exact-dot top-3 on the 6dp-rounded score —
    // everything downstream of the sign-plane projection cross-checked
    "e_ann_lsh" ->
      """WITH b AS (SELECT vec_id, bucket FROM '__OUTDIR__/e_ann_buckets/*.parquet'),
        |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |hot AS (SELECT bucket FROM b WHERE vec_id >= 20
        |        GROUP BY bucket HAVING count(*) > 256),
        |cand AS (
        |  SELECT b.vec_id, b.bucket, v.v FROM b JOIN v USING (vec_id)
        |  WHERE b.vec_id >= 20 AND b.bucket NOT IN (SELECT bucket FROM hot)),
        |probes AS (
        |  SELECT b.vec_id AS probe_id, v.v AS pv,
        |    unnest(list_distinct(list_concat([b.bucket],
        |      list_transform(generate_series(0, 7), p -> xor(b.bucket, 1::BIGINT << p))))) AS bucket
        |  FROM b JOIN v USING (vec_id) WHERE b.vec_id < 20),
        |scored AS (
        |  SELECT probe_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(pv, c.v), 6) AS dot
        |  FROM probes p JOIN cand c ON p.bucket = c.bucket),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, dot,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY dot DESC, neighbor_id) AS rk
        |  FROM scored)
        |SELECT probe_id, rk, neighbor_id, dot FROM ranked WHERE rk <= 3
        |ORDER BY probe_id, rk""".stripMargin,
    // exact double cosine: both engines sum the dot product strictly
    // left-to-right over the same double-cast floats (IEEE ops are
    // deterministic given order), sqrt/divide are correctly rounded, and
    // ranking uses the 6dp-rounded value — bit-identical cross-engine
    "e_knn_cosine" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) AS cos
        |  FROM n p JOIN n c ON p.vec_id < 5 AND c.vec_id >= 5),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk
        |  FROM scored)
        |SELECT probe_id, rk, neighbor_id, cos FROM ranked WHERE rk <= 3
        |ORDER BY probe_id, rk""".stripMargin,
    "e_knn_quantized" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
        |  FROM embeddings),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |    list_dot_product(p.qv, c.qv) AS dot
        |  FROM q p JOIN q c ON p.vec_id < 5 AND c.vec_id >= 5),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, dot,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY dot DESC, neighbor_id) AS rk
        |  FROM scored)
        |SELECT probe_id, rk, neighbor_id, dot FROM ranked WHERE rk <= 5
        |ORDER BY probe_id, rk""".stripMargin,
    "e_knn_classify" ->
      """WITH q AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
        |  FROM embeddings),
        |nb AS (
        |  SELECT p.vec_id AS probe_id, c.label,
        |    row_number() OVER (PARTITION BY p.vec_id
        |      ORDER BY list_dot_product(p.qv, c.qv) DESC, c.vec_id) AS rk
        |  FROM q p JOIN q c ON p.vec_id < 20 AND c.vec_id >= 20),
        |votes AS (
        |  SELECT probe_id, label, count(*) AS votes FROM nb WHERE rk <= 5 GROUP BY 1, 2),
        |best AS (
        |  SELECT probe_id, label AS predicted, votes,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY votes DESC, label) AS vrk
        |  FROM votes)
        |SELECT probe_id, predicted, votes FROM best WHERE vrk = 1 ORDER BY probe_id""".stripMargin,
    "e_nb_numeric" ->
      """WITH comps AS (
        |  SELECT vec_id, label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |  WHERE i - 1 < 8),
        |stats AS (
        |  SELECT label AS m_label, dim AS m_dim, avg(x) AS mu, var_samp(x) AS v
        |  FROM comps WHERE vec_id >= 100 GROUP BY 1, 2),
        |priors AS (
        |  SELECT label AS m_label, count(*) AS n_docs FROM embeddings WHERE vec_id >= 100 GROUP BY 1),
        |train_n AS (SELECT count(*) * 1.0 AS tn FROM embeddings WHERE vec_id >= 100),
        |scored AS (
        |  SELECT c.vec_id, c.label, s.m_label,
        |    sum(-(c.x - s.mu) * (c.x - s.mu) / (2.0 * s.v) - 0.5 * ln(s.v)) AS ll
        |  FROM comps c JOIN stats s ON c.dim = s.m_dim
        |  WHERE c.vec_id < 100 GROUP BY 1, 2, 3),
        |finals AS (
        |  SELECT vec_id, label, m_label, round(ln(n_docs / tn) + ll, 6) AS score
        |  FROM scored JOIN priors USING (m_label) CROSS JOIN train_n),
        |ranked AS (
        |  SELECT vec_id, label, m_label,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, m_label) AS rk
        |  FROM finals)
        |SELECT label, m_label AS predicted, count(*) AS n
        |FROM ranked WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e_label_centroids" ->
      """SELECT label, dim, round(avg(qv), 4) AS centroid, count(*) AS n FROM (
        |  SELECT label, i - 1 AS dim, round(CAST(embedding[i] AS DOUBLE) * 1000) AS qv
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i))
        |WHERE dim < 8 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
