package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the embedding dedup/ANN family (VERDICT r1 items
  * 4–5): the LSH paths must PROVE they find things — planted
  * near-duplicates are detected, ANN recall vs the exact KNN baseline is
  * >= 0.9 on a fixture, and hot buckets are capped (excluded from the
  * join) rather than joined all-pairs.
  */
class DedupAnnSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("dedup-ann")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dim = 16

  /** Deterministic pseudo-random unit-ish vector per id. */
  private def vec(id: Int, rnd: scala.util.Random): Array[Double] =
    Array.fill(dim)(rnd.nextGaussian())

  private def fixture(): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(42)
    val probes = (0 until 20).map(i => (i.toLong, vec(i, rnd).toSeq))
    // candidate 20+i = probe i + small noise -> its true nearest neighbor
    val planted = probes.map { case (id, v) =>
      (id + 20, v.map(x => x + 0.05 * rnd.nextGaussian()))
    }
    val fillers = (40 until 200).map(i => (i.toLong, vec(i, rnd).toSeq))
    probes ++ planted ++ fillers
  }

  private def toDf(rows: Seq[(Long, Seq[Double])]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("vec_id", "v")
  }

  test("annLsh recall >= 0.9 vs exact top-1 on planted-neighbor fixture") {
    val rows = fixture()
    val df = toDf(rows)
    // exact top-1 per probe by brute force (the oracle)
    val byId = rows.toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val exactTop1 = (0 until 20).map { p =>
      val pv = byId(p.toLong)
      val best = rows.filter(_._1 >= 20).maxBy { case (_, v) => dot(pv, v) }
      p.toLong -> best._1
    }.toMap
    val ann = CatalogEmbed.annLsh(df, probeMax = 20, k = 3)
      .collect().groupBy(_.getAs[Long]("probe_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val hits = (0 until 20).count(p => ann.getOrElse(p.toLong, Set.empty).contains(exactTop1(p.toLong)))
    assert(hits >= 18, s"ANN recall ${hits / 20.0} < 0.9 (hits=$hits, found=${ann.size} probes)")
  }

  test("annIvf recall >= 0.9 vs exact top-1 on planted-neighbor fixture") {
    val rows = fixture()
    val df = toDf(rows)
    val byId = rows.toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val exactTop1 = (0 until 20).map { p =>
      val pv = byId(p.toLong)
      p.toLong -> rows.filter(_._1 >= 20).maxBy { case (_, v) => dot(pv, v) }._1
    }.toMap
    val ivf = CatalogEmbed.annIvf(df, probeMax = 20, k = 3)
      .collect().groupBy(_.getAs[Long]("probe_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val hits = (0 until 20).count(p => ivf.getOrElse(p.toLong, Set.empty).contains(exactTop1(p.toLong)))
    assert(hits >= 18, s"IVF recall ${hits / 20.0} < 0.9 (hits=$hits)")
  }

  test("cosineDupes finds planted near-duplicates") {
    val rows = fixture()
    val df = toDf(rows)
    val dupes = CatalogEmbed.cosineDupes(df, 0.9).collect()
    // every planted pair (p, p+20) has cosine ~0.99; the LSH bucket may
    // drop a few across a plane boundary but most must be found
    val plantedFound = dupes.count { r =>
      r.getAs[Long]("dup_id") - r.getAs[Long]("keep_id") == 20 && r.getAs[Long]("keep_id") < 20
    }
    assert(plantedFound >= 15, s"found only $plantedFound of 20 planted near-dup pairs")
    assert(dupes.forall(_.getAs[Double]("cos") >= 0.9))
  }

  test("e_cosine_dupes query returns planted rows on driver testdata") {
    val out = CatalogEmbed.queries("e_cosine_dupes")(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty, "e_cosine_dupes returned 0 rows — the planted fixture is broken")
    assert(out.forall(r => r.getAs[Long]("dup_id") >= 100000), "unexpected natural dupe?")
  }

  test("hot buckets are capped: identical vectors above the cap yield no all-pairs join") {
    val hot = (0 until 300).map(i => (i.toLong, Seq.fill(dim)(1.0))) // one bucket, 300 members
    val dupes = CatalogEmbed.cosineDupes(toDf(hot), 0.9).collect()
    assert(dupes.isEmpty, s"cap ${CatalogEmbed.MAX_ANN_BUCKET} not applied: got ${dupes.length} pairs")
    val warm = (0 until 100).map(i => (i.toLong, Seq.fill(dim)(1.0))) // under the cap
    val found = CatalogEmbed.cosineDupes(toDf(warm), 0.9).count()
    assert(found == 100L * 99 / 2, s"under-cap bucket should join all-pairs, got $found")
  }

  test("minhash LSH guards short docs and caps hot buckets") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_minhash").toString
    // 100 identical docs (hot bucket, > MAX_LSH_BUCKET=64), 2 distinct
    // near-dups, and degenerate short docs that would crash the
    // unguarded sequence(0, n-3)
    val hotDocs = (0 until 100).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta", "en", "src0", 40L))
    // identical pair: J=1 -> every band collides -> detection GUARANTEED
    // (a partial overlap would make the gate probabilistic)
    val pair = Seq(
      (200L, "red orange yellow green blue indigo violet magenta", "en", "src1", 40L),
      (201L, "red orange yellow green blue indigo violet magenta", "en", "src1", 40L))
    val shorties = Seq((300L, "one", "en", "src2", 3L), (301L, "two words", "en", "src2", 9L),
      (302L, "", "en", "src2", 0L))
    (hotDocs ++ pair ++ shorties).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = CatalogText.queries("t_minhash_lsh")(spark, tmp).collect()
    // the identical-100 block is capped away; the near-dup pair remains
    assert(pairs.exists(r => r.getLong(0) == 200L && r.getLong(1) == 201L),
      s"near-dup pair not found: ${pairs.mkString(",")}")
    assert(!pairs.exists(_.getLong(0) < 100), "hot bucket joined all-pairs despite cap")
    // jaccard query also survives the short docs
    val jac = CatalogText.queries("t_ngram_jaccard")(spark, tmp).collect()
    assert(jac.nonEmpty)
  }

  test("simhash pins: identical docs equal, near-dups close, distinct docs far") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_simhash").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "s", 10L),
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s", 10L),  // identical to 0
      (2L, "alpha beta gamma delta epsilon eta", "en", "s", 10L),   // 1 token differs
      (3L, "one two three four five six", "en", "s", 10L))          // disjoint
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sh = CatalogText.queries("t_simhash")(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(sh(0L) == sh(1L), "identical docs must have identical simhash")
    assert(hamming(sh(0L), sh(2L)) < hamming(sh(0L), sh(3L)),
      s"near-dup should be closer: ${hamming(sh(0L), sh(2L))} vs ${hamming(sh(0L), sh(3L))}")
    assert(hamming(sh(0L), sh(2L)) <= 16, "1-token change flipped too many bits")
  }
}
