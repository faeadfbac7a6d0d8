package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions: equal to the UDF/oracle semantics, no
  * ScalaUDF node in the plan, codegen-compatible.
  */
class ExpressionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("exprs")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val names = spark.read
    .parquet("/root/testdata/sf0.001/customer.parquet")
    .select(col("c_name").as("s"))

  test("native expressions equal the semantics functions row-for-row") {
    import spark.implicits._
    val rows = names
      .withColumn("norm_native", NativeFunctions.normalize_surface($"s"))
      .withColumn("sig_native", NativeFunctions.case_signature($"s"))
      .collect()
    for (r <- rows) {
      val s = r.getString(0)
      assert(r.getString(1) == graft.semantics.StringOps.normalizeSurface(s))
      assert(r.getString(2) == graft.semantics.StringOps.caseSignature(s))
    }
  }

  test("minhash signature expression == the declarative HOF idiom bit-for-bit") {
    import spark.implicits._
    // adversarial shapes: double/leading/trailing spaces create EMPTY
    // split tokens; multibyte UTF-8; exactly-3 and under-3 tokens
    val texts = Seq(
      "alpha beta gamma delta epsilon",
      "one two three",
      "two words", "single", "",
      "  leading and trailing  ",
      "double  space  tokens here",
      "unicode tökens höre über many wörds",
      "a b c d e f g h i j k l m n o p") ++
      (0 until 50).map(i => s"w${i % 7} x${i % 5} y${i % 3} z$i tail${i % 2}")
    val df = texts.toDF("text")
    val got = df.select(col("text"),
        NativeFunctions.minhash_sigs(col("text")).as("sigs"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    // under-3-token docs: the native expression must return null (these
    // rows crash the HOF idiom itself — the sharp edge the old SQL guard
    // existed for — so the reference is only evaluable on >= 3 tokens)
    val shortOnes = df.where(size(split(col("text"), " ")) < 3)
      .collect().map(_.getString(0))
    for (text <- shortOnes)
      assert(got(text) == null, s"'$text' must be null under 3 tokens")
    val want = df
      .where(size(split(col("text"), " ")) >= 3)
      .withColumn("shingles", expr(
        "transform(sequence(0, size(split(text, ' ')) - 3), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"))
      .select(col("text"),
        array((0 until 16).map(k =>
          expr(s"array_min(transform(shingles, sh -> xxhash64(sh, $k)))")): _*).as("sigs"))
      .collect()
    assert(want.length + shortOnes.length == texts.distinct.length)
    for (r <- want) {
      val text = r.getString(0)
      assert(got(text) == r.getSeq[Long](1), s"signature mismatch for '$text'")
    }
  }

  test("char trigram expression == the transform/substring idiom") {
    import spark.implicits._
    val texts = Seq("abc", "abcd", "ab", "a", "",
      "hello world of text", "tökens höre über", "a b c d")
    val df = texts.toDF("text")
    val got = df.select(col("text"), NativeFunctions.char_trigrams(col("text")).as("gs"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    val want = df.where(length(col("text")) >= 3)
      .select(col("text"),
        expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))").as("gs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (t <- texts) {
      if (t.length < 3) assert(got(t) == null, s"'$t' must be null under 3 chars")
      else assert(got(t) == want(t), s"trigram mismatch for '$t'")
    }
  }

  test("plan contains no ScalaUDF and stays in whole-stage codegen") {
    val df = names.select(NativeFunctions.normalize_surface(col("s")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
  }

  test("null propagates") {
    import spark.implicits._
    val out = Seq[String]("A", null).toDF("s")
      .select(NativeFunctions.case_signature($"s")).collect()
    assert(out(0).getString(0) == "A" && out(1).isNullAt(0))
  }

  test("winnow fingerprint: robust to far-away edits, sensitive to equality, codegen-safe") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog and keeps running far away"
    // direct evaluation matches the Column expression through codegen
    val viaExpr = Seq(a).toDF("s")
      .select(NativeFunctions.winnow_fp($"s")).first().getLong(0)
    assert(viaExpr == NativeFunctions.winnowFingerprint(
      org.apache.spark.unsafe.types.UTF8String.fromString(a)))
    // identical text -> identical fingerprint; edit far from the minimum
    // window usually preserves it (property of winnowing) — pin one case
    val b = a + " zzz" // suffix edit
    def fp(s: String) = NativeFunctions.winnowFingerprint(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(fp(a) == viaExpr)
    assert(fp(a) == fp(b) || fp(b) != 0L) // suffix change may keep min; never degenerates
    assert(fp("") == 0L && fp("ab") != 0L)
    // no ScalaUDF in the plan
    val plan = Seq(a).toDF("s").select(NativeFunctions.winnow_fp($"s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("SQL registration works") {
    NativeFunctions.register(spark)
    names.createOrReplaceTempView("names_v")
    val r = spark.sql(
      "SELECT pal_case_signature_native(s) AS sig, pal_normalize_native(s) AS n FROM names_v LIMIT 1")
      .first()
    assert(r.getString(0).nonEmpty && r.getString(1).nonEmpty)
  }
}
