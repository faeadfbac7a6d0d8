package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

import scala.collection.mutable

/** CategoryEntries merge as a typed Aggregator/UDAF (SURVEY.md §2 row
  * 62 — the reference's CategoryEntriesBuilder as an SQL-side
  * aggregate): merges (category, weight) pairs into a normalized
  * probability map. Registered via functions.udaf for SQL use;
  * exercised by the kg_surface_type_dist query (per-surface tag
  * distribution over all mentions).
  */
object CategoryMergeAggregator
    extends Aggregator[(String, Double), mutable.Map[String, Double], Map[String, Double]] {

  override def zero: mutable.Map[String, Double] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Double], a: (String, Double)): mutable.Map[String, Double] = {
    if (a._1 != null) b(a._1) = b.getOrElse(a._1, 0.0) + a._2
    b
  }

  override def merge(b1: mutable.Map[String, Double], b2: mutable.Map[String, Double]): mutable.Map[String, Double] = {
    for ((k, v) <- b2) b1(k) = b1.getOrElse(k, 0.0) + v
    b1
  }

  override def finish(b: mutable.Map[String, Double]): Map[String, Double] = {
    val total = b.values.sum
    if (total <= 0) Map.empty
    else b.map { case (k, v) => k -> BigDecimal(v / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }.toMap
  }

  override def bufferEncoder: Encoder[mutable.Map[String, Double]] =
    Encoders.kryo[mutable.Map[String, Double]]
  override def outputEncoder: Encoder[Map[String, Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Double]]()

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("pal_category_merge", org.apache.spark.sql.functions.udaf(this))
}
