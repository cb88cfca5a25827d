package graft

import graft.Determinism._
import graft.operators.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r21 q_interval_join rewrite: the per-point aggregate over
  * covering fixed-length intervals is a function of the point's day
  * alone, so the day-level pre-aggregate + equi-join form must equal
  * the pair-enumerating RangeJoin form bit-for-bit (exact decimal sums
  * are grouping-independent; the inner join drops uncovered points in
  * both shapes).
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The pre-r21 shape of q_interval_join over generic fixtures. */
  private def pairForm(points: DataFrame, ivs: DataFrame): DataFrame =
    RangeJoin.pointInInterval(points,
        ivs.withColumn("d1", col("d0") + 6),
        point = col("pd"), lo = col("d0"), hi = col("d1"), binWidth = 7L)
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_big"), dsum(col("price")).as("sum_price"))

  /** The r21 shape: per-day interval rollup (decimal-exact) + equi-join
    * on the day + rollup to the (non-unique) point key.
    */
  private def dayAggForm(points: DataFrame, ivs: DataFrame): DataFrame = {
    val cov = ivs
      .select(explode(sequence(col("d0"), col("d0") + 6)).as("pd"), col("price"))
      .groupBy(col("pd"))
      .agg(count(lit(1)).as("n_day"), sum(dec2(col("price"))).as("sum_day"))
    points.join(broadcast(cov), Seq("pd"))
      .groupBy(col("pid"))
      .agg(sum(col("n_day")).as("n_big"),
        sum(col("sum_day")).cast("double").as("sum_price"))
  }

  private def collectMap(df: DataFrame): Map[Long, (Long, Double)] =
    df.collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2))
    }.toMap

  test("day-aggregate form equals the pair-enumerating RangeJoin form " +
    "bit-for-bit on randomized fixtures (r21)") {
    val rnd = new scala.util.Random(29)
    (1 to 3).foreach { trial =>
      // clustered days so some days carry many intervals, some none;
      // prices with cents so double-vs-decimal drift would surface
      val ivs = (1 to 60).map { _ =>
        (rnd.nextInt(40).toLong - 5L,
          BigDecimal(490000 + rnd.nextInt(60000)) + BigDecimal(rnd.nextInt(100)) / 100)
      }.toDF("d0", "price")
      // DUPLICATE point keys (like the corpus' lineitem key): a key's
      // rows may ship on different days; the key-grain rollup must
      // merge them exactly as the pair form's GROUP BY does
      val points = (1 to 200).map(_ =>
          (rnd.nextInt(80).toLong, rnd.nextInt(60).toLong - 10L))
        .toDF("pid", "pd")
      val pair = collectMap(pairForm(points, ivs))
      val day = collectMap(dayAggForm(points, ivs))
      assert(day == pair, s"diverged at trial=$trial")
      // sanity: the fixture actually exercises both matched and
      // unmatched points
      assert(pair.nonEmpty && pair.size < 200, s"degenerate fixture $trial")
    }
  }
}
