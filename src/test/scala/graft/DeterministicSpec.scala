package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Deterministic

/** Property tests for the cross-engine determinism helpers and query
  * invariants (SURVEY.md §5 item 3). Uses ScalaCheck generators directly
  * (fixed seed → reproducible) rather than the scalatestplus bridge.
  */
class DeterministicSpec extends SparkSpec {

  test("exactSum equals a scaled integer sum regardless of partitioning") {
    import spark.implicits._
    val values = Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6))
      .apply(Gen.Parameters.default, Seed(7L)).get
    val expected = values.map(v => math.round(v * 100)).sum / 100.0
    for (parts <- Seq(1, 3, 7)) {
      val got = values.toDF("v").repartition(parts)
        .agg(Deterministic.exactSum(col("v"), 2).alias("s"))
        .collect()(0).getDouble(0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("quantize is exact for representable 2-decimal values") {
    import spark.implicits._
    val cents = Gen.listOfN(300, Gen.chooseNum(-100000, 100000))
      .apply(Gen.Parameters.default, Seed(42L)).get
    val got = cents.map(_ / 100.0).toDF("v")
      .select(Deterministic.quantize(col("v"), 2).alias("q"))
      .collect().map(_.getLong(0)).toList
    assert(got == cents.map(_.toLong))
  }

  test("grouped exactSums reconcile with the global exactSum") {
    val l = Tables.lineitem(spark, sf)
    val global = l.agg(Deterministic.exactSum(col("l_quantity"), 2)).collect()(0).getDouble(0)
    val grouped = l.groupBy("l_returnflag")
      .agg(Deterministic.exactSum(col("l_quantity"), 2).alias("s"))
      .agg(sum(round(col("s") * 100).cast("long"))).collect()(0).getLong(0)
    assert(grouped == math.round(global * 100))
  }

  test("dim_date distinct is idempotent") {
    val d = q("dim_date")
    assert(d.count() == d.distinct().count())
  }
}
