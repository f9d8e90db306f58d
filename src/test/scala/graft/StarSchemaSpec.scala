package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parity-tier semantics: schemas, join-drop behavior, calendar
  * conventions (SURVEY.md §5 item 2).
  */
class StarSchemaSpec extends SparkSpec {

  test("dim_customer: schema and no null nation names after inner join") {
    val df = q("dim_customer")
    assert(df.schema.fieldNames.toSeq ==
      Seq("customer_key", "customer_name", "market_segment", "nation_name", "account_balance"))
    assert(df.filter(col("nation_name").isNull).count() == 0)
    assert(df.count() == 150)
  }

  test("dim_product: 3-way inner chain keeps only fully-linked rows") {
    val df = q("dim_product")
    assert(df.count() == 10) // all suppliers link nation→region at sf0.001
    assert(df.filter(col("category_name").isNull).count() == 0)
  }

  test("dim_date: date_key round-trips and dayofweek is 1=Sunday..7") {
    val df = q("dim_date")
    val bad = df.filter(
      date_format(col("date"), "yyyyMMdd").cast("int") =!= col("date_key") ||
      col("day_of_week") < 1 || col("day_of_week") > 7)
    assert(bad.count() == 0)
    // spot value: 2024-01-07 was a Sunday → day_of_week 1
    val sun = df.filter(col("date") === to_date(lit("1996-01-07"))).select("day_of_week")
    assert(sun.collect().forall(_.getInt(0) == 1))
  }

  test("fact_sales_detail: line_total = extendedprice*(1-discount) rowwise") {
    val df = q("fact_sales_detail")
    val bad = df.filter(
      abs(col("line_total") - col("unit_price") * (lit(1.0) - col("discount"))) > 1e-9)
    assert(bad.count() == 0)
    assert(df.schema("date_key").dataType == IntegerType)
  }

  test("driver t1 contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("fact agg totals reconcile with detail totals") {
    val detail = q("fact_sales_detail")
      .agg(sum(round(col("order_quantity") * 100).cast("long")).alias("qty100"))
      .collect()(0).getLong(0)
    val agg = q("fact_sales_agg_daily_product")
      .agg(sum(round(col("total_quantity_sold") * 100).cast("long")).alias("qty100"))
      .collect()(0).getLong(0)
    assert(detail == agg)
  }

  test("incremental product totals ≡ from-scratch rebuild, bit-exact") {
    import graft.functions.Deterministic
    val oneShot = Tables.lineitem(spark, sf).alias("l")
      .join(Tables.orders(spark, sf).alias("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .groupBy(col("l.l_partkey").alias("product_key"))
      .agg(Deterministic.exactSum(col("l.l_quantity"), 2).alias("total_quantity_sold"),
        Deterministic.exactSum(
          col("l.l_extendedprice") * (lit(1.0) - col("l.l_discount")), 4)
          .alias("total_revenue"),
        count(lit(1)).alias("n_lines"))
      .orderBy("product_key")
      .collect().toSeq
    val incr = q("fact_product_totals_incremental").collect().toSeq
    assert(incr == oneShot)
    // the cut actually splits the data — both legs contribute
    val batchRows = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01")).count()
    val baseRows = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("1997-01-01")).count()
    assert(batchRows > 0 && baseRows > 0)
  }
}
