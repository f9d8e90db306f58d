package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.{JdbcSource, ParquetSink, Sink}

/** Job 1 rebuild — source → explicit-schema DataFrames → Parquet lake
  * (reference: `/root/reference/code_base/db_to_parquet.py:154-199`).
  *
  * Differences from the reference, on purpose (SURVEY.md §4):
  *  - The JDBC path takes a [[graft.sources.JdbcPartitioning]] so a large
  *    table lands as N parallel range/predicate scans, not one connection.
  *  - Sources are pluggable ([[TableProvider]]): the harness runs the
  *    same job against Parquet fixtures; production runs it against JDBC
  *    with the identical schema/sink wiring.
  *
  * Explicit schemas mirror the reference's `TABLE_SCHEMAS` discipline
  * (`db_to_parquet.py:29-144`): declared, not inferred, so a source
  * catalog change surfaces as an analysis error instead of silent drift.
  */
object IngestJob {

  /** Declared fixture-table schemas (FIXTURES.md §1). */
  val tableSchemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType, nullable = false),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType, nullable = false),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType, nullable = false),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType, nullable = false),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType, nullable = false),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType, nullable = false),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
  )

  /** One table's source — explicit schema applied at the reader. */
  trait TableProvider {
    def read(spark: SparkSession, table: String, schema: StructType): DataFrame
  }

  /** Harness source: fixture parquet with the declared schema enforced. */
  final case class ParquetProvider(sfDir: String) extends TableProvider {
    def read(spark: SparkSession, table: String, schema: StructType): DataFrame =
      spark.read.schema(schema).parquet(s"$sfDir/$table.parquet")
  }

  /** Production source: partitioned JDBC (reference option surface). */
  final case class JdbcProvider(base: JdbcSource) extends TableProvider {
    def read(spark: SparkSession, table: String, schema: StructType): DataFrame =
      base.copy(table = table, schema = Some(schema)).load(spark)
  }

  /** Ingest every declared table through `provider` into `sinkFor`.
    * The reference's loop (`db_to_parquet.py:194-199`) with the sink
    * abstracted; each write is an independent Spark job, as there.
    */
  def run(spark: SparkSession, provider: TableProvider,
      sinkFor: String => Sink = name => ParquetSink(name)): Unit =
    tableSchemas.foreach { case (table, schema) =>
      sinkFor(table).write(provider.read(spark, table, schema))
    }

  /** Harness entry: fixtures → parquet lake under `outDir`. */
  def runFromParquet(spark: SparkSession, sfDir: String, outDir: String): Unit =
    run(spark, ParquetProvider(sfDir), name => ParquetSink(s"$outDir/$name"))
}
