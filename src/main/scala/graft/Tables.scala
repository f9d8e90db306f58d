package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Table catalog over the harness fixture directory.
  *
  * Analog of the reference's table-dict loader
  * (`code_base/transform_to_bq.py:77-83`): lazy Parquet scans, schema from
  * footers, data does not move until an action fires. Column pruning and
  * predicate pushdown reach the scan because nothing here forces
  * materialization.
  *
  * Scale note: at 100 TB each `load` is a partitioned multi-file scan; the
  * single-`.parquet`-file fixture layout is just the harness shape. Nothing
  * in this object assumes single-file or single-partition input.
  */
object Tables {
  /** TPC-H-ish star schema tables. */
  val star: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** LLM-pipeline tier tables. */
  val northStar: Seq[String] = Seq("events", "documents", "embeddings")

  val all: Seq[String] = star ++ northStar

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** Load + spread across the cluster for CPU-heavy narrow pipelines.
    *
    * The fixture tables are single parquet files, so a plain scan yields
    * ONE input partition and a compute-bound stage (shingling, hashing,
    * vector math) runs on one core — measured 3.5s single-threaded for
    * work that takes 0.2s spread. The round-robin repartition is a tiny
    * shuffle (the rows themselves), bought back many times over by the
    * parallel stage. At 100 TB inputs arrive multi-file and this becomes a
    * no-op cost-wise; it still guards against small-but-expensive inputs
    * (exactly the LLM-pipeline shape: few docs, heavy per-doc work).
    */
  def loadSpread(spark: SparkSession, sfDir: String, name: String): DataFrame =
    load(spark, sfDir, name).repartition(spark.sparkContext.defaultParallelism)

  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * Parquet reader rejects by default (no TimestampNTZ-nanos type). Read
    * it with an explicit LongType schema (physical INT64 passes through),
    * then floor-divide to micros — the same truncation DuckDB applies when
    * it scans a nanos column as TIMESTAMP, so oracle comparisons agree.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.read.schema(rawSchema).parquet(path(sfDir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
