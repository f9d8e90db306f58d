package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
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
  /** Physical schema of `events.parquet`: `ts` is INT64 TIMESTAMP(NANOS),
    * which Spark's Parquet reader rejects by default (no nanos timestamp
    * type) — it is read as a plain long and converted via
    * [[eventsTsMicrosExpr]]. Shared by the batch reader below and the
    * streaming reader (`graft.streaming.EventStream`), so the contract
    * lives in exactly one place.
    */
  val eventsPhysicalSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Nanos-long `ts` → TimestampType(micros), flooring like DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast does (−0.5µs → −1µs; a bare `div`
    * truncates toward zero and would disagree for pre-epoch instants).
    * Integral `div` keeps the arithmetic exact — a double division would
    * lose precision above 2^53 nanos (~1970+104 days).
    */
  val eventsTsMicrosExpr: String =
    "timestamp_micros((ts - pmod(ts, 1000)) div 1000)"

  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.schema(eventsPhysicalSchema).parquet(path(sfDir, "events"))
      .withColumn("ts", expr(eventsTsMicrosExpr))
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
