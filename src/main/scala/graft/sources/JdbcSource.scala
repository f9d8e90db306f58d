package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** JDBC ingestion source — the engine-side rebuild of the reference's
  * Job 1 reader (`/root/reference/code_base/db_to_parquet.py:156-165`):
  * explicit schema (no catalog round-trip), format("jdbc"), url/dbtable/
  * user/password/driver options.
  *
  * The reference reads each table through ONE connection/task (no
  * partitionColumn — its biggest scale defect, SURVEY.md §4). This source
  * makes partitioned reads first-class: either numeric range partitioning
  * (`partitionColumn`/bounds/`numPartitions` → N concurrent connections,
  * each scanning a slice) or arbitrary predicate partitioning (one task
  * per predicate — e.g. hash-mod slices for keyless tables). At cluster
  * scale the 100 TB table lands as N parallel scans instead of one
  * serialized stream.
  *
  * Pure configuration — no connection is opened until an action runs, so
  * the option-building surface is unit-testable offline.
  */
final case class JdbcSource(
    url: String,
    table: String,
    user: String,
    password: String,
    driver: String = "org.postgresql.Driver",
    schema: Option[StructType] = None,
    partitioning: Option[JdbcPartitioning] = None,
    extraOptions: Map[String, String] = Map.empty) {

  /** The exact option surface of the reference reader, plus partitioning. */
  def options: Map[String, String] = {
    val base = Map(
      "url" -> url, "dbtable" -> table, "user" -> user,
      "password" -> password, "driver" -> driver)
    val parts = partitioning match {
      case Some(JdbcRangePartitioning(column, lower, upper, n)) => Map(
        "partitionColumn" -> column, "lowerBound" -> lower.toString,
        "upperBound" -> upper.toString, "numPartitions" -> n.toString)
      case _ => Map.empty[String, String]
    }
    base ++ parts ++ extraOptions
  }

  /** Configure a reader; lazy — nothing connects until an action. */
  def reader(spark: SparkSession): DataFrameReader = {
    val r = spark.read.format("jdbc").options(options)
    schema.fold(r)(r.schema)
  }

  def load(spark: SparkSession): DataFrame = partitioning match {
    case Some(JdbcPredicatePartitioning(predicates)) =>
      // DataFrameReader.jdbc(predicates) — one task per predicate. This
      // API has no user-schema slot, so the declared schema is enforced
      // post-resolution: a catalog drift fails loudly here instead of
      // flowing through silently.
      val props = new java.util.Properties()
      options.foreach { case (k, v) => props.setProperty(k, v) }
      val df = spark.read.jdbc(url, table, predicates.toArray, props)
      schema.foreach { s =>
        // case-insensitive, order-insensitive — the same leniency Spark's
        // own resolver applies on the .schema() path, so both load paths
        // accept the same declarations
        val got = df.schema.fields.map(f => (f.name.toLowerCase, f.dataType)).toMap
        val want = s.fields.map(f => (f.name.toLowerCase, f.dataType)).toMap
        require(got == want,
          s"declared schema for $table does not match the source catalog: " +
            s"declared=$want resolved=$got")
      }
      df
    case _ => reader(spark).load()
  }
}

sealed trait JdbcPartitioning

/** Range-partitioned scan: numPartitions slices of [lower, upper] on a
  * numeric/date column.
  */
final case class JdbcRangePartitioning(
    column: String, lower: Long, upper: Long, numPartitions: Int)
  extends JdbcPartitioning

/** Predicate-partitioned scan: one partition per WHERE clause (for
  * keyless or non-numeric-keyed tables, e.g. `"mod(hash(id), 8) = N"`).
  */
final case class JdbcPredicatePartitioning(predicates: Seq[String])
  extends JdbcPartitioning
