package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.types._

import graft.jobs.IngestJob
import graft.sources._

/** LIVE JDBC integration — the one §2a path unit tests can't reach: an
  * embedded Derby database (ships with Spark's jars) seeded from the
  * fixture `nation` parquet, read back through every [[JdbcSource]] load
  * path, and round-tripped to Parquet the way the reference's Job 1 does
  * (`/root/reference/code_base/db_to_parquet.py:154-199`).
  *
  * This spec is what exposed the reference's own latent defect: its
  * `.schema(table_schema)` on a jdbc read throws at load time (the jdbc
  * source takes no user-specified schema) — the declared-schema
  * discipline only actually works through the `customSchema` option +
  * post-resolution validation that JdbcSource now implements.
  */
class JdbcIntegrationSpec extends SparkSpec {

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"
  private lazy val dbDir =
    Files.createTempDirectory("graft-derby").toString + "/db"
  private lazy val url = s"jdbc:derby:$dbDir;create=true"

  private val nationSchema = IngestJob.tableSchemas("nation")

  /** Seed Derby from the fixture parquet once per suite. */
  private lazy val seeded: Unit = {
    System.setProperty("derby.stream.error.file", s"$dbDir.log")
    Class.forName(DerbyDriver)
    val c = DriverManager.getConnection(url)
    try {
      c.createStatement().execute(
        "CREATE TABLE nation (n_nationkey INT NOT NULL, " +
          "n_name VARCHAR(64), n_regionkey INT)")
      val ps = c.prepareStatement("INSERT INTO nation VALUES (?, ?, ?)")
      Tables.nation(spark, sf).collect().foreach { r =>
        ps.setInt(1, r.getInt(0)); ps.setString(2, r.getString(1))
        ps.setInt(3, r.getInt(2)); ps.addBatch()
      }
      ps.executeBatch()
    } finally c.close()
  }

  private def src(partitioning: Option[JdbcPartitioning] = None,
      schema: Option[StructType] = Some(nationSchema)) = JdbcSource(
    url = url, table = "nation", user = "", password = "",
    driver = DerbyDriver, schema = schema, partitioning = partitioning)

  private def fixtureRows =
    Tables.nation(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet

  test("unpartitioned JDBC load honors the declared schema and matches the fixture") {
    seeded
    val df = src().load(spark)
    assert(df.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap ==
      nationSchema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap)
    val got = df.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(got == fixtureRows && got.size == 25)
  }

  test("range-partitioned JDBC load runs N slices and loses no rows") {
    seeded
    val df = src(Some(JdbcRangePartitioning("n_nationkey", 0L, 24L, 4))).load(spark)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
      == fixtureRows)
  }

  test("predicate-partitioned JDBC load runs one slice per predicate, no dup/loss") {
    seeded
    val preds = Seq("n_nationkey < 12", "n_nationkey >= 12")
    val df = src(Some(JdbcPredicatePartitioning(preds))).load(spark)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
      == fixtureRows)
  }

  test("declared schema overrides catalog types (INT column read as BIGINT)") {
    seeded
    val widened = StructType(nationSchema.fields.map {
      case f if f.name == "n_regionkey" => f.copy(dataType = LongType)
      case f => f
    })
    val df = src(schema = Some(widened)).load(spark)
    // Derby reports upper-case column names — match case-insensitively,
    // the same leniency the loader's own validation applies
    assert(df.schema.fields
      .find(_.name.equalsIgnoreCase("n_regionkey")).get.dataType == LongType)
    assert(df.collect().map(_.getLong(2)).sum ==
      fixtureRows.toSeq.map(_._3.toLong).sum)
  }

  test("source-catalog drift (renamed column) fails loudly at load") {
    seeded
    val drifted = StructType(nationSchema.fields.map {
      case f if f.name == "n_regionkey" => f.copy(name = "n_bogus")
      case f => f
    })
    val e = intercept[IllegalArgumentException] {
      src(schema = Some(drifted)).load(spark)
    }
    assert(e.getMessage.contains("does not match the source catalog"))
  }

  test("filters push down into the JDBC scan instead of filtering post-load") {
    seeded
    import org.apache.spark.sql.functions.col
    val df = src().load(spark).filter(col("n_nationkey") < 5)
    // the predicate must reach the remote scan (WHERE in the generated
    // query), not run as a Spark Filter over a whole-table pull — the
    // reference's own Job 1 pulls entire tables
    // (/root/reference/code_base/db_to_parquet.py:156-165); at 100 TB the
    // pushed predicate is the difference between reading 5 rows and
    // shipping the table
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.toLowerCase.contains("jdbc"))
      .getOrElse(fail("no JDBC scan node in the executed plan"))
    val pushed = "(?i)pushedfilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scan)
      .getOrElse(fail(s"no PushedFilters metadata on the JDBC scan:\n$scan"))
      .group(1).toLowerCase
    assert(pushed.contains("n_nationkey") && pushed.contains("5"),
      s"filter not pushed to the JDBC source: [$pushed]")
    assert(df.collect().map(_.getInt(0)).toSet == (0 until 5).toSet)
  }

  test("Job-1 round trip: JDBC provider -> Parquet sink ≡ Parquet provider") {
    seeded
    val outDir = Files.createTempDirectory("graft-jdbc-ingest").toString
    val provider = IngestJob.JdbcProvider(src())
    ParquetSink(s"$outDir/nation")
      .writeWithSchema(provider.read(spark, "nation", nationSchema), nationSchema)
    val back = spark.read.parquet(s"$outDir/nation")
    assert(back.schema.fieldNames.toSeq == nationSchema.fieldNames.toSeq)
    assert(back.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
      == fixtureRows)
  }
}
