package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources._

class SourcesSpec extends SparkSpec {

  test("JdbcSource builds the reference option surface plus range partitioning") {
    val src = JdbcSource(
      url = "jdbc:postgresql://127.0.0.1:5432/adventureworks",
      table = "sales.salesorderheader",
      user = "u", password = "p",
      partitioning = Some(JdbcRangePartitioning("salesorderid", 1L, 100000L, 16)))
    val o = src.options
    assert(o("url").startsWith("jdbc:postgresql"))
    assert(o("dbtable") == "sales.salesorderheader")
    assert(o("driver") == "org.postgresql.Driver")
    assert(o("partitionColumn") == "salesorderid" && o("numPartitions") == "16")
    // lazy: configuring a reader must not open a connection
    val reader = src.reader(spark)
    assert(reader != null)
  }

  test("JdbcSource predicate partitioning keeps one predicate per slice") {
    val preds = (0 until 8).map(i => s"mod(hash(id), 8) = $i")
    val src = JdbcSource("jdbc:postgresql://h/db", "t", "u", "p",
      partitioning = Some(JdbcPredicatePartitioning(preds)))
    src.partitioning.get match {
      case JdbcPredicatePartitioning(ps) => assert(ps.size == 8)
      case other => fail(s"unexpected $other")
    }
  }

  test("ParquetSink round-trips and writeWithSchema reorders columns") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = Tables.region(spark, sf)
    val outSchema = StructType(Seq(
      StructField("r_name", StringType), StructField("r_regionkey", IntegerType)))
    ParquetSink(s"$dir/region").writeWithSchema(df, outSchema)
    val back = spark.read.parquet(s"$dir/region")
    assert(back.schema.fieldNames.toSeq == Seq("r_name", "r_regionkey"))
    assert(back.count() == df.count())
  }

  test("OrcSink round-trips with predicate pushdown at the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    OrcSink(s"$dir/orders").write(Tables.orders(spark, sf))
    val back = spark.read.orc(s"$dir/orders").filter(col("o_totalprice") > 300000.0)
    val scan = back.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PushedFilters"))
    assert(scan.isDefined && scan.get.contains("GreaterThan(o_totalprice"))
    assert(back.count() ==
      Tables.orders(spark, sf).filter(col("o_totalprice") > 300000.0).count())
  }

  test("CsvSink + JsonSink write readable data") {
    val dir = Files.createTempDirectory("graft-sink2").toString
    val df = Tables.region(spark, sf)
    CsvSink(s"$dir/csv").write(df)
    JsonSink(s"$dir/json").write(df)
    assert(spark.read.option("header", "true").csv(s"$dir/csv").count() == 5)
    assert(spark.read.json(s"$dir/json").count() == 5)
  }

  test("ParquetSink partitionBy produces hive-style directories") {
    val dir = Files.createTempDirectory("graft-sink3").toString
    ParquetSink(s"$dir/nation", partitionByCols = Seq("n_regionkey"))
      .write(Tables.nation(spark, sf))
    val back = spark.read.parquet(s"$dir/nation")
    assert(back.count() == 25)
    assert(new java.io.File(s"$dir/nation").list().exists(_.startsWith("n_regionkey=")))
  }

  test("partition-keyed reads prune partitions (filter reaches PartitionFilters)") {
    val dir = Files.createTempDirectory("graft-prune").toString
    ParquetSink(s"$dir/nation", partitionByCols = Seq("n_regionkey"))
      .write(Tables.nation(spark, sf))
    val filtered = spark.read.parquet(s"$dir/nation").filter(col("n_regionkey") === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("n_regionkey"), plan.take(500))
    assert(filtered.count() == Tables.nation(spark, sf).filter(col("n_regionkey") === 1).count())
  }

  test("BigQuerySink exposes the reference writer options") {
    val s = BigQuerySink("dataset.dim_customer", "staging-bucket")
    assert(s.writerOptions == Map(
      "table" -> "dataset.dim_customer", "temporaryGcsBucket" -> "staging-bucket"))
  }

  test("schema evolution: mergeSchema unions generations, old files null-fill" +
      " the new column, and pushdown still reaches the scan") {
    // the add-a-column migration every long-lived table goes through:
    // generation 1 lacks `quality`, generation 2 carries it — a reader
    // over both must see the union schema with nulls for gen-1 rows,
    // and predicates on pre-existing columns must still push down
    val dir = Files.createTempDirectory("graft-evolve").toString
    import spark.implicits._
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.2))
      .toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("doc_id", "text", "quality", "gen"))
    val rows = merged.orderBy("doc_id").collect()
    assert(rows.length == 4)
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("quality"))),
      "gen-1 rows must null-fill the evolved column")
    assert(rows.drop(2).forall(!_.isNullAt(rows.head.fieldIndex("quality"))))
    val filtered = merged.filter(col("doc_id") >= 3L)
    val scan = filtered.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PushedFilters"))
    assert(scan.isDefined && scan.get.contains("GreaterThanOrEqual(doc_id"),
      scan.getOrElse("no scan line"))
    assert(filtered.count() == 2)
  }

  test("readJsonLines quarantines malformed lines and parses the rest" +
      " with the enforced schema — no inference pass") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"doc_id": 1, "text": "alpha beta", "n": 10}
        |not json at all {{{
        |{"doc_id": 2, "text": "gamma", "n": 20}
        |{"doc_id": "THREE", "text": "type drift", "n": 30}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("n", LongType)))
    val got = TextSources.readJsonLines(spark, dir, schema)
    // the read schema is exactly what was supplied plus the quarantine
    // column — schema enforced, never inferred
    assert(got.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "n", "_corrupt_record"))
    val rows = got.collect()
    assert(rows.length == 4)
    val bad = rows.filter(!_.isNullAt(3))
    // the garbage line AND the type-drifted line are both quarantined
    // verbatim; neither kills the job nor silently disappears
    assert(bad.length == 2)
    assert(bad.exists(_.getString(3).startsWith("not json")))
    assert(bad.exists(_.getString(3).contains("THREE")))
    val good = rows.filter(_.isNullAt(3)).sortBy(_.getLong(0))
    assert(good.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "alpha beta", 10L), (2L, "gamma", 20L)))
  }

  test("docs_jsonl_roundtrip serves the parquet original row for row") {
    val got = q("docs_jsonl_roundtrip").collect()
    val want = Tables.documents(spark, sf)
      .orderBy("doc_id").collect()
    assert(got.length == want.length)
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }
}
