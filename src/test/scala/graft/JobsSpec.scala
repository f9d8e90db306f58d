package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.{IngestJob, TransformJob}

class JobsSpec extends SparkSpec {

  test("IngestJob lands every declared table with its declared schema") {
    val out = Files.createTempDirectory("graft-ingest").toString
    IngestJob.runFromParquet(spark, sf, out)
    IngestJob.tableSchemas.foreach { case (table, schema) =>
      val back = spark.read.parquet(s"$out/$table")
      assert(back.schema.fieldNames.toSeq == schema.fieldNames.toSeq, table)
      assert(back.count() == Tables.load(spark, sf, table).count(), table)
    }
  }

  test("TransformJob writes the six star outputs in declared column order") {
    val out = Files.createTempDirectory("graft-mart").toString
    val audits = TransformJob.runToParquet(spark, sf, out)
    TransformJob.outputSchemas.foreach { case (name, schema) =>
      val back = spark.read.parquet(s"$out/$name")
      assert(back.schema.fieldNames.toSeq == schema.fieldNames.toSeq, name)
      assert(back.count() == q(name).count(), name)
      // the observe audit rode the write pass — no re-scan, same count
      assert(audits(name) == back.count(), s"$name audit")
    }
  }

  test("fact join drops nothing at fixture integrity (all lineitems keep an order)") {
    val out = q("fact_sales_detail").count()
    assert(out == Tables.lineitem(spark, sf).count())
  }
}
