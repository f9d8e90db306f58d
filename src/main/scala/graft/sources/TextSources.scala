package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

import graft.Tables

/** Text-format ingestion — the read half of [[JsonSink]]/[[CsvSink]]:
  * JSON-lines is the interchange format crawl dumps and annotation
  * vendors actually deliver, so a training-data engine needs a
  * first-class, schema-ENFORCED reader for it, not just a writer.
  *
  * Scale discipline baked into the API (the reasons each knob exists):
  *  - The schema is a REQUIRED argument: schema inference is a second
  *    full pass over the input before the real job starts — at 100 TB
  *    that is a job you did not ask for. Supplying the schema also pins
  *    types against drift (a vendor switching `id` from number to string
  *    fails loudly at read, not silently downstream).
  *  - PERMISSIVE mode with an explicit corrupt-record column: one
  *    malformed line among billions must QUARANTINE (route to
  *    `_corrupt_record` for a dead-letter audit), not kill the job
  *    (FAILFAST) or silently shrink the corpus (DROPMALFORMED).
  *  - JSONL is line-splittable, so executors parallelize within files —
  *    but only if the files are not gzip-compressed (gzip is a
  *    whole-file codec; one 1 TB .json.gz becomes one task). Production
  *    layouts keep many uncompressed/zstd files of a few hundred MB.
  */
object TextSources {

  /** Schema-enforced JSON-lines read with corrupt-record quarantine.
    * The corrupt column is appended to the supplied schema (Spark only
    * populates it when it is part of the read schema).
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  private def roundtripDir(sfDir: String): String =
    graft.operators.Layout.tmpPath("graft-jsonl-docs", sfDir)

  /** JSONL ROUND-TRIP GATE: write the documents table through
    * [[JsonSink]], read it back through [[readJsonLines]] with the
    * original schema, and serve every column — the oracle compares
    * against the PARQUET original, so any fidelity loss in the
    * writer→reader loop (escaping, null handling, numeric coercion,
    * dropped rows) fails the hash gate. This is the certification a
    * pipeline needs before trusting JSONL as its interchange format.
    *
    * Memoized durably (the [[graft.operators.Layout]] discipline): the
    * write side effect runs once per JVM; the returned lineage is only
    * the JSON scan, so replaying it after a cache reset measures the
    * production read path.
    */
  def jsonlRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheLifecycle.memoizedDurable(s"sources.jsonlRoundtrip:$sfDir") {
      val docs = Tables.documents(spark, sfDir)
      val dir = roundtripDir(sfDir)
      JsonSink(dir).write(docs)
      readJsonLines(spark, dir, docs.schema)
        .select(docs.schema.fieldNames.map(col).toIndexedSeq: _*)
        .orderBy("doc_id")
    }

  val oracles: Map[String, String] = Map(
    // the round trip must reproduce the parquet original exactly
    "docs_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "docs_jsonl_roundtrip" -> jsonlRoundtrip _,
  )
}
