package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{VectorFunctions => V}

class SimilaritySpec extends SparkSpec {

  test("knn: 5 neighbors per query, ranks 1..5, cosine within [-1,1]") {
    val df = q("knn_brute_cosine")
    assert(df.count() == 50) // 10 queries × 5
    val bad = df.filter(
      col("cos_sim") < -1.0 || col("cos_sim") > 1.0 ||
      col("rank") < 1 || col("rank") > 5 ||
      col("query_id") === col("neighbor_id")).count()
    assert(bad == 0)
  }

  test("knn ranking is descending in cos_sim per query") {
    val df = q("knn_brute_cosine").orderBy("query_id", "rank").collect()
    df.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sortBy(-_)))
    }
  }

  test("ann candidates come from the query's own bucket and match brute scores") {
    val ann = q("ann_lsh_cosine")
    assert(ann.count() > 0)
    // every (query, neighbor) pair in ANN must carry the same score brute force computed
    val brute = q("knn_brute_cosine")
      .select(col("query_id"), col("neighbor_id"), col("cos_sim").alias("bcos"))
    val joined = ann.join(brute, Seq("query_id", "neighbor_id"), "inner")
      .filter(col("cos_sim") =!= col("bcos"))
    assert(joined.count() == 0)
  }

  test("quantized cosine tracks double-precision cosine within quantization error") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select(col("vec_id").alias("ia"), col("embedding").alias("ea"))
    val b = e.select(col("vec_id").alias("ib"), col("embedding").alias("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .select(
        V.cosine(col("ea"), col("eb")).alias("dcos"),
        V.qcosineFrom(
          V.qdot(V.quantize1000(col("ea")), V.quantize1000(col("eb"))),
          V.qnorm2(V.quantize1000(col("ea"))),
          V.qnorm2(V.quantize1000(col("eb")))).alias("qcos"))
    val maxErr = pairs.agg(max(abs(col("dcos") - col("qcos")))).collect()(0).getDouble(0)
    assert(maxErr < 0.01, s"quantization error $maxErr")
  }
}
