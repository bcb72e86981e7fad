package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Random-sign JL projection: the LCG sign matrix and the 0.0-seeded
  * left-to-right fold are pure arithmetic, so the distributed result must
  * be BIT-identical to a driver-side replay — the same property the
  * DuckDB oracle checks at sf0.01.
  */
class EmbeddingProjectSpec extends SparkSpec {
  import spark.implicits._

  private def sign(i: Long, j: Long, outDims: Long): Double =
    (((1103515245L * (i * outDims + j) + 12345L) % 2147483648L) % 3L - 1L).toDouble

  private def localProject(emb: Array[Float], outDims: Int): Array[Double] =
    Array.tabulate(outDims) { j =>
      var acc = 0.0
      var i = 0
      while (i < emb.length) { acc += emb(i).toDouble * sign(i.toLong, j.toLong, outDims.toLong); i += 1 }
      acc
    }

  test("projectSigns is bit-identical to the driver-side fold; empty vectors dropped") {
    val data = Seq(
      (1L, Array(0.5f, -1.25f, 2.75f, 0.001f, -3.5f)),
      (2L, Array(1.0f)),
      (3L, Array.empty[Float]),
      (4L, Array.tabulate(64)(k => (k * 0.37f - 11.0f) / 3.0f)))
    val out = Similarity.projectSigns(data.toDF("vec_id", "embedding"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = (for {
      (id, emb) <- data if emb.nonEmpty
      (v, j) <- localProject(emb, 4).zipWithIndex
    } yield (id, j.toLong) -> v).toMap
    assert(out.keySet === expected.keySet)
    for ((k, v) <- expected)
      assert(java.lang.Double.doubleToLongBits(out(k)) ===
        java.lang.Double.doubleToLongBits(v), s"value drift at $k")
  }

  test("declared embedding_project: 16 output dims per fixture vector, total order") {
    val out = Similarity.embeddingProject(spark, sfTiny, outDims = 16)
    val n = Tables.embeddings(spark, sfTiny)
      .filter(size(col("embedding")) > 0).count()
    assert(out.count() === n * 16)
    val dims = out.select("dim").distinct().collect().map(_.getLong(0)).sorted
    assert(dims === (0L until 16L).toArray)
  }
}
