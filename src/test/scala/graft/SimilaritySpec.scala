package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of a vector with itself is 1") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val sim = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    assert(df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0) === 0.0)
  }

  test("similarity_topk: k results per probe, descending sim, no self-match") {
    val df = Similarity.similarityTopk(spark, sfTiny, numProbes = 5, k = 3).cache()
    assert(df.count() === 15)
    assert(df.filter(col("probe_id") === col("cand_id")).count() === 0)
    val perProbe = df.groupBy("probe_id").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 3).count()
    assert(perProbe === 0)
    // rank 1 has the max sim within each probe
    val bad = df.groupBy("probe_id")
      .agg(max(col("sim")).as("mx"))
      .join(df.filter(col("rank") === 1), "probe_id")
      .filter(col("sim") =!= col("mx")).count()
    assert(bad === 0)
    df.unpersist()
  }

  test("ann_lsh results are a subset-quality approximation of brute force") {
    val exact = Similarity.similarityTopk(spark, sfTiny, numProbes = 10, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.annLsh(spark, sfTiny, numProbes = 10, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    // every ANN pair shares the probe's bucket; sanity: non-empty and
    // no self pairs (recall is data-dependent, assert it's measurable)
    assert(approx.nonEmpty)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"ANN recall@5 = $recall (${approx.size} approx pairs)")
  }

  test("similarity_ivf: candidates come only from the probe's nprobe cells; recall measurable") {
    val ivf = Similarity.annIvf(spark, sfTiny, numProbes = 10, k = 5).cache()
    assert(ivf.count() === 50)
    assert(ivf.filter(col("probe_id") === col("cand_id")).count() === 0)
    val exact = Similarity.similarityTopk(spark, sfTiny, numProbes = 10, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = ivf.select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"IVF recall@5 (nprobe=2/10 cells) = $recall")
    assert(recall > 0.0)
    ivf.unpersist()
  }

  test("dedup_embedding: every returned pair truly exceeds the cosine threshold; decent recall") {
    import graft.ops.Dedup
    val thr = 0.4
    val got = Dedup.dedupEmbedding(spark, sfTiny, threshold = thr)
      .select("vec1", "vec2", "cos").as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // exact truth by brute force on the tiny corpus
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = emb.select(col("vec_id").as("vec1"), col("v").as("v1"))
    val b = emb.select(col("vec_id").as("vec2"), col("v").as("v2"))
    val truth = a.join(b, col("vec1") < col("vec2"))
      .select(col("vec1"), col("vec2"), Similarity.cosine(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= thr)
      .select("vec1", "vec2").as[(Long, Long)].collect().toSet
    // precision must be exact (every emitted pair re-ranked with true cosine)
    got.foreach { case (v1, v2, c) =>
      assert(c >= thr && truth.contains((v1, v2)))
    }
    val recall = got.map(p => (p._1, p._2)).toSet.size.toDouble / truth.size
    info(s"embedding near-dup recall @cos>=$thr = $recall (${got.length}/${truth.size})")
    assert(recall >= 0.2)
  }

  test("kmeans-quantized IVF: k results per probe from trained cells") {
    val ivf = Similarity.annIvfKmeans(spark, sfTiny, cells = 8).cache()
    assert(ivf.count() === 50)
    assert(ivf.filter(col("probe_id") === col("cand_id")).count() === 0)
    val exact = Similarity.similarityTopk(spark, sfTiny, numProbes = 10, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = ivf.select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    info(s"kmeans-IVF recall@5 = ${exact.intersect(approx).size.toDouble / exact.size}")
    ivf.unpersist()
  }

  test("native CosineSim equals the composed-builtin cosine bit-for-bit") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = emb.filter(col("vec_id") < 40)
      .select(col("vec_id").as("i"), col("v").as("va"))
    val b = emb.filter(col("vec_id") >= 40 && col("vec_id") < 80)
      .select(col("vec_id").as("j"), col("v").as("vb"))
    val mismatch = a.crossJoin(b)
      .select(Similarity.cosine(col("va"), col("vb")).as("native"),
        Similarity.cosineComposed(col("va"), col("vb")).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mismatch === 0)
  }

  test("native HyperplaneSig equals the composed-builtin signature bit-for-bit") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val mismatch = emb.select(
        Similarity.lshSignature(col("v"), 6, 12).as("native"),
        Similarity.lshSignatureComposed(col("v"), 6, 12).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mismatch === 0)
  }

  test("embedding centroids match a driver-side per-dimension mean") {
    val rows = Tables.embeddings(spark, sfTiny)
      .select(col("label"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1)))
    val dims = rows.head._2.length
    val expected = rows.groupBy(_._1).map { case (label, vs) =>
      label -> (0 until dims).map { i =>
        vs.map(v => BigDecimal(v._2(i).toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / vs.length
      }
    }
    val got = Similarity.embeddingCentroids(spark, sfTiny).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got.size === expected.size * dims)
    expected.foreach { case (label, means) =>
      means.zipWithIndex.foreach { case (m, i) =>
        val (c, n) = got((label, i))
        assert(n === rows.count(_._1 == label).toLong)
        assert(math.abs(c - m) < 1e-9, s"label=$label dim=$i")
      }
    }
  }

  test("embeddings are unit-norm (fixture invariant the ops rely on)") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val offUnit = emb.select(Similarity.norm(col("v")).as("n"))
      .filter(abs(col("n") - 1.0) > 1e-3).count()
    assert(offUnit === 0)
  }
}
