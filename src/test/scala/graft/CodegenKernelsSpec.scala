package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The three per-row kernels the dedup/ANN families run over every
  * corpus row gained real `doGenCode` in round 4 (previously
  * CodegenFallback). These specs force codegen with NO interpreter
  * fallback — a janino rejection must fail loudly here, not silently
  * run interpreted (the ZOrderKey lesson) — and cross-check against the
  * composed-builtin twins / interpreted eval.
  */
class CodegenKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def codegenForced[A](body: => A): A = {
    val savedFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val savedFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      savedFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      savedFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("ShingleHashes under forced codegen equals composed shingles+xxhash64") {
    val edge = Seq("", " ", "a", "a b", "a b c", "a b c d",
      "  padded   text  here  ", "x x x x x").toDF("text")
    val docs = Tables.documents(spark, sfTiny).select(col("text")).unionAll(edge)
    val mismatch = codegenForced {
      docs.select(
          sort_array(graft.functions.ShingleHashes
            .shingleHashes(spark, col("text"))).as("native"),
          sort_array(array_distinct(
            transform(Dedup.shingles(col("text")), s => xxhash64(s)))).as("composed"))
        .filter(col("native") =!= col("composed")).count()
    }
    assert(mismatch === 0)
  }

  test("SimHash64 under forced codegen equals interpreted eval, nulls stay null") {
    val texts = Tables.documents(spark, sfTiny)
      .select(col("text")).as[String].collect().take(50).toSeq ++
      Seq("", " ", "one", "a b c")
    val viaCodegen = codegenForced {
      texts.toDF("text")
        .select(graft.functions.GraftFunctions.simhash64(spark, col("text")))
        .as[Long].collect().toSeq
    }
    val viaEval = texts.map { t =>
      graft.functions.SimHash64(
        org.apache.spark.sql.catalyst.expressions.Literal(t))
        .eval(null).asInstanceOf[Long]
    }
    assert(viaCodegen === viaEval)
    val nulls = codegenForced {
      Seq[Option[String]](None, Some("x")).toDF("text")
        .select(graft.functions.GraftFunctions.simhash64(spark, col("text")).as("s"))
        .filter(col("s").isNull).count()
    }
    assert(nulls === 1L)
  }

  test("NearestCentroid under forced codegen equals spark.ml transform and interpreted eval") {
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val pinned = emb.repartition(8, col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .withColumn("fv", array_to_vector(col("v")))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(7).setSeed(42).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(pinned)
    val centers = model.clusterCenters.map(_.toArray)
    val native = codegenForced {
      emb.select(col("vec_id"),
          graft.functions.NearestCentroid
            .nearestCentroid(spark, col("v"), centers).as("cell"))
        .as[(Long, Int)].collect().toMap
    }
    // parity with spark.ml's own assignment on the same centers —
    // including tie behavior (strict <, first index wins)
    val ml = model.transform(pinned)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    assert(native === ml)
    // interpreted eval path + tie break + null propagation
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val two = graft.functions.NearestCentroid(
      Literal.create(Seq(0.9, 0.1), ArrayType(DoubleType)),
      2, Seq(0.0, 0.0, 1.0, 0.0))
    assert(two.eval(null) === 1)
    val tied = graft.functions.NearestCentroid(
      Literal.create(Seq(0.5, 0.5), ArrayType(DoubleType)),
      2, Seq(1.0, 0.0, 1.0, 0.0))
    assert(tied.eval(null) === 0, "ties must break to the lowest index")
    val nul = graft.functions.NearestCentroid(
      Literal.create(null, ArrayType(DoubleType)), 2, Seq(1.0, 0.0, 1.0, 0.0))
    assert(nul.eval(null) == null)
    // dimensionality drift must FAIL, not assign by prefix distance: a
    // 1-dim vector against 2-dim centroids is a malformed corpus row
    val narrow = graft.functions.NearestCentroid(
      Literal.create(Seq(0.9), ArrayType(DoubleType)),
      2, Seq(0.0, 0.0, 1.0, 0.0))
    val ex = intercept[IllegalArgumentException](narrow.eval(null))
    assert(ex.getMessage.contains("dims"))
    val wide = graft.functions.NearestCentroid(
      Literal.create(Seq(0.9, 0.1, 0.3), ArrayType(DoubleType)),
      2, Seq(0.0, 0.0, 1.0, 0.0))
    intercept[IllegalArgumentException](wide.eval(null))
  }

  test("HyperplaneSig under forced codegen equals the composed-builtin signature") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val mismatch = codegenForced {
      emb.select(
          Similarity.lshSignature(col("v"), 6, 12).as("native"),
          Similarity.lshSignatureComposed(col("v"), 6, 12).as("composed"))
        .filter(col("native") =!= col("composed")).count()
    }
    assert(mismatch === 0)
  }
}
