package graft

import graft.ops.{Aggregates, Basket, Curate, Dedup}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-4 kernels against brute-force oracles
  * on generated inputs: top-run fold, sliding windows, basket pairs,
  * discrete quantiles.
  */
class NewKernelsPropSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int = 5)(body: T => Unit): Unit = {
    var seed = Seed(11L)
    var checked = 0
    while (checked < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { v => body(v); checked += 1 }
      seed = seed.next
    }
  }

  private val word = Gen.oneOf("a", "bb", "ccc", "d", "ee")

  test("topRunCount equals the max element multiplicity on random arrays") {
    val arrGen = Gen.choose(0, 15).flatMap(Gen.listOfN(_, word))
    forAll(Gen.listOfN(20, arrGen)) { arrays =>
      val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("id", "arr")
      val got = df.select(col("id"), Curate.topRunCount(col("arr")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      arrays.zipWithIndex.foreach { case (a, i) =>
        val expected =
          if (a.isEmpty) 0L
          else a.groupBy(identity).values.map(_.length).max.toLong
        assert(got(i.toLong) === expected, s"array $a")
      }
    }
  }

  test("slidingConcat equals naive sliding windows for n in 2..4") {
    val toksGen = Gen.choose(2, 12).flatMap(Gen.listOfN(_, word))
    forAll(Gen.listOfN(15, toksGen)) { docs =>
      for (n <- 2 to 4) {
        val df = docs.zipWithIndex
          .map { case (t, i) => (i.toLong, t.mkString(" ")) }
          .toDF("id", "text")
        val got = df.select(col("id"),
            Curate.spans(col("text"), n).as("w"))
          .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        docs.zipWithIndex.foreach { case (t, i) =>
          val expected =
            if (t.length < n) Seq.empty
            else t.sliding(n).map(_.mkString(" ")).toSeq
          assert(got(i.toLong) === expected, s"tokens $t n=$n")
        }
      }
    }
  }

  test("basket pairCounts equals the brute-force pair census") {
    val itemGen = Gen.choose(1L, 8L)
    val basketGen = Gen.choose(0, 6).flatMap(Gen.listOfN(_, itemGen))
    forAll(Gen.listOfN(12, basketGen)) { baskets =>
      val rows = baskets.zipWithIndex.flatMap { case (items, b) =>
        items.map(i => (b.toLong, i))
      }
      if (rows.nonEmpty) {
        val got = Basket.pairCounts(rows.toDF("o", "it"), "o", "it",
            minSupport = 1)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        val expected = baskets
          .flatMap(items => items.distinct.sorted.combinations(2))
          .map { case Seq(x, y) => (x, y) }
          .groupBy(identity).view.mapValues(_.length.toLong).toMap
        assert(got === expected, s"baskets $baskets")
      }
    }
  }

  test("groupQuantilesOf equals sort-based selection on random groups") {
    val valGen = Gen.choose(0, 50).map(_.toDouble)
    val rowGen = for {
      k <- Gen.oneOf("g1", "g2", "g3"); v <- valGen
    } yield (k, v)
    forAll(Gen.choose(3, 40).flatMap(Gen.listOfN(_, rowGen))) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "id")
      val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99)
      val got = Aggregates.groupQuantilesOf(df, "k", "v", "id", ps)
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      rows.groupBy(_._1).foreach { case (k, grp) =>
        // selection mirrors the operator's definition: the member at
        // 1-based rank ceil(p*n) in (value, insertion-id) order
        val sorted = grp.zipWithIndex.sortBy { case ((_, v), i) => (v, i) }
          .map(_._1._2)
        def sel(p: Double): Double =
          sorted(math.ceil(p * sorted.length).toInt - 1)
        assert(got(k) === ((sel(0.25), sel(0.5), sel(0.99))), s"group $k of $grp")
      }
    }
  }

  test("NearestCentroid equals brute-force argmin on random vectors and matrices") {
    val dimGen = Gen.choose(1, 6)
    val cfg = for {
      d <- dimGen
      k <- Gen.choose(1, 5)
      centers <- Gen.listOfN(k, Gen.listOfN(d, Gen.choose(-3.0, 3.0)))
      vectors <- Gen.listOfN(12, Gen.listOfN(d, Gen.choose(-3.0, 3.0)))
    } yield (d, centers, vectors)
    forAll(cfg, n = 8) { case (d, centers, vectors) =>
      val m = centers.map(_.toArray).toArray
      val got = vectors.toDF("v")
        .select(graft.functions.NearestCentroid
          .nearestCentroid(spark, col("v"), m).as("c"))
        .as[Int].collect().toSeq
      val want = vectors.map { v =>
        // strict < scan — ties to the lowest index, like the kernel
        centers.zipWithIndex.minBy { case (c, i) =>
          (c.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum, i)
        }._2
      }
      assert(got === want, s"d=$d k=${centers.length}")
    }
  }
}
