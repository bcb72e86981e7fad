package graft

class GraftSessionSpec extends SparkSpec {

  test("GraftSession settings encode the scale sizing rules") {
    // 100 GB input → 800 shuffle partitions (≈128 MiB each) > 2×cores
    val big = GraftSession.settings(cores = 16, expectedInputGB = 100.0)
    assert(big("spark.sql.shuffle.partitions") === "800")
    assert(big("spark.sql.files.maxPartitionBytes") === (128L * 1024 * 1024).toString)
    assert(big("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(big("spark.sql.session.timeZone") === "UTC")
    // tiny input on a big machine → the two-waves floor wins
    val small = GraftSession.settings(cores = 16, expectedInputGB = 0.1)
    assert(small("spark.sql.shuffle.partitions") === "32")
    // and the builder is constructible with these settings
    assert(GraftSession.local("t", 2) != null)
  }
}
