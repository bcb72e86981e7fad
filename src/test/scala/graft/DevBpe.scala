package graft

/** Dev-only: regenerate graft.ops.Bpe.DefaultMerges from the sf0.001
  * fixture. Run: sbt "Test/runMain graft.DevBpe [numMerges]"
  */
object DevBpe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSpec.session
    val merges = graft.ops.Bpe.learnMerges(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text", n)
    println("=== DefaultMerges ===")
    merges.foreach { case (a, b) => println(s"""    ("$a", "$b"),""") }
    println("=== end ===")
  }
}
