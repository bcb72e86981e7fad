package graft

import graft.pipeline.LogStore
import org.apache.hadoop.fs.Path

/** Child JVM for [[CrossProcessRaceSpec]]: commits `count` versions
  * into `dir` through the named [[LogStore]], racing any sibling
  * PROCESS version-by-version (the in-process OCC suites share one
  * JVM and one filesystem view — they cannot catch fs-visibility
  * bugs between processes; this can). Prints one `won:<version>`
  * line per version it wins; exits non-zero on any error.
  */
object DevRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(storeName, dir, writerId, countS) = args
    val count = countS.toInt
    val store: LogStore = storeName match {
      case "hardlink"    => LogStore.HardLink
      case "objectstore" => LogStore.ObjectStore
      case "rename"      => LogStore.Rename
      case other => throw new IllegalArgumentException(other)
    }
    val conf = new org.apache.hadoop.conf.Configuration()
    val root = new Path(dir)
    val f = root.getFileSystem(conf)
    f.mkdirs(root)
    def maxVersion(): Long =
      f.listStatus(root).map(_.getPath.getName).collect {
        case n if n.startsWith("v-") && n.endsWith(".txt") =>
          n.stripPrefix("v-").stripSuffix(".txt").toLong
      }.foldLeft(0L)(math.max)
    var won = 0
    // multi-KB payload: a torn cross-process read would surface as a
    // file whose END line is missing or whose body is truncated
    val payload = (s"writer=$writerId " * 200).trim
    while (won < count) {
      val v = maxVersion() + 1
      val tmp = new Path(root,
        s"tmp-$writerId-$v-${java.util.UUID.randomUUID.toString.take(6)}")
      val out = f.create(tmp, true)
      val body = s"BEGIN $writerId $v\n$payload\nEND $writerId $v\n"
      try out.write(body.getBytes("UTF-8")) finally out.close()
      if (store.putIfAbsent(f, tmp, new Path(root, s"v-$v.txt"))) {
        won += 1
        println(s"won:$v")
      } else {
        f.delete(tmp, false): Unit
      }
    }
  }
}
