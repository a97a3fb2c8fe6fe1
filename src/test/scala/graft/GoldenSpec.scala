package graft

import scala.jdk.CollectionConverters._
import graft.tools.Golden

/** Frozen sf0.001 digests: any semantic drift in a declared query fails
  * here before it reaches the driver's oracle (SURVEY §5.2.5). */
class GoldenSpec extends SparkSpec {

  test("every declared query matches its golden digest") {
    val url = getClass.getClassLoader.getResource("golden/digests.txt")
    assert(url != null, "golden/digests.txt missing — run: sbt 'runMain graft.tools.Golden'")
    val frozen = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(url.toURI)).asScala
      .filter(_.nonEmpty)
      .map { l => val Array(n, d) = l.split(" ", 2); n -> d }.toMap
    val current = Golden.computeAll(spark).toMap
    val missing = current.keySet -- frozen.keySet
    val stale = frozen.keySet -- current.keySet
    assert(missing.isEmpty, s"queries without golden digests (regenerate): $missing")
    assert(stale.isEmpty, s"golden digests for deleted queries: $stale")
    val drifted = current.filter { case (n, d) => frozen(n) != d }.keys.toSeq.sorted
    assert(drifted.isEmpty, s"semantic drift in: ${drifted.mkString(", ")}")
  }
}
