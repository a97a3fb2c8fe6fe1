package graft

import scala.jdk.CollectionConverters._
import graft.tools.Golden

/** Frozen sf0.001 digests: any semantic drift in a declared query fails
  * here before it reaches the driver's oracle (SURVEY §5.2.5). */
class GoldenSpec extends SparkSpec {

  test("digest byte-layout is frozen (r14: separators respelled as escapes)") {
    // r13 verdict cosmetic #1: Golden.scala embedded LITERAL control bytes
    // (0x00/0x1f/0x1e) as digest separators, making the file read as
    // binary to every text tool — in a repo with two recorded
    // sweep-script-mangling incidents. r14 respelled them as \u-escapes;
    // this pin proves the respelling byte-neutral: the hex constant was
    // computed from the PRE-CHANGE byte layout (null -> 0x00, field sep
    // 0x1f, row terminator 0x1e, UTF-8 sha-256). If digest() ever changes
    // layout, every frozen golden silently shifts — fail here first.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", StringType),
      StructField("b", StringType), StructField("c", LongType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("x", null, 7L), Row("y", "z", -1L)), schema)
    assert(Golden.digest(df) ===
      "71ef2cd40c4c234fc2f5e913c600a3a5f2ec416a826ef34ba40b5cd0adfcdb73")
  }

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
