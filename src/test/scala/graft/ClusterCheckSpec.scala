package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forks [[ClusterCheck]] into its OWN JVM (one SparkContext per JVM —
  * the suite's shared `local[32]` session cannot coexist with a
  * `local-cluster` one) and asserts its three claims: two real executor
  * JVMs registered, K=4 sharded answers byte-identical to the hot tier
  * across the process boundary, and identical answers after an executor
  * is killed mid-serve (the persisted-RDD lineage rebuild). This is the
  * r17 verdict's "never crossed a JVM" gap, closed as a gated spec. */
class ClusterCheckSpec extends AnyFunSuite {

  test("sharded tier across real executor JVMs: parity holds and survives executor loss") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = ClusterCheck.AddOpensPackages
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"), "graft.ClusterCheck")).toList
    val outFile = java.nio.file.Files.createTempFile("graft_clck", ".log").toFile
    val pb = new ProcessBuilder(cmd: _*)
    // the standalone Worker's executor launcher needs the Scala version
    // env that load-spark-env.sh would normally export
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    pb.redirectOutput(outFile)
    val p = pb.start()
    val done = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!done) { p.destroyForcibly(); fail("ClusterCheck timed out after 10 min") }
    val out = java.nio.file.Files.readString(outFile.toPath)
    assert(p.exitValue() == 0,
      s"ClusterCheck exited ${p.exitValue()}:\n${out.takeRight(4000)}")
    assert(out.contains("CLUSTERCHECK executors=2"), out.takeRight(2000))
    assert(out.contains("CLUSTERCHECK parity"), out.takeRight(2000))
    assert(out.contains("CLUSTERCHECK rebuild"), out.takeRight(2000))
    assert(out.contains("CLUSTERCHECK OK"))
  }
}
