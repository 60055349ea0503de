package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CROSS-JVM check for the sharded hot tier — `local-cluster[2,4,2048]`
  * spins two REAL executor JVMs (standalone Worker-launched
  * CoarseGrainedExecutorBackend processes, no cluster manager needed),
  * which is the boundary every prior sharded measurement stopped at:
  * under `local[N]` the "executors" are threads in the driver process,
  * so [[operators.GraphIndex.GraphArrays]] serialization, the
  * `@transient` idToIdx rebuild, partition placement, and recovery from
  * executor loss were designed-for but never executed. This main runs
  * them for real:
  *
  *  1. build a graph store over sf0.001 documents ON the cluster;
  *  2. pin the K=4 sharded tier (each shard's GraphArrays ships to an
  *     executor inside the persisted deserialized RDD — the idToIdx
  *     lazy rebuild runs in the executor JVM, exercising the
  *     Serializable contract end to end);
  *  3. assert the sharded walk's visited sets are BYTE-IDENTICAL to the
  *     driver-side hot tier's (the GraphIndexSpec discipline, now with
  *     a process boundary in the middle);
  *  4. KILL one executor and re-run every query: the persisted RDD's
  *     lost partitions recompute from lineage (store parquet → shard
  *     frames → zipPartitions) on the surviving/replacement executor,
  *     and the answers must not change.
  *
  * Honest framing (SCALE.md): local-cluster still shares one box's
  * CPUs, page cache, and loopback network — it proves process-boundary
  * CORRECTNESS (serialization, placement, rebuild), not multi-machine
  * throughput. The "K machines = K× walk throughput" claim stays a
  * design argument; this closes the "never crossed a JVM" gap.
  *
  * Run via `sbt "runMain graft.ClusterCheck"` (ClusterCheckSpec forks
  * it as a child process — one SparkContext per JVM). Prints
  * CLUSTERCHECK lines; exit 0 = all assertions held.
  */
object ClusterCheck {
  /** JDK-17 module opens Spark needs (mirror of build.sbt's list) —
    * executor JVMs don't inherit the driver's flags, so every
    * local-cluster launcher passes these via
    * `spark.executor.extraJavaOptions`. */
  val AddOpensPackages: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
  val AddOpens: String =
    AddOpensPackages.map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  def main(args: Array[String]): Unit = {
    // The standalone Worker's executor launcher infers the Scala
    // version from SPARK_SCALA_VERSION (normally exported by
    // load-spark-env.sh, which an in-process Worker never runs) and
    // dies with "Cannot find any build directories." without it. If
    // the env is missing, RE-EXEC this main once with it set — `sbt
    // "runMain graft.ClusterCheck"` then just works.
    if (System.getenv("SPARK_SCALA_VERSION") == null) {
      val javaBin = new java.io.File(
        new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
      val cmd = (Seq(javaBin) ++
        AddOpensPackages.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++
        Seq("-Xmx4g", "-Dspark.ui.enabled=false",
          "-cp", sys.props("java.class.path"), "graft.ClusterCheck")).toList
      val pb = new ProcessBuilder(cmd: _*).inheritIO()
      pb.environment().put("SPARK_SCALA_VERSION", "2.13")
      sys.exit(pb.start().waitFor())
    }
    // executors are separate JVMs: they need the app classes (sbt's
    // forked-JVM classpath) and the same JDK-17 module opens the
    // driver gets from build.sbt
    val addOpens = AddOpens
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("graft-cluster-check")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    try {
      // wait for both executor JVMs (ids "0","1"; "driver" excluded) —
      // registration is async and a task scheduled before it would just
      // run on one executor, weakening the placement claim
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def nExecs: Int = spark.sparkContext.statusTracker.getExecutorInfos.length - 1
      while (nExecs < 2 && System.nanoTime() < deadline) Thread.sleep(200)
      require(nExecs >= 2, s"CLUSTERCHECK: only $nExecs executor(s) registered")
      println(s"CLUSTERCHECK executors=$nExecs (real JVMs)")

      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("string").as("doc_id"), col("text"))
      val chunks = operators.Ingest.chunk(
          docs.filter(operators.Ingest.nonBlank(col("text"))), "text", 32)
        .select("doc_id", "chunk_idx", "chunk_text")
      val embedded = operators.Embed.withEmbedding(chunks, "chunk_text", "embedding")
      val dir = java.nio.file.Files.createTempDirectory("graft_clck").toString
      val h = operators.GraphIndex.build(spark, embedded,
        Seq("doc_id", "chunk_idx"), "embedding", dir,
        nCentroids = 16, m = 16, nBuckets = 16, beamWidth = 32, hops = 3)

      val queries = Seq("fast table scan merge join",
        "columnar storage compression", "stream window aggregation state")
      val qvecs = queries.map(q => operators.Embed.embedQuery(spark, q).toSeq)

      val hot = operators.GraphIndex.hot(spark, h)
      val hotSets = qvecs.map(qv => hot.search(spark, qv)
        .select("uid", "sim").as[(Long, Double)].collect().toSet)
      def hotTop3(qv: Seq[Double]) = hot.topK(spark, qv, 3,
          tieBreak = Seq("doc_id", "chunk_idx"))
        .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSeq
      val hotTops = qvecs.map(hotTop3)
      hot.cool()

      // parity 1 — BIT-FOR-BIT: one shard, but that shard's GraphArrays
      // lives in an EXECUTOR JVM (serialized there, idToIdx rebuilt
      // remotely); the walk runs as an executor task. sharded(1) drops
      // no edges, so its visited sets must equal hot's exactly.
      val s1 = operators.GraphIndex.hotSharded(spark, h, nShards = 1)
      val s1Sets = try qvecs.map(qv => s1.search(spark, qv)
        .select("uid", "sim").as[(Long, Double)].collect().toSet)
      finally () // cooled after the kill replay below
      require(s1Sets == hotSets,
        "CLUSTERCHECK: sharded(1) visited sets diverged from hot across the JVM boundary")
      println(s"CLUSTERCHECK parity: sharded(1) == hot bit-for-bit on " +
        s"${queries.length} queries (GraphArrays serialized to an executor " +
        "JVM, idToIdx rebuilt remotely)")

      // parity 2 — QUALITY across 4 executor-resident shards: on this
      // fixture beam >= |C| routes every cell, so K=4 top-3 equals
      // hot's (the GraphIndexSpec quality statement, now cross-process;
      // full visited sets legitimately differ — per-shard confinement)
      val s4 = operators.GraphIndex.hotSharded(spark, h, nShards = 4)
      try {
        val s4Tops = qvecs.map(qv => s4.topK(spark, qv, 3,
            tieBreak = Seq("doc_id", "chunk_idx"))
          .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSeq)
        require(s4Tops == hotTops,
          "CLUSTERCHECK: K=4 sharded top-3 diverged from hot across the JVM boundary")
        println("CLUSTERCHECK parity: K=4 sharded top-3 == hot " +
          "(4 shards pinned across 2 executor JVMs)")

        // kill one executor MID-SERVE and replay BOTH tiers: lost shard
        // partitions must recompute from lineage (store parquet → shard
        // frames → zipPartitions) with identical answers
        val killed = spark.sparkContext.killExecutors(Seq("0"))
        if (!killed) {
          // fallback: force-exit one executor from a task (task retries
          // elsewhere; the dead executor's cached partitions are lost)
          try {
            spark.sparkContext.parallelize(1 to 8, 8).foreach { _ =>
              if (org.apache.spark.SparkEnv.get.executorId == "0")
                System.exit(99)
            }
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        Thread.sleep(2000) // let the loss propagate to the block manager
        val s1After = qvecs.map(qv => s1.search(spark, qv)
          .select("uid", "sim").as[(Long, Double)].collect().toSet)
        require(s1After == hotSets,
          "CLUSTERCHECK: sharded(1) answers changed after executor loss — " +
            "the persisted-RDD rebuild path did not restore the shard")
        val s4After = qvecs.map(qv => s4.topK(spark, qv, 3,
            tieBreak = Seq("doc_id", "chunk_idx"))
          .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSeq)
        require(s4After == hotTops,
          "CLUSTERCHECK: K=4 answers changed after executor loss")
        println("CLUSTERCHECK rebuild: answers identical after killing an " +
          s"executor (killExecutors=$killed; lost partitions recomputed from lineage)")
      } finally { s4.cool(); s1.cool() }
      println("CLUSTERCHECK OK")
    } finally spark.stop()
  }
}
