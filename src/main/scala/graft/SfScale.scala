package graft

import org.apache.spark.sql.functions._

/** Scale-up generator for the sf1 bench corpus (10x sf0.1) — VERDICT r9
  * next-round #1: the full query suite had only ever been BENCHED at
  * sf0.1; per-operator decade probes structurally miss compositional
  * stragglers. This writes a complete sf directory 10x the source so
  * Bench can run the whole suite against it.
  *
  * TPC-H tables replicate Fx with PER-REPLICA KEY OFFSETS — every key
  * column shifts by replica * (source max key + 1), and every foreign key
  * shifts by ITS table's offset with the same replica index, so each
  * replica is a closed referential world: orders reference the same
  * replica's customers, lineitems the same replica's orders, parts, and
  * suppliers. Join fan-outs, per-key group sizes, and predicate
  * selectivities therefore match sf0.1 EXACTLY, which is what makes a
  * "linear scaling" expectation meaningful when comparing sf1 walls
  * against 10x the sf0.1 walls. region/nation stay fixed (TPC-H's
  * fixed-size dimensions; nation keys stay valid in every replica).
  *
  * events replicate the same way on (event_id, user_id) — 10x users,
  * per-user timelines byte-identical to a source user's — the realistic
  * growth axis for the event-ops family.
  *
  * documents/embeddings are generated FRESH at 10x count with the source
  * corpus's empirical shape ([[CorpusGen]]): replicating text verbatim
  * would plant a 10-clone exact-duplicate cluster on every document and
  * change the dedup family's workload character outright (every doc in a
  * dup group, candidate mass x45 per doc) — fresh generation keeps
  * near-dup mass linear, like the real corpus.
  *
  * Usage: runMain graft.SfScale <srcSfDir> <outDir> [factor=10]
  */
object SfScale {
  def main(args: Array[String]): Unit = {
    val (src, out) = (args(0), args(1))
    val f = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local()
    build(spark, src, out, f)
    spark.stop()
  }

  /** In-process build — the cluster lane (LocalClusterSpec) regenerates
    * the sf1 directory with the suite's own session when it is absent,
    * so the sf1 lane is reproducible on a fresh machine. Deterministic:
    * TPC-H replicas are pure key arithmetic and CorpusGen is seeded. */
  def build(spark: org.apache.spark.sql.SparkSession, src: String,
      out: String, f: Int = 10): Unit = {
    // Invalidate any pre-existing completion sentinel FIRST: an in-place
    // regeneration over a previously complete dir that crashes midway must
    // leave the dir reading as incomplete, not half-overwritten-but-marked
    // -usable (ADVICE r14). Re-written strictly last, below.
    val donePath = new org.apache.hadoop.fs.Path(s"$out/$COMPLETE_MARKER")
    val doneFs = donePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    doneFs.delete(donePath, false)

    def copy(t: String): Unit =
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    /** Replica key offset: source max + 1 keeps every replica's key range
      * disjoint while preserving key density. */
    def off(t: String, k: String): Long =
      spark.read.parquet(s"$src/$t.parquet")
        .agg(max(col(k).cast("long"))).head().getLong(0) + 1

    def scaled(t: String, parts: Int, remaps: (String, Long)*): Unit = {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val rep = df.withColumn("__r", explode(expr(s"sequence(0L, ${f - 1}L)")))
      remaps.foldLeft(rep) { case (d, (k, o)) =>
        d.withColumn(k, col(k) + col("__r") * o)
      }.drop("__r").repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    copy("region"); copy("nation")
    val ck = off("customer", "c_custkey")
    val sk = off("supplier", "s_suppkey")
    val pk = off("part", "p_partkey")
    val ok = off("orders", "o_orderkey")
    val ek = off("events", "event_id")
    val uk = off("events", "user_id")
    scaled("customer", 4, "c_custkey" -> ck)
    scaled("supplier", 2, "s_suppkey" -> sk)
    scaled("part", 4, "p_partkey" -> pk)
    scaled("orders", 8, "o_orderkey" -> ok, "o_custkey" -> ck)
    scaled("lineitem", 32,
      "l_orderkey" -> ok, "l_partkey" -> pk, "l_suppkey" -> sk)
    scaled("events", 8, "event_id" -> ek, "user_id" -> uk)

    val nDocs = spark.read.parquet(s"$src/documents.parquet").count().toInt
    val nVecs = spark.read.parquet(s"$src/embeddings.parquet").count().toInt
    CorpusGen.documents(spark, src, nDocs * f, out)
    CorpusGen.embeddings(spark, nVecs * f, out)

    Tables.names.foreach { t =>
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      println(s"SFSCALE $t rows=$n")
    }

    // Completion sentinel, written strictly AFTER the last table (and
    // after the row-count read-back proves each is scannable): consumers
    // key "is this sf dir usable" on THIS file, not on the first table's
    // presence — a build that crashed mid-way (documents written, later
    // tables missing/truncated) must regenerate, not half-serve (ADVICE
    // r13). Through the Hadoop FS API so a shared-FS `out` works too.
    doneFs.create(donePath, true).close()
  }

  /** Name of the completion sentinel [[build]] writes last. */
  val COMPLETE_MARKER = "_GRAFT_SF_COMPLETE"

  /** True iff `dir` holds a COMPLETED build — the regeneration key. */
  def isComplete(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$COMPLETE_MARKER")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
