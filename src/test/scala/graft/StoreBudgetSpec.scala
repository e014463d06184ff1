package graft

import org.apache.spark.sql.functions._

/** The content-keyed temp-store LRU budget (VERDICT r12 missing #2): a
  * long-lived gateway JVM that serves many distinct corpora must hold
  * store occupancy under the caps — with evicted stores REBUILDING
  * identically on refetch (content-keyed ⇒ eviction costs a rebuild,
  * never staleness). Mirrors the job registry's TTL-sweeper spec. */
class StoreBudgetSpec extends SparkSpec {

  /** Write one tiny distinct corpus (full documents schema) and return its
    * dir. Two of the docs are near-dups so the pair store is non-empty. */
  private def writeCorpus(root: java.nio.file.Path, i: Int): String = {
    val d = root.resolve(s"corpus$i").toString
    val texts = Seq(
      s"the quick brown fox jumps over the lazy dog variant$i",
      s"the quick brown fox jumps over the lazy dog variant$i today",
      s"completely different content about the number $i and spark plans",
      s"a third unrelated document mentioning corpus $i twice corpus $i",
      s"yet another filler line for corpus $i with enough tokens in it")
    val rows = texts.zipWithIndex.map { case (t, j) =>
      (j.toLong, t, "en", "test", t.length.toLong)
    }
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("LRU budget: occupancy holds under a low cap across cycled corpora; " +
      "evicted stores rebuild bit-identically") {
    val root = java.nio.file.Files.createTempDirectory("graft-budget-spec")
    val oldCap = Tables.storeCountCap
    val oldGrace = Tables.storeEvictionGraceMs
    try {
      val dirs = (0 until 6).map(writeCorpus(root, _))
      Tables.storeCountCap = 3
      // Grace 0: this test observes DELETION; the grace window itself is
      // covered by the dedicated test below.
      Tables.storeEvictionGraceMs = 0L

      // First corpus: snapshot its verified pair relation and its store dir.
      val first = pipeline.Dedup.materializedPairs(spark, dirs.head, 0.5)
        .orderBy("a_id", "b_id").collect().toSeq
      assert(first.nonEmpty, "tiny corpus must yield at least one near-dup pair")
      val firstDir = {
        val snap = Tables.storeOccupancySnapshot
        val hit = snap.filter(r => r._1 == "graft-pairs-idx" &&
          r._2.startsWith(dirs.head))
        assert(hit.size == 1, s"expected one pairs store for corpus0, got $snap")
        // Registry keys are dirs; recover via the registry map itself.
        var dir: String = null
        Tables.storeRegistry.forEach((d, e) =>
          if (e.store == "graft-pairs-idx" && e.key.startsWith(dirs.head)) dir = d)
        dir
      }
      assert(firstDir != null && new java.io.File(firstDir).exists())

      // Cycle the remaining corpora through the same store family. Each
      // warms 2 stores (shingle index + pair store): 12 total against a
      // cap of 3 ⇒ evictions must fire and the oldest (corpus 0) must go.
      val evict0 = Tables.storeEvictions.get()
      dirs.tail.foreach(d =>
        pipeline.Dedup.materializedPairs(spark, d, 0.5).count())
      assert(Tables.storeRegistry.size() <= 3,
        s"registry ${Tables.storeRegistry.size()} exceeds cap 3")
      assert(Tables.storeEvictions.get() > evict0, "no eviction fired")
      // Force-drain the condemned queue first: an eviction that raced a
      // straggler thread from an earlier suite can condemn under the
      // DEFAULT grace before this test's grace=0 write is observed; the
      // assertion's subject is reclamation (no leak), deferred-deletion
      // semantics are the dedicated grace test's.
      Tables.sweepCondemnedStores(force = true)
      assert(!new java.io.File(firstDir).exists(),
        "LRU victim's directory must be deleted (post forced sweep)")
      assert(Tables.condemnedStores.isEmpty,
        "forced sweep must drain the condemned queue")
      // Every surviving registry row points at a live directory.
      Tables.storeRegistry.forEach((d, _) =>
        assert(new java.io.File(d).exists(), s"registry row $d has no files"))
      val bytes = Tables.storeOccupancySnapshot.map(_._3).sum
      assert(bytes <= Tables.storeBytesCap)

      // Refetch the evicted corpus: one rebuild, identical relation.
      val builds0 = Tables.tempBuildCount
      val again = pipeline.Dedup.materializedPairs(spark, dirs.head, 0.5)
        .orderBy("a_id", "b_id").collect().toSeq
      assert(Tables.tempBuildCount > builds0, "refetch must rebuild the store")
      assert(again == first, "rebuilt store must match the evicted relation")
    } finally {
      Tables.storeCountCap = oldCap
      Tables.storeEvictionGraceMs = oldGrace
      // Drop the test corpora's stores so later suites' LRU space isn't
      // polluted by entries whose source dirs are about to vanish.
      pipeline.Dedup.evictSharedStores()
      scala.reflect.io.Path(root.toFile).deleteRecursively()
    }
  }

  test("eviction grace window: a just-served store's files outlive its " +
      "eviction until the grace deadline (serve→execute race, ADVICE r13)") {
    val root = java.nio.file.Files.createTempDirectory("graft-grace-spec")
    val oldCap = Tables.storeCountCap
    val oldGrace = Tables.storeEvictionGraceMs
    try {
      val dirs = (0 until 4).map(writeCorpus(root, _))
      Tables.storeCountCap = 2
      Tables.storeEvictionGraceMs = 60L * 1000 // longer than this test
      // Serve corpus 0 LAZILY — no action yet, exactly the race window.
      val lazily = pipeline.Dedup.materializedPairs(spark, dirs.head, 0.5)
        .orderBy("a_id", "b_id")
      var dir0: String = null
      Tables.storeRegistry.forEach((dd, e) =>
        if (e.store == "graft-pairs-idx" && e.key.startsWith(dirs.head)) dir0 = dd)
      assert(dir0 != null)
      // Cycle the other corpora: corpus 0's stores get EVICTED (registry
      // row + cache entry gone) under the low cap...
      val evict0 = Tables.storeEvictions.get()
      dirs.tail.foreach(d =>
        pipeline.Dedup.materializedPairs(spark, d, 0.5).count())
      assert(Tables.storeEvictions.get() > evict0, "no eviction fired")
      assert(!Tables.storeRegistry.containsKey(dir0),
        "victim must leave the registry immediately")
      // ...but its FILES survive (condemned, not deleted), so the lazy
      // plan served before the evictions still executes correctly.
      assert(new java.io.File(dir0).exists(),
        "condemned store's files must survive the grace window")
      assert(lazily.collect().nonEmpty,
        "a pre-eviction lazy plan must still execute during the grace window")
      // A forced sweep (the shutdown path; deadline expiry in production)
      // actually deletes the condemned files.
      Tables.sweepCondemnedStores(force = true)
      assert(!new java.io.File(dir0).exists(),
        "sweep past the deadline must delete the condemned files")
    } finally {
      Tables.storeCountCap = oldCap
      Tables.storeEvictionGraceMs = oldGrace
      Tables.sweepCondemnedStores(force = true)
      pipeline.Dedup.evictSharedStores()
      scala.reflect.io.Path(root.toFile).deleteRecursively()
    }
  }

  test("spark.graft.store.root redirects store files to a shared-FS root") {
    // On a multi-host cluster the stores must live on a SHARED filesystem
    // (executors read what the driver registers). With the conf set, new
    // store dirs land under <root>/graft-store-<jvmId>/ and eviction
    // deletes them through the Hadoop FS API; values are unchanged.
    val root = java.nio.file.Files.createTempDirectory("graft-shared-root")
    val corpus = java.nio.file.Files.createTempDirectory("graft-root-corpus")
    try {
      val d = writeCorpus(corpus, 99)
      spark.conf.set("spark.graft.store.root", root.toString)
      val rows = pipeline.Dedup.materializedPairs(spark, d, 0.5)
        .orderBy("a_id", "b_id").collect().toSeq
      assert(rows.nonEmpty)
      var dir: String = null
      Tables.storeRegistry.forEach((dd, e) =>
        if (e.store == "graft-pairs-idx" && e.key.startsWith(d)) dir = dd)
      assert(dir != null && dir.startsWith(root.toString),
        s"store dir $dir must land under the configured root $root")
      assert(new java.io.File(dir).exists())
      // Eviction through the helper condemns the shared-FS files (grace
      // window, ADVICE r14); a sweep past the deadline removes them.
      pipeline.Dedup.evictSharedStores()
      Tables.sweepCondemnedStores(force = true)
      assert(!new java.io.File(dir).exists())
    } finally {
      spark.conf.unset("spark.graft.store.root")
      pipeline.Dedup.evictSharedStores()
      scala.reflect.io.Path(root.toFile).deleteRecursively()
      scala.reflect.io.Path(corpus.toFile).deleteRecursively()
    }
  }

  test("catalog-store cap bounds the bucketed fp-store family across corpora") {
    // The bucketed saveAsTable stores (incremental dedup's fingerprint
    // store) are keyed by corpus path — one catalog table per distinct
    // corpus, unbounded on a long-lived JVM without the cap. Cycle
    // CAP + 2 distinct corpora and assert the table count stays bounded
    // while the query keeps answering (a dropped store rebuilds).
    val root = java.nio.file.Files.createTempDirectory("graft-budget-cat")
    try {
      val dirs = (0 until Tables.CATALOG_STORE_CAP + 2).map(writeCorpus(root, _))
      dirs.foreach { d =>
        assert(SparkEntry.queries("q_dedup_incremental")(spark, d).collect()
          .nonEmpty)
      }
      val n = spark.catalog.listTables().collect()
        .count(_.name.startsWith("graft_fp_store_"))
      assert(n <= Tables.CATALOG_STORE_CAP,
        s"$n fp-store tables survive a ${dirs.size}-corpus cycle")
      // A capped-out corpus still answers (store rebuilds transparently).
      assert(SparkEntry.queries("q_dedup_incremental")(spark, dirs.head)
        .collect().nonEmpty)
    } finally {
      scala.reflect.io.Path(root.toFile).deleteRecursively()
      ()
    }
  }

  test("contentToken canonicalizes path spellings; staleSibling survives " +
      "'#' in paths and numeric param suffixes (ADVICE r13)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tok")
    try {
      java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
      val abs = Tables.contentToken(dir.toString)
      // Same corpus through a non-canonical spelling -> same token.
      assert(Tables.contentToken(s"$dir/../${dir.getFileName}") == abs)
      val sep = Tables.TOKEN_SEP
      // Fabricated sibling tokens for a path CONTAINING '#': the old
      // '#'-split parse truncated the path half and disabled eviction.
      val p = s"file:/data/we#ird/corpus"
      val stale = s"$p${sep}3#100#1000"
      val fresh = s"$p${sep}3#120#2000"
      assert(Tables.staleSibling(fresh, stale))
      assert(!Tables.staleSibling(stale, fresh))
      // Numeric param suffixes (the IVF '#nTables#nBits' shape) must not
      // derail the mtime parse; same-content different-suffix never evicts.
      assert(Tables.staleSibling(s"$fresh#8#16", s"$stale#8#16"))
      assert(!Tables.staleSibling(s"$fresh#8#16", s"$fresh#4#32"))
      // Absent tokens and different paths never compare as siblings.
      assert(!Tables.staleSibling(fresh, s"$p${sep}absent"))
      assert(!Tables.staleSibling(fresh,
        s"file:/data/other${sep}3#100#1000"))
    } finally {
      scala.reflect.io.Path(dir.toFile).deleteRecursively()
      ()
    }
  }

  test("store_occupancy view reflects the registry and its caps") {
    pipeline.Dedup.materializedPairs(spark, sfDir, 0.5).count()
    val rt = new gateway.JobRuntime(spark)
    try {
      rt.registerStoreOccupancyView()
      val rows = spark.sql(
        """SELECT store, bytes, last_access_seq, count_cap, bytes_cap
           FROM store_occupancy""").collect()
      assert(rows.nonEmpty)
      assert(rows.exists(_.getString(0) == "graft-pairs-idx"))
      assert(rows.forall(_.getLong(1) > 0L), "every store has on-disk bytes")
      assert(rows.forall(r => r.getInt(3) == Tables.storeCountCap &&
        r.getLong(4) == Tables.storeBytesCap))
      assert(rows.length <= Tables.storeCountCap)
      // Refresh-on-scan: warming another store family changes the next
      // observation without re-registering the view.
      val n0 = spark.sql("SELECT count(*) FROM store_occupancy").head().getLong(0)
      pipeline.Dedup.materializedStrategyPairs(spark, sfDir, "minhash").count()
      val n1 = spark.sql("SELECT count(*) FROM store_occupancy").head().getLong(0)
      assert(n1 >= n0, "view must re-snapshot the registry per scan")
    } finally rt.close()
  }
}
