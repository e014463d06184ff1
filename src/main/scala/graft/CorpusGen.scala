package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus generators shared by [[ScaleProbe]] (10x/100x
  * decade corpora) and [[SfScale]] (the sf1 bench corpus): documents,
  * embeddings, and events with the OBSERVABLE SHAPE of a given source
  * corpus at any requested size. Two corpora generated at different sizes
  * by the IDENTICAL process isolate the scaling law rather than generator
  * drift; planted near-duplicate mass grows linearly with corpus size —
  * the property the banded dedup strategies must track without quadratic
  * candidate blowup.
  */
object CorpusGen {

  /** Documents mimicking `srcDir`'s corpus (empirical vocab + token
    * frequencies, empirical length distribution, lang mix) with 1%
    * planted near-dups (5%-token perturbations of an earlier doc,
    * J ~ 0.9). Fresh generation — replicating source docs verbatim at a
    * larger SF would plant F-clone EXACT-duplicate clusters and change
    * the dedup workload's character. */
  def documents(spark: SparkSession, srcDir: String, n: Int, out: String): Unit = {
    val src = Tables.t(spark, srcDir, "documents")
    val vocab = src.select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").groupBy("tok").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val lengths = src.select(size(split(col("text"), " "))).collect().map(_.getInt(0))
    val langs = src.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val rnd = new scala.util.Random(42)
    val cumV = vocab.scanLeft(0L)(_ + _._2).tail
    val totV = cumV.last
    def sampleTok(): String = {
      val x = rnd.nextLong(totV)
      vocab(cumV.indexWhere(_ > x))._1
    }
    val cumL = langs.scanLeft(0L)(_ + _._2).tail
    def sampleLang(): String = {
      val x = rnd.nextLong(cumL.last)
      langs(cumL.indexWhere(_ > x))._1
    }
    val docs = new Array[Array[String]](n)
    var i = 0
    while (i < n) {
      docs(i) =
        if (i > 100 && rnd.nextDouble() < 0.01) {
          // planted near-dup: 5% token perturbation of an earlier doc
          docs(rnd.nextInt(i)).map(t =>
            if (rnd.nextDouble() < 0.05) sampleTok() else t)
        } else {
          Array.fill(lengths(rnd.nextInt(lengths.length)))(sampleTok())
        }
      i += 1
    }
    val rows = docs.zipWithIndex.map { case (toks, id) =>
      val text = toks.mkString(" ")
      (id.toLong, text, sampleLang(), s"src${id % 10}", text.length.toLong)
    }
    import spark.implicits._
    // ~2k docs per file (the r10 media-store rule): text operators are
    // CPU-bound PER ROW (n-gram folds, shingling, hashing), so byte-sized
    // splits underparallelize them — 8 files for 50k docs capped every
    // map stage at 8 of 32 cores and masqueraded as a super-linear decade
    // (q_quality_gopher read 5.6x at 10x with maxTask ≈ wall; r11 probe).
    // A 100 TB corpus arrives in thousands of splits; the probe corpus
    // must too, or the instrument measures layout, not the scaling law.
    val parts = math.max(16, n / 2000)
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(parts).write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  /** 64-dim Gaussian embeddings (the sf corpus's shape: random vectors,
    * int labels), with 1% planted near-dups — an earlier vector plus
    * sigma=0.03 noise, cosine ~ 0.998 >> the 0.95 dedup threshold — so
    * embedding-dedup true-pair volume grows linearly like the document
    * generator's. */
  def embeddings(spark: SparkSession, n: Int, out: String): Unit = {
    val rnd = new scala.util.Random(43)
    val vecs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      vecs(i) =
        if (i > 100 && rnd.nextDouble() < 0.01)
          vecs(rnd.nextInt(i)).map(x => x + 0.03f * rnd.nextGaussian().toFloat)
        else Array.fill(64)(rnd.nextGaussian().toFloat)
      i += 1
    }
    import spark.implicits._
    vecs.zipWithIndex
      .map { case (v, id) => (id.toLong, v.toSeq, rnd.nextInt(10)) }.toSeq
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label").cast("int"))
      // ~5k vectors per file — same CPU-bound-per-row rule as documents
      // (cosine scoring, LSH signatures): splits must outnumber cores at
      // every probe tier or decade ratios measure layout.
      .repartition(math.max(16, n / 5000))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Events with the source corpus's observable shape — empirical
    * event_type mix and mean events/user measured from srcDir — generated
    * entirely as Spark expressions (deterministic xxhash64 streams, no
    * driver-side arrays: the generator itself must scale). `hot` plants
    * one user carrying hot._1/hot._2 of all events so a probe can watch
    * whether a skewed user inflates maxTask. `ts` is written as ns-LONG
    * directly — the post-normalization contract [[graft.Tables.t]]
    * guarantees. */
  def events(spark: SparkSession, srcDir: String, nUsers: Int, out: String,
      hot: (Int, Int) = (1, 100)): Unit = {
    val srcEv = Tables.t(spark, srcDir, "events")
    val mix = srcEv.groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val evPerUser = math.max(1L,
      mix.map(_._2).sum / math.max(1L, srcEv.select("user_id").distinct().count()))
    val span = srcEv.agg(min(col("ts")), max(col("ts"))).head()
    val (t0, t1) = (span.getLong(0), span.getLong(1))
    val total = nUsers * evPerUser
    val cum = mix.scanLeft(0L)(_ + _._2).tail
    val tot = cum.last
    // type by threshold walk over the cumulative empirical mix
    val typeExpr = mix.zip(cum).foldRight(lit(mix.last._1): org.apache.spark.sql.Column) {
      case (((t, _), c), acc) =>
        when(pmod(xxhash64(col("id"), lit("ty")), lit(tot)) < c, lit(t)).otherwise(acc)
    }
    spark.range(0, total, 1, math.max(8, (total / 250000L).toInt))
      .select(
        col("id").as("event_id"),
        (lit(t0) + pmod(xxhash64(col("id"), lit("ts")), lit(t1 - t0))).as("ts"),
        when(pmod(xxhash64(col("id"), lit("hot")), lit(hot._2.toLong)) < hot._1,
          lit(0L))
          .otherwise(pmod(xxhash64(col("id"), lit("u")), lit(nUsers.toLong))).as("user_id"),
        typeExpr.as("event_type"),
        (pmod(xxhash64(col("id"), lit("v")), lit(10000L)) / 100.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }
}
