package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.{ArgmaxCosine, CdcBounds, CosineSimilarity, DsirBuckets, GopherStats, GramFoldHashes, GramHashes, GramProfile, JaccardSimilarity, LshSignatures, OverlapAtLeast, OverlapCount, PqAdc, PqEncode, WinnowSelect}

/** Session extensions: graft's native functions, injected at session build
  * (`spark.sql.extensions=graft.GraftExtensions`). This is the sanctioned
  * Catalyst extension point — custom expressions participate in whole-stage
  * codegen like built-ins, unlike Scala UDFs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => plans.JaccardLengthPruning)
    ext.injectOptimizerRule(_ => plans.WindowTopKRewrite)
    ext.injectPlannerStrategy(_ => plans.TopKPerGroupStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_cosine(a, b) takes two array<double> arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_sigs"),
      new ExpressionInfo(classOf[LshSignatures].getName, "graft_lsh_sigs"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_lsh_sigs(v, planes, bits) takes (array<double>, array<double>, int)")
        LshSignatures(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_argmax_cos"),
      new ExpressionInfo(classOf[ArgmaxCosine].getName, "graft_argmax_cos"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_argmax_cos(v, tensor) takes two array<double> arguments")
        ArgmaxCosine(children.head, children(1))
      }))
    // Spark's own runtime-filter bloom expressions, surfaced as callable
    // functions: InjectRuntimeFilter builds exactly this pair
    // (BloomFilterAggregate over xxhash64 on the creation side,
    // BloomFilterMightContain on the application side) when it semi-join-
    // reduces a shuffle join. Registering them lets a query state the same
    // prefilter EXPLICITLY where the optimizer's heuristics would not fire
    // (our store side is a pre-bucketed catalog table with no selective
    // creation-side filter, so InjectRuntimeFilter passes it over).
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_bloom_agg(xxhash64(x), est_items, n_bits) takes (bigint, bigint, bigint)")
        new BloomFilterAggregate(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_bloom_contains(bloom, xxhash64(x)) takes (binary scalar-subquery/literal, bigint)")
        BloomFilterMightContain(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gopher_stats"),
      new ExpressionInfo(classOf[GopherStats].getName, "graft_gopher_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_gopher_stats(toks) takes one array<string> argument")
        GopherStats(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_profile"),
      new ExpressionInfo(classOf[GramProfile].getName, "graft_gram_profile"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_gram_profile(toks, n) takes (array<string>, int)")
        GramProfile(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "graft_gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_gram_hashes(toks, n) takes (array<string>, int)")
        GramHashes(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_fold_hashes"),
      new ExpressionInfo(classOf[GramFoldHashes].getName, "graft_gram_fold_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_gram_fold_hashes(toks, n) takes (array<string>, int)")
        GramFoldHashes(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_bounds"),
      new ExpressionInfo(classOf[CdcBounds].getName, "graft_cdc_bounds"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_cdc_bounds(text, w, d) takes (string, int, int)")
        CdcBounds(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dsir_buckets"),
      new ExpressionInfo(classOf[DsirBuckets].getName, "graft_dsir_buckets"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_dsir_buckets(text, salt, b) takes (string, string, int)")
        DsirBuckets(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_winnow(gh, w) takes (array<bigint>, int)")
        WinnowSelect(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "graft_jaccard"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_jaccard(a, b) takes two sorted-distinct array<bigint> arguments")
        JaccardSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_overlap"),
      new ExpressionInfo(classOf[OverlapCount].getName, "graft_overlap"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_overlap(a, b) takes two sorted-distinct array<bigint> arguments")
        OverlapCount(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "graft_pq_encode(vec, cb, sd, ks) takes " +
            "(array<double>, array<double>, int, int)")
        PqEncode(children.head, children(1), children(2), children(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_pq_adc(dtf, codes, ks) takes (array<double>, array<int>, int)")
        PqAdc(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_overlap_ge"),
      new ExpressionInfo(classOf[OverlapAtLeast].getName, "graft_overlap_ge"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_overlap_ge(a, b, needed) takes two sorted-distinct " +
            "array<bigint> arguments and a bigint threshold")
        OverlapAtLeast(children.head, children(1), children(2))
      }))
  }
}
