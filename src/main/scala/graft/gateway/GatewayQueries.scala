package graft.gateway

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** CORRECTNESS-gate entries for the gateway layer (SURVEY §2.3 rows 62-65):
  * the `running_jobs` virtual table observed mid-lifecycle. */
object GatewayQueries {

  /** Submit two tracked-but-unfetched jobs, snapshot `running_jobs` via SQL.
    * job_id/created_at are run-specific, so the checked output is the
    * deterministic `job_meta` column; the oracle is the expected literal
    * relation. Proves rows 12+62/63: registry, submit, and the queryable
    * observability view (`integration-tests/app/src/table.rs:30-61`). */
  private val runningJobs = QueryDef(
    "q_running_jobs",
    (s, d) => {
      val rt = new JobRuntime(s)
      try {
        rt.submit("SELECT 1 AS one", Map("name" -> "job-a"))
        rt.submitDataFrame(
          Tables.t(s, d, "nation").groupBy(col("n_regionkey")).count(),
          Map("name" -> "job-b"))
        rt.registerRunningJobsView()
        // The view is refresh-on-scan and dies with the runtime (reference
        // table.rs:43-60), so materialize the mid-lifecycle observation
        // into a LocalRelation the driver can evaluate after close().
        // Two registry rows — driver-local by design, not a data path.
        val observed = s.sql(
          "SELECT job_meta FROM running_jobs ORDER BY job_meta").collect()
        s.createDataFrame(java.util.Arrays.asList(observed: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "job_meta", org.apache.spark.sql.types.StringType, nullable = false))))
      } finally rt.close()
    },
    Some("""SELECT job_meta
      FROM (VALUES ('{"name": "job-a", "query": "SELECT 1 AS one"}'), ('{"name": "job-b"}')) t(job_meta)
      ORDER BY job_meta"""))

  /** The cluster membership view (SURVEY §2 row 65). Counts and capacity
    * are host-specific → the checked output is the deterministic shape:
    * one Available row per node (local[n] = 1). */
  private val clusterNodes = QueryDef(
    "q_cluster_nodes",
    (s, _) => {
      val rt = new JobRuntime(s)
      try {
        rt.registerClusterNodesView()
        s.sql("""SELECT status, count(*) AS n_nodes FROM cluster_nodes
          WHERE cpu_cores > 0 AND total_memory > 0 GROUP BY status""")
      } finally rt.close()
    },
    Some("SELECT 'Available' AS status, CAST(1 AS BIGINT) AS n_nodes"))

  /** The `grid_decisions` observability view (refresh-on-scan DSv2 over
    * [[graft.Sessions.gridDecisions]]): run one grid-bearing dedup query
    * to populate the registry, wait for its decision to land on the
    * listener bus, then observe the view via SQL. Deterministic at the
    * gate corpus: the minhash site stays in the `linear` regime with no
    * recommendation, so the materialized observation is a fixed relation
    * (the escalated/saturated regimes are spec-gated in SkewSpec, where
    * the corpus is constructed). */
  private val gridDecisions = QueryDef(
    "q_grid_decisions",
    (s, d) => {
      val metric = graft.pipeline.Dedup.GRID_METRIC_PREFIX + "minhash"
      graft.Sessions.gridDecisions.remove(metric)
      graft.pipeline.Dedup.all.find(_.name == "q_dedup_minhash").get
        .build(s, d).write.format("noop").mode("overwrite").save()
      // Observed metrics arrive on the async listener bus; bounded wait,
      // then fail LOUDLY — a silent fall-through would surface as an
      // opaque 0-vs-1-row hash mismatch at the driver instead of naming
      // the real cause (listener-bus drop, or a session that never went
      // through Sessions.registerGridWitness).
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (graft.Sessions.gridDecisions.get(metric) == null &&
        System.nanoTime() < deadline) Thread.sleep(50)
      require(graft.Sessions.gridDecisions.get(metric) != null,
        s"no grid decision for $metric after 30s — listener bus dropped the " +
          "observe event, or this session lacks the grid witness listener")
      val rt = new JobRuntime(s)
      try {
        rt.registerGridDecisionsView()
        val observed = s.sql("""SELECT site, regime,
            CAST(recommendation IS NULL AS BOOLEAN) AS no_escape
          FROM grid_decisions WHERE site = 'minhash'""").collect()
        s.createDataFrame(java.util.Arrays.asList(observed: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("site",
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField("regime",
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField("no_escape",
              org.apache.spark.sql.types.BooleanType, nullable = false))))
      } finally rt.close()
    },
    Some("""SELECT 'minhash' AS site, 'linear' AS regime, TRUE AS no_escape"""))

  val all: Seq[QueryDef] = Seq(runningJobs, clusterNodes, gridDecisions)
}
