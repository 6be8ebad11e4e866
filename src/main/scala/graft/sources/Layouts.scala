package graft.sources

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Storage-layout tools — the engine's answer to the reference's
  * partition-key + clustering-order physical design (SURVEY §1.4: Cassandra
  * `((wsid), year, month, day, hour)` wide rows). On parquet the same two
  * levers are:
  *
  *  - PARTITIONED layout (`partitionBy`): coarse pruning — a filter on the
  *    partition column eliminates whole directories before any IO
  *    (`PartitionFilters` in the scan, the analog of Cassandra's
  *    partition-key routing).
  *  - BUCKETED layout (`bucketBy` via the catalog): co-location — two facts
  *    bucketed by the same key into the same bucket count join with NO
  *    exchange on either side (the analog of co-located Cassandra tables
  *    sharing a partition key).
  *
  * At 100 TB both are table-creation-time decisions; these helpers
  * materialize them locally so plans and queries can be asserted against
  * the real physical layouts (PlanQualitySpec).
  */
object Layouts {

  /** Materialize orders+lineitem bucketed by order key into the session
    * catalog (idempotent per session). Bucket count would be sized to
    * ~128-256 MB/bucket at the target scale; 8 locally. */
  /** DROP a managed table including a stale on-disk location: a prior JVM's
    * in-memory catalog is gone but its warehouse files survive, and CTAS
    * then refuses to create (LOCATION_ALREADY_EXISTS). */
  def dropTableAndLocation(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val p = java.nio.file.Paths.get(wh, table)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  def bucketedOrdersLineitem(s: SparkSession, dir: String, buckets: Int = 8): Unit = {
    // check BOTH tables AND their source dir: a run interrupted between the
    // two writes must not leave a half-created state that skips the second
    // table forever, and a session that switches scale-factor dirs must not
    // silently reuse the first dir's buckets for the second dir's queries
    val upToDate = Seq("graft_orders_b", "graft_lineitem_b").forall(t =>
      s.catalog.tableExists(t) && sourceDirOf(s, t).contains(dir))
    if (!upToDate) {
      Seq("graft_orders_b", "graft_lineitem_b")
        .foreach(dropTableAndLocation(s, _))
      // The layout carries only the join/aggregate columns: a bucketed
      // "join index", not a second full copy of the facts. (A production
      // deployment bucketing its PRIMARY copy would keep all columns — the
      // co-location mechanics are identical; this keeps the demo's write
      // volume proportional to what the queries read.)
      // repartition by the bucket key first: task partitioning then matches
      // bucket partitioning (same Murmur3 hash), so each task writes ONE
      // sorted bucket file instead of numShufflePartitions × buckets files
      // — fewer, bigger files is exactly what the 100 TB layout wants.
      import org.apache.spark.sql.functions.col
      Tables.orders(s, dir)
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .repartition(buckets, col("o_orderkey"))
        .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_orders_b")
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .repartition(buckets, col("l_orderkey"))
        .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("graft_lineitem_b")
      Seq("graft_orders_b", "graft_lineitem_b").foreach(t =>
        s.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.source.dir' = '$dir')"))
    }
  }

  /** The scale dir a managed layout table was built from (its
    * `graft.source.dir` table property), if recorded. */
  private def sourceDirOf(s: SparkSession, table: String): Option[String] =
    try {
      s.sql(s"SHOW TBLPROPERTIES $table ('graft.source.dir')")
        .collect().headOption.map(_.getString(1))
        .filter(!_.contains("does not have property"))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Materialize events partitioned by event_type under `outDir` —
    * a filter on event_type then prunes at the directory level. */
  def partitionedEvents(s: SparkSession, dir: String, outDir: String): Unit =
    Tables.events(s, dir).write
      .partitionBy("event_type")
      .mode("overwrite").parquet(outDir)

  /** Small-file compaction — the maintenance verb every streaming-append
    * table needs: micro-batches leave one file per trigger per partition,
    * and file COUNT (listing, footer reads, task scheduling) eventually
    * dominates scan cost regardless of data size. Rewrites `inDir` into
    * `targetFiles` files at `outDir` via a round-robin repartition (no
    * key, no skew: every output file gets ~rows/targetFiles rows).
    * Returns (filesBefore, filesAfter). At scale this runs per partition
    * with targetFiles sized to ~128-256 MB/file. */
  def compact(s: SparkSession, inDir: String, outDir: String,
      targetFiles: Int): (Int, Int) = {
    def parquetCount(p: String): Int = {
      val d = new java.io.File(p)
      if (!d.exists) 0
      else d.listFiles.count(f => f.getName.endsWith(".parquet"))
    }
    val before = parquetCount(inDir)
    s.read.parquet(inDir)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(outDir)
    (before, parquetCount(outDir))
  }
}
