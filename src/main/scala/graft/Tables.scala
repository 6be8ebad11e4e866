package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table layer. Stands in for the reference's Cassandra
  * keyspace (ref: data/create-timeseries.cql) — each logical table is one
  * parquet dataset under the scale-factor directory.
  *
  * Scale notes: at 100 TB these would be partitioned/bucketed datasets
  * (e.g. lineitem bucketed by l_orderkey, events partitioned by date and
  * bucketed by user_id) so the joins/aggregations below co-locate without a
  * shuffle. Locally the driver-generated single files are read as-is;
  * Catalyst still gets filter pushdown + column pruning into the parquet
  * scans, which is the same mechanism partition pruning uses at scale.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation cache, weak-keyed by session: every uncached
    * `spark.read.parquet` re-lists files and re-reads footers for schema —
    * pure metadata overhead when dozens of queries share ten static
    * testdata tables. This is exactly what a table catalog provides;
    * DataFrames are immutable plans, so sharing them is safe. The WeakHashMap
    * key lets a stopped session (and everything it pins) be GC'd. NOTE:
    * cached entries pin the first file listing — correct for the immutable
    * driver testdata this layer serves; a mutable table would need catalog
    * invalidation, which is out of scope here. */
  private val cache =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) { m = scala.collection.concurrent.TrieMap.empty; cache.put(spark, m) }
      m
    }
    perSession.getOrElseUpdate(s"$dir/$name.parquet",
      spark.read.parquet(s"$dir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")

  /** events.parquet has shipped with two different `ts` encodings across
    * testdata generations: TIMESTAMP(NANOS) (which Spark's parquet reader
    * rejects — [PARQUET_TYPE_ILLEGAL] — unless read as raw long under the
    * legacy conf) and native TIMESTAMP(MICROS) (scanned as TIMESTAMP_NTZ).
    * Branch on the *scanned* dtype so either generation normalizes to the
    * same session-TZ TimestampType at µs precision; sessions run UTC, so
    * wall-clock semantics are identical on both paths. The legacy conf is
    * only set when a plain read actually rejects the file. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try apply(s, d, "events")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          apply(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-int64: truncate to µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already session-TZ TimestampType
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register tables as temp views for the `spark.sql` query path
    * (ref: SampleJoin.scala:40-48 uses a SQL context over named tables).
    * Prefer the selective form — every registration is a parquet
    * footer/schema read, and SQL entries rarely need all ten tables. */
  def register(spark: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach { n =>
      val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names)
}
