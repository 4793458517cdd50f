package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's vectorized
  * parquet reader, predicate pushdown and column pruning apply. At
  * cluster scale the same call works on a directory of many files /
  * partitions; nothing here assumes a single file.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extra: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extra

  /** Schema catalog: parquet footer schemas are immutable table
    * METADATA, memoized per path the way any production catalog (HMS /
    * Iceberg) serves them — `spark.read.parquet` without a schema
    * re-infers from the footer on every call, measured 95 ms vs 7.5 ms
    * with the schema supplied (round 19). Data is still read from
    * parquet on every action; nothing row-shaped is ever cached here.
    *
    * The memo key carries the file's (mtime, length) fingerprint
    * (ADVICE r19): a path regenerated with a different schema in the
    * same JVM (fixture rebuild, testdata refresh) re-infers instead of
    * silently serving the stale StructType. The stat is a local
    * filesystem call, microseconds against the 95 ms it replaces; a
    * multi-file parquet DIRECTORY fingerprints as the directory's own
    * (mtime, length), which any rewrite bumps.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = try {
      val p = java.nio.file.Paths.get(path)
      (path, java.nio.file.Files.getLastModifiedTime(p).toMillis,
        java.nio.file.Files.size(p))
    } catch { case _: Exception => (path, -1L, -1L) }
    val sch = schemaCache.computeIfAbsent(key, _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations (which Spark's vectorized reader rejects,
    * [PARQUET_TYPE_ILLEGAL] — read nanos as long, truncate losslessly to
    * µs) and plain timestamp[us] (TIMESTAMP_NTZ) in others. Normalize
    * either shape to a microsecond TimestampType so every downstream
    * query and oracle mirror sees one schema.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views (for spark.sql-style use / tests). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
