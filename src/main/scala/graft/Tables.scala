package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture table loader.
  *
  * The reference pipeline lands opaque files in object storage so the data is
  * "organized and accessible for further analysis" (reference README.md:9).
  * Here the analysis-ready landed data is the driver-generated Parquet star
  * schema described in /root/repo/FIXTURES.md; every query in [[SparkEntry]]
  * reads through this single entry point so schema/pushdown behavior is
  * uniform and scan-level options live in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table from `sfDir`. Column pruning + predicate pushdown
    * are left to Catalyst — callers express plain `select`/`where` and the
    * Parquet scan picks them up (asserted in PlanShapeSpec).
    *
    * `events.ts` has shipped under two physical encodings across fixture
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized Parquet reader
    * rejects — read as a long via the legacy nanosAsLong conf and truncated
    * to micros, matching DuckDB's micro-precision truncation) and plain
    * TIMESTAMP(MICROS, isAdjustedToUTC=false). The loader's CONTRACT is that
    * `ts` comes out as classic TimestampType (LTZ) under the engine's UTC
    * session timezone — every consumer uses `unix_micros`/`Row.getTimestamp`,
    * which reject TIMESTAMP_NTZ — so NTZ inference is disabled for the scan
    * (the micros value is identical; DuckDB reads the same naive micros) and
    * a residual NTZ column is cast. The loader branches on the loaded type
    * rather than assuming one encoding, so a fixture regeneration is a no-op
    * here.
    */
  /** Per-session memo of the RESOLVED plan, NOT of any data: every
    * `spark.read.parquet` call lists the path and reads the footer on the
    * driver to infer the schema — ~10-40 ms of pure metadata work that the
    * bench/verify drivers would otherwise repeat for every one of the
    * ~400 queries × 1-3 tables each. The cached object is a lazy
    * DataFrame (no persist): every action over it still scans the parquet
    * from disk, so no result or data caching crosses query boundaries.
    * Keyed weakly by session so test sessions do not pin each other.
    */
  private val planCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = planCache.synchronized {
      // the cached DataFrames strongly reference their session, so weak-key
      // eviction alone never fires (value → key). Explicitly drop entries
      // whose underlying context has stopped — the lifecycle test suites
      // actually have (one session per suite, context stopped at the end) —
      // so closed sessions do not stay pinned for the JVM lifetime
      // (r18 advisory).
      planCache.entrySet().removeIf(e => e.getKey.sparkContext.isStopped)
      var m = planCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        planCache.put(spark, m)
      }
      m
    }
    val key = s"$sfDir/$name"
    val existing = perSession.get(key)
    if (existing != null) existing
    else {
      val built = load(spark, sfDir, name)
      val prev = perSession.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
