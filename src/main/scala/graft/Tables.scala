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
    * `events.ts` is physically TIMESTAMP(NANOS), which Spark's vectorized
    * Parquet reader rejects; it is read as a long (legacy nanosAsLong conf)
    * and truncated to microseconds — the same truncation DuckDB applies when
    * it reads nanos into its micro-precision timestamps, so oracle parity is
    * preserved.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
