package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling scratch — not committed
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val und = time("memo copurchase_edges") {
      val e = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .where(size(col("ps")) > 1)
        .select(posexplode(col("ps")).as(Seq("i", "x")), col("ps"))
        .select(col("i"), col("x"), posexplode(col("ps")).as(Seq("j", "y")))
        .where(col("i") < col("j"))
        .select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"))
        .distinct()
        .persist(MEMORY_AND_DISK)
      println(s"[scratch] edges=${e.count()}")
      e
    }
    val aqeKey = "spark.sql.adaptive.enabled"
    spark.conf.set(aqeKey, "false")
    val e = und.union(und.select(col("b").as("a"), col("a").as("b")))
    val seed = time("seed") {
      val s0 = e.agg(min(col("a")).as("node"))
        .select(col("node"), lit(0L).as("dist")).persist(MEMORY_AND_DISK)
      s0.count(); s0
    }
    val frontiers = scala.collection.mutable.ArrayBuffer(seed)
    var frontier = seed
    (1 to 3).foreach { depth =>
      val recent =
        if (frontiers.size < 2) frontiers.last
        else frontiers.takeRight(2).reduce(_ unionByName _)
      val next = time(s"superstep $depth") {
        val n = e.join(broadcast(frontier), frontier("node") === e("a"))
          .select(col("b").as("node")).distinct()
          .join(broadcast(recent), Seq("node"), "left_anti")
          .select(col("node"), lit(depth.toLong).as("dist"))
          .persist(MEMORY_AND_DISK)
        println(s"[scratch] frontier $depth size=${n.count()}")
        n
      }
      frontiers += next
      frontier = next
    }
    time("final agg") {
      frontiers.reduce(_ unionByName _).groupBy("dist")
        .agg(count(lit(1)).as("n_nodes")).collect()
        .foreach(r => println(s"[scratch] ${r}"))
    }
    spark.stop()
  }
}
