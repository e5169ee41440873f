package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Per-operator checks over the relational surface on sf0.001 — small
  * hand-checkable invariants that are independent of the DuckDB oracle
  * (SURVEY.md §5 item 2).
  */
class RelationalSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val d = TestSpark.sf

  test("q_scan_parquet returns the full part table, ordered") {
    val r = Relational.scanParquet(s, d)
    assert(r.count() === 200)
    assert(r.columns.toSeq === Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    val keys = r.select("p_partkey").collect().map(_.getLong(0)).toSeq
    assert(keys === keys.sorted)
  }

  test("q_scan_pruned only projects two columns and respects the predicate") {
    val r = Relational.scanPruned(s, d)
    assert(r.columns.toSeq === Seq("l_orderkey", "l_extendedprice"))
    val full = Tables(s, d, "lineitem")
      .where(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")).count()
    assert(r.count() === full)
  }

  test("q_filter_predicate agrees with a hand-rolled filter") {
    val manual = Tables(s, d, "lineitem").collect().count { row =>
      val disc = row.getAs[Double]("l_discount")
      disc >= 0.05 && disc <= 0.07 && row.getAs[Double]("l_quantity") < 24
    }
    assert(Relational.filterPredicate(s, d).count() === manual)
  }

  test("q_join_broadcast row count equals lineitem rows with matching parts") {
    val n = Relational.joinBroadcast(s, d).agg(sum("n")).collect()(0).getLong(0)
    assert(n === Tables(s, d, "lineitem")
      .join(Tables(s, d, "part"), col("l_partkey") === col("p_partkey")).count())
  }

  test("q_join_semi_anti partitions customers exactly") {
    val r = Relational.joinSemiAnti(s, d)
    assert(r.count() === 150)
    val byTag = r.groupBy("tag").count().collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val withOrders = Tables(s, d, "orders").select("o_custkey").distinct().count()
    assert(byTag.getOrElse("has_orders", 0L) === withOrders)
    assert(byTag.getOrElse("has_orders", 0L) + byTag.getOrElse("no_orders", 0L) === 150)
  }

  test("q_join_outer keeps every customer and zero-counts the orderless") {
    val r = Relational.joinOuter(s, d)
    assert(r.count() === 150)
    val zeroes = r.where(col("n_orders") === 0).count()
    val anti = Tables(s, d, "customer")
      .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(zeroes === anti)
  }

  test("q_join_asof_range: as-of timestamp is never after the purchase") {
    val r = Relational.joinAsofRange(s, d).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val p = row.getAs[java.sql.Timestamp]("purchase_ts")
      Option(row.getAs[java.sql.Timestamp]("last_click_ts")).foreach(c => assert(!c.after(p)))
    }
  }

  test("q_agg_hash totals reconcile with raw sums") {
    val r = Relational.aggHash(s, d)
    val totalN = r.agg(sum("n")).collect()(0).getLong(0)
    val expected = Tables(s, d, "lineitem")
      .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp")).count()
    assert(totalN === expected)
  }

  test("q_agg_distinct: exact vs approx distinct within published HLL error") {
    val exact = Relational.aggDistinct(s, d)
      .agg(sum("n_users")).collect()(0).getLong(0)
    val approx = Tables(s, d, "events").groupBy("event_type")
      .agg(approx_count_distinct("user_id").as("a"))
      .agg(sum("a")).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }

  test("q_agg_histogram_merge: merged-sketch quantiles bracket the exact ones") {
    val hist = Relational.aggHistogramMerge(s, d).collect()
    // the sketch's quantile definition is the ⌈q·n⌉-th smallest value's bin
    // (ceil rank, like percentile_disc) — compute that exact value per group
    val sorted = Tables(s, d, "events").groupBy("event_type")
      .agg(sort_array(collect_list(col("value"))).as("vs"))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[scala.collection.Seq[Double]]("vs")).toMap
    assert(hist.nonEmpty)
    hist.foreach { r =>
      val vs = sorted(r.getAs[String]("event_type"))
      val (h50, h90, h99) = (r.getAs[Long]("p50_lo"), r.getAs[Long]("p90_lo"),
        r.getAs[Long]("p99_lo"))
      assert(h50 <= h90 && h90 <= h99, "quantile bins must be monotone")
      assert(r.getAs[Long]("n") === vs.length.toLong)
      Seq((h50, 0.5), (h90, 0.9), (h99, 0.99)).foreach { case (lo, q) =>
        val exact = vs(math.ceil(q * vs.length).toInt - 1)
        assert(exact >= lo && exact < lo + 10,
          s"ceil-rank q=$q value $exact outside sketch bin [$lo, ${lo + 10})")
      }
    }
  }

  test("q_agg_quantile_sketch_merge: merge never reads raw rows and prunes to the window") {
    Relational.aggQuantileSketchMerge(s, d).collect()
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_agg_quantile_sketch_merge"
    val inputs = Relational.quantileSketchMergeFrame(s, root).inputFiles
    assert(inputs.nonEmpty)
    assert(inputs.forall(_.contains("/daily/")),
      s"rollup must read only the persisted sketch table:\n${inputs.mkString("\n")}")
    assert(inputs.forall(!_.contains("events.parquet")),
      "rollup must never rescan the raw feed")
    // day-partition pruning must reach the physical scan (inputFiles is the
    // pre-pruning listing, so the assertion reads the executed plan): the
    // window predicate must sit in PartitionFilters, not a post-scan Filter
    val p = Relational.quantileSketchMergeFrame(s, root)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("day")),
      s"expected the day window as a partition filter on the sketch scan:\n$p")
  }

  test("q_agg_theta_sketch_diff: set algebra never reads raw rows, estimates are exact-mode") {
    val out = Relational.aggThetaSketchDiff(s, d).collect()
    assert(out.nonEmpty)
    // every bound boolean holds (the oracle pins them as literal true)
    out.foreach { r =>
      assert(r.getAs[Boolean]("diff_est_ok") && r.getAs[Boolean]("int_est_ok") &&
        r.getAs[Boolean]("union_est_ok"),
        s"theta estimate outside the error envelope: $r")
    }
    // the merge frame reads ONLY the persisted sketch table
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_agg_theta_sketch_diff"
    val inputs = Relational.thetaDiffMergeFrame(s, root).inputFiles
    assert(inputs.nonEmpty)
    assert(inputs.forall(_.contains("/daily/")),
      s"set algebra must read only the persisted sketch table:\n${inputs.mkString("\n")}")
    assert(inputs.forall(!_.contains("events.parquet")),
      "set algebra must never rescan the raw feed")
    // difference is genuinely exercised: some type has churned users
    assert(out.exists(_.getAs[Long]("n_diff_exact") > 0),
      "no churned users anywhere — the difference operator is vacuous")
  }

  test("q_agg_quantile_sketch_merge: merged quantiles bracket the exact ones") {
    val out = Relational.aggQuantileSketchMerge(s, d).collect()
    val sorted = Tables(s, d, "events")
      .where(to_date(col("ts")) >= lit("2024-01-08").cast("date") &&
        to_date(col("ts")) < lit("2024-01-22").cast("date"))
      .groupBy("event_type")
      .agg(sort_array(collect_list(col("value"))).as("vs"))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[scala.collection.Seq[Double]]("vs")).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val vs = sorted(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") === vs.length.toLong)
      assert(r.getAs[Long]("n_days") === 14L)
      Seq(("p50_lo", 0.5), ("p90_lo", 0.9), ("p99_lo", 0.99)).foreach { case (c, q) =>
        val lo = r.getAs[Long](c)
        val exact = vs(math.ceil(q * vs.length).toInt - 1)
        assert(exact >= lo && exact < lo + 5,
          s"ceil-rank q=$q value $exact outside sketch bin [$lo, ${lo + 5})")
      }
    }
  }

  test("q_agg_heavy_hitters: sketch path certifies on the fixture and matches full groupBy") {
    val (df, certified) = Relational.heavyHittersImpl(s, d)
    assert(certified, "fixture distribution should be certified by the MG bound")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = Tables(s, d, "events").groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want.toSeq)
    // descending with id tiebreak — the deterministic-order contract
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    }
  }

  test("q_agg_rollup_cube: grand total row equals orders count") {
    val r = Relational.aggRollupCube(s, d)
    val grand = r.where(col("gid") === 3).collect()
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n_orders") === 1500)
  }

  test("q_window_running: final running balance equals the group sum") {
    val r = Relational.windowRunning(s, d)
    val lastPerCust = r.groupBy("o_custkey").agg(max("running_bal").as("final"))
    val direct = Tables(s, d, "orders").groupBy("o_custkey")
      .agg((sum(round(col("o_totalprice") * 100, 0)) / 100).as("total"))
    val joined = lastPerCust.join(direct, "o_custkey")
      .where(abs(col("final") - col("total")) > 1e-9)
    assert(joined.count() === 0)
  }

  test("q_window_rank keeps at most 3 rows per customer, correctly ranked") {
    val r = Relational.windowRank(s, d)
    val over = r.groupBy("o_custkey").count().where(col("count") > 3).count()
    assert(over === 0)
    assert(r.where(col("rn") === 1).count() ===
      Tables(s, d, "orders").select("o_custkey").distinct().count())
  }

  test("q_topk returns the true top 50 by extendedprice") {
    val got = Relational.topk(s, d).select("l_extendedprice").collect().map(_.getDouble(0))
    val want = Tables(s, d, "lineitem").select("l_extendedprice")
      .collect().map(_.getDouble(0)).sorted(Ordering[Double].reverse).take(50)
    assert(got.toSeq === want.toSeq)
  }

  test("q_topk_per_key equals the window formulation, for any k, any partitioning") {
    import org.apache.spark.sql.expressions.Window
    val base = Tables(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    def windowed(k: Int) = base
      .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))))
      .where(col("rn") <= k).drop("rn")
      .collect().map(_.toSeq).toSet
    def heaped(df: org.apache.spark.sql.DataFrame, k: Int) =
      graft.plans.TopKPerKey(df,
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), k)
        .collect().map(_.toSeq).toSet
    assert(heaped(base, 3) === windowed(3))
    // k exceeding every group size degenerates to the identity
    assert(heaped(base, 100000) === base.collect().map(_.toSeq).toSet)
    // result is partitioning-invariant (heap merge is order-independent)
    assert(heaped(base.repartition(17), 3) === windowed(3))
    assert(heaped(base.repartition(1), 3) === windowed(3))
  }

  test("q_set_ops algebra: |union| = |A| + |B| - |intersect|") {
    val r = Relational.setOps(s, d).groupBy("op").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    def keysIn(yr: Int) = Tables(s, d, "orders")
      .where(year(col("o_orderdate")) === yr).select("o_custkey").distinct().count()
    assert(r("union") === keysIn(1997) + keysIn(1998) - r("intersect"))
    assert(r("except") === keysIn(1997) - r("intersect"))
  }

  test("q_sample_stratified is deterministic and hits exact per-stratum quotas") {
    val a = Relational.sampleStratified(s, d).collect().toSeq
    val b = Relational.sampleStratified(s, d).collect().toSeq
    assert(a === b)
    val totals = Tables(s, d, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pct = Map("en" -> 50L, "de" -> 25L, "es" -> 25L, "fr" -> 25L, "zh" -> 10L)
    assert(a.map(_.getString(0)).toSet === pct.keySet.filter(totals.getOrElse(_, 0L) > 0))
    a.foreach { row =>
      val lang = row.getString(0)
      // exact-quota selection: precisely floor(pct * n / 100) docs survive
      assert(row.getLong(1) === totals(lang) * pct(lang) / 100,
        s"$lang sampled ${row.getLong(1)}, expected ${totals(lang) * pct(lang) / 100}")
    }
  }

  test("q_dedup_exact is idempotent and matches distinct()") {
    val r = Relational.dedupExact(s, d)
    assert(r.count() === r.dropDuplicates("l_partkey", "l_returnflag").count())
    assert(r.count() ===
      Tables(s, d, "lineitem").select("l_partkey", "l_returnflag").distinct().count())
  }

  test("q_window_first_last: frame laws per customer") {
    val rows = Relational.windowFirstLast(s, d).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, grp) =>
      // every row of a customer carries the same first/last values
      assert(grp.map(_.getAs[Double]("first_price")).distinct.length === 1)
      assert(grp.map(_.getAs[Double]("last_price")).distinct.length === 1)
      if (grp.length == 1) {
        // single-order customer: first == last == own price, no second
        val r = grp.head
        assert(r.getAs[Double]("first_price") === r.getAs[Double]("o_totalprice"))
        assert(r.getAs[Double]("last_price") === r.getAs[Double]("o_totalprice"))
        assert(r.isNullAt(r.fieldIndex("second_price")))
      } else assert(!grp.head.isNullAt(grp.head.fieldIndex("second_price")))
    }
  }

  test("q_join_null_aware_anti: ANSI NOT IN semantics; NAAJ hash plan") {
    val row = Relational.joinNullAwareAnti(s, d).collect().head
    val (withNulls, filtered, nCust) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // one NULL in the subquery makes NOT IN empty — the ANSI trap
    assert(withNulls === 0L)
    assert(nCust === Tables(s, d, "customer").count())
    // the null-filtered variant equals a plain anti join on the same subset
    val urgent = Tables(s, d, "orders")
      .where(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 13 =!= 0)
      .select(col("o_custkey").as("k"))
    val want = Tables(s, d, "customer")
      .join(urgent, col("c_custkey") === col("k"), "left_anti").count()
    assert(filtered === want)
    assert(filtered > 0, "subset too broad — filtered NOT IN is vacuous")
    // the single-column NOT IN must plan as a null-aware hash anti join,
    // not the nested loop the general case would require
    Tables(s, d, "orders").createOrReplaceTempView("graft_naaj_o2")
    Tables(s, d, "customer").createOrReplaceTempView("graft_naaj_c2")
    val p = s.sql(
      """SELECT count(*) FROM graft_naaj_c2 WHERE c_custkey NOT IN
        |(SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_custkey END
        | FROM graft_naaj_o2 WHERE o_orderpriority = '1-URGENT')""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"NOT IN did not plan as a null-aware anti join:\n$p")
  }

  test("q_agg_cms_merge: merged daily sketches respect both CMS bounds") {
    val out = Relational.aggCmsMerge(s, d).collect()
    assert(out.length === 5)
    val exact = Tables(s, d, "events").where(col("user_id") < 5)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (uid, n, lo, hi) = (r.getLong(0), r.getLong(1),
        r.getBoolean(2), r.getBoolean(3))
      assert(n === exact(uid), s"user $uid exact count")
      assert(lo, s"user $uid: CMS estimate below true count — impossible " +
        "for count-min unless the merge corrupted the sketch")
      assert(hi, s"user $uid: CMS estimate above the eps*N bound")
    }
  }

  test("q_join_nullsafe: NULL keys cross-match; plan stays a hash join") {
    val df = Relational.joinNullsafe(s, d)
    val out = df.collect()
    val nullPairs = out.filter(_.getBoolean(0)).map(_.getLong(2)).sum
    val nCust = Tables(s, d, "customer")
      .where(col("c_custkey") % 11 === 0).count()
    val nOrd = Tables(s, d, "orders")
      .where(col("o_custkey") % 11 === 0).count()
    // every NULL cust row pairs with every NULL order row (cross class)
    assert(nullPairs === nCust * nOrd, "null-null cross product wrong")
    assert(nullPairs > 0, "fixture produced no NULL keys — vacuous")
    // non-null classes agree with the plain equi-join
    val plainPairs = Tables(s, d, "orders")
      .where(col("o_custkey") % 11 =!= 0)
      .join(Tables(s, d, "customer").where(col("c_custkey") % 11 =!= 0),
        col("o_custkey") === col("c_custkey")).count()
    assert(out.filter(!_.getBoolean(0)).map(_.getLong(2)).sum === plainPairs)
    // the <=> key must plan as a hash/merge join, not a nested loop
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"null-safe join degenerated to a quadratic plan:\n$p")
  }

  test("q_join_asof_tolerance: matches iff within 2h; agrees with plain asof") {
    val tol = Relational.joinAsofTolerance(s, d).collect()
      .map(r => (r.getLong(0), r.isNullAt(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5))).toList
    assert(tol.nonEmpty)
    // matched rows carry staleness in [0, 7200]; unmatched carry nulls
    tol.foreach { case (id, clickNull, stale, matched) =>
      if (matched) assert(!clickNull && stale >= 0 && stale <= 7200, s"event $id")
      else assert(clickNull && stale == -1L, s"event $id")
    }
    // every match is also a plain-asof match with the same click instant
    val plain = Relational.joinAsofRange(s, d).collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    tol.foreach { case (id, _, _, matched) =>
      if (matched) assert(plain(id).isDefined)
    }
    // the tolerance must actually exclude something (non-vacuous)
    val plainMatched = plain.count(_._2.isDefined)
    assert(tol.count(_._4) < plainMatched,
      "tolerance excluded nothing — staleness cut is vacuous on this fixture")
  }

  test("q_sql_lateral equals the window-rank top-2 and decorrelates") {
    val df = Relational.sqlLateral(s, d)
    val out = df.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // reference: row_number <= 2 per customer over the same total order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = Tables(s, d, "orders")
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("rk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.toSet === want)
    assert(out.length === want.size, "lateral duplicated rows")
    // Catalyst must decorrelate — per-driving-row re-execution shows up as
    // a nested loop / cartesian in the physical plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"lateral did not decorrelate:\n$p")
  }

  test("q_agg_hll_overlap: inclusion-exclusion exact; estimates in envelope") {
    val rows = operators.Relational.aggHllOverlap(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))
    assert(rows.length === 10, "5 event types give C(5,2)=10 pairs")
    val du = Tables(s, d, "events").select("event_type", "user_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rows.foreach { case (a, b, na, nb, nu, ni, okO, okU) =>
      assert(na === du(a).size.toLong && nb === du(b).size.toLong)
      assert(ni === du(a).intersect(du(b)).size.toLong, s"($a,$b)")
      assert(nu === na + nb - ni)
      assert(ni <= math.min(na, nb) && nu >= math.max(na, nb))
      assert(okO && okU, s"($a,$b) sketch estimate outside envelope")
    }
  }

  test("q_join_asof_nearest: the matched click truly minimizes |gap|") {
    val out = Relational.joinAsofNearest(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(out.nonEmpty)
    val clicks = Tables(s, d, "events").where(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, g) => u -> g.map(_._2) }
    out.foreach { case (eid, u, pUs, clickUs, gap) =>
      clicks.get(u) match {
        case None => assert(clickUs.isEmpty && gap.isEmpty, s"event $eid")
        case Some(cs) =>
          val best = cs.map(c => c - pUs).minBy(g => (math.abs(g), g))
          assert(gap.contains(best), s"event $eid: got $gap want $best")
          assert(clickUs.contains(pUs + best))
      }
    }
    // both directions actually occur in the fixture
    assert(out.exists(_._5.exists(_ < 0)) && out.exists(_._5.exists(_ > 0)))
  }

  test("q_scalar_dense_ids: a bijection onto 0..n-1 preserving key order") {
    val rows = Relational.scalarDenseIds(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = Tables(s, d, "events").select("user_id").distinct().count()
    assert(rows.length === n.toInt)
    // dense ids are exactly 0..n-1 and monotone in the natural key
    assert(rows.map(_._2).toSeq === (0L until n).toSeq)
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
  }

  test("q_agg_bitmap_distinct equals count(DISTINCT) exactly") {
    val got = Relational.aggBitmapDistinct(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Tables(s, d, "events").select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
    // the merge path never shuffles raw ids: the second aggregate's input
    // is (type, bucket, bitmap) rows, asserted by the plan containing the
    // bitmap fold below the final exchange
    val p = Relational.aggBitmapDistinct(s, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("bitmap_construct_agg") && p.contains("partial_"),
      s"bitmap fold must partial-aggregate map-side:\n$p")
  }

  test("q_sql_grouping_sets: exactly the three declared sets; totals nest") {
    val rows = Relational.sqlGroupingSets(s, d).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    // gid bitmask: flag is the MSB → (flag,status)=0, (status)=2, ()=3
    assert(rows.map(_._5).toSet === Set(0, 2, 3))
    val leaf = rows.filter(_._5 == 0)
    val byStatus = rows.filter(_._5 == 2)
    val all = rows.filter(_._5 == 3)
    assert(all.length === 1 && all.head._1.isEmpty && all.head._2.isEmpty)
    // counts roll up exactly across the non-hierarchical sets
    assert(leaf.map(_._3).sum === all.head._3)
    assert(byStatus.map(_._3).sum === all.head._3)
    byStatus.foreach { case (_, st, n, qty, _) =>
      val mine = leaf.filter(_._2 == st)
      assert(mine.map(_._3).sum === n)
      assert(math.abs(mine.map(_._4).sum - qty) < 1e-6, s"status $st")
    }
  }

  test("q_agg_approx_quantile: rank contract holds; exact envelope sane") {
    val rows = operators.Relational.aggApproxQuantile(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"${r.getString(0)} p50 outside rank envelope")
      assert(r.getBoolean(5), s"${r.getString(0)} p90 outside rank envelope")
      assert(r.getDouble(2) <= r.getDouble(3), "p50 exceeds p90")
    }
  }

  test("q_scan_observed: piggy-backed metrics equal the direct aggregate") {
    val row = operators.Relational.scanObserved(s, d).head
    val direct = Tables(s, d, "orders").agg(
      count(lit(1)),
      sum(round(col("o_totalprice") * 100, 0).cast("long")),
      sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L)),
      date_format(max(to_date(col("o_orderdate"))), "yyyy-MM-dd")).head
    assert(row.getLong(0) === direct.getLong(0))
    assert(row.getLong(1) === direct.getLong(1))
    assert(row.getLong(2) === direct.getLong(2))
    assert(row.getString(3) === direct.getString(3))
  }

  test("q_join_asof_forward: next click is strictly after; agrees with brute force") {
    val out = operators.Relational.joinAsofForward(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.nonEmpty)
    val ev = Tables(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    out.foreach { case (eid, uid, pUs, nextClick) =>
      val mine = byUser(uid).sortBy(r => (r._4, r._2))
      val idx = mine.indexWhere(_._2 == eid)
      val want = mine.drop(idx + 1).filter(_._3 == "click").map(_._4)
        .sorted.headOption
      assert(nextClick === want, s"forward asof mismatch at event $eid")
      nextClick.foreach(nc => assert(nc >= pUs - 0,
        "next click cannot precede the purchase in event order"))
    }
    assert(out.exists(_._4.isEmpty), "some purchase has no later click")
    assert(out.exists(_._4.isDefined), "no purchase matched — suspicious")
  }

  test("q_agg_delta_method: moments replay; CI brackets the ratio") {
    val r0 = graft.operators.Analytics.aggDeltaMethod(s, d).head
    val (n, sx, sy) = (r0.getLong(0), r0.getLong(1), r0.getLong(2))
    val (ratio, se, lo, hi) = (r0.getDouble(3), r0.getDouble(4),
      r0.getDouble(5), r0.getDouble(6))
    val users = Tables(s, d, "events").groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("x"),
        count(lit(1)).as("y")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(n === users.length.toLong)
    assert(sx === users.map(_._1).sum && sy === users.map(_._2).sum)
    assert(math.abs(ratio - sx.toDouble / sy) < 1e-6)
    assert(se > 0 && lo < ratio && ratio < hi)
    assert(math.abs((hi - lo) - 2 * 1.96 * se) < 1e-4)
  }
}
