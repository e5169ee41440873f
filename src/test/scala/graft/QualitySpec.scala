package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Invariants for the reconciliation / data-quality family beyond the
  * DuckDB oracle: class partitions, rule-count conservation, exact-z-score
  * cross-checks against the floating formulation, and CDC fold laws.
  */
class QualitySpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val d = TestSpark.sf

  test("q_reconcile_diff classes partition both snapshots exactly") {
    val rows = Quality.reconcileDiff(s, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nOrders = Tables(s, d, "orders").count()
    val nDeleted = Tables(s, d, "orders")
      .where(col("o_orderkey") % 101 === 0).count()
    val nAdded = Tables(s, d, "orders")
      .where(col("o_orderkey") % 103 === 0).count()
    // v1 rows are exactly removed + changed + unchanged; v2-only rows = added
    assert(rows("removed") === nDeleted)
    assert(rows("added") === nAdded)
    assert(rows.getOrElse("changed", 0L) + rows.getOrElse("unchanged", 0L)
      === nOrders - nDeleted)
    // changed keys are the repriced ones that survived deletion (key 0 is
    // ≡0 mod everything → deleted by the 101 rule, so never 'changed')
    val nChanged = Tables(s, d, "orders")
      .where(col("o_orderkey") % 97 === 0 && col("o_orderkey") % 101 =!= 0)
      .count()
    assert(rows.getOrElse("changed", 0L) === nChanged)
  }

  test("q_dq_rules reports all six rules over the full row count, and fires") {
    val rows = Quality.dqRules(s, d).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("discount_range",
      "fk_orders", "flag_domain", "not_null_orderkey", "qty_range",
      "ship_after_order"))
    val nLi = Tables(s, d, "lineitem").count()
    assert(rows.forall(_.getLong(2) === nLi), "every rule checked every row")
    val byRule = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // clean-by-construction rules stay clean; range rules genuinely fire
    assert(byRule("not_null_orderkey") === 0 && byRule("fk_orders") === 0)
    assert(byRule("qty_range") > 0 && byRule("discount_range") > 0)
    assert(byRule.values.forall(v => v >= 0 && v <= nLi))
  }

  test("q_anomaly_zscore exact integer test agrees with the floating z-score") {
    val got = Quality.anomalyZscore(s, d).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // independent floating formulation (population stddev over cents)
    val c = Tables(s, d, "events")
      .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("v"))
    val st = c.groupBy("event_type").agg(
      avg(col("v")).as("mu"), stddev_pop(col("v")).as("sd"))
    val ref = c.join(st, "event_type")
      .where(abs(col("v") - col("mu")) > lit(2.0) * col("sd"))
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (k, n) =>
      val f = ref.getOrElse(k, 0L)
      // the exact test uses a strict inequality on integers; the floating
      // check can disagree only on rows where z is within double-rounding
      // distance of exactly 2 — allow a tiny boundary band
      assert(math.abs(n - f) <= 2, s"type $k: exact=$n floating=$f")
    }
    assert(got.values.sum > 0, "no outliers flagged at all")
  }

  test("q_cdc_apply folds the changelog to correct final state") {
    val out = Quality.cdcApply(s, d)
    val orders = Tables(s, d, "orders")
    val nDel = orders.where(col("o_orderkey") % 7 === 0).count()
    assert(out.count() === orders.count() - nDel, "deletes removed exactly")
    assert(out.where(col("k") % 7 === 0).count() === 0, "no deleted key survives")
    // every surviving %5 key carries the update, everything else the insert
    val seqs = out.groupBy("applied_seq").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nUpd = orders.where(col("o_orderkey") % 5 === 0 &&
      col("o_orderkey") % 7 =!= 0).count()
    assert(seqs.getOrElse(1, 0L) === nUpd)
    assert(seqs.getOrElse(2, 0L) === 0L, "no delete rows in output")
    // spot-check an updated price: +5.00 over the base
    val k5 = orders.where(col("o_orderkey") % 5 === 0 && col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice")).limit(1).collect()
    if (k5.nonEmpty) {
      val base = k5.head
      val got = out.where(col("k") === base.getLong(0)).collect().head
      assert(got.getDouble(2) === base.getDouble(1) + 5.0)
    }
  }

  test("q_anomaly_mad matches a full driver recompute; the gate barely moves") {
    val out = Quality.anomalyMad(s, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // driver-side recompute of the whole statistic, injection included
    val rows = Tables(s, d, "events")
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0),
        if (r.getLong(1) % 997 == 0) r.getLong(2) * 50 else r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      // smallest value whose cumulative count reaches half the total
      sorted((sorted.length - 1) / 2)
    }
    out.foreach { case (tpe, (n, med, mad, nOut)) =>
      val vs = rows.filter(_._1 == tpe).map(_._2).toSeq
      assert(n === vs.length.toLong)
      assert(med === lowerMedian(vs), s"$tpe median")
      assert(mad === lowerMedian(vs.map(v => math.abs(v - med))), s"$tpe MAD")
      // same 3·1.4826·MAD gate as the operator (3·1.4826·10000 = 44478 —
      // the r10 review caught a 10×-too-lax 444780 here and in the engine)
      assert(nOut === vs.count(v => math.abs(v - med) * 10000 > mad * 44478),
        s"$tpe outlier count")
      // robustness: k injected rows can shift the median by at most k RANK
      // positions in the clean sorted order — a breakdown-resistant
      // estimator moves by neighborhood, not by the outliers' magnitude
      val cleanSorted = Tables(s, d, "events").where(col("event_type") === tpe)
        .select(round(col("value") * 100, 0).cast("long")).collect()
        .map(_.getLong(0)).sorted
      val k = Tables(s, d, "events").where(col("event_type") === tpe &&
        col("event_id") % 997 === 0).count().toInt
      val mid = (cleanSorted.length - 1) / 2
      val lo = cleanSorted(math.max(0, mid - k))
      val hi = cleanSorted(math.min(cleanSorted.length - 1, mid + k))
      assert(med >= lo && med <= hi,
        s"$tpe: median $med outside the k=$k rank neighborhood [$lo, $hi]")
    }
    assert(out.values.map(_._4).sum > 0, "no injected outlier was flagged")
  }

  test("q_dq_benford histogram partitions orders; constants match log10(1+1/d)") {
    val rows = Quality.dqBenford(s, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet.subsetOf((1 to 9).toSet))
    assert(rows.map(_._2).sum === Tables(s, d, "orders").count(),
      "digit counts must partition the table")
    // observed frequencies are floor millionths: sum within 9 of 1e6
    val obsSum = rows.map(_._3).sum
    assert(obsSum > 1000000L - 9 && obsSum <= 1000000L)
    rows.foreach { case (dg, n, obs, exp, dev) =>
      assert(n > 0)
      assert(exp === math.floor(math.log10(1.0 + 1.0 / dg) * 1e6).toLong,
        s"digit $dg: hardcoded Benford constant drifted")
      assert(dev === math.abs(obs - exp))
    }
    // the fixture's totals are uniform-ish, not Benford — the audit must
    // actually flag deviation somewhere (non-vacuous screen)
    assert(rows.map(_._5).max > 0)
  }

  test("q_privacy_kanon: released cells meet k, members counted exactly once") {
    val rows = Quality.privacyKanon(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every released (non-suppressed) cell meets k = 10
    rows.foreach { case (grain, seg, geo, n) =>
      if (grain != "suppressed") assert(n >= 10L, s"cell $grain/$seg/$geo n=$n")
      else assert(geo === "*")
    }
    // no duplicate released cells
    assert(rows.map(t => (t._1, t._2, t._3)).distinct.length === rows.length)
    // partition: every customer is in exactly one released row
    val total = Tables(s, d, "customer").count()
    assert(rows.map(_._4).sum === total)
    // the ladder is non-vacuous on the fixture: some cell generalized or
    // suppressed (otherwise the operator degenerates to a plain rollup)
    assert(rows.exists(_._1 != "nation"))
  }

  test("q_dq_drift: counts reconcile, PSI totals its parts, injected shift fires") {
    val rows = Quality.dqDrift(s, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // counts partition the (injection-filtered) stream exactly
    val ev = Tables(s, d, "events")
    val nRef = ev.where("ts < TIMESTAMP '2024-01-08 00:00:00'").count()
    val nCur = ev.where("ts >= TIMESTAMP '2024-01-08 00:00:00' " +
      "AND NOT (value < 50 AND event_id % 2 = 0)").count()
    assert(rows.map(_._2).sum === nRef)
    assert(rows.map(_._3).sum === nCur)
    // the reported total is the exact integer sum of the per-bin parts
    val total = rows.head._5
    assert(rows.map(_._4).sum === total)
    assert(rows.forall(_._5 === total))
    // the injected small-ticket withholding is a real mix shift: the gate
    // fires (0.1 nats = 43429 micro-log10)
    assert(total > 43429L)
    assert(rows.forall(_._6))
  }

  test("q_dq_referential: orphans are exactly the injected keys; fixture is clean") {
    val rows = graft.operators.Quality.dqReferential(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 7)
    val injected = Map(
      "customer.c_nationkey->nation" -> 1L,
      "lineitem.l_orderkey->orders" -> 3L,
      "lineitem.l_partkey->part" -> 3L,
      "lineitem.l_suppkey->supplier" -> 3L,
      "nation.n_regionkey->region" -> 1L,
      "orders.o_custkey->customer" -> 2L,
      "supplier.s_nationkey->nation" -> 1L)
    rows.foreach { case (fk, n, orphans, micro) =>
      // the underlying fixture is referentially clean, so the audit must
      // find the injected orphans and NOTHING else — detection is real,
      // false-positive rate is zero
      assert(orphans === injected(fk), fk)
      assert(micro === 1000000L * orphans / n, fk)
    }
    // row counts are child-table counts plus the injection
    val li = Tables(s, d, "lineitem").count()
    assert(rows.filter(_._1.startsWith("lineitem")).forall(_._2 === li + 3))
  }

  test("q_privacy_ldiversity: one cell recounted; flag obeys l >= 3") {
    val rows = Quality.privacyLdiversity(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, l, ok) =>
      assert(l >= 1 && l <= n)
      assert(ok === (l >= 3))
    }
    // cells partition the customer table exactly
    assert(rows.map(_._3).sum === Tables(s, d, "customer").count())
    // recount the first cell's sensitive diversity directly
    val (nat, seg, _, l, _) = rows.head
    val want = Tables(s, d, "customer")
      .join(Tables(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .where(col("n_name") === nat && col("c_mktsegment") === seg)
      .select(floor(col("c_acctbal") / 1000).cast("long")).distinct().count()
    assert(l === want)
  }

  test("q_privacy_tclose: TVD recounted exactly for one cell, bounds hold") {
    val rows = Quality.privacyTclose(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, tvd, ok) =>
      assert(n >= 1)
      assert(tvd >= 0 && tvd <= 1000000, s"TVD $tvd outside [0, 1]")
      assert(ok === (tvd <= 250000L))
    }
    // cells partition the customer table exactly
    assert(rows.map(_._3).sum === Tables(s, d, "customer").count())
    // recount the first cell's TVD directly from raw bands
    val (nat, seg, n, tvd, _) = rows.head
    val bands = Tables(s, d, "customer")
      .join(Tables(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val globalCnt = bands.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cellCnt = bands.filter(b => b._1 == nat && b._2 == seg)
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val bigN = bands.length.toLong
    assert(cellCnt.values.sum === n)
    val num = globalCnt.map { case (b, g) =>
      math.abs(cellCnt.getOrElse(b, 0L) * bigN - g * n)
    }.sum
    assert(tvd === (num * 1000000L) / (2L * n * bigN))
  }

  test("q_privacy_local_dp: randomized response flips both ways and debiases") {
    val rows = graft.operators.Quality.privacyLocalDp(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (seg, n, nTrue, nReported, estQ) =>
      // debias identity holds exactly
      assert(estQ === 8L * nReported - 2L * n)
      // the deterministic-coin estimate lands near the truth: the RR
      // estimator's sd is ~sqrt(3n)/2 quarters·4 — allow 5 sd
      val err = math.abs(estQ / 4.0 - nTrue)
      assert(err <= math.max(10.0, 5.0 * math.sqrt(3.0 * n) / 2.0),
        s"$seg: debiased estimate $err off the truth — coins are biased")
      // privacy is real: the reported count differs from the truth (some
      // rows flipped), in expectation by ~n/4 toward 1/2
      assert(nReported != nTrue || n < 20,
        s"$seg: no row flipped — the mechanism is leaking truth verbatim")
    }
  }

  test("q_privacy_dp_count: noise replays from the keyed md5 and looks geometric") {
    val rows = graft.operators.Quality.privacyDpCount(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // driver replay of the ladder: first 3 md5 hex digits -> inverse CDF
    def noiseOf(seg: String, geo: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graftdp:$seg:$geo".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val v = Integer.parseInt(hex.take(3), 16)
      val ladder = Seq(0L -> 4096L) ++ (1 to 8).flatMap { k =>
        Seq(k.toLong -> (4096L >> k), -k.toLong -> (4096L >> k))
      }
      var cum = 0L
      for ((k, mass) <- ladder) {
        cum += mass
        if (v * 3 < cum) return k
      }
      9L
    }
    rows.foreach { case (seg, geo, nTrue, noise, nDp) =>
      assert(noise === noiseOf(seg, geo), s"cell ($seg,$geo) noise diverges")
      assert(nDp === math.max(nTrue + noise, 0L))
      assert(noise >= -8L && noise <= 9L)
    }
    // the mechanism must actually perturb, concentrated near zero:
    // P(|k| <= 2) = 5/6 for alpha = 1/2 — allow wide slack on 125 cells
    assert(rows.exists(_._4 != 0L), "all-zero noise: draw is broken")
    val small = rows.count(r => math.abs(r._4) <= 2)
    assert(small * 10 >= rows.length * 6,
      s"noise too heavy-tailed for alpha=1/2: $small/${rows.length} within |2|")
  }

  test("q_privacy_dp_quantile: the exponential mechanism replays driver-side") {
    val rows = graft.operators.Quality.privacyDpQuantile(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val cust = Tables(s, d, "customer")
      .select(col("c_mktsegment"), round(col("c_acctbal") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { case (seg, n, draw, relB, relLoss, relCents, trueB) =>
      val cents = cust.filter(_._1 == seg).map(_._2)
      assert(n === cents.length.toLong)
      val hist = Array.fill(64)(0L)
      cents.foreach { c =>
        hist(math.min(63L, math.max(0L, (c + 102400L) / 17280L)).toInt) += 1 }
      val cumle = hist.scanLeft(0L)(_ + _).tail
      val loss = (0 until 64).map(k => math.abs(n - 2 * cumle(k)))
      val wt = loss.map(l => 4096L >> math.min(l, 12L).toInt)
      val tot = wt.sum
      val cumw = wt.scanLeft(0L)(_ + _).tail
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graftdpq:$seg".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val v = Integer.parseInt(hex.take(3), 16).toLong
      assert(draw === v, s"$seg draw diverges")
      val k = (0 until 64).find(i => 4096L * cumw(i) > v * tot).get
      assert(relB === k.toLong, s"$seg released bucket diverges")
      assert(relLoss === loss(k))
      assert(relCents === -102400L + k * 17280L + 8640L)
      assert(trueB === (0 until 64).find(i => 2 * cumle(i) >= n).get.toLong)
      // utility: with exp(-loss·ln2) weights the draw concentrates around
      // the true median; at sf0.001's sparse n (~30/segment) the weight
      // plateau is wide (loss grows ~1 per 2 buckets), so the bound is 8
      // cells — tight enough to catch an inverted CDF or a broken weight
      // ladder, loose enough for the legitimate plateau spread
      assert(math.abs(relB - trueB) <= 8L,
        s"$seg released $relB vs true $trueB — mechanism utility broken")
    }
  }

  test("q_privacy_dp_sum: clipping bounds sensitivity; release closes over noise·cap") {
    val cap = 500000L
    val rows = Quality.privacyDpSum(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, sumTrue, sumClipped, nClipped, noise, sumDp) =>
      assert(sumClipped <= sumTrue, "clipping can only reduce")
      // every clipped order removed at least 1 cent, at most all its excess
      if (nClipped == 0) assert(sumClipped === sumTrue)
      else assert(sumClipped < sumTrue)
      assert(noise >= -8L && noise <= 9L, "ladder range")
      assert(sumDp === math.max(sumClipped + noise * cap, 0L))
    }
    // independence from dp_count: same cells, different salt, so the two
    // noise vectors must not be identical
    val cnt = Quality.privacyDpCount(s, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    val diff = rows.count { case (seg, geo, _, _, _, nz, _) =>
      cnt.get((seg, geo)).exists(_ != nz) }
    assert(diff > 0, "dp_sum draws must differ from dp_count draws")
  }

  test("q_privacy_dp_topk: stability-thresholded, noisy-rank-ordered, release closes") {
    val rows = Quality.privacyDpTopk(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (_, nTrue, noise, nDp) =>
      assert(noise >= -8L && noise <= 9L, "ladder range")
      assert(nDp === math.max(nTrue + noise, 0L))
      assert(nDp >= 20L, "stability threshold")
    }
    // ordered by the NOISY count (the released ranking), name tie-break
    val keys = rows.map(r => (-r._4, r._1))
    assert(keys === keys.sorted, "release must rank on noisy counts")
  }

  test("q_dq_freshness: staleness measures against the corpus watermark") {
    val rows = Quality.dqFreshness(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    val watermark = rows.map(_._2).max
    rows.foreach { case (_, lastDay, nOrders, stale, fresh) =>
      val want = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(lastDay), java.time.LocalDate.parse(watermark))
      assert(stale === want, "staleness = watermark − last_day")
      assert(fresh === (stale <= 7L))
      assert(nOrders > 0L)
    }
    assert(rows.exists(_._4 == 0L), "the watermark nation itself is fresh")
  }

  test("q_anomaly_iqr: fences replay; outliers counted against them exactly") {
    val rows = Quality.anomalyIqr(s, d).collect()
    assert(rows.nonEmpty)
    val vals = Tables(s, d, "orders")
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        round(col("o_totalprice") * 100, 0).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sorted }
    rows.foreach { r =>
      val (seg, n, q1, q3, lo, hi, nOut) = (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getLong(6))
      val xs = vals(seg)
      assert(n === xs.length.toLong)
      def q(p: Double): Double = {
        val idx = p * (xs.length - 1)
        val a = xs(idx.toInt)
        val b = xs(math.min(idx.toInt + 1, xs.length - 1))
        a + (idx - idx.toInt) * (b - a)
      }
      assert(math.abs(q1 - q(0.25)) < 1e-6 * math.max(1, q(0.25)))
      assert(math.abs(q3 - q(0.75)) < 1e-6 * math.max(1, q(0.75)))
      assert(math.abs(lo - (q1 - 1.5 * (q3 - q1))) < 1e-6)
      assert(math.abs(hi - (q3 + 1.5 * (q3 - q1))) < 1e-6)
      assert(nOut === xs.count(x => x < lo || x > hi).toLong)
    }
  }
}
