package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FeeExpr
import graft.sources.{CronSchedule, Zip}

/** Property-based checks (SURVEY.md §5 item 3) over driver-side kernels.
  * Generators come from scalacheck directly (sampled with a fixed seed —
  * the scalatest/scalacheck bridge artifact is not on the offline
  * classpath); DataFrame-level algebraic properties live in RelationalSpec
  * to keep Spark job counts low.
  */
class PropertiesSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("FeeExpr is monotone in price and non-negative for valid inputs") {
    val cases = samples(for {
      p <- Gen.choose(0.0, 1e6)
      d <- Gen.choose(0.0, 0.5)
      t <- Gen.choose(0.0, 0.2)
    } yield (p, d, t))
    assert(cases.nonEmpty)
    cases.foreach { case (p, d, t) =>
      val fee = FeeExpr.compute(p, d, t)
      assert(fee >= 0.0)
      assert(FeeExpr.compute(p * 2, d, t) >= fee)
    }
  }

  test("Zip round-trip preserves arbitrary byte content") {
    val cases = samples(Gen.nonEmptyListOf(Gen.choose(1, 512)), 50)
    cases.foreach { sizes =>
      val entries = sizes.zipWithIndex.map { case (sz, i) =>
        (s"e$i.bin", Array.tabulate[Byte](sz)(j => (i * 31 + j).toByte))
      }
      val out = Zip.unzip(Zip.zip(entries)).toSeq
      assert(out.map(_._1) === entries.map(_._1))
      assert(out.zip(entries).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    }
  }

  test("CronSchedule.nextAfter always lands strictly in the future, within 24h, at M/H") {
    val cases = samples(for {
      now <- Gen.choose(0L, 2000000000L)
      m <- Gen.choose(0, 59)
      h <- Gen.choose(0, 23)
    } yield (now, m, h))
    cases.foreach { case (now, m, h) =>
      val next = CronSchedule.nextAfter(s"$m $h * * *", now)
      assert(next > now && next <= now + 86400)
      assert(java.lang.Math.floorMod(next, 86400L) === h * 3600L + m * 60L)
    }
  }
}
