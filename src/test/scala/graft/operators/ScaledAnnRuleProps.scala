package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import Prop.forAll

/** Property fuzzing for the scaled-ANN rule ladder (kC / keep / nprobe /
  * rerank — `ann_ivfpq_scaled`'s production rules). The invariants a
  * regression would silently break:
  *
  *  - kC ∈ [16, 4096] and, past the floor, never below 64 points/cell;
  *  - nprobe ∈ [4, kC] — probing more cells than exist is a planner bug,
  *    fewer than 4 under-serves the conformance width;
  *  - the min-points-PROBED floor: expected probed rows nprobe·N/kC
  *    reach ~2048 (or the whole corpus when N ≤ 2048 — the brute-force-
  *    exact degradation the thin-corpus recall fix relies on);
  *  - rerank = min(N, 2048) and never exceeds the probed row count's
  *    order (re-ranking more than probed would be wasted exact dots);
  *  - monotonicity: growing the corpus never shrinks kC (a sawtooth
  *    cell count would thrash a persisted index's layout).
  */
object ScaledAnnRuleProps extends Properties("ScaledAnnRule") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(2000)

  // corpus sizes from "too thin to train" to web scale, log-uniform
  private val genN: Gen[Long] =
    Gen.choose(0.0, 1.0).flatMap { u =>
      Gen.const(math.max(400L, math.pow(10, 2.7 + u * 6.3).toLong))
    }

  property("cell count bounds and min points per cell") = forAll(genN) { n =>
    val kC = SimilarityQueries.scaledCellCount(n)
    val okRange = kC >= 16 && kC <= 4096
    // above the floor's reach, the N/64 clamp must hold exactly
    val okDensity = kC == 16 || n / kC >= 64
    okRange && okDensity
  }

  property("probe width bounds and min points probed") = forAll(genN) { n =>
    val kC = SimilarityQueries.scaledCellCount(n)
    val np = SimilarityQueries.scaledNprobe(kC, n)
    val probedRows = np.toLong * n / kC
    val okRange = np >= math.min(4, kC) && np <= kC
    // either ~2048 expected rows are probed, or every cell is (thin
    // corpus full scan); 15/16 covers integer-division slack
    val okFloor = probedRows >= math.min(n, 2048L) * 15 / 16 || np == kC
    okRange && okFloor
  }

  property("rerank budget") = forAll(genN) { n =>
    val r = SimilarityQueries.scaledRerank(n)
    r == math.min(n, 2048L).toInt
  }

  property("cell count is monotone in corpus size") =
    forAll(genN, genN) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      SimilarityQueries.scaledCellCount(lo) <=
        SimilarityQueries.scaledCellCount(hi)
    }
}
