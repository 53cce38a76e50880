package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the PQ / max-cosine kernels against naive
  * references: the codegen fast paths must equal the obvious
  * formulation on seeded-random inputs (the OraNumberProps pattern —
  * the oracle gates prove engine equivalence at SF scale, these prove
  * the kernels compute what their scaladoc claims on arbitrary data).
  */
class VectorKernelPropsSpec extends AnyFunSuite {

  private def arr(xs: Array[Long]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs)

  test("pqEncodeArr: slots are in-range, argmin matches naive L2, rn2 exact") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 200).foreach { _ =>
      val m = 1 + rnd.nextInt(4)
      val sub = 1 + rnd.nextInt(6)
      val dim = m * sub
      val ks = Array.fill(m)(1 + rnd.nextInt(5))
      val cents: Array[Array[Array[Long]]] = ks.map(k =>
        Array.fill(k)(Array.fill(sub)(rnd.nextInt(2000).toLong - 1000)))
      val q = Array.fill(dim)(rnd.nextInt(2000).toLong - 1000)
      val enc = VectorNative.pqEncodeArr(q, cents)
      assert(enc.length === m + 1)
      var base = 0
      var rn2 = 0L
      (0 until m).foreach { mm =>
        val slot = enc(mm).toInt
        assert(slot >= base + 1 && slot <= base + ks(mm),
          s"slot $slot out of range for subspace $mm")
        val j = slot - base - 1
        // naive argmin by full L2 (including the ||sub||^2 term the
        // kernel drops as constant), first-wins on ties
        val subv = q.slice(mm * sub, mm * sub + sub)
        def l2(c: Array[Long]): Long =
          subv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        val naive = cents(mm).zipWithIndex.minBy { case (c, idx) => (l2(c), idx) }._2
        assert(j === naive, s"kernel argmin $j != naive $naive (subspace $mm)")
        rn2 += cents(mm)(j).map(x => x * x).sum
        base += ks(mm)
      }
      assert(enc(m) === rn2, "reconstruction norm must be the sum of chosen cells")
      // pqLut layout agreement: the chosen slot's LUT entry is the dot
      // product of the query's subspace with the chosen centroid
      val lut = VectorNative.pqLut(arr(q), cents)
      (0 until m).foreach { mm =>
        val slot = enc(mm).toInt
        val j = slot - (0 until mm).map(ks).sum - 1
        val subv = q.slice(mm * sub, mm * sub + sub)
        val expect = subv.zip(cents(mm)(j)).map { case (a, b) => a * b }.sum
        assert(lut.getLong(slot - 1) === expect,
          "pqLut slot layout must match pqEncode")
      }
    }
  }

  test("maxCos equals the naive per-pair maximum, bit-for-bit") {
    val rnd = new scala.util.Random(7L)
    (1 to 200).foreach { _ =>
      val dim = 1 + rnd.nextInt(8)
      val nb = 1 + rnd.nextInt(6)
      val q = Array.fill(dim)(rnd.nextInt(2000).toLong - 1000 + 1)
      val bench = Array.fill(nb)(Array.fill(dim)(rnd.nextInt(2000).toLong - 1000 + 1))
      val norms = bench.map(b => math.sqrt(b.map(x => x * x).sum.toDouble))
      val got = VectorNative.maxCos(arr(q), bench, norms)
      val n2 = q.map(x => x * x).sum
      val naive = bench.map { b =>
        val dot = q.zip(b).map { case (a, c) => a * c }.sum
        val bn2 = b.map(x => x * x).sum
        dot.toDouble / (math.sqrt(n2.toDouble) * math.sqrt(bn2.toDouble))
      }.max
      assert(java.lang.Double.compare(got, naive) === 0,
        s"maxCos $got != naive $naive")
    }
  }

  test("winnow: shared span guarantee and selection-density property") {
    // the Schleimer guarantee: any two hash arrays sharing a contiguous
    // run of >= w grams share at least one selected fingerprint; and
    // the selected set is a subset of the input's values
    val rnd = new scala.util.Random(31L)
    (1 to 200).foreach { _ =>
      val w = 2 + rnd.nextInt(4)
      val n = w + rnd.nextInt(40)
      val a = Array.fill(n)(rnd.nextInt(1000000).toLong)
      val shared = Array.fill(w)(rnd.nextInt(1000000).toLong)
      val b = Array.fill(rnd.nextInt(20))(rnd.nextInt(1000000).toLong) ++ shared ++
        Array.fill(rnd.nextInt(20))(rnd.nextInt(1000000).toLong)
      val withShared = a ++ shared
      def fps(xs: Array[Long]) = TextHash.winnow(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(xs), w)
        .toLongArray().toSet
      val fa = fps(withShared)
      val fb = fps(b)
      assert(fa.subsetOf(withShared.toSet) && fb.subsetOf(b.toSet),
        "fingerprints must be input hash values")
      // the shared w-run contains a full window in both arrays, whose
      // min is selected in both
      val sharedMin = shared.min
      assert(fa.contains(sharedMin) || fa.intersect(fb).nonEmpty,
        "a shared w-gram span must yield a shared fingerprint")
      assert(fa.intersect(fb).nonEmpty,
        s"no shared fingerprint despite a shared $w-run")
    }
  }

  test("sortedIntersectCount: adaptive search path equals the plain merge") {
    // the r10 asymmetric fast path (walk small, binary-search large)
    // must match min-multiplicity merge semantics on arbitrary sorted
    // inputs — duplicates included, both asymmetry directions, and
    // sizes straddling the 32x switchover
    def merge(a: Array[Long], b: Array[Long]): Long = {
      var i = 0; var j = 0; var m = 0L
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { m += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1 else j += 1
      }
      m
    }
    val rnd = new scala.util.Random(20260815L)
    (1 to 500).foreach { k =>
      val na = rnd.nextInt(12)
      val nb = if (k % 3 == 0) rnd.nextInt(12) else rnd.nextInt(800) + 1
      def gen(n: Int) =
        Array.fill(n)(rnd.nextInt(60).toLong).sorted // dense -> dups likely
      val (a, b) = (gen(na), gen(nb))
      val got = graft.functions.TextHash.sortedIntersectCount(
        arr(a), arr(b))
      assert(got === merge(a, b), s"a=${a.mkString(",")} b=${b.mkString(",")}")
      val got2 = graft.functions.TextHash.sortedIntersectCount(
        arr(b), arr(a))
      assert(got2 === merge(a, b), "symmetric direction diverged")
    }
  }

  test("pqProbe: equals the full (d2, cell) sort on random inputs, " +
      "including d2 ties, nprobe >= kC and tiny kC") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 400).foreach { t =>
      val dim = 1 + rnd.nextInt(6)
      val kC = 1 + rnd.nextInt(12)
      val nprobe = 1 + rnd.nextInt(kC + 3) // sometimes > kC
      // small value range so distinct cells collide on d2 often — the
      // tie-break path the insertion kernel must order by cell id
      val cents = Array.fill(kC)(Array.fill(dim)(rnd.nextInt(5).toLong - 2))
      val q = Array.fill(dim)(rnd.nextInt(5).toLong - 2)
      val cn2 = cents.map(_.map(x => x * x).sum)
      val naive = cents.zipWithIndex.map { case (c, j) =>
          val dot = q.zip(c).map { case (a, b) => a * b }.sum
          (cn2(j) - 2L * dot, j)
        }.sortBy(identity).take(math.min(nprobe, kC)).map(_._2 + 1L)
      val got = VectorNative.pqProbe(arr(q), cents, cn2, nprobe)
        .toLongArray().toSeq
      assert(got === naive.toSeq,
        s"t=$t kC=$kC nprobe=$nprobe dim=$dim: kernel $got != sort ${naive.toSeq}")
    }
  }
}
