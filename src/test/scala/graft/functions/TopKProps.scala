package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}
import Prop.forAll

/** Property fuzzing for the bounded top-k heap (the kernel under six
  * ANN/top-k gates and the TopKRewrite bounded-heap rewrite). The heap
  * must agree with the obvious reference — sort everything, take k —
  * under ANY arrival order, ANY partition split (partial heaps merged),
  * duplicate scores, duplicate payload values, and NaN scores; a
  * disagreement would mean results depend on partitioning, the exact
  * bug partial aggregation can never have at 100 TB.
  */
object TopKProps extends Properties("TopKHeap") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(2000)

  private val genEntry: Gen[(Double, Long, Long)] = for {
    score <- Gen.frequency(
      8 -> Gen.choose(-1e6, 1e6),
      2 -> Gen.oneOf(0.0, -0.0, 1.0, -1.0, Double.NaN,
        Double.PositiveInfinity, Double.NegativeInfinity),
      // duplicate-heavy scores: ties are where ordering bugs live
      4 -> Gen.choose(0L, 4L).map(_.toDouble))
    id <- Gen.choose(0L, 50L) // small domain → frequent id collisions too
    payload <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield (score, id, payload)

  /** Reference: full sort by (score desc — Double.compare, so NaN
    * greatest — then id asc), take k, FIRST occurrence per (score, id)
    * arrival kept... the heap admits duplicates of (score,id) as
    * separate entries, so the reference just sorts all entries.
    */
  private def reference(entries: Seq[(Double, Long, Long)],
      k: Int): Seq[(Double, Long)] =
    entries.sortWith { case ((s1, i1, _), (s2, i2, _)) =>
      val c = java.lang.Double.compare(s1, s2)
      if (c != 0) c > 0 else i1 < i2
    }.take(k).map(e => (e._1, e._2))

  private def heapOf(entries: Seq[(Double, Long, Long)], k: Int): TopKHeap = {
    val h = new TopKHeap(k)
    entries.foreach { case (s, i, p) => h.add(s, i, p) }
    h
  }

  private val genCase = for {
    k <- Gen.choose(1, 8)
    n <- Gen.choose(0, 60)
    entries <- Gen.listOfN(n, genEntry)
  } yield (k, entries)

  property("single heap == sort-take-k, any arrival order") =
    forAll(genCase) { case (k, entries) =>
      val got = heapOf(entries, k).sortedBestFirst.map(e => (e.score, e.id))
      canon(got.toSeq) == canon(reference(entries, k))
    }

  property("merged partials == one heap over the union (partition invariance)") =
    forAll(genCase, Gen.choose(1, 5)) { case ((k, entries), parts) =>
      val splits = entries.grouped(
        math.max(1, (entries.size + parts - 1) / parts)).toSeq
      val merged = new TopKHeap(k)
      splits.foreach(s => merged.mergeFrom(heapOf(s, k)))
      val whole = heapOf(entries, k)
      canon(merged.sortedBestFirst.map(e => (e.score, e.id)).toSeq) ==
        canon(whole.sortedBestFirst.map(e => (e.score, e.id)).toSeq)
    }

  property("serialize/deserialize roundtrip preserves the heap") =
    forAll(genCase) { case (k, entries) =>
      val h = heapOf(entries, k)
      val rt = TopKHeap.fromBytes(k, h.toBytes)
      // multiset compare including payloads: two kept entries can share
      // (score, id) with different payloads (generator ids collide;
      // production ids are unique per group), and their relative output
      // order is legitimately unspecified
      def ms(x: TopKHeap) = x.sortedBestFirst
        .map(e => (java.lang.Double.doubleToLongBits(e.score), e.id,
          e.payload)).toSeq.sorted
      ms(rt) == ms(h)
    }

  /** NaN-tolerant comparison key (NaN != NaN under ==). */
  private def canon(xs: Seq[(Double, Long)]): Seq[(Long, Long)] =
    xs.map { case (s, i) => (java.lang.Double.doubleToLongBits(s), i) }
}
