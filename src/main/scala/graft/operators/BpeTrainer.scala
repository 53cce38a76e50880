package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING loop (Sennrich et al. 2016): the
  * iterated form of the `text_bpe` gate's single step. Each iteration
  * is ONE corpus-wide map-side-combinable aggregation (adjacent-pair
  * counts over the current symbol sequences, overlapping occurrences
  * counted — the exact statistic sequential BPE maximizes), an argmax
  * reduced to a single row, and one map pass applying the merge
  * greedily left-to-right. The driver holds only the merge table
  * (n rows) — PrefixSum-style metadata, never corpus data — so the
  * loop runs unchanged over a 100 TB corpus: n iterations cost
  * n scans + n tiny shuffles, and the symbol state lives in the
  * persisted distributed dataset (lineage truncated per iteration).
  *
  * Reference analogue: none — oracdc has no analytics (SURVEY §2.7);
  * this extends the BASELINE.json text-pipeline mandate.
  */
object BpeTrainer {

  /** Initial BPE symbols of a word = its Unicode CODE POINTS, not
    * Java chars: per-char `_.toString` would split a surrogate pair
    * into two lone surrogates that don't round-trip Spark's UTF-8
    * encoding, so `learn` and [[learnSequential]] could diverge on
    * non-BMP corpora (the r7 advice finding).
    */
  def codePointSymbols(w: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  /** Unsigned lexicographic UTF-8 byte comparison — Spark's binary
    * string collation (UTF8String.compareTo), which the distributed
    * argmax tie-break in [[learn]] follows. Java's String#compareTo
    * orders by UTF-16 code unit instead, which disagrees above U+FFFF
    * (supplementary code points sort below U+E000–U+FFFF in UTF-16
    * order but above them in UTF-8/code-point order), so the
    * sequential reference must compare the way Spark does.
    */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Greedy non-overlapping left-to-right merge of the adjacent pair
    * (a, b) in one symbol sequence — the sequential-BPE apply rule.
    */
  def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val in = syms.toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < in.length) {
      if (i + 1 < in.length && in(i) == a && in(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += in(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn up to `n` merges over a corpus of words (one string column
    * `t`, one row per word occurrence). Returns the ordered merge table
    * ((left, right), pairCount). Stops early when no pair occurs twice.
    */
  def learn(spark: SparkSession, words: DataFrame, n: Int)
      : Seq[((String, String), Long)] = {
    import spark.implicits._
    val merges = scala.collection.mutable.ArrayBuffer[((String, String), Long)]()
    // Dataset.unpersist is a NO-OP for localCheckpointed frames (the
    // blocks are registered at the RDD level, not in the CacheManager),
    // so each iteration must release the PREVIOUS checkpoint's RDD
    // blocks explicitly or n iterations stack n corpus-sized
    // MEMORY_AND_DISK block sets until driver GC happens to reap them —
    // on a long training run that fills executor storage. Snapshot the
    // persistent-RDD ids around each checkpoint and retire exactly the
    // ids it added (never a caller's persists).
    val sc = spark.sparkContext
    def checkpointTracked(ds: Dataset[Seq[String]])
        : (Dataset[Seq[String]], Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = ds.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    // initial symbols = code points (the classic BPE start state;
    // see codePointSymbols for why not Java chars)
    var (cur, curIds) = checkpointTracked(
      words.select(col("t")).as[String].map(codePointSymbols))
    var it = 0
    var done = false
    while (it < n && !done) {
      val bestRows = cur.toDF("syms")
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms)-1)," +
            " i -> struct(element_at(syms,i) AS a, element_at(syms,i+1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .orderBy(col("c").desc, col("a"), col("b")).limit(1)
        .as[(String, String, Long)]
        // 1-row argmax to the driver — merge-table metadata, not data
        // (the PrefixSum partition-totals precedent)
        .collect()
      if (bestRows.isEmpty) done = true
      else {
        val (a, b, c) = bestRows.head
        merges += (((a, b), c))
        // localCheckpoint(eager): truncate lineage each iteration so n
        // merges never stack n map closures on the plan; release the
        // previous iteration's blocks at the RDD level (see above)
        val (next, nextIds) = checkpointTracked(
          cur.map(s => applyMerge(s, a, b)))
        release(curIds)
        cur = next
        curIds = nextIds
      }
      it += 1
    }
    release(curIds)
    merges.toSeq
  }

  /** Tokenize one word with a learned merge table — the apply side of
    * the trainer: chars → fold every merge in learned order. Pure
    * function, usable inside any map pass.
    */
  def encodeWord(w: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(codePointSymbols(w)) {
      case (s, (a, b)) => applyMerge(s, a, b)
    }

  /** Encode a corpus of words (string column `t`) with a learned merge
    * table in ONE distributed map pass — the merge table rides the
    * closure (it is driver-side metadata by construction), the fold
    * over merges happens per word, so n learned merges never cost n
    * corpus passes at apply time.
    */
  def encode(spark: SparkSession, words: DataFrame,
      merges: Seq[(String, String)]): Dataset[Seq[String]] = {
    import spark.implicits._
    val table = merges.toIndexedSeq
    words.select(col("t")).as[String].map(w => encodeWord(w, table))
  }

  /** Sequential reference implementation (whole corpus in memory) — the
    * spec oracle [[graft.BpeTrainerSpec]] checks `learn` against.
    */
  def learnSequential(words: Seq[String], n: Int): Seq[((String, String), Long)] = {
    var corpus: Seq[Seq[String]] = words.map(codePointSymbols)
    val merges = scala.collection.mutable.ArrayBuffer[((String, String), Long)]()
    var it = 0
    var done = false
    while (it < n && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      corpus.foreach { syms =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + 1
          i += 1
        }
      }
      val candidates = counts.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        // tie-break by UTF-8 byte order (Spark's binary collation) so
        // this reference matches `learn`'s distributed argmax on
        // non-ASCII symbols — a plain (a, b) sortBy would use Java's
        // UTF-16 order, which diverges above the BMP
        val best = candidates.toSeq.reduceLeft { (x, y) =>
          val cmp =
            if (x._2 != y._2) java.lang.Long.compare(y._2, x._2)
            else {
              val ca = utf8Compare(x._1._1, y._1._1)
              if (ca != 0) ca else utf8Compare(x._1._2, y._1._2)
            }
          if (cmp <= 0) x else y
        }
        merges += best
        corpus = corpus.map(s => applyMerge(s, best._1._1, best._1._2))
      }
      it += 1
    }
    merges.toSeq
  }
}
