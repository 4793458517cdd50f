package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding tokenizer primitives — the char-level BPE of
  * Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of Rare
  * Words with Subword Units", ACL) in plain Scala for typed map stages.
  *
  * Two deliberate, documented deviations from the paper, both in the
  * service of exact cross-engine mirroring:
  *   - symbols are Unicode CODEPOINTS and there is no end-of-word
  *     marker: merges never cross word boundaries anyway (segmentation
  *     is per whitespace word), and the `</w>` marker only sharpens
  *     suffix statistics — it does not change the algorithm;
  *   - ties during training break by (count desc, pair lexicographic):
  *     the paper leaves tie order unspecified, but a reproducible
  *     release needs a total order.
  *
  * MERGE-APPLICATION ORDER: [[segment]] applies merges in rank order,
  * one left-to-right non-overlapping pass per merge. This is equivalent
  * to the priority-queue form (GPT-2's encoder repeatedly merges the
  * lowest-rank pair present): a merge's output symbol exists only after
  * that merge runs, so every pair involving it has a strictly later
  * rank — skipped earlier ranks can never become applicable again.
  * The left-to-right pass is also exactly what a chain of SQL
  * `replace()` calls performs over the SEP-wrapped symbol encoding
  * (see the tok1 oracle), which is what makes this DuckDB-mirrorable
  * where a heap-based implementation would not be.
  */
object Bpe {

  /** One word split into codepoint symbols (astral-safe — the charStats
    * lesson: UTF-16 code units would split emoji into surrogates).
    */
  def splitCodepoints(s: String): Array[String] = {
    val out = new ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      out += s.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One left-to-right non-overlapping merge pass: every adjacent
    * (a, b) becomes ab; a symbol consumed by a merge is not
    * reconsidered ("aaa" + (a,a) -> [aa, a]).
    */
  private[functions] def mergePass(
      syms: Array[String], a: String, b: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Segment one word under a fixed merges table (rank order = Seq
    * order). O(merges * len); callers tokenizing a corpus should memo
    * per word — Zipf makes the hit rate extreme (see
    * TextAnalysis.bpeTokenize).
    */
  def segment(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = splitCodepoints(word)
    merges.foreach { case (a, b) => syms = mergePass(syms, a, b) }
    syms
  }

  /** Leftmost-longest MaxMatch segmentation of one word against a
    * piece vocabulary — the fast-WordPiece matching rule (Song et al.
    * 2021, minus the `##` continuation marks): at each position take
    * the longest vocabulary piece that matches; if none does, consume
    * ONE codepoint as its own token (the unknown-char fallback, so
    * segmentation is total). A different decoder over the same learned
    * pieces than [[segment]]'s merge replay — production stacks run
    * exactly this swap for throughput.
    */
  def maxMatchSegment(
      word: String, pieces: Set[String], maxPieceLen: Int): Array[String] = {
    val out = new ArrayBuffer[String]
    var pos = 0
    while (pos < word.length) {
      var len = math.min(maxPieceLen, word.length - pos)
      var matched: String = null
      while (matched == null && len >= 2) {
        val cand = word.substring(pos, pos + len)
        if (pieces.contains(cand)) matched = cand else len -= 1
      }
      if (matched == null) {
        // one CODEPOINT (surrogate pairs stay whole, the splitCodepoints rule)
        val cp = word.codePointAt(pos)
        matched = word.substring(pos, pos + Character.charCount(cp))
      }
      out += matched
      pos += matched.length
    }
    out.toArray
  }

  /** Viterbi (max-likelihood) segmentation of one word under a piece
    * cost table — the SentencePiece unigram-LM decoding rule (Kudo
    * 2018): choose the full cover of the word minimizing the sum of
    * integer micro-costs (−ln p(piece), micro-rounded); ties break to
    * FEWER pieces, then to the lexicographically smallest space-joined
    * token stream — a total order both engines realize identically
    * (the oracle packs (cost, n, toks) into one zero-padded sort key).
    * O(len × maxPieceLen) with len-bounded DP state. The caller
    * guarantees coverage: the vocab contains every token of the word's
    * bootstrap segmentation, so at least one full cover exists.
    */
  /** Compare by Unicode CODE POINT — identical to UTF-8 byte order
    * (UTF-8 is order-preserving), which is what the DuckDB mirror's
    * packed-key `min()` realizes. Plain `String.compareTo` compares
    * UTF-16 code units, which mis-orders supplementary characters
    * (surrogate pairs sort below U+E000..U+FFFF) — invisible on ASCII
    * vocabularies but a silent cross-engine divergence beyond them.
    */
  private[graft] def codePointCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def viterbiSegment(
      word: String,
      costs: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Array[String] = {
    val L = word.length
    val cost = new Array[Long](L + 1)
    val np = new Array[Int](L + 1)
    val toks = new Array[String](L + 1)
    java.util.Arrays.fill(cost, Long.MaxValue)
    cost(0) = 0L
    toks(0) = ""
    var pos = 0
    while (pos < L) {
      if (cost(pos) != Long.MaxValue) {
        val maxPl = math.min(maxPieceLen, L - pos)
        var pl = 1
        while (pl <= maxPl) {
          val c = costs.get(word.substring(pos, pos + pl))
          if (c != null) {
            val p = word.substring(pos, pos + pl)
            val nc = cost(pos) + c.longValue()
            val nn = np(pos) + 1
            // packed-key contract with the SQL mirror: every DP state
            // packs as printf('%015d', cost) || printf('%04d', n) — a
            // cost >= 1e15 or >9999 pieces would overflow the fixed
            // widths and silently break the mirror's lexicographic
            // order, so the bound is enforced, not assumed
            require(nc < 1000000000000000L && nn <= 9999,
              s"viterbiSegment: packed-key bounds exceeded (cost=$nc n=$nn) " +
                s"for '$word' — the %015d/%04d mirror contract caps " +
                "cumulative micro-cost at 1e15 and pieces per word at 9999")
            val nt = if (pos == 0) p else toks(pos) + " " + p
            val e = pos + pl
            val better = cost(e) == Long.MaxValue || nc < cost(e) ||
              (nc == cost(e) && (nn < np(e) ||
                (nn == np(e) && codePointCompare(nt, toks(e)) < 0)))
            if (better) { cost(e) = nc; np(e) = nn; toks(e) = nt }
          }
          pl += 1
        }
      }
      pos += 1
    }
    require(cost(L) != Long.MaxValue,
      s"viterbiSegment: no cover for '$word' — vocab misses its bootstrap pieces")
    if (L == 0) Array.empty else toks(L).split(' ')
  }

  /** Learn `numMerges` merges from a word-frequency dict — the paper's
    * training loop verbatim: count adjacent symbol pairs weighted by
    * word frequency, merge the most frequent pair everywhere, repeat.
    * Stops early when no pair remains. The dict is vocabulary-sized
    * (callers bound it; see TextAnalysis.bpeTrain), so this is cheap
    * driver-side work even for realistic merge counts.
    */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"invalid numMerges=$numMerges")
    var vocab: Array[(Array[String], Long)] =
      wordFreq.map { case (w, f) => (splitCodepoints(w), f) }.toArray
    val merges = new ArrayBuffer[(String, String)](numMerges)
    var continue = numMerges > 0
    while (continue) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.iterator.reduceLeft { (x, y) =>
          // (count desc, pair asc) without allocating a sort
          if (y._2 > x._2 ||
            (y._2 == x._2 && (y._1._1 < x._1._1 ||
              (y._1._1 == x._1._1 && y._1._2 < x._1._2)))) y
          else x
        }._1
        merges += best
        vocab = vocab.map { case (syms, f) =>
          (mergePass(syms, best._1, best._2), f)
        }
        continue = merges.length < numMerges
      }
    }
    merges.toSeq
  }

  private val MergesMagic = 0x47425045 // "GBPE"

  /** Persist a trained merge table (rank order preserved) as a
    * length-prefixed binary — the tokenizer-artifact twin of
    * [[graft.operators.TrainingPipeline.writeRefreshArtifacts]]'s
    * format. Binary, not Sennrich's merges.txt, on purpose: symbols
    * are arbitrary codepoint concatenations of whitespace-split words,
    * and [[graft.functions.TextHashing.tokens]] splits on ' ' ONLY, so
    * a symbol can legally contain tabs or newlines and any
    * line-oriented text format would be ambiguous. `writeUTF` handles
    * every string.
    */
  def saveMerges(merges: Seq[(String, String)], path: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path)))
    try {
      out.writeInt(MergesMagic)
      out.writeInt(1) // version
      out.writeInt(merges.length)
      merges.foreach { case (a, b) => out.writeUTF(a); out.writeUTF(b) }
    } finally out.close()
  }

  /** Load a merge table persisted by [[saveMerges]], rank order intact. */
  def loadMerges(path: java.nio.file.Path): Seq[(String, String)] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      java.nio.file.Files.newInputStream(path)))
    try {
      require(in.readInt() == MergesMagic, s"not a BPE merges file: $path")
      val version = in.readInt()
      require(version == 1, s"unknown BPE merges version $version")
      val n = in.readInt()
      val b = Seq.newBuilder[(String, String)]
      var i = 0
      while (i < n) { b += ((in.readUTF(), in.readUTF())); i += 1 }
      b.result()
    } finally in.close()
  }
}
