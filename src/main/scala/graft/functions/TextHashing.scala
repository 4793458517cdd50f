package graft.functions


/** Row-local text-hashing primitives in plain Scala, used from typed
  * `Dataset.map` stages.
  *
  * Why not Catalyst expressions: Spark's higher-order functions
  * (transform/aggregate/filter lambdas) do NOT participate in whole-stage
  * codegen — they evaluate interpreted, and nested lambdas re-evaluate
  * their free subexpressions per element (a 64-hash MinHash signature
  * re-derives the shingle set ~129x per row). A native Scala loop in a
  * typed map is linear, allocation-light, and still fully distributed;
  * at 100 TB this is a narrow map stage with perfect scaling.
  */
object TextHashing {

  /** Whitespace tokens, empties dropped (parity with
    * `list_filter(string_split(text,' '), x -> x <> '')`).
    */
  def tokens(text: String): Array[String] = text.split(' ').filter(_.nonEmpty)

  /** Lowercase MD5 hex — the one definition every engine-side content
    * hash goes through (UTF-8; parity with DuckDB/Spark `md5()`), so a
    * hashing change can never diverge between call sites.
    */
  def md5Hex(s: String): String = md5Hex(s.getBytes("UTF-8"))

  private val HexChars = "0123456789abcdef".toCharArray

  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    // table-driven hex: a per-byte format interpolator here cost ~40%
    // of frameSample's wall (one format-string parse per byte)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Round half away from zero at 4 dp via the floor trick — the ONE
    * definition every engine-side score rounding goes through (DuckDB
    * `round(double, 4)` parity: scale, add half, floor, unscale, in
    * plain double arithmetic). Spark's `round(col, 4)` is BigDecimal
    * HALF_UP on the exact binary value and can differ by one ulp-step
    * at representation boundaries; fused/typed stages and the Column
    * sites must share THIS definition or a pipeline can disagree with
    * its composed parts on borderline values (see
    * [[graft.functions.GraftFunctions.round4]] for the Column form,
    * which performs the identical double ops under codegen).
    */
  def round4(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e4 + 0.5) / 1e4

  /** Distinct word n-gram shingles, order-insensitive set semantics. */
  def shingles(toks: Array[String], n: Int = 3): Array[String] =
    if (toks.length < n) Array.empty
    else toks.sliding(n).map(_.mkString(" ")).toArray.distinct

  /** Scala twin of [[graft.operators.TextAnalysis.normalizedText]] —
    * lowercase, collapse `[ \t\r\n]+` runs to one space, trim — for
    * fused typed stages that normalize and score in one pass (parity
    * spec-pinned against the Column form on real data). Two Spark
    * details are mirrored exactly, not approximated:
    *   - `lower()` lowercases pure-ASCII strings bytewise ('A'..'Z'
    *     only) and falls back to JDK default-locale toLowerCase
    *     otherwise (UTF8String's fast/slow paths) — a plain
    *     Locale.ROOT toLowerCase would agree on ASCII but can differ
    *     under exotic default locales, and a plain default-locale call
    *     would BREAK the ASCII case under tr_TR;
    *   - `trim()` strips 0x20 spaces ONLY (Java's String.trim strips
    *     every control char <= 0x20 — wrong twin).
    */
  def normalize(text: String): String = {
    var ascii = true
    var k = 0
    while (ascii && k < text.length) {
      if (text.charAt(k) >= 0x80) ascii = false
      k += 1
    }
    val lowered =
      if (ascii) {
        val a = new Array[Char](text.length)
        var i = 0
        while (i < text.length) {
          val c = text.charAt(i)
          a(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
          i += 1
        }
        new String(a)
      } else text.toLowerCase()
    val s = lowered.replaceAll("[ \\t\\r\\n]+", " ")
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  private val MersennePrime = (1L << 61) - 1

  /** Universal-hash parameter table for MinHash (fixed seed). */
  def minhashParams(numHashes: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numHashes)((math.abs(rnd.nextInt()).toLong | 1L, math.abs(rnd.nextInt()).toLong))
  }

  /** MinHash signature over the shingle set; empty set -> all -1.
    * Shingle base hash is the 31-bit poly32 (SQL-mirrorable, and a*h
    * never overflows against the Mersenne modulus), so the ENTIRE
    * signature pipeline replays in the DuckDB oracle.
    */
  def minhashSignature(shingleSet: Array[String], params: Array[(Long, Long)]): Array[Long] = {
    val sig = Array.fill(params.length)(Long.MaxValue)
    if (shingleSet.isEmpty) return Array.fill(params.length)(-1L)
    var i = 0
    while (i < shingleSet.length) {
      val h = poly32(shingleSet(i), 41) & 0x7fffffffL
      var j = 0
      while (j < params.length) {
        val (a, b) = params(j)
        val v = (a * h + b) % MersennePrime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Hash a signature band (for LSH bucketing): fold the band's rows mod
    * 2^32 — every intermediate < 2^72/131 < 2^63 after the row values are
    * masked to 32 bits, so the identical fold is ANSI-SQL-expressible
    * (wraparound Long arithmetic would not be). The band index is not
    * folded in; bucket keys are the (band, band_hash) PAIR.
    */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = 97L
      var i = b * rows
      while (i < (b + 1) * rows) { h = (h * 131 + (sig(i) & 0xffffffffL)) & 0xffffffffL; i += 1 }
      h
    }
  }

  /** 32-bit char-level polynomial hash: fold (h*131 + CODEPOINT) mod
    * 2^32, then one xorshift-multiply-xorshift avalanche round (raw
    * polynomial low bits correlate across similar tokens, which would
    * inflate SimHash collision rates ~7x). Every intermediate stays
    * < 2^48 (codepoints are < 2^21), so the IDENTICAL steps are
    * expressible in ANSI SQL over BIGINT without overflow — this is
    * what lets the SimHash and winnowing operators carry a DuckDB
    * oracle (the same reason txt_fingerprint's fold is mod-bounded).
    *
    * CODEPOINTS, not UTF-16 units: the SQL mirrors fold
    * `string_split(w, '')` elements through `ascii(c)` — one codepoint
    * each — so a surrogate-pair fold here would silently diverge on
    * astral-plane tokens (the charStats lesson; identical on BMP text,
    * which is why every existing fixture hash is unchanged).
    */
  def poly32(s: String, seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131 + cp) & 0xffffffffL
      i += Character.charCount(cp)
    }
    h ^= h >>> 16
    h = (h * 40503L) & 0xffffffffL
    h ^ (h >>> 13)
  }

  /** 63-bit combined hash from two independent poly32 folds (seeds 7/13):
    * high 31 bits from seed 7, low 32 from seed 13. Non-negative, so Long
    * ordering == BIGINT ordering in the SQL mirror.
    */
  def poly63(s: String): Long =
    ((poly32(s, 7) & 0x7fffffffL) << 32) | poly32(s, 13)

  /** 64-bit SimHash as a bit array: bits 0..31 vote on poly32(w, 17) bits,
    * bits 32..63 on poly32(w, 31) bits (two independent 32-bit hashes
    * instead of one murmur64 so the signature is SQL-mirrorable; see
    * [[poly32]]).
    */
  def simhashBits(toks: Array[String]): Array[Int] = simhashBitsN(toks, 64)

  /** The poly32 seeds backing each 32-bit word of a generalized
    * SimHash signature: words 0..1 are the original 64-bit signature's
    * (17, 31), so [[simhashBitsN]] at 64 bits IS [[simhashBits]];
    * wider signatures extend with further small primes. Public because
    * the SQL mirror generator replays the same seed list.
    */
  val simhashSeeds: Array[Int] = Array(17, 31, 37, 41, 43, 47, 53, 59)

  /** `nBits`-bit SimHash as a bit array (nBits a multiple of 32, up to
    * 256): word w votes on poly32(token, simhashSeeds(w)) bits. The
    * WIDTH is the saturation knob for the banded Hamming join
    * ([[graft.operators.Dedup.simhashPairs]] `nBits`): keeping 8 bands
    * (pigeonhole recall for Hamming <= 7) while widening the signature
    * widens each band — 64 bits = 8-bit bands (256 buckets, saturating
    * around 256·cap docs), 128 bits = 16-bit bands (65536 buckets),
    * 256 bits = 32-bit bands (4.3e9 buckets) — the dd5c
    * wider-signature discipline applied to the text family.
    */
  def simhashBitsN(toks: Array[String], nBits: Int): Array[Int] = {
    require(nBits >= 32 && nBits % 32 == 0 && nBits / 32 <= simhashSeeds.length,
      s"simhashBitsN: nBits=$nBits must be a multiple of 32 up to ${32 * simhashSeeds.length}")
    val words = nBits / 32
    val votes = new Array[Int](nBits)
    var i = 0
    while (i < toks.length) {
      var w = 0
      while (w < words) {
        val h = poly32(toks(i), simhashSeeds(w))
        var j = 0
        while (j < 32) {
          if (((h >>> j) & 1L) == 1L) votes(w * 32 + j) += 1
          else votes(w * 32 + j) -= 1
          j += 1
        }
        w += 1
      }
      i += 1
    }
    votes.map(v => if (v > 0) 1 else 0)
  }

  /** Pack bit array into `bits.length / 8` byte-valued bands
    * (pigeonhole recall for Hamming distance <= bands-1).
    *
    * CONTRACT CHANGE (round 17): this bands the WHOLE array and
    * requires `bits.length % 8 == 0`. The pre-r17 form silently read
    * exactly the first 64 bits of any-length input with no validation;
    * a caller relying on that truncation now throws (length not a
    * multiple of 8) or gets extra bands (length > 64). All in-repo
    * callers pass 64-bit signatures, where the two behaviors coincide.
    */
  def byteBands(bits: Array[Int]): Array[Int] = bands(bits, 8)

  /** Pack a bit array into `bits.length / bandBits` integer-valued
    * bands — the generalized [[byteBands]]. The band width is the LSH
    * scale knob: buckets per band = 2^bandBits, so 8-bit bands top out
    * at 256 buckets (saturating around ~10^5 random vectors — every
    * bucket fills toward the cap and candidate fan-out goes quadratic)
    * while 16-bit bands give 65536 and push the same saturation two
    * orders of magnitude out. Recall at similarity s follows
    * 1 − (1 − p^bandBits)^nBands with p = 1 − arccos(s)/π, so a wider
    * band NEEDS a wider signature to keep nBands up (the dd5c shape:
    * 128 bits × 16-bit bands ≈ the 64×8 curve shifted toward
    * higher-sim pairs, with 256× the buckets).
    */
  def bands(bits: Array[Int], bandBits: Int): Array[Int] = {
    require(bandBits >= 1 && bandBits <= 30 && bits.length % bandBits == 0,
      s"bad banding: ${bits.length} bits into $bandBits-bit bands")
    Array.tabulate(bits.length / bandBits) { b =>
      var v = 0; var i = b * bandBits
      while (i < (b + 1) * bandBits) { v = v * 2 + bits(i); i += 1 }
      v
    }
  }

  /** [[bands]] widened to Long band values (bandBits up to 62) — the
    * band width past 30 bits needs a 64-bit carrier. Same MSB-first
    * packing; for bandBits <= 30 the values equal [[bands]]'s, so
    * switching a caller between the two never re-buckets anything.
    */
  def bandsLong(bits: Array[Int], bandBits: Int): Array[Long] = {
    require(bandBits >= 1 && bandBits <= 62 && bits.length % bandBits == 0,
      s"bad banding: ${bits.length} bits into $bandBits-bit bands")
    Array.tabulate(bits.length / bandBits) { b =>
      var v = 0L; var i = b * bandBits
      while (i < (b + 1) * bandBits) { v = v * 2 + bits(i); i += 1 }
      v
    }
  }

  def hamming(a: Array[Int], b: Array[Int]): Int = {
    var d = 0; var i = 0
    while (i < a.length) { if (a(i) != b(i)) d += 1; i += 1 }
    d
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03, public
    * algorithm): rolling k-gram hashes, then the minimum hash of each
    * sliding window of `w` hashes (rightmost on ties). Guarantees every
    * shared substring of length >= k + w - 1 yields at least one shared
    * fingerprint — fragment-level dedup, robust to reordering around the
    * fragment.
    */
  def winnow(toks: Array[String], k: Int = 4, w: Int = 4): Array[Long] = {
    if (toks.length < k) return Array.empty
    val grams = toks.sliding(k).map(g => poly63(g.mkString(" "))).toArray
    if (grams.length <= w) return Array(grams.min)
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var i = 0
    while (i + w <= grams.length) {
      var minIdx = i
      var j = i + 1
      while (j < i + w) { if (grams(j) <= grams(minIdx)) minIdx = j; j += 1 }
      out += grams(minIdx)
      i += 1
    }
    out.toArray
  }

  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }
}
