package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Deduplication operators for large text/embedding corpora.
  *
  * Scale design: every variant avoids the O(n^2) all-pairs comparison at
  * cluster scale —
  *   - exact: single hash-groupBy (one shuffle on the content hash);
  *   - MinHash-LSH: per-row signature (narrow map, fully codegen via
  *     nested higher-order functions), then an equi-join on
  *     (band, bandHash) buckets, then exact verification only on
  *     candidate pairs;
  *   - SimHash: per-row 64-bit signature, banded into 8 bytes; a pair
  *     within Hamming distance <= 7 must share at least one band
  *     (pigeonhole), so the band equi-join has guaranteed recall;
  *   - embedding near-dup keeps a brute-force form here (the oracle
  *     baseline); the ANN path for scale lives in [[Similarity]].
  */
object Dedup {

  private val Prime: Long = 1000000007L

  /** Whitespace tokens with empty strings dropped (texts can carry a
    * trailing separator).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** Word 3-gram shingles as a deduplicated array (order irrelevant for
    * Jaccard). Documents shorter than `n` words get an empty set.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val count = size(toks) - (n - 1)
    when(count > 0,
      array_distinct(transform(sequence(lit(0), count - 1),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: group identical texts by content hash. Output is one
    * row per distinct content with the representative (min doc id) and
    * multiplicity — the standard "keep one copy" shape.
    */
  def exact(documents: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    documents
      .groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))
      .orderBy("h")

  /** Per-document MinHash signature of `numHashes` 61-bit values.
    *
    * Universal hashing (a*x+b mod p) over a 31-bit base hash keeps every
    * product < 2^62, so the arithmetic is overflow-free under ANSI mode.
    * Entirely row-local: nested `transform`/`array_min` higher-order
    * expressions, no explode and no shuffle until the band join.
    */
  def minhashSignature(text: Column, numHashes: Int): Column = {
    val rnd = new scala.util.Random(42)
    val params = (0 until numHashes).map { _ =>
      (math.abs(rnd.nextInt()).toLong | 1L, math.abs(rnd.nextInt()).toLong)
    }
    val baseHashes = transform(shingles(text),
      s => pmod(xxhash64(s), lit(1L << 31)))
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => {
        // Per-hash (a,b) selected via element_at on literal arrays so the
        // whole signature is one codegen'd expression tree.
        val as = array(params.map(p => lit(p._1)): _*)
        val bs = array(params.map(p => lit(p._2)): _*)
        when(size(baseHashes) > 0,
          array_min(transform(baseHashes,
            h => pmod(element_at(as, i + 1) * h + element_at(bs, i + 1), lit((1L << 61) - 1)))))
          .otherwise(lit(-1L))
      })
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * numHashes=64 split into 32 bands of 2 rows: P(candidate) at
    * Jaccard 0.5 is 1-(1-0.25)^32 ≈ 0.9999, so recall at the 0.5
    * verification threshold is effectively total while random pairs
    * (J≈0.01) almost never collide. Candidates are then verified with
    * the exact shingle-set Jaccard; `2*inter >= union` is the
    * integer-exact form of J >= 0.5.
    */
  def minhashLsh(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 32): DataFrame = {
    val rows = numHashes / bands
    val sigs = documents.select(
      col(idCol).as("doc_id"),
      shingles(col(textCol)).as("sh"),
      minhashSignature(col(textCol), numHashes).as("sig"))

    val banded = sigs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*)))
      .toDF("doc_id", "band", "band_hash")

    val l = banded.select(col("band"), col("band_hash"), col("doc_id").as("da"))
    val r = banded.select(col("band"), col("band_hash"), col("doc_id").as("db"))
    val candidates = l.join(r,
        l("band") === r("band") && l("band_hash") === r("band_hash") && col("da") < col("db"))
      .select("da", "db").distinct()

    val sa = sigs.select(col("doc_id").as("da"), col("sh").as("sha"))
    val sb = sigs.select(col("doc_id").as("db"), col("sh").as("shb"))
    candidates.join(sa, "da").join(sb, "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(col("sha")) + size(col("shb")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni") && col("uni") > 0)
      .select(col("da"), col("db"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
      .orderBy("da", "db")
  }

  /** Exact word-3-gram Jaccard similarity over all qualifying pairs,
    * via shingle explode + equi-self-join (the shuffle is on the shingle
    * value, so co-occurring docs meet without an n^2 cross join).
    * This is the oracle-checkable exact counterpart of [[minhashLsh]].
    */
  def ngramJaccard(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.5): DataFrame = {
    val sh = documents.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol))).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("da"), col("s"))
      .join(sh.select(col("doc_id").as("db"), col("s")), "s")
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      // 2*inter >= union <=> J >= 0.5 in exact integer arithmetic
      .filter(col("inter") * lit((1 / threshold).toLong) >= col("uni"))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
      .orderBy("da", "db")
  }

  /** 64-bit SimHash per document: bit j of the signature is the sign of
    * sum over tokens of (+1/-1 by bit j of the token hash). Exposed as an
    * array<int> of 64 bits (packing to one long would overflow ANSI
    * arithmetic on the top bit, and the array form feeds hammingBits
    * directly).
    */
  def simhashBits(text: Column): Column = {
    val hashes = transform(tokens(text), w => xxhash64(w))
    array((0 until 64).map(j =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        > 0, 1).otherwise(0)): _*)
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    *
    * Banding: the 64 bits are split into 8 bytes; any pair within
    * Hamming distance 7 shares at least one identical byte (pigeonhole),
    * so joining on (byteIdx, byteValue) has guaranteed recall for
    * maxHamming <= 7 — no n^2 stage at any scale.
    */
  def simhashPairs(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7, "banding guarantees recall only for maxHamming <= 7")
    val sigs = documents.select(col(idCol).as("doc_id"),
      simhashBits(col(textCol)).as("bits"))
    val banded = sigs.select(
      col("doc_id"), col("bits"),
      posexplode(array((0 until 8).map(b =>
        aggregate(slice(col("bits"), b * 8 + 1, 8), lit(0), (acc, x) => acc * 2 + x)): _*)))
      .toDF("doc_id", "bits", "band", "byte_val")
    val l = banded.select(col("band"), col("byte_val"), col("doc_id").as("da"), col("bits").as("ba"))
    val r = banded.select(col("band"), col("byte_val"), col("doc_id").as("db"), col("bits").as("bb"))
    l.join(r, Seq("band", "byte_val")).filter(col("da") < col("db"))
      .select("da", "db", "ba", "bb").distinct()
      .withColumn("hamming", VectorFunctions.hammingBits(col("ba"), col("bb")))
      .filter(col("hamming") <= maxHamming)
      .select("da", "db", "hamming")
      .orderBy("da", "db")
  }

  /** Embedding cosine near-duplicate pairs — brute-force O(n^2) baseline
    * (oracle-checkable). For corpus-scale data use
    * [[Similarity.lshTopK]]'s bucketed path instead.
    */
  def embeddingNearDup(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.45): DataFrame = {
    val e = embeddings.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val a = e.select(col(idCol).as("va"), col("v").as("x"))
    val b = e.select(col(idCol).as("vb"), col("v").as("y"))
    a.crossJoin(b).filter(col("va") < col("vb"))
      .withColumn("sim", VectorFunctions.cosine(col("x"), col("y")))
      .filter(col("sim") > threshold)
      .select(col("va"), col("vb"), round(col("sim"), 4).as("sim"))
      .orderBy("va", "vb")
  }
}
