package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for LLM-data pipelines (north star): exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash.
  *
  * Scale posture: exact dedup is one hash-groupBy (map-side combined);
  * Jaccard/minhash work on an inverted shingle index — the shuffle key is the
  * shingle/band bucket, never the document pair space, so candidate
  * generation is linear in index size rather than quadratic in corpus size.
  */
object Dedup {

  /** Exact dedup groups by normalized-content fingerprint. */
  def exact(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), TextOps.fingerprintCol.as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))
      .orderBy("canonical_id")

  /** Latest-version-wins dedup on the events stream (CDC compaction):
    * one row per user key, the highest event wins.
    */
  def latestByKey(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(desc("event_id"))
    Tables.events(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("k"))
      .orderBy("user_id")
  }

  /** Shared shingle index, materialized once per session. Shingles are
    * xxhash64-hashed to 8-byte longs right after generation: every downstream
    * shuffle (distinct, inverted-index groupBy, minhash) moves longs instead
    * of ~30-byte strings, and set semantics are unchanged (collisions are
    * ~n^2/2^64, negligible).
    */
  def cachedShingles(spark: SparkSession, d: String): DataFrame =
    Memo(spark, s"shingles|$d") {
      shingles(Tables.documents(spark, d)).persist()
    }

  /** Distinct hashed word 5-gram shingles per doc: `(doc_id, shingle)`. */
  def shingles(docs: DataFrame, n: Int = 5): DataFrame = {
    val words = split(trim(col("text")), " ")
    docs
      .select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w) - $n), i -> xxhash64(" +
          (0 until n).map(j => s"w[i + $j]").mkString("concat_ws(' ', ", ", ", ")") + "))"
      )).as("shingle"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    * shingle → docs, self-join on shingle, |∩| per pair, then
    * J = |∩| / (|A| + |B| - |∩|). No quadratic pair space: only docs sharing
    * ≥1 shingle meet.
    */
  def ngramJaccard(
      spark: SparkSession,
      d: String,
      threshold: Double = 0.5,
      maxDf: Int = 256): DataFrame =
    jaccardPairs(cachedShingles(spark, d), threshold, maxDf)

  /** Pair mining over a `(doc_id, shingle)` index. `maxDf` caps shingle
    * document frequency: a boilerplate shingle shared by k docs would emit
    * k²/2 pairs inside ONE task (license headers / navigation chrome reach
    * k≈10⁶ at web scale → 5·10¹¹ pairs), so shingles above the cap are
    * excluded from candidate generation — the standard stop-shingle rule in
    * near-dup mining. Doc sizes |A|,|B| still count ALL shingles, so the cap
    * only loses intersection evidence from ubiquitous (uninformative)
    * shingles; it never inflates a score. The oracle SQL applies the same
    * cap, keeping the operator exactly checkable.
    */
  def jaccardPairs(sh: DataFrame, threshold: Double, maxDf: Int): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // Pair generation via the inverted index: group docs per shingle, DROP
    // singleton shingles early (the vast majority) and hot shingles past
    // maxDf, then explode ordered doc pairs within each group. One shuffle
    // on the shingle, never a quadratic doc-pair join.
    val inter = sh.groupBy("shingle").agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), " +
          "y -> struct(least(x, y) as a, greatest(x, y) as b))))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "n_a"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "n_b"), "b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("n_common"), col("jaccard"))
      .orderBy("a", "b")
  }

  /** MinHash signatures: k universal-hash functions over murmur3 shingle
    * hashes, `min((a_i * h + b_i) mod p)` per doc — one groupBy over the
    * shingle index, signature length k columns folded as an array.
    */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    val rnd = new scala.util.Random(42)
    val coeffs = Vector.fill(k)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong ->
      rnd.nextInt(Int.MaxValue).toLong)
    val h = pmod(col("shingle"), lit(p)).as("h") // shingles are pre-hashed longs
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("h") + lit(b), lit(p))).as(s"mh_$i")
    }
    sh.select(col("doc_id"), h)
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  private def pmod(c: Column, m: Column): Column = ((c % m) + m) % m

  /** MinHash + LSH banding: signatures split into `bands` bands of `rowsPer`
    * rows; docs sharing any band bucket become candidates; candidates are
    * verified with estimated Jaccard = fraction of equal signature slots.
    * The shuffle key is the (band, bucket-hash) — candidate generation never
    * materializes the full pair space.
    */
  def minhashLsh(
      spark: SparkSession,
      d: String,
      bands: Int = 16,
      rowsPer: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 4096): DataFrame = {
    val k = bands * rowsPer
    val sh = cachedShingles(spark, d)
    val sigs = minhashSignatures(sh, k).cache()
    val banded0 = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
        s"hash(slice(sig, b * $rowsPer + 1, $rowsPer)))")).as(Seq("band", "bucket")))
    // Hot-bucket guard: a degenerate bucket of k docs emits k² join rows in
    // one task; prune buckets past maxBucket (and singletons, which cannot
    // pair) with a semi-join BEFORE the self-join.
    val banded = keepPairableBuckets(banded0, Seq("band", "bucket"), maxBucket)
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), t -> t))") //
          .cast("double") / lit(k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select(col("a"), col("b"), col("est_jaccard"))
      .orderBy("a", "b")
  }

  /** 64-bit SimHash per document: sign-sum of per-token 64-bit hashes
    * (xxhash64), bit-majority folded into a fingerprint.
    */
  def simhash(spark: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .select(col("doc_id"), xxhash64(col("token")).as("h"))
    // per-bit contribution: +1 when bit set, -1 otherwise; majority = bit set
    val bitCols = (0 until 64).map { i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"b_$i")
    }
    tok.groupBy("doc_id")
      .agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"b_$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup candidates: pairs within `maxHamming` bits, banded on
    * 16-bit chunks (a pair within hamming 3 shares at least one of 4 chunks).
    */
  def simhashPairs(
      spark: SparkSession,
      d: String,
      maxHamming: Int = 3,
      maxBucket: Int = 4096): DataFrame = {
    val fp = simhash(spark, d).cache()
    val banded0 = fp.select(col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), c -> (simhash >> (c * 16)) & 65535)"))
        .as(Seq("chunk", "chunk_val")))
    // same hot-bucket guard as minhashLsh (a 16-bit chunk value shared by a
    // boilerplate cluster would otherwise square inside one task)
    val banded = keepPairableBuckets(banded0, Seq("chunk", "chunk_val"), maxBucket)
    val l = banded.select(col("chunk"), col("chunk_val"), col("doc_id").as("a"), col("simhash").as("sh_a"))
    val r = banded.select(col("chunk"), col("chunk_val"), col("doc_id").as("b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
      .orderBy("a", "b")
  }

  /** Keep only LSH buckets that can produce pairs and are below the blow-up
    * cap: bucket size in [2, maxBucket]. One aggregate on the bucket key +
    * a broadcast-able semi-join; prunes singleton buckets (the majority)
    * before the self-join as a bonus.
    */
  private def keepPairableBuckets(
      banded: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val ok = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_in_bucket"))
      .filter(col("n_in_bucket").between(2, maxBucket))
      .select(keys.map(col): _*)
    banded.join(ok, keys, "left_semi")
  }
}
