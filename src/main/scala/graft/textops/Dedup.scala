package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for training-data pipelines, smallest-shuffle
  * first:
  *
  *  - [[exactDedup]] — one hash-groupBy (a single shuffle on a 32-char key);
  *  - [[minhashLsh]] — the 100 TB near-dup path: per-doc signatures (one
  *    narrow scan), band buckets (shuffle on short band keys), candidate
  *    verification confined to same-bucket pairs;
  *  - [[ngramJaccardPairs]] — exact Jaccard via shingle inverted index;
  *    quadratic in bucket size, so hot shingles are frequency-capped;
  *  - [[simhash64]] / [[simhashNearPairs]] — 64-bit sketch, pigeonhole
  *    banding on 16-bit chunks, Hamming verification via bit_count;
  *  - [[embeddingDupPairs]] — cosine near-dup over embeddings through
  *    seeded random-hyperplane LSH buckets.
  *
  * All sketches use built-in hash expressions (xxhash64 with literal
  * salts) — deterministic across runs and cluster layouts, no UDFs.
  */
object Dedup {
  import TextFunctions._

  /** Exact dedup on the normalized-text fingerprint: one row per distinct
    * content, keeping the smallest id; `n_copies` counts collapsed rows. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Salted 64-bit shingle hash: k independent functions from one builtin. */
  private def saltedHash(shingle: Column, salt: Int): Column =
    xxhash64(shingle, lit(salt))

  /** MinHash signature: element i = min over shingles of xxhash64(s, i). */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      aggregate(shinglesCol, lit(Long.MaxValue),
        (acc, s) => least(acc, saltedHash(s, i)))
    }: _*)

  /** MinHash+LSH near-duplicate pairs.
    *
    * shingle → minhash(numHashes) → band into `bands` rows-per-band groups
    * → bucket-join on (band, bandHash) → verify estimated Jaccard from full
    * signatures. Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = df.select(
        col(idCol).cast(LongType).as("doc_id"),
        minhashSignature(wordShingles(col(textCol), shingleK), numHashes).as("sig"))
      .filter(size(filter(col("sig"), h => h =!= Long.MaxValue)) > 0)
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast("array<string>")), lit(b))
      }: _*)).as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
    candidates
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          (x === y).cast("int")), v => v === 1)).cast("double") / numHashes.toDouble)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Exact n-gram Jaccard pairs via a shingle inverted index.
    *
    * `maxShingleFreq` drops shingles present in more than that many docs —
    * the standard guard against quadratic blowup on boilerplate shingles
    * (at 100 TB a stopword shingle would otherwise pair everything).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, threshold: Double = 0.5,
                        maxShingleFreq: Int = 1000): DataFrame = {
    val exploded = df.select(col(idCol).cast(LongType).as("doc_id"),
        explode(wordShingles(col(textCol), shingleK)).as("shingle"))
    val sizes = exploded.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val capped = exploded
      .withColumn("freq", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("freq") <= maxShingleFreq).drop("freq")
    val inter = capped.as("x").join(capped.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("n_shingles").as("size_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n_shingles").as("size_b")), "id_b")
      .withColumn("jaccard", col("n_common").cast("double")
        / (col("size_a") + col("size_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over word shingles: bit i is the sign of the weighted
    * sum of shingle-hash bits. */
  def simhash64(shinglesCol: Column): Column = {
    val hashes = transform(shinglesCol, s => xxhash64(s))
    val bits = (0 until 64).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(1L) * 2L - 1L))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming` (< 16):
    * pigeonhole on the four 16-bit chunks — any pair within distance 3
    * agrees on at least one chunk — then verify with bit_count(xor). */
  def simhashNearPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleK: Int = 3, maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).cast(LongType).as("doc_id"),
      simhash64(wordShingles(col(textCol), shingleK)).as("sim"))
    val chunked = sigs.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map { c =>
        shiftrightunsigned(col("sim"), c * 16).bitwiseAND(0xFFFFL)
      }: _*)).as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding cosine near-duplicates via seeded random-hyperplane LSH:
    * `numPlanes` sign bits form the bucket key; exact cosine verifies
    * within buckets. Planes come from a fixed seed → reproducible. */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, numPlanes: Int = 12,
                        threshold: Double = 0.95): DataFrame = {
    val planes = Similarity.hyperplanes(dim, numPlanes, seed = 42L)
    val bucketed = df.select(col(idCol).cast(LongType).as("doc_id"),
      col(vecCol).as("vec"),
      Similarity.bucketSignature(col(vecCol), planes).as("bucket"))
    val a = bucketed.select(col("bucket"), col("doc_id").as("id_a"), col("vec").as("vec_a"))
    val b = bucketed.select(col("bucket"), col("doc_id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
