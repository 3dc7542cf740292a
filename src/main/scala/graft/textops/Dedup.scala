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

  /** Exploded distinct (doc_id, shingle) pairs — the shared first stage of
    * the sketch family. posexplode over the word array + element_at lookups
    * stays fully codegen'd; generating shingles through a higher-order
    * `transform`/`slice` lambda is ~9× slower per row (interpreted
    * generator input). Docs shorter than k words yield no shingles. */
  private def shingled(df: DataFrame, idCol: String, textCol: String,
                       shingleK: Int): DataFrame = {
    val words = split(normText(col(textCol)), " ")
    df.select(col(idCol).cast(LongType).as("doc_id"), words.as("__w"))
      .select(col("doc_id"), col("__w"),
        posexplode(col("__w")).as(Seq("__p", "__x")))
      .filter(col("__p") <= size(col("__w")) - shingleK)
      .select(col("doc_id"),
        concat_ws(" ", (col("__x") +: (2 to shingleK).map(j =>
          element_at(col("__w"), col("__p") + j))): _*).as("shingle"))
      .filter(length(col("shingle")) > 0)
      .distinct()
  }

  /** MinHash signatures via explode → groupBy-min: one shuffle on doc_id,
    * each hash function a codegen'd `min(xxhash64(shingle, seed))`.
    *
    * (A per-row `aggregate()` lambda over the shingle array evaluates the
    * whole shingling tree once per hash function per row and falls out of
    * codegen — quadratically slower; the relational form is the 100 TB
    * shape.) Docs with no shingles drop out (no signature ⇒ no pairs). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, numHashes: Int): DataFrame = {
    val mins = shingled(df, idCol, textCol, shingleK)
      .groupBy("doc_id")
      .agg(min(xxhash64(col("shingle"), lit(0))).as("h0"),
           (1 until numHashes).map(i =>
             min(xxhash64(col("shingle"), lit(i))).as(s"h$i")): _*)
    mins.select(col("doc_id"),
      array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-duplicate pairs.
    *
    * shingle → minhash(numHashes) → band into `bands` rows-per-band groups
    * → bucket-join on (band, bandHash) → verify estimated Jaccard from full
    * signatures. Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.7): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must be positive and divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, shingleK, numHashes)
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
    // Shuffle 8-byte hashed shingles, not strings (xxhash64 collisions at
    // corpus scale: ~n²/2⁶⁴, immaterial next to the threshold). The index
    // feeds four plan branches (sizes, hot list, both self-join sides) —
    // persist it once instead of re-deriving it per branch; at cluster
    // scale this is the materialized inverted index.
    // (The cache lives for the session and is LRU-evictable, not pinned;
    // callers running many corpora can spark.catalog.clearCache().)
    val exploded = shingled(df, idCol, textCol, shingleK)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Hot-shingle cap via broadcast anti-join: the hot list is tiny by
    // construction, so no sort-heavy window over the full index.
    val hot = exploded.groupBy("sh").agg(count(lit(1)).as("freq"))
      .filter(col("freq") > maxShingleFreq).select("sh")
    val capped = exploded.join(broadcast(hot), Seq("sh"), "left_anti")
    // Sizes must come from the SAME capped index as the intersection,
    // or docs containing a hot shingle get systematically under-scored
    // (an exact duplicate would fall below 1.0).
    val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val inter = capped.as("x").join(capped.as("y"), Seq("sh"))
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

  /** SimHash fingerprints via the same explode → groupBy shape: 64
    * codegen'd bit-vote sums per doc, assembled into one long. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int): DataFrame = {
    val votes = shingled(df, idCol, textCol, shingleK)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      .groupBy("doc_id")
      .agg(sum(shiftright(col("h"), 0).bitwiseAND(1L) * 2L - 1L).as("b0"),
           (1 until 64).map(i =>
             sum(shiftright(col("h"), i).bitwiseAND(1L) * 2L - 1L).as(s"b$i")): _*)
    votes.select(col("doc_id"),
      (0 until 64).map(i =>
        when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
        .reduce(_.bitwiseOR(_)).as("sim"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming` (≤ 3):
    * pigeonhole on the four 16-bit chunks — any pair within distance 3
    * agrees on at least one chunk — then verify with bit_count(xor).
    * Larger radii would need more/overlapping chunks, so they are
    * rejected rather than silently under-recalled. */
  def simhashNearPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleK: Int = 3, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-chunk pigeonhole only guarantees recall for distance <= 3, got $maxHamming")
    val sigs = simhashSignatures(df, idCol, textCol, shingleK)
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
      .withColumn("cosine", Similarity.cosineNative(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
