package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document corpora.
  *
  * Design for 100 TB:
  *  - Exact dedup hashes the full text down to a 128-bit digest *before* the
  *    shuffle, so the exchange moves 16-byte keys, not documents.
  *  - MinHash/LSH never materializes the O(n²) pair space: docs are bucketed
  *    by band signature and only bucket-mates are paired (the classic
  *    Broder '97 / MMDS ch.3 scheme), which is a key-partitioned shuffle
  *    join, not a cross join.
  *  - All hashing is integer arithmetic over a deterministic token-id
  *    dictionary (dense ranks of the distinct-shingle set), so results are
  *    engine-reproducible (DuckDB-oracle-checkable) — no reliance on any
  *    engine's private string hash.
  *
  * The token-id dictionary is itself a DataFrame, built with one distinct +
  * window pass; at scale the dictionary is tiny relative to the corpus (it
  * is vocabulary-sized) and broadcast-joins back to the exploded shingles.
  */
object Dedup {

  /** Large prime modulus for MinHash permutations; small enough that
    * a*id+b stays far from Long overflow for any realistic vocabulary.
    */
  val P: Long = 1000003L

  /** (a, b) parameters of the K hash permutations h_i(x) = (a*x + b) mod P.
    * Fixed primes: deterministic across runs and engines.
    */
  def hashParams(k: Int): Seq[(Long, Long)] = {
    val as = Seq(31L, 131L, 1313L, 13131L, 7L, 77L, 777L, 7777L,
      37L, 373L, 3737L, 41L, 431L, 4313L, 43L, 433L)
    val bs = Seq(17L, 171L, 1717L, 17171L, 11L, 111L, 1111L, 11111L,
      19L, 191L, 1919L, 23L, 231L, 2323L, 29L, 291L)
    require(k <= as.length, s"at most ${as.length} hash functions supported")
    as.zip(bs).take(k)
  }

  /** One row per (id, distinct shingle) — the exploded set representation
    * used by minhash/jaccard. Shingle k=3 over whitespace tokens.
    *
    * Dedup happens row-wise after the explode (one shuffle) rather than via
    * per-row `array_distinct`, which is O(len²) string comparisons on long
    * documents — measurably pathological at corpus scale.
    */
  def explodedShingles(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol), split(col(textCol), " ").as("__toks"))
    val sh = TextFunctions.shinglesOfTokens(col("__toks"), k)
    toks.select(col(idCol), explode(sh).as("shingle")).distinct()
  }

  /** Deterministic dense integer ids for the global distinct-shingle set:
    * row_number over the sorted vocabulary. One narrow distinct + one
    * window over the (small) vocabulary.
    */
  def shingleVocabulary(shingled: DataFrame): DataFrame =
    shingled.select(col("shingle")).distinct()
      .withColumn("tid", row_number().over(Window.orderBy(col("shingle"))).cast("long"))

  /** Shingles joined to their token ids: (id, tid). The vocabulary side is
    * broadcast — it is vocabulary-sized, orders of magnitude smaller than
    * the corpus. The exploded-shingle table is cached: it feeds both the
    * vocabulary build and the join (callers release via
    * `spark.catalog.clearCache()` — the Verify/Bench harnesses do).
    *
    * The dictionary (sorted dense ids) exists for engine-reproducible
    * hashing (oracle parity). At real 100 TB corpus scale the shingle
    * vocabulary itself is corpus-sized — use [[shingleIdsHashed]] there,
    * which hashes shingles directly (xxhash64) with no dictionary, no
    * global sort, and no second pass.
    */
  def shingleIds(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val sh = explodedShingles(df, idCol, textCol, k).persist()
    sh.join(broadcast(shingleVocabulary(sh)), "shingle").select(col(idCol), col("tid"))
  }

  /** Scale-path shingle ids: tid = xxhash64(shingle) masked non-negative.
    * One narrow pass, no dictionary; not oracle-portable (Spark-specific
    * hash) but the production choice for corpora whose vocabulary doesn't
    * fit a broadcast.
    */
  def shingleIdsHashed(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    explodedShingles(df, idCol, textCol, k)
      .select(col(idCol), (abs(xxhash64(col("shingle"))) % (P - 1) + 1).as("tid"))

  /** MinHash signatures: one row per id with columns h0..h{k-1}.
    * minhash_i = min over the doc's token ids of (a_i*tid + b_i) mod P.
    * Single hash-aggregate over the exploded shingle-id table — partial
    * (map-side) min-combine keeps the shuffle tiny.
    */
  def minhashSignatures(ids: DataFrame, idCol: String, numHashes: Int = 8): DataFrame = {
    val aggs = hashParams(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((col("tid") * a + b) % P).as(s"h$i")
    }
    ids.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signatures via the native TypedImperativeAggregate
    * ([[graft.functions.expressions.MinHashAgg]]): identical results to
    * [[minhashSignatures]], one array-buffered aggregate with no
    * per-row Encoder round-trip. Same output columns h0..h{k-1}.
    */
  def minhashSignaturesNative(ids: DataFrame, idCol: String, numHashes: Int = 8): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = ColumnBridge.column(
      graft.functions.expressions.MinHashAgg(
        ColumnBridge.expression(col("tid")), numHashes).toAggregateExpression())
    ids.groupBy(col(idCol)).agg(agg.as("sig"))
      .select(col(idCol) +:
        (0 until numHashes).map(i => col("sig").getItem(i).as(s"h$i")): _*)
  }

  /** LSH candidate pairs: ids sharing at least one band of the signature.
    * Bands of `rowsPerBand` hashes are concatenated into a band key; docs
    * are grouped by (band index, band key) and paired within buckets.
    * Output: (id_a, id_b) with id_a < id_b, distinct.
    */
  def lshCandidatePairs(signatures: DataFrame, idCol: String,
                        numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(numHashes % rowsPerBand == 0)
    val nBands = numHashes / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val key = concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
      struct(lit(b).as("band"), key.as("bkey"))
    }
    // Cached: the banded table is both sides of the self-join.
    val banded = signatures
      .select(col(idCol), explode(array(bands: _*)).as("bk"))
      .select(col(idCol), col("bk.band"), col("bk.bkey"))
      .persist()
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  /** SimHash of `nBits` bits over the doc's distinct token ids: bit j is set
    * when the majority vote sum(2*((tid*A_j+B_j) mod P mod 2)-1) > 0.
    * Output: (id, simhash long).
    */
  def simhash(ids: DataFrame, idCol: String, nBits: Int = 16): DataFrame = {
    val params = hashParams(16).take(nBits)
    val bitSums = params.zipWithIndex.map { case ((a, b), j) =>
      sum(((col("tid") * a + b) % P % 2L) * 2L - 1L).as(s"s$j")
    }
    val sums = ids.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until nBits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col(idCol), hash.as("simhash"))
  }

  /** Exact n-gram Jaccard similarity between chosen id pairs.
    * `pairs` must have columns (id_a, id_b). Shuffle-join on tid: the
    * intersection size comes from a join of the two shingle-id sets, union
    * size by inclusion-exclusion — no per-pair set materialization.
    */
  def jaccard(ids0: DataFrame, idCol: String, pairs0: DataFrame): DataFrame = {
    val ids = ids0.persist() // reused three times: intersection + both sizes
    // The pair set is tiny next to the exploded id table — broadcast it so
    // the expansion join is map-side; only the (id_b, tid) intersection
    // join shuffles. Doc-size tables are doc-count-sized: broadcast too.
    val pairs = broadcast(pairs0)
    val ta = ids.select(col(idCol).as("id_a"), col("tid"))
    val tb = ids.select(col(idCol).as("id_b"), col("tid"))
    val inter = ta.join(pairs, "id_a").join(tb, Seq("id_b", "tid"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    val szA = broadcast(ids.groupBy(col(idCol).as("id_a")).agg(count(lit(1)).as("sz_a")))
    val szB = broadcast(ids.groupBy(col(idCol).as("id_b")).agg(count(lit(1)).as("sz_b")))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(szA, "id_a")
      .join(szB, "id_b")
      .select(col("id_a"), col("id_b"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sz_a") + col("sz_b") - coalesce(col("inter"), lit(0L)))).as("jaccard"))
  }

  /** End-to-end near-duplicate detection: shingle → MinHash → LSH
    * candidates → exact Jaccard verification → threshold filter. The
    * complete pipeline a training-data dedup pass runs: candidates come
    * from banding (never the O(n²) pair space), and only candidates pay
    * the exact-Jaccard join.
    *
    * @return (id_a, id_b, jaccard) for pairs with jaccard >= threshold
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, numHashes: Int = 8,
                   rowsPerBand: Int = 2, k: Int = 3): DataFrame = {
    val ids = shingleIds(df, idCol, textCol, k).persist()
    val sigs = minhashSignatures(ids, idCol, numHashes)
    val candidates = lshCandidatePairs(sigs, idCol, numHashes, rowsPerBand)
    jaccard(ids, idCol, candidates).filter(col("jaccard") >= threshold)
  }

  /** Deduplicated corpus: drop every document that has a near-duplicate
    * with a smaller id (the standard greedy keep-first pass — one
    * candidate join, no iterative connected components; a doc chained
    * transitively to a smaller id through intermediate near-dups survives
    * only if none of its direct pairs has a smaller id).
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double, numHashes: Int = 8,
                         rowsPerBand: Int = 2, k: Int = 3): DataFrame = {
    val losers = nearDupPairs(df, idCol, textCol, threshold, numHashes, rowsPerBand, k)
      .select(col("id_b").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep the first row per key by the given ordering — the deterministic
    * form of dropDuplicates. One window, no extra shuffle beyond the
    * partitionBy exchange.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
