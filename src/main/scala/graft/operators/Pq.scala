package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compressed scoring path for ANN at
  * 100 TB (Jegou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011; the scoring scheme FAISS calls ADC).
  *
  * A d-dim vector becomes m sub-vectors, each quantized to one of nCodes
  * per-subspace centroids: storage drops from d floats to m small ints
  * (64-dim float -> 8 bytes at nCodes<=256, a 32x compression), and query
  * scoring needs no original vectors at all — per query a m x nCodes
  * lookup table of exact sub-distances is built once, and each candidate's
  * approximate squared L2 distance is m table lookups.
  *
  * Scale shape:
  *  - `fit` trains per-subspace k-means on a SAMPLE (codebooks are tiny:
  *    m * nCodes * dsub doubles — driver/broadcast-sized by construction);
  *  - `encode` is a narrow projection: per subspace the native
  *    [[graft.functions.expressions.NearestCentroid]] argmin kernel on the
  *    sliced sub-vector (no shuffle, codegen'd);
  *  - `topK` scores with a STATIC sum of m `element_at` lookups (plain
  *    codegen'd built-ins — no lambda, no UDF) against the broadcast
  *    per-query tables, then ranks through the k-bounded
  *    [[TopK.perGroupAgg]] aggregate — no per-query sort, k-bounded
  *    shuffle.
  *
  * Approximate by nature (quantization error) — recall-tested against
  * exact L2 in unit tests, like the k-means IVF path.
  */
object Pq {

  /** codebooks(subspace)(code) = centroid of length dsub. */
  case class PqModel(m: Int, dsub: Int, nCodes: Int,
                     codebooks: Array[Array[Array[Double]]])

  def fit(corpus: DataFrame, vecCol: String, m: Int, nCodes: Int,
          seed: Long = 42L, sampleFraction: Double = 1.0): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val sample =
      (if (sampleFraction < 1.0) corpus.sample(withReplacement = false, sampleFraction, seed)
       else corpus).select(col(vecCol)).persist()
    val codebooks = (0 until m).map { i =>
      val sub = sample.select(array_to_vector(
        transform(slice(col(vecCol), i * dsub + 1, dsub), _.cast("double"))).as("features"))
      new KMeans().setK(nCodes).setSeed(seed + i).setMaxIter(10).fit(sub)
        .clusterCenters.map(_.toArray)
    }.toArray
    sample.unpersist()
    PqModel(m, dsub, nCodes, codebooks)
  }

  /** PQ codes as a narrow array<int> column: per subspace, the native
    * argmin kernel over that subspace's codebook literal.
    */
  def encodeCol(vecCol: Column, model: PqModel): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    array((0 until model.m).map { i =>
      val cents: Seq[(Long, Seq[Double])] =
        model.codebooks(i).zipWithIndex.map { case (cv, c) => (c.toLong, cv.toSeq) }.toSeq
      ColumnBridge.column(graft.functions.expressions.NearestCentroid(
        ColumnBridge.expression(slice(vecCol, i * model.dsub + 1, model.dsub)),
        ColumnBridge.expression(typedLit(cents)))).cast("int")
    }: _*)
  }

  /** Approximate top-k by ADC over PQ codes. `queries` is the small side
    * by contract (its vectors are collected to build the lookup tables);
    * `encodedCorpus` needs (idCol, codesCol) only — original vectors are
    * not touched.
    *
    * @return (query_id, rank, neighbor_id, adist) — approximate squared
    *         L2, ascending, ties by neighbor id.
    */
  def topK(encodedCorpus: DataFrame, queries: DataFrame,
           idCol: String, vecCol: String, codesCol: String,
           model: PqModel, k: Int): DataFrame = {
    val spark = encodedCorpus.sparkSession
    import spark.implicits._
    // Exact per-subspace distances query -> every code centroid.
    // Cast to array<double> before collect: accepts float OR double vector
    // columns (reading getSeq[Float] from an array<double> column would
    // throw at element access).
    val qTables: Seq[(Long, Seq[Double])] = queries
      .select(col(idCol).cast("long"),
        graft.functions.VectorFunctions.toDouble(col(vecCol))).collect().toSeq.map { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Double](1)
        val table = for {
          i <- 0 until model.m
          c <- 0 until model.nCodes
        } yield {
          var d = 0.0
          var j = 0
          while (j < model.dsub) {
            val diff = qv(i * model.dsub + j) - model.codebooks(i)(c)(j)
            d += diff * diff
            j += 1
          }
          d
        }
        qid -> table
      }
    val qDf = broadcast(qTables.toDF("query_id", "__table"))

    // Static sum of m codegen'd lookups — no lambda, no UDF.
    val adist = (0 until model.m).map { i =>
      element_at(col("__table"),
        lit(i * model.nCodes + 1) + element_at(col(codesCol), i + 1))
    }.reduce(_ + _)

    val scored = encodedCorpus
      .select(col(idCol).as("neighbor_id"), col(codesCol))
      .crossJoin(qDf)
      .select(col("query_id"), col("neighbor_id"), adist.as("adist"))
    TopK.perGroupAgg(scored, Seq("query_id"), -col("adist"), col("neighbor_id"), k)
      .select(col("query_id"), col("rn").as("rank"),
        col("id").as("neighbor_id"), (-col("value")).as("adist"))
  }
}
