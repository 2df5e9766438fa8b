package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (Array[Float]) — brute-force
 * cosine top-k as the exact baseline, and an IVF (inverted-file) variant as
 * the scale path: embeddings are bucketed to their nearest centroid once,
 * queries probe only the `nProbe` nearest centroid buckets, so the scan cost
 * drops from O(N·Q) to O(N·Q·nProbe/K) at a small recall cost.
 *
 * Scale design (what moves at 10^12 rows and what never does):
 *  - the DATA side is never collected to the driver and never funneled
 *    through a single reducer: top-k is computed per input partition first
 *    (bounded heap in one mapPartitions pass) and only P·Q·k candidate rows
 *    reach the final exact rank;
 *  - only MODELS travel: the query vectors and the K centroids (both small
 *    by construction) are broadcast; centroid assignment is a map-side
 *    argmax — zero shuffle of the big table;
 *  - exact pair enumeration (cosinePairs) is a chunked block self-join:
 *    O(N²) WORK is inherent to an exact threshold join when the similarity
 *    distribution has no gap at the threshold, but it distributes over
 *    (N/C)² independent tasks with no driver state and no skew.
 */
object Similarity {

  /** dot(a,b) in double over float arrays — a tight-loop UDF with the SAME
    * left-to-right IEEE summation as the higher-order-function formulation
    * (bit-identical results), ~20x faster than the interpreted
    * aggregate(zip_with(...)) path on wide candidate joins. */
  private def dotP(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cosineP(a: Array[Float], b: Array[Float]): Double =
    dotP(a, b) / (math.sqrt(dotP(a, a)) * math.sqrt(dotP(b, b)))

  private val dotUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  def dot(a: Column, b: Column): Column = dotUdf(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact global top-k per query from per-partition partial top-k rows:
    * the final rank runs over only P·Q·k survivors, so no reducer ever sees
    * more than that (vs windowing ALL N·Q scored rows into Q reducers). */
  private def finalRank(partials: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
    partials.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("sim"))
  }

  /** Bounded top-k buffer under the (sim DESC, vec_id ASC) total order —
    * the partial-aggregation kernel shared by the exact and IVF paths. */
  private final class TopKBuf(k: Int) {
    // min-heap by the total order: head = current worst of the kept k
    private val ord = Ordering.by[(Long, Double), (Double, Long)] {
      case (id, sim) => (-sim, id) // natural max = worst (lowest sim, then highest id)
    }
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord)
    def add(id: Long, sim: Double): Unit = {
      if (heap.size < k) heap.enqueue((id, sim))
      else {
        val (wid, wsim) = heap.head
        if (sim > wsim || (sim == wsim && id < wid)) { heap.dequeue(); heap.enqueue((id, sim)) }
      }
    }
    def drain: Iterator[(Long, Double)] = heap.iterator
  }

  /**
   * Exact brute-force cosine top-k. Queries (small — a model) are collected
   * once and broadcast; the big side streams through ONE mapPartitions pass
   * that keeps a bounded k-heap per query, so the shuffle carries only
   * P·Q·k partial winners into the final exact rank — no N·Q materialized
   * join, no single-query reducer hotspots.
   * Queries must have columns (qid, qvec). Results (incl. tie order) are
   * bit-identical to the naive join+window formulation: same left-to-right
   * IEEE dot product, same (sim DESC, vec_id ASC) total order.
   */
  def bruteForceTopK(data: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] =
      queries.select(col("qid").cast("long"), col("qvec")).as[(Long, Array[Float])].collect()
    val bc = spark.sparkContext.broadcast(qs)
    val partials = data.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val queries = bc.value
        val qnorms = queries.map { case (_, qv) => math.sqrt(dotP(qv, qv)) }
        val heaps = queries.map(_ => new TopKBuf(k))
        it.foreach { case (id, v) =>
          val nv = math.sqrt(dotP(v, v))
          var qi = 0
          while (qi < queries.length) {
            val (qid, qv) = queries(qi)
            if (!(excludeSelf && id == qid)) {
              // same expression shape as `cosine`: dot / (norm(v) * norm(q))
              heaps(qi).add(id, dotP(v, qv) / (nv * qnorms(qi)))
            }
            qi += 1
          }
        }
        queries.iterator.zip(heaps.iterator).flatMap { case ((qid, _), h) =>
          h.drain.map { case (id, sim) => (qid, id, sim) }
        }
      }.toDF("qid", "vec_id", "sim")
    finalRank(partials, k)
  }

  /**
   * Exact cosine near-duplicate pairs above a threshold — the
   * embedding-cosine dedup operator, as a chunked block self-join:
   * ids are grouped into chunks of `chunkSize` vectors, every chunk PAIR
   * (ck_a <= ck_b) becomes one task that scores its C×C block with a tight
   * primitive loop (norms precomputed per chunk). Nothing is collected to
   * the driver; the O(N²) scoring — inherent to an EXACT threshold join
   * when the cosine distribution has no gap at the threshold — distributes
   * over (N/C)²/2 independent tasks.
   *
   * At web scale with a real near-dup threshold (>= ~0.8) use
   * `cosinePairsLsh`: random-hyperplane candidate buckets + this same exact
   * verify, trading a quantified recall bound for sub-quadratic work.
   * Summation order matches the Column `dot` exactly, so results are
   * bit-identical to the naive join.
   */
  def cosinePairs(data: DataFrame, idCol: String, vecCol: String,
                  threshold: Double, chunkSize: Int = 4096): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val rows = data.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
    // chunk table: one row per chunk, vectors sorted by id (determinism)
    val chunks: Dataset[(Long, Array[(Long, Array[Float])])] = rows
      .groupByKey(_._1 / chunkSize)
      .mapGroups { (ck, it) => (ck, it.toArray.sortBy(_._1)) }
    // materialize the chunk table once (it feeds both sides of the block
    // self-join; without this the grouping shuffle runs twice)
    val chunkDf = chunks.toDF("ck", "vs").localCheckpoint()
    // Enumerate the (ck_a <= ck_b) pairs as a SELF-JOIN of the tiny
    // chunk-ID table (ids only, N/chunkSize rows): the `<=` theta runs as a
    // broadcast nested-loop over bare longs — bounded metadata, never the
    // packed vectors — and NOTHING reaches the driver (the round-1 version
    // collected chunk ids and built the O((N/C)²) pair list driver-side).
    // The packed chunk table is attached afterwards by equi-join, so the
    // vectors never ride the theta-join either.
    val ckDf = chunkDf.select(col("ck"))
    val pairs = ckDf.select(col("ck").as("ck_a"))
      .join(broadcast(ckDf.select(col("ck").as("ck_b"))), col("ck_a") <= col("ck_b"))
    pairs
      .join(chunkDf.select(col("ck").as("ck_a"), col("vs").as("vs_a")), Seq("ck_a"))
      .join(chunkDf.select(col("ck").as("ck_b"), col("vs").as("vs_b")), Seq("ck_b"))
      .select(col("ck_a"), col("vs_a"), col("ck_b"), col("vs_b"))
      .as[(Long, Array[(Long, Array[Float])], Long, Array[(Long, Array[Float])])]
      .flatMap { case (ckA, vsA, ckB, vsB) =>
        val same = ckA == ckB
        val nA = vsA.map { case (_, v) => math.sqrt(dotP(v, v)) }
        val nB = if (same) nA else vsB.map { case (_, v) => math.sqrt(dotP(v, v)) }
        val out = Array.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < vsA.length) {
          val (idA, va) = vsA(i)
          var j = if (same) i + 1 else 0
          while (j < vsB.length) {
            val (idB, vb) = vsB(j)
            val c = dotP(va, vb) / (nA(i) * nB(j))
            if (c >= threshold) out += ((idA, idB, c))
            j += 1
          }
          i += 1
        }
        out.result()
      }.toDF("id_a", "id_b", "cosine")
  }

  /**
   * Sub-quadratic near-dup pairs for HIGH thresholds: random-hyperplane
   * LSH candidate buckets + exact cosine verify (prune + refine — the same
   * architecture as the spatial joins and MinHash LSH). A pair at cosine c
   * agrees on one signature bit with probability p = 1 − arccos(c)/π, and
   * is caught iff some band of `bitsPerBand` bits matches:
   * recall(c) = 1 − (1 − p^bits)^bands — e.g. c=0.85 (p=0.823),
   * 16 bands × 4 bits: 1 − (1 − 0.459)^16 ≈ 1 − 5e-5. At c=0.4 the bit
   * agreement is barely better than random (p=0.63) so no band scheme both
   * prunes and recalls — that regime belongs to the exact `cosinePairs`.
   * Hyperplanes are deterministic (seeded); only candidate pairs sharing a
   * (band, bucket) are scored, as id pairs re-joined to vectors (the heavy
   * arrays never ride the band shuffle).
   */
  def cosinePairsLsh(data: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, bands: Int = 16, bitsPerBand: Int = 4,
                     seed: Long = 42L): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val rows = data.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
    val dim = rows.head()._2.length
    val rnd = new scala.util.Random(seed)
    // deterministic gaussian hyperplanes: bands × bitsPerBand of them
    val planes = Array.fill(bands * bitsPerBand, dim)(rnd.nextGaussian())
    val bcPlanes = spark.sparkContext.broadcast(planes)
    val nb = bands; val bpb = bitsPerBand
    val sigs = rows.mapPartitions { it =>
      val ps = bcPlanes.value
      it.flatMap { case (id, v) =>
        (0 until nb).map { band =>
          var bucket = 0L
          var bit = 0
          while (bit < bpb) {
            val p = ps(band * bpb + bit)
            var s = 0.0; var d = 0
            while (d < v.length) { s += p(d) * v(d); d += 1 }
            bucket = (bucket << 1) | (if (s >= 0) 1L else 0L)
            bit += 1
          }
          (band, bucket, id)
        }
      }
    }.toDF("band", "bucket", "id").localCheckpoint() // signatures computed once
    val rhs = sigs.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candIds = sigs.join(rhs, Seq("band", "bucket"))
      .where(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    // verify: re-attach vectors to the candidate ID pairs only
    val vecs = rows.toDF("vid", "v")
    candIds
      .join(vecs, col("id_a") === col("vid")).withColumnRenamed("v", "va").drop("vid")
      .join(vecs, col("id_b") === col("vid")).withColumnRenamed("v", "vb").drop("vid")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Deterministic centroid seed: the first `k` vectors by id. `sort(id).
    * limit(k)` runs as a distributed TakeOrdered (per-partition top-k, tiny
    * merge) — NO global-sort window; the k-row centroid table is a model,
    * so numbering it through one partition is free. */
  def seedCentroids(data: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val firstK = data.select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(k)
    val w = Window.orderBy(col(idCol)) // k rows only — bounded by the model size
    firstK.withColumn("rn", row_number().over(w))
      .select((col("rn") - 1).as("centroid_id"), col(vecCol).as("cvec"))
  }

  /** Assign each row to its nearest centroid — map-side argmax over the
    * broadcast centroid array: ZERO shuffle of the big table (the previous
    * crossJoin×window shape materialized and shuffled N×K rows to compute
    * an argmax). Ties keep the lowest centroid_id (strict `>` compare),
    * matching ORDER BY sim DESC, centroid_id ASC. */
  def ivfAssign(data: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val cents: Array[(Int, Array[Float])] = centroids
      .select(col("centroid_id").cast("int"), col("cvec")).as[(Int, Array[Float])]
      .collect().sortBy(_._1) // the model: K small by construction
    val bc = spark.sparkContext.broadcast(cents)
    val argmaxUdf = udf { (v: Seq[Float]) =>
      val cs = bc.value
      val va = v.toArray
      var best = -1; var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < cs.length) {
        val sim = cosineP(va, cs(i)._2) // same formula/order as `cosine`
        if (sim > bestSim) { bestSim = sim; best = cs(i)._1 }
        i += 1
      }
      best
    }
    data.select(col(idCol), col(vecCol))
      .withColumn("centroid_id", argmaxUdf(col(vecCol)))
  }

  /**
   * Lloyd refinement passes over the seed centroids: map-side assignment
   * (broadcast centroids, zero big-table shuffle) followed by per-
   * (centroid, dimension) means — the only shuffle is the dim-exploded
   * aggregate, whose key space is numCentroids × dim. Means are cast back
   * to float (the vector element type), which also absorbs the last-ulp
   * order dependence of the distributed double sum. Empty clusters keep
   * their previous centroid. Better bucket balance on clustered data than
   * the raw first-k seed (recall note: SURVEY §8).
   */
  def refineCentroids(data: DataFrame, idCol: String, vecCol: String,
                      centroids: DataFrame, iterations: Int = 1): DataFrame = {
    var cents = centroids
    for (_ <- 0 until iterations) {
      val assigned = ivfAssign(data, idCol, vecCol, cents)
      val means = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("__pos", "__val")))
        .groupBy("centroid_id", "__pos")
        .agg(avg(col("__val").cast("double")).as("__m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__pm"))
        .select(col("centroid_id"),
          transform(col("__pm"), e => e.getField("__m").cast("float")).as("__newvec"))
      cents = cents.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"), coalesce(col("__newvec"), col("cvec")).as("cvec"))
        .localCheckpoint() // next iteration / assignment reads the tiny model
    }
    cents
  }

  /** IVF top-k: probe only the nProbe nearest centroid buckets per query.
    * Probes (Q×K rows — two models joined) stay tiny; the candidate scan is
    * bucket-pruned and its top-k goes through the same partial-heap pass as
    * the brute-force path (no per-query reducer funnel).
    * @param refineIterations Lloyd passes over the seed centroids
    *        ([[refineCentroids]]); 0 keeps the raw first-k seed. */
  def ivfTopK(data: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, k: Int, numCentroids: Int, nProbe: Int,
              refineIterations: Int = 0): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val cents0 = seedCentroids(data, idCol, vecCol, numCentroids)
    val cents =
      if (refineIterations > 0)
        refineCentroids(data, idCol, vecCol, cents0, refineIterations)
      else cents0
    val assigned = ivfAssign(data, idCol, vecCol, cents)
    val qProbes = queries.crossJoin(broadcast(cents))
      .withColumn("sim_c", cosine(col("qvec"), col("cvec")))
    val wq = Window.partitionBy("qid").orderBy(desc("sim_c"), col("centroid_id"))
    val probes = qProbes.withColumn("rn", row_number().over(wq)).where(col("rn") <= nProbe)
      .select(col("qid"), col("qvec"), col("centroid_id"))
    val partials = assigned.join(broadcast(probes), Seq("centroid_id"))
      .where(col(idCol) =!= col("qid"))
      .select(col("qid").cast("long"), col(idCol).cast("long"), col(vecCol), col("qvec"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.LongMap.empty[TopKBuf]
        it.foreach { case (qid, id, v, qv) =>
          heaps.getOrElseUpdate(qid, new TopKBuf(k)).add(id, cosineP(v, qv))
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.drain.map { case (id, sim) => (qid, id, sim) }
        }
      }.toDF("qid", "vec_id", "sim")
    finalRank(partials, k).select(col("qid"), col("rank"), col("vec_id"), col("sim"))
  }

  // ---- product quantization (the ANN memory-scale path) --------------------

  /**
   * PQ codebooks: `m` subspaces of `dim/m` dims, `codes` centroids per
   * subspace, seeded from the first `codes` vectors by id (the
   * [[seedCentroids]] rule — deterministic, no RNG). Returned as a model
   * table (subspace, code, cvec) of m·codes rows.
   *
   * Why PQ: at 10^12 embeddings the float vectors are ~0.25 PB — they can't
   * ride candidate scans. Encoded, each vector is `m` small ints; the ADC
   * scan touches original vectors never.
   */
  def pqCodebooks(data: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int, codes: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    seedCentroids(data, idCol, vecCol, codes)
      .select(col("centroid_id").as("code"),
        explode(sequence(lit(0), lit(m - 1))).as("subspace"), col("cvec"))
      .select(col("subspace"), col("code"),
        slice(col("cvec"), col("subspace") * sub + 1, lit(sub)).as("cvec"))
  }

  private def collectCodebooks(cb: DataFrame): Array[Array[Array[Float]]] = {
    val spark = cb.sparkSession
    import spark.implicits._
    val rows = cb.select(col("subspace").cast("int"), col("code").cast("int"),
      col("cvec")).as[(Int, Int, Array[Float])].collect() // model-bounded
    val out = Array.ofDim[Array[Float]](rows.map(_._1).max + 1, rows.map(_._2).max + 1)
    rows.foreach { case (j, c, v) => out(j)(c) = v }
    out
  }

  /**
   * PQ encoding: each vector becomes `m` codes — per subspace the argmin
   * squared-L2 centroid, computed as dot(x,x) − 2·dot(x,c) + dot(c,c) (the
   * expansion the DuckDB oracle evaluates in the identical IEEE order);
   * ties keep the LOWEST code (strict < compare). Map-side over broadcast
   * codebooks — zero shuffle; the output carries (id, codes) only.
   */
  def pqEncode(data: DataFrame, idCol: String, vecCol: String,
               cb: DataFrame): DataFrame = {
    val spark = data.sparkSession
    val bc = spark.sparkContext.broadcast(collectCodebooks(cb))
    val enc = udf { (v: Seq[Float]) =>
      // null vector -> null codes (ADVICE r6: propagate, don't NPE the job)
      if (v == null) null
      else {
      val b = bc.value; val va = v.toArray
      val m = b.length; val sub = va.length / m
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        val xs = java.util.Arrays.copyOfRange(va, j * sub, (j + 1) * sub)
        val dxx = dotP(xs, xs)
        var best = -1; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < b(j).length) {
          val d = dxx - 2.0 * dotP(xs, b(j)(c)) + dotP(b(j)(c), b(j)(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(j) = best; j += 1
      }
      out
      }
    }
    data.select(col(idCol), enc(col(vecCol)).as("codes"))
  }

  /**
   * ADC (asymmetric distance computation) top-k over PQ codes: per query an
   * m×codes lookup table of subvector dot products is built ONCE on the
   * driver (model-sized); every encoded row then costs m table lookups +
   * adds — the original vectors are never touched by the scan. Same
   * partial-heap pass and exact final rank as the brute-force/IVF paths;
   * `sim` is the ADC approximation of dot(q, x), accumulated in ascending
   * subspace order (the oracle's list_reduce order).
   */
  def pqTopK(encoded: DataFrame, idCol: String, queries: DataFrame,
             cb: DataFrame, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val books = collectCodebooks(cb)
    val qs = queries.select(col("qid").cast("long"), col("qvec"))
      .as[(Long, Array[Float])].collect() // queries are a model: broadcast
    val tables = qs.map { case (qid, qv) =>
      val m = books.length; val sub = qv.length / m
      (qid, Array.tabulate(m) { j =>
        val qsv = java.util.Arrays.copyOfRange(qv, j * sub, (j + 1) * sub)
        books(j).map(cv => dotP(qsv, cv))
      })
    }
    val bc = spark.sparkContext.broadcast(tables)
    val partials = encoded.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val ts = bc.value
        val heaps = scala.collection.mutable.LongMap.empty[TopKBuf]
        it.foreach { case (id, codes) =>
          var qi = 0
          while (qi < ts.length) {
            val (qid, t) = ts(qi)
            if (qid != id) {
              var s = 0.0; var j = 0
              while (j < codes.length) { s += t(j)(codes(j)); j += 1 }
              heaps.getOrElseUpdate(qid, new TopKBuf(k)).add(id, s)
            }
            qi += 1
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.drain.map { case (id, s) => (qid, id, s) }
        }
      }.toDF("qid", "vec_id", "sim")
    finalRank(partials, k)
  }
}
