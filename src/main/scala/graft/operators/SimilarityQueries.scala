package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  *  - Brute-force cosine top-k (oracle-checked): the exact baseline.
  *    A small query set crossed with all candidates — the join is a
  *    broadcast of the query side, so the candidate scan stays fully
  *    parallel and nothing funnels through the driver; cost is
  *    O(|Q|·N·d) spread across executors.
  *  - LSH-bucketed variant (rows-only + SimilaritySpec recall check):
  *    the scale path. Random-hyperplane signatures put near vectors in
  *    the same bucket; the search join is then bucket-equi rather than
  *    cross. At 100 TB this is the difference between a shuffled
  *    cartesian and a hash join on a short key.
  *
  * Ranking determinism: rank on (round(cos, 6) DESC, vec_id) so both
  * engines order identically even when cosines differ in the last ulp.
  */
object SimilarityQueries extends QueryModule {

  /** Sequential-order dot product — the native DotProduct expression
    * (whole-stage codegen loop). Same left-to-right accumulation as
    * DuckDB's list_inner_product, so doubles match bit-for-bit.
    * Callers must have run SketchExpressions.register on the session.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.SketchExpressions.dot_product(a, b)

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / sqrt(normA * normB)

  /** Exact top-k neighbors for each query vector (vec_id < nQueries). */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    graft.functions.SketchExpressions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val e = emb.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("v")
    )
    val withNorm = e.withColumn("n2", dot(col("v"), col("v")))
    val q = withNorm
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn"))
    val c = withNorm.select(
      col("vec_id").as("cand_id"),
      col("v").as("cv"),
      col("n2").as("cn")
    )
    val scored = c
      .join(broadcast(q), col("q_id") =!= col("cand_id"))
      .withColumn(
        "cos",
        round(cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6)
      )
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
    scored
      .select(col("q_id"), col("cand_id"), col("cos"), row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Multi-table random-hyperplane LSH: `tables` independent hash
    * tables of `planes` deterministic ±1 hyperplanes each. A vector
    * lands in one bucket per table; the search join is bucket-equi on
    * (table, bucket) and candidates are deduped before exact rescoring
    * — the classic recall fix that keeps the join selective at scale.
    */
  def lshTopK(
      emb: DataFrame,
      nQueries: Int,
      k: Int,
      planes: Int,
      dim: Int,
      numTables: Int = 8
  ): DataFrame = {
    graft.functions.SketchExpressions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val e = emb.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("v")
    )
    // cached for the consuming action (CacheScope releases it): the
    // hyperplane bucket assignment (planes × dim dot products per row)
    // is the expensive part and feeds three consumers — hot-bucket
    // scan, query side, candidate side. All numTables bucket codes
    // come from ONE native expression call per row (HyperplaneBuckets)
    // — the equivalent literal coefficient tree (numTables × planes ×
    // dim lit()s) costs more in codegen compilation than the scan.
    val withBuckets = graft.CacheScope.cached(e
      .withColumn("n2", dot(col("v"), col("v")))
      .select(
        col("vec_id"),
        col("v"),
        col("n2"),
        posexplode(
          graft.functions.SketchExpressions
            .hyperplane_buckets(col("v"), planes, dim, numTables)
        ).as(Seq("tbl", "bucket"))
      ))
    val q = withBuckets
      .filter(col("vec_id") < nQueries)
      .select(
        col("vec_id").as("q_id"),
        col("v").as("qv"),
        col("n2").as("qn"),
        col("tbl"),
        col("bucket")
      )
    // hot-bucket guard: a bucket holding a giant slice of the corpus
    // (e.g. the all-zeros region of a degenerate embedding model) would
    // make the bucket join quadratic; candidates keep numTables-1 other
    // tables, so recall degrades gracefully. The over-cap list is tiny
    // by construction, so it broadcasts.
    val hotBuckets = withBuckets
      .groupBy("tbl", "bucket")
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > MinHashLsh.MaxBucketSize)
      .select(col("tbl"), col("bucket"))
    val c = withBuckets
      .join(broadcast(hotBuckets), Seq("tbl", "bucket"), "left_anti")
      .select(
        col("vec_id").as("cand_id"),
        col("v").as("cv"),
        col("n2").as("cn"),
        col("tbl"),
        col("bucket")
      )
    val scored = c
      .join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("qv"), col("qn"), col("cand_id"), col("cv"), col("cn"))
      .dropDuplicates(Seq("q_id", "cand_id")) // pairs can collide in several tables
      .withColumn(
        "cos",
        round(cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6)
      )
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
    scored
      .select(col("q_id"), col("cand_id"), col("cos"), row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path next to
    * the hyperplane LSH: a small k-means codebook partitions the corpus
    * into `nLists` cells; a query probes only its `nProbe` nearest
    * cells and rescores those candidates exactly. At scale the index
    * build is one narrow pipeline over the corpus (assignment is a
    * broadcast argmin, the codebook update shuffles k×dim cells), and
    * the search join is list-equi instead of cross.
    *
    * Determinism: seed centroids are the evenly-spaced vec_ids, Lloyd
    * updates average in a fixed element order, and every argmin breaks
    * ties on the centroid id — stable across runs and partitionings.
    * The codebook (k×dim doubles) is the only driver-side state, the
    * same footprint any k-means keeps.
    */
  /** The IVF index build shared by the float and SQ8 search paths:
    * deterministic seed codebook, `lloydIters` Lloyd refinements, and
    * the final cell assignment. Returns (centroids, inverted lists,
    * cached normed corpus). Only the k×dim codebook ever reaches the
    * driver — assignment and refinement are fully distributed.
    */
  private def ivfIndex(
      emb: DataFrame,
      nLists: Int,
      lloydIters: Int
  ): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.SketchExpressions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val s = emb.sparkSession
    // cached: the normed corpus feeds the codebook seed, every Lloyd
    // iteration, the final assignment, and the probe side; released by
    // the consuming action's CacheScope
    val e = graft.CacheScope.cached(emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", dot(col("v"), col("v"))))
    val n = e.count()
    val step = math.max(1L, n / nLists)

    def centroidDf(cents: Seq[(Int, Seq[Double])]): DataFrame = {
      import s.implicits._
      cents.toDF("list_id", "cv").withColumn("cn2", dot(col("cv"), col("cv")))
    }

    /** nearest-centroid assignment: broadcast codebook, argmin of
      * squared euclidean, ties to the lower list id
      */
    def assign(df: DataFrame, cents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("list_id"))
      df.crossJoin(broadcast(cents))
        .withColumn("dist2", col("n2") - lit(2.0) * dot(col("v"), col("cv")) + col("cn2"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn", "dist2", "cv", "cn2")
    }

    // seed codebook: evenly-spaced vec_ids
    var codebook = e
      .filter(pmod(col("vec_id"), lit(step)) === 0)
      .orderBy(col("vec_id"))
      .limit(nLists)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](r.fieldIndex("v"))) }
      .toSeq
    // Lloyd iterations: elementwise mean per cell via posexplode —
    // the shuffle is k×dim cells, independent of corpus size
    for (_ <- 1 to lloydIters) {
      val assigned = assign(e, centroidDf(codebook))
      codebook = assigned
        .select(col("list_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("list_id"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("list_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("list_id"), col("pm.m").as("cv"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .toSeq
        .sortBy(_._1)
    }

    val cents = centroidDf(codebook)
    val lists = assign(e, cents) // (vec_id, v, n2, list_id)
    (cents, lists, e)
  }

  def ivfTopK(
      emb: DataFrame,
      nQueries: Int,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 2
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cents, lists, e) = ivfIndex(emb, nLists, lloydIters)
    // each query probes its nProbe nearest cells
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("dist2"), col("list_id"))
    val probes = e
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("dist2", col("qn") - lit(2.0) * dot(col("qv"), col("cv")) + col("cn2"))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nProbe)
      .select(col("q_id"), col("qv"), col("qn"), col("list_id"))
    val scored = lists
      .join(probes, "list_id")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", round(cosine(col("qv"), col("v"), col("qn"), col("n2")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .select(col("q_id"), col("vec_id").as("cand_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Symmetric per-vector int8 scalar quantization (the SQ8 scheme of
    * Faiss's scalar quantizer; the standard embedding-compression
    * step): scale = max|v| / 127, code_i = round(v_i / scale),
    * dequant = code * scale. At 100 TB this is the 4× shuffle/IO
    * reduction that makes vector search affordable — codes travel,
    * floats stay at rest. Every step is IEEE double arithmetic plus
    * ties-away-from-zero rounding, both bit-identical across engines,
    * so unlike the float sketches this operator is EXACTLY
    * oracle-checkable.
    */
  def sq8Quantize(emb: DataFrame): DataFrame = {
    val e = emb.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("v")
    )
    e.withColumn("max_abs", array_max(transform(col("v"), x => abs(x))))
      .withColumn("scale",
        when(col("max_abs") > 0, col("max_abs") / lit(127.0))
          .otherwise(lit(0.0)))
      .withColumn("qvec",
        when(col("max_abs") > 0,
          transform(col("v"), x => round(x / col("scale"), 0).cast("int")))
          .otherwise(transform(col("v"), _ => lit(0))))
  }

  /** Top-k cosine over the QUANTIZED codes: every product and partial
    * sum of an int8 dot is an exact integer far below 2^53, so the
    * scores are order-independent and engine-exact — the quantized
    * ANN ranks identically in Spark and DuckDB and gets a real hash
    * oracle. Like the brute-force baseline the search side is a
    * broadcast cross of a small query set (the scale path composes
    * these codes with the LSH/IVF bucket joins — the codes ride the
    * same equi-join keys at a quarter of the payload).
    */
  def sq8TopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    graft.functions.SketchExpressions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val qd = sq8Quantize(emb)
      .select(col("vec_id"),
        transform(col("qvec"), c => c.cast("double")).as("qv"))
    val withNorm = qd.withColumn("qn", dot(col("qv"), col("qv")))
    val q = withNorm
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("a"), col("qn").as("an"))
    val c = withNorm.select(
      col("vec_id").as("cand_id"), col("qv").as("b"), col("qn").as("bn"))
    val scored = c
      .join(broadcast(q), col("q_id") =!= col("cand_id"))
      .withColumn("qcos",
        round(dot(col("a"), col("b")) / sqrt(col("an") * col("bn")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("cand_id"))
    scored
      .select(col("q_id"), col("cand_id"), col("qcos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** IVF-SQ8 composite (the Faiss IVFScalarQuantizer layout): the
    * coarse quantizer (centroid probe) runs in float, but the inverted
    * lists carry only the int8 codes — at 100 TB the scan payload of
    * the probed cells is a quarter of the float index, which is the
    * whole point of the composite. Scoring is cosine over codes with
    * deterministic tie-breaks; the scale factor cancels out of cosine
    * up to rounding, so recall tracks the float IVF's.
    */
  def ivfSq8TopK(
      emb: DataFrame,
      nQueries: Int,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cents, lists0, e) = ivfIndex(emb, nLists, 2)
    // codes derived per-row from the stored floats (index build time);
    // the search never touches v again
    def codes(vcol: Column): Column = {
      val ma = array_max(transform(vcol, x => abs(x)))
      when(ma > 0,
        transform(vcol, x => round(x / (ma / lit(127.0)), 0)))
        .otherwise(transform(vcol, _ => lit(0.0)))
    }
    val lists = lists0
      .withColumn("cb", codes(col("v")))
      .withColumn("cbn", dot(col("cb"), col("cb")))
      .select(col("list_id"), col("vec_id"), col("cb"), col("cbn"))
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("dist2"), col("list_id"))
    val probes = e
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("dist2", col("qn") - lit(2.0) * dot(col("qv"), col("cv")) + col("cn2"))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nProbe)
      .select(col("q_id"), codes(col("qv")).as("qa"),
        col("list_id"))
      .withColumn("qan", dot(col("qa"), col("qa")))
    val scored = lists
      .join(probes, "list_id")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("qcos",
        round(dot(col("qa"), col("cb")) / sqrt(col("qan") * col("cbn")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("vec_id"))
    scored
      .select(col("q_id"), col("vec_id").as("cand_id"), col("qcos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_ann_brute_force",
      (s, dir) => bruteForceTopK(tables(s, dir).embeddings, 10, 5),
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                          list_inner_product(embedding::DOUBLE[],
                                             embedding::DOUBLE[]) AS n2
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
                 round(list_inner_product(q.v, c.v) / sqrt(q.n2 * c.n2), 6) AS cos
          FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id != q.vec_id
        )
        SELECT q_id, cand_id, cos, rnk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, cand_id) AS INT) AS rnk
          FROM scored)
        WHERE rnk <= 5
      """)
    ),
    QueryDef(
      "q_ann_lsh",
      (s, dir) => lshTopK(tables(s, dir).embeddings, 10, 5, 4, 64),
      None
    ),
    QueryDef(
      "q_ann_ivf",
      (s, dir) => ivfTopK(tables(s, dir).embeddings, 10, 5),
      None // probabilistic recall — spec-checked against brute force
    ),
    QueryDef(
      "q_ann_ivf_sq8",
      (s, dir) => ivfSq8TopK(tables(s, dir).embeddings, 10, 5),
      None // probabilistic recall — spec-checked against brute force
    ),
    // Per-vector int8 quantization summary: the scale factor plus three
    // engine-exact digests of the code vector (integer checksum,
    // saturated-code count, max reconstruction error). The codes
    // themselves are compared via qsum — an order-independent integer.
    QueryDef(
      "q_embed_quantize_sq8",
      (s, dir) => {
        val qd = sq8Quantize(tables(s, dir).embeddings)
        qd.select(
          col("vec_id"),
          col("scale"),
          aggregate(col("qvec"), lit(0L), (acc, x) => acc + x).as("qsum"),
          size(filter(col("qvec"), c => abs(c) === 127)).cast("long").as("n_sat"),
          round(
            when(col("max_abs") > 0,
              array_max(transform(col("v"),
                x => abs(x - round(x / col("scale"), 0) * col("scale")))))
              .otherwise(lit(0.0)),
            9).as("max_abs_err")
        )
      },
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        s AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS max_abs
          FROM e
        )
        SELECT vec_id,
               CASE WHEN max_abs > 0 THEN max_abs / 127.0 ELSE 0.0 END AS scale,
               CAST(list_sum(CASE WHEN max_abs > 0
                    THEN list_transform(v, x ->
                         CAST(round(x / (max_abs / 127.0), 0) AS INTEGER))
                    ELSE list_transform(v, x -> 0) END) AS BIGINT) AS qsum,
               CAST(len(list_filter(CASE WHEN max_abs > 0
                    THEN list_transform(v, x ->
                         CAST(round(x / (max_abs / 127.0), 0) AS INTEGER))
                    ELSE list_transform(v, x -> 0) END,
                    c -> abs(c) = 127)) AS BIGINT) AS n_sat,
               round(CASE WHEN max_abs > 0
                    THEN list_max(list_transform(v, x ->
                         abs(x - round(x / (max_abs / 127.0), 0)
                                 * (max_abs / 127.0))))
                    ELSE 0.0 END, 9) AS max_abs_err
        FROM s
      """)
    ),
    // Quantized ANN: top-k cosine over the int8 codes — exact hash
    // oracle (integer dots are engine-exact), unlike the float-sketch
    // ANN variants which are recall-gated instead.
    QueryDef(
      "q_ann_sq8",
      (s, dir) => sq8TopK(tables(s, dir).embeddings, 10, 5),
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        s AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS max_abs
          FROM e
        ),
        qd AS (
          SELECT vec_id,
                 CASE WHEN max_abs > 0
                      THEN list_transform(v, x -> CAST(CAST(
                           round(x / (max_abs / 127.0), 0) AS INTEGER) AS DOUBLE))
                      ELSE list_transform(v, x -> 0.0) END AS qv
          FROM s
        ),
        n AS (SELECT vec_id, qv, list_inner_product(qv, qv) AS qn FROM qd),
        scored AS (
          SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
                 round(list_inner_product(q.qv, c.qv) / sqrt(q.qn * c.qn), 6) AS qcos
          FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id != q.vec_id
        )
        SELECT q_id, cand_id, qcos, rnk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY q_id
                         ORDER BY qcos DESC, cand_id) AS INT) AS rnk
          FROM scored)
        WHERE rnk <= 5
      """)
    )
  )
}
