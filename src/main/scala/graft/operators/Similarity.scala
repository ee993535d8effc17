package graft.operators

import graft.Ckpt.PinOps
import org.apache.spark.sql.{Column, DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  *  - `bruteForceTopK` is the exact baseline: query-set × corpus join with
  *    codegen'd cosine, per-query top-k via window rank. Cost |Q|·|C| —
  *    fine for small query sets, the correctness oracle for ANN variants.
  *  - `lshTopK` is the scale path: random-hyperplane LSH buckets both sides
  *    so the join is an equi-join on bucket id (shuffle on a compact key,
  *    candidate count ≈ |Q|·|C|/2^bits per probe), then exact cosine rescores
  *    within buckets. Hyperplanes are seeded constants ⇒ fully deterministic.
  */
object Similarity {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** The embeddings table under the zero-norm exclusion contract (found by
    * the extreme-values tier): a zero-norm vector has no direction, so
    * cosine against it is 0/0 — which DuckDB's list_cosine_similarity
    * special-cases to -1.0 while Spark's dot/(‖a‖‖b‖) throws DIVIDE_BY_ZERO
    * under this build's ANSI default (even for doubles). One all-zero
    * embedding at 100 TB — an empty input to the encoder — would kill the
    * whole search job. Every similarity operator therefore excludes
    * zero-norm rows AT THE SOURCE, and every oracle carries the same guard
    * ([[graft.Registry]] `guardVec`). The predicate is an exact
    * component-wise comparison (not `norm > 0`) so float-squaring
    * underflow cannot diverge from the oracle's double-precision filter. */
  private[graft] def vectors(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").filter(exists(col("embedding"), _ =!= lit(0.0f)))

  private[graft] val Dim = 64
  private[graft] val LshBits = 6

  /** The Lloyd/PQ nearest-cell assignment as ONE stable-shaped codegen
    * kernel ([[graft.functions.PqArgminCells]]) instead of per-centroid
    * literal dot expressions. Bit-identical argmin (the kernel's scaladoc
    * carries the equivalence argument; SimilaritySpec asserts it
    * element-wise against the literal composition), but the codebook rides
    * a runtime reference object, so the generated source — and its janino
    * compilation — is shared across training iterations and the corpus
    * encode rather than recompiled per iteration (r16 optimization round). */
  private def cellsFast(
      books: Array[Array[Array[Double]]], v: Column,
      sub: Int, strictLen: Boolean): Column =
    GraftShim.column(graft.functions.PqArgminCells(
      GraftShim.expression(v),
      books.map(_.map(_.toVector).toVector).toVector, sub, strictLen))

  /** Exact top-k neighbors for query vectors (vec_id < 10), ranked on
    * rounded cosine with id tie-break for cross-engine determinism. */
  def bruteForceTopK(s: SparkSession, d: String): DataFrame = {
    val e = vectors(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        normFast(col("embedding")).as("qn"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      normFast(col("embedding")).as("cn"))
    val scored = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("cos",
        round(dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("q_id", "c_id", "cos", "rk")
      .orderBy("q_id", "rk")
  }

  /** Deterministic ±1 hyperplane entry, ENGINE-PORTABLE: (p, j) is +1 iff
    * the first hex digit of md5("p:j") is ≥ 8 (digest top bit set). DuckDB
    * re-derives the identical sign — `strpos('89abcdef',
    * substr(md5(p||':'||j), 1, 1)) > 0` — which is what gives ss2 a full
    * oracle: the projection Σ ±x_j is a sequential double sum on both
    * engines ([[graft.functions.FloatVectorDot]]'s accumulation order ≡ an
    * unrolled left-associated `+` chain), so bucket assignment is
    * bit-exact cross-engine. */
  private[graft] def lshPlaneSign(p: Int, j: Int): Float = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 0xf) >= 8) 1.0f else -1.0f
  }

  /** The hyperplanes as literal ±1 arrays ([[lshPlaneSign]] entries), so
    * the bucketing expression is constant-folded into the scan. */
  private def planes(nPlanes: Int): Seq[Column] =
    (0 until nPlanes).map { p =>
      array((0 until Dim).map(j => lit(lshPlaneSign(p, j))): _*)
    }

  private def bucketOf(v: Column, ps: Seq[Column]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      when(dotFast(v, p) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via sign-LSH bucketing ([[LshBits]] hyperplanes → 64 buckets)
    * with multi-probe: each query also probes every 1-bit-flipped bucket
    * (the standard recall/cost knob — candidates ≈ (1+bits)·n/2^bits per
    * query), then exact cosine rescores the DISTINCT candidate set (a
    * candidate reachable through several probe buckets scores once, which
    * also makes the rank deterministic). The md5-derived hyperplanes
    * ([[lshPlaneSign]]) make the ENTIRE pipeline — buckets, probes,
    * candidates, ss1-style round-6 cosine, top-k — re-derivable in DuckDB,
    * so ss2 carries a full hash-checked oracle; recall vs brute force
    * stays a SimilaritySpec property (approximate by design). */
  def lshTopK(s: SparkSession, d: String): DataFrame = {
    val ps = planes(LshBits)
    val e = vectors(s, d)
    val withBucket = e.withColumn("bucket", bucketOf(col("embedding"), ps))
    val probeCols = lit(0L) +: (0 until LshBits).map(i => lit(1L << i))
    val q = withBucket.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("bucket"))
      .withColumn("bucket", explode(array(probeCols.map(col("bucket").bitwiseXOR(_)): _*)))
    val c = withBucket.select(col("vec_id").as("c_id"), col("bucket"))
    val cand = q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id").distinct()
    val qv = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        normFast(col("embedding")).as("qn"))
    val cv = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      normFast(col("embedding")).as("cn"))
    val scored = cand.join(broadcast(qv), "q_id").join(cv, "c_id")
      .withColumn("cos",
        round(dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("q_id", "c_id", "cos", "rk")
      .orderBy("q_id", "rk")
  }

  /** Genuine IVF: deterministic Lloyd k-means builds the coarse quantizer,
    * then queries probe their `nprobe` nearest cells and rescore exactly.
    *
    * Scale shape: each Lloyd iteration is one distributed pass — cell
    * assignment is a codegen'd argmin over k centroid literals (narrow
    * map), the per-dimension means are one (cell, dim)-keyed aggregation,
    * and ONLY the k×dim centroid table crosses to the driver (metadata
    * scale; the same loop structure MLlib's KMeans uses). The corpus never
    * collects. Search is the IVF shape: candidates come from an equi-join
    * on cell id, so each query scans ~nprobe/k of the corpus.
    *
    * Determinism AND portability: seeds are the k lowest vec_ids, argmin
    * ties break on cell id via struct ordering, and centroid means come
    * from scaled-integer fixed point (the gr1-proven pattern): each
    * coordinate is quantized to round(x·10⁹) BIGINT, summed exactly
    * (order-independent, unlike float avg()), and the mean is re-derived
    * driver-side with a fixed IEEE op sequence — so the centroids, and
    * every assignment derived from them, are bit-stable across runs,
    * partitionings AND engines. That last property is what gives ss4 a
    * FULL DuckDB oracle (Registry.ss4OracleSql): the whole 3-iteration
    * Lloyd loop unrolls as chained CTEs, every arithmetic step
    * reproducible bit-for-bit (float→double casts exact, left-associated
    * double dot = FloatVectorDot's accumulation order, exact integer
    * means). Recall vs brute force stays a SimilaritySpec property
    * (approximate by design — the oracle checks the pipeline, not ANN
    * quality). */
  def ivfKMeansTopK(
      s: SparkSession, d: String,
      k: Int = 8, iters: Int = 3, nprobe: Int = 2): DataFrame = {
    val e = vectors(s, d)
      .select(col("vec_id"), col("embedding"))
      .pinLazy() // reused by every Lloyd pass + the final search
    def centLit(c: Array[Double]): Column = array(c.map(x => lit(x.toFloat)): _*)
    // argmin_c |x-c|^2 = argmin_c (|c|^2 - 2 x·c): one codegen'd dot per
    // centroid, ties broken by cell id through struct ordering
    def distCells(cents: Array[Array[Double]], v: Column): Seq[Column] =
      cents.zipWithIndex.toSeq.map { case (c, i) =>
        struct(
          (lit(c.map(x => x * x).sum) - lit(2.0) * dotFast(v, centLit(c))).as("d"),
          lit(i).as("cell"))
      }
    // seeds: the k lowest vec_ids actually present (not `vec_id < k`, which
    // silently under-seeds a corpus with sparse or shifted ids)
    var cents: Array[Array[Double]] = e.orderBy("vec_id").limit(k)
      .collect().map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    // loud degenerate-input contract (the pqTopK/pageRank convention):
    // training a quantizer on nothing would otherwise die deep inside the
    // cell expression with an unhelpful analysis error
    require(cents.nonEmpty, "ivfKMeansTopK needs a non-empty embeddings corpus")
    for (_ <- 0 until iters) {
      // stable-shaped assignment kernel (see cellsFast): whole-vector dot
      // against 64-wide centroids, so validity is n == Dim (strictLen) —
      // the literal form's dot length-mismatch semantics
      val means = e
        .withColumn("cell",
          element_at(cellsFast(Array(cents), col("embedding"), Dim, strictLen = true), 1))
        .select(col("cell"), posexplode(col("embedding")))
        .toDF("cell", "pos", "x")
        // scaled-integer accumulation, not avg(float): quantize each
        // coordinate to round(x·10⁹) and sum EXACTLY (decimal(38,0) —
        // long sums could overflow at corpus scale), so the sum is
        // independent of partition/merge order AND engine — float avg()
        // could straddle the 1e-6 rounding boundary below, and decimal
        // DIVISION rounding rules differ across engines. The mean itself
        // is re-derived below with a fixed IEEE double op sequence that
        // the DuckDB oracle mirrors verbatim.
        .groupBy("cell", "pos")
        .agg(
          sum(floor(col("x").cast("double") * lit(1e9) + lit(0.5))
            .cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("cnt"))
        .collect() // k×dim rows — metadata scale
      val next = cents.clone()
      means.groupBy(_.getAs[Int]("cell")).foreach { case (cell, rows) =>
        val c = new Array[Double](Dim)
        rows.foreach { r =>
          // EXACT integer → double (correctly rounded), then the fixed op
          // sequence the oracle replays: /cnt, /1e9, ·1e6, +0.5, floor, /1e6
          val m = r.getAs[java.math.BigDecimal]("s").doubleValue /
            r.getAs[Long]("cnt").toDouble / 1e9
          c(r.getAs[Int]("pos")) = math.floor(m * 1e6 + 0.5) / 1e6
        }
        next(cell) = c
      }
      cents = next
    }

    val c = e
      // same kernel as training: identical generated source → the corpus
      // assignment reuses the training pass's compiled stage
      .withColumn("cell",
        element_at(cellsFast(Array(cents), col("embedding"), Dim, strictLen = true), 1))
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"), col("cell"),
        normFast(col("embedding")).as("cn"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        normFast(col("embedding")).as("qn"),
        explode(slice(array_sort(array(distCells(cents, col("embedding")): _*)), 1, nprobe)
          .getField("cell")).as("cell"))
    val scored = q.join(c, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        round(dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("cell").cast("long").as("cell"), col("c_id"), col("cos"), col("rk"))
      .orderBy("q_id", "rk")
  }

  /** Build the IVF index as a PERSISTED cell-partitioned parquet layout —
    * the build-once / probe-many serving shape. Each cell is a `cell=N`
    * directory, norms precomputed at build time, so probes never touch
    * other cells' bytes. At 100 TB the index build is one partitioned
    * write; probes are metadata-pruned scans of ~nprobe/k of the data. */
  def buildIvfIndex(embeddings: DataFrame, outDir: String): Unit = {
    // loud degenerate-input contract (the pqTopK/pageRank convention): an
    // empty build writes NO files, and the later probe's schema inference
    // would die with an unrelated-looking error
    require(!embeddings.isEmpty, "buildIvfIndex needs a non-empty embeddings corpus")
    embeddings
      .select(col("vec_id"), col("embedding"),
        normFast(col("embedding")).as("n"), col("label").cast("int").as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(outDir)
  }

  /** Probe the persisted index with a query relation. The probe joins the
    * index on `cell` against the (small, broadcast) query set, which
    * triggers DYNAMIC PARTITION PRUNING: Spark computes the query cells at
    * runtime and prunes the index scan to those `cell=` directories before
    * reading them (plan-asserted in SimilaritySpec) — no manual cell-list
    * plumbing, and the same plan at any index size. */
  def probeIvfIndex(s: SparkSession, indexDir: String, queries: DataFrame, k: Int = 5): DataFrame = {
    val idx = s.read.parquet(indexDir)
    val q = queries.select(
      col("vec_id").as("q_id"), col("embedding").as("qv"),
      col("label").cast("int").as("cell"), normFast(col("embedding")).as("qn"))
    val scored = idx.join(broadcast(q), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos",
        round(dotFast(col("qv"), col("embedding")) / (col("qn") * col("n")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cell").cast("long").as("cell"),
        col("vec_id").as("c_id"), col("cos"), col("rk"))
      .orderBy("q_id", "rk")
  }

  /** Registry query (ss5): the full persisted-index lifecycle in one
    * relation — build the cell-partitioned index into a fresh temp
    * directory, then probe it. Cells equal `label` and scoring matches
    * [[ivfTopK]] exactly, so the probe result is byte-identical to ss3's
    * and shares its DuckDB oracle: the dynamic-partition-pruned path gets
    * a hash-checked CORRECTNESS row, not just a plan test. */
  def persistedIvfTopK(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-ss5")
      .resolve("idx").toString
    val e = vectors(s, d)
    buildIvfIndex(e, dir)
    probeIvfIndex(s, dir, e.filter(col("vec_id") < 10))
  }

  /** Product-quantization ANN (ss6): the compressed-domain scale path.
    * The 64-dim float vector (256 B) is quantized to `m` = 8 sub-codes of
    * 4 bits (one byte-array column, 32× smaller), and candidate generation
    * scans ONLY the code table with per-query lookup tables — at 100 TB
    * the raw embedding column is touched just twice (codebook training and
    * the final shortlist rescore of |Q|·shortlist rows), while the
    * brute-force part of the search runs over a relation 32× narrower
    * than the corpus.
    *
    * Training is one distributed pass per Lloyd iteration for ALL
    * subspaces at once: posexplode puts every (dim, value) on its own row,
    * `pos div sub` recovers the subspace, and the (subspace, cell, dim)
    * means come back at metadata scale (m·ksub·sub = 1024 rows). The same
    * determinism-and-portability contract as [[ivfKMeansTopK]]:
    * lowest-vec_id seeds, scaled-integer exact means rounded to 1e-6,
    * argmin ties on cell id — so codes, shortlists, and results are
    * bit-stable across runs, partitionings and engines, which is what
    * gives ss6 a FULL DuckDB oracle (Registry.ss6OracleSql) covering
    * training, encode, ADC shortlist and rescore end to end.
    *
    * Search: asymmetric distance (ADC). Each query precomputes, per
    * subspace, the dot of its sub-vector with every centroid (plus the
    * centroid norm table, a query-independent literal), so approximate
    * cosine is 8 array lookups per candidate — no vector math on the
    * corpus side. The ADC shortlist (top `shortlist` per query) is then
    * rescored EXACTLY against the raw embeddings and the top k of that is
    * returned. Recall floors stay in SimilaritySpec (approximate by
    * design — the oracle checks the pipeline, not ANN quality). */
  def pqTopK(
      s: SparkSession, d: String,
      m: Int = 8, ksub: Int = 16, iters: Int = 2, shortlist: Int = 40): DataFrame =
    pqTopKOf(vectors(s, d).select(col("vec_id"), col("embedding")),
      m, ksub, iters, shortlist)

  /** [[pqTopK]] over an explicit (vec_id, embedding) relation — the
    * testable core (SimilaritySpec drives it with a corpus smaller than
    * `ksub` to pin the seed-clamp behavior). */
  private[graft] def pqTopKOf(
      corpus: DataFrame,
      m: Int, ksub: Int, iters: Int, shortlist: Int): DataFrame = {
    val sub = Dim / m
    val e = corpus
      .pinLazy() // reused: training passes, encode, rescore
    def subvec(v: Column, j: Int): Column = slice(v, j * sub + 1, sub)
    def centLit(c: Array[Double]): Column = array(c.map(x => lit(x.toFloat)): _*)

    // Codebooks train on a deterministic hash-style sample (~4k vectors,
    // all of a small corpus) — the standard PQ recipe: codebook quality
    // needs a representative subset, not the corpus, and at 100 TB a
    // full-corpus Lloyd pass per iteration would dominate the build.
    val sampleMod = math.max(1L, e.count() / 4096)
    val train = e.filter(col("vec_id") % sampleMod === 0).pinLazy()

    // seeds: sub-vectors of the ksub lowest vec_ids, per subspace. ksub is
    // clamped to the vectors actually available — a tiny corpus (or a
    // sparse hash sample) must shrink the codebook, not throw on
    // seedRows(i); fewer cells only coarsens the quantizer
    val seedRows = train.orderBy("vec_id").limit(ksub)
      .collect().map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    require(seedRows.nonEmpty, "pqTopK needs a non-empty embeddings corpus")
    val kEff = math.min(ksub, seedRows.length)
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m, kEff)((j, i) => seedRows(i).slice(j * sub, (j + 1) * sub))
    for (_ <- 0 until iters) {
      // all-subspace assignment in the stable-shaped kernel: one compiled
      // stage shared by every iteration AND the final encode (cellsFast)
      val cells = cellsFast(books, col("embedding"), sub, strictLen = false)
      // assignments MATERIALIZE before the dimension explode: left inline,
      // CollapseProject folds the all-subspace `cells` kernel into the
      // post-explode projection and re-evaluates it per exploded dimension
      // (64× per vector — measured 31 s vs 1.4 s per pass at sf0.1 on the
      // old literal form; the same re-evaluation trap as
      // TextAnalysis.bigramStream's re-split)
      val assigned = train
        .select(col("embedding"), cells.as("cells"))
        .pinLazy() // severs the plan; materializes in the collect below
      val means = assigned
        .select(col("cells"), posexplode(col("embedding")))
        .toDF("cells", "pos", "x")
        .withColumn("j", expr(s"pos div $sub"))
        .select(col("j"), col("pos"),
          element_at(col("cells"), col("j").cast("int") + 1).as("cell"), col("x"))
        .groupBy("j", "cell", "pos")
        // same scaled-integer portable means as ivfKMeansTopK: exact
        // order-independent integer sums, mean re-derived with a fixed
        // IEEE op sequence the ss6 oracle replays verbatim
        .agg(
          sum(floor(col("x").cast("double") * lit(1e9) + lit(0.5))
            .cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("cnt"))
        .collect() // m·ksub·sub rows — metadata scale
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        val mv = r.getAs[java.math.BigDecimal]("s").doubleValue /
          r.getAs[Long]("cnt").toDouble / 1e9
        // `div` yields LONG regardless of operand width
        next(r.getAs[Long]("j").toInt)(r.getAs[Int]("cell"))(r.getAs[Int]("pos") % sub) =
          math.floor(mv * 1e6 + 0.5) / 1e6
      }
      books = next
    }

    // encode the corpus ONCE into the compact code table (8 small ints per
    // vector — the 32×-compressed relation everything downstream scans);
    // materialized so the candidate join starts from stored codes, not a
    // re-encode under the join
    val codes = e.select(col("vec_id").as("c_id"),
      cellsFast(books, col("embedding"), sub, strictLen = false).as("codes"))
      .pinLazy() // severed plan; blocks land on the first scan
    // centroid squared-norm tables (query-independent literals)
    val normLut: Seq[Column] =
      (0 until m).map(j => array(books(j).map(c => lit(c.map(x => x * x).sum)): _*))
    val q = (0 until m).foldLeft(
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
          normFast(col("embedding")).as("qn"))) { (df, j) =>
      df.withColumn(s"lut$j",
        array(books(j).map(c => dotFast(subvec(col("qv"), j), centLit(c))): _*))
    }
    val adc = (0 until m).map(j =>
      element_at(col(s"lut$j"), element_at(col("codes"), j + 1) + 1)).reduce(_ + _)
    // reconstructed candidate norm, also a pure code lookup
    val approx = adc / (col("qn") * sqrt((0 until m).map(j =>
      element_at(normLut(j), element_at(col("codes"), j + 1) + 1)).reduce(_ + _)))
    val wA = Window.partitionBy("q_id").orderBy(col("approx").desc, col("c_id"))
    val short = broadcast(q).join(codes, col("q_id") =!= col("c_id"))
      .withColumn("approx", approx)
      .withColumn("ark", row_number().over(wA))
      .filter(col("ark") <= shortlist)
      .select("q_id", "qv", "qn", "c_id")
    // exact rescore of the shortlist only — the shared rescore stage
    rescoreTopK(e, short.select("q_id", "c_id"))
  }

  /** Exact cosine top-k over an explicit (q_id, c_id) candidate relation —
    * the rescore stage every sketch-based ANN variant ends in (the PQ ADC
    * shortlist feeds it directly above; LSH/IVF use the same join→cosine→
    * rank shape inline). Only candidates pay the raw-vector join, so cost
    * is |candidates|, not |Q|·|C|. Registered standalone as ss7 over a
    * deterministic candidate rule so the exact stage carries its own
    * hash-checked CORRECTNESS row, isolating sketch recall (measured in
    * SimilaritySpec) from rescore math (oracle-exact). */
  def rescoreTopK(e: DataFrame, candidates: DataFrame, k: Int = 5): DataFrame = {
    val q = e.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
      normFast(col("embedding")).as("qn"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
      normFast(col("embedding")).as("cn"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    // candidate side BROADCAST into the corpus join (r15 opt round): the
    // candidate list is |Q|·shortlist rows by construction — without the
    // hint the planner has no stats on the derived side and sort-merges,
    // shuffling the ENTIRE raw-vector corpus to meet a few hundred rows
    // (guide §3.1: hint when you know a side is small and estimates don't)
    broadcast(candidates.join(broadcast(q), "q_id")).join(c, "c_id")
      .withColumn("cos",
        round(dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "c_id", "cos", "rk")
      .orderBy("q_id", "rk")
  }

  /** ss7: [[rescoreTopK]] on a FIXED deterministic candidate set (every
    * 17th vector, offset 3 — standing in for a sketch shortlist, but
    * expressible identically in ANSI SQL). The oracle hash-checks the exact
    * stage end to end: candidate join, float dot/norm, 1e-6 rounding, rank
    * tie-break. */
  def fixedCandidateRescore(s: SparkSession, d: String): DataFrame = {
    val e = vectors(s, d)
    val cands = broadcast(e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id")))
      .crossJoin(e.filter(col("vec_id") % 17 === 3).select(col("vec_id").as("c_id")))
      .filter(col("q_id") =!= col("c_id"))
    rescoreTopK(e, cands)
  }

  /** IVF-style variant: coarse partitions from label (stand-in for k-means
    * cell ids at scale), search restricted to the query's cell. Demonstrates
    * the partition-pruned ANN shape: the corpus is clustered/bucketed once,
    * queries only scan their cell. */
  def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val e = vectors(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("label"),
        normFast(col("embedding")).as("qn"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"), col("label"),
      normFast(col("embedding")).as("cn"))
    val scored = q.join(c, Seq("label"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        round(dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("label").cast("long").as("cell"), col("c_id"), col("cos"), col("rk"))
      .orderBy("q_id", "rk")
  }
}
