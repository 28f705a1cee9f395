package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float>, label) — the LLM-pipeline ANN operator
  * set. No reference counterpart (arthur-redshift-etl stops at SQL
  * transforms); built Spark-first:
  *
  *  - brute-force cosine top-k: the exact baseline. Query vectors are
  *    a broadcast; the scan over the corpus is embarrassingly
  *    parallel (per-row zip_with/aggregate fold, whole-stage codegen,
  *    no shuffle until the tiny per-query top-k).
  *  - random-hyperplane LSH: the scale path. Vectors bucket by the
  *    sign pattern of `LshPlanes` hyperplane dot products; candidates
  *    come from a bucket equi-join and only candidates are scored
  *    exactly — same banded shape as the minhash/simhash joins. At
  *    billions of vectors, add more planes (bucket count 2^planes)
  *    and multi-probe neighboring buckets for recall.
  *
  * Determinism across engines: element arithmetic is float→double
  * (exact), folds run left-to-right in both engines, and hyperplane
  * components derive from md5 — no RNG, no engine-specific seeds.
  */
object AnnOps {

  val Dim = 64
  val TopK = 3
  val NumQueries = 5    // query set: vec_id < 5
  val LshPlanes = 6     // 2^6 = 64 buckets

  /** Cosine similarity between two float-array columns, computed as
    * sequential double folds (deterministic in both engines). */
  private def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String): String =
      s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) FOR i IN range(1, ${Dim + 1})])"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  // ------------------------------------------------------ brute force
  /** Exact top-k nearest neighbors by cosine for each query vector.
    * Plan: broadcast the query set against the corpus scan (no
    * shuffle for scoring), then a per-query top-k window over
    * #queries partitions. At scale replace the final window with
    * per-partition partial top-k + merge (TakeOrdered shape). */
  def annTopkCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val queries = vecs.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val scored = vecs.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosine($"q_emb", $"embedding").as("cosine"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  val annTopkCosineSql: String =
    s"""WITH queries AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < $NumQueries
       |), scored AS (
       |  SELECT q.query_id, v.vec_id AS neighbor_id,
       |    ${cosineSql("q.q_emb", "v.embedding")} AS cosine
       |  FROM embeddings v JOIN queries q ON v.vec_id <> q.query_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------------ LSH buckets
  /** Hyperplane component (plane p, dim i): a deterministic
    * pseudo-random value in [-499.5, 499.5] derived from md5 — both
    * engines compute the identical hyperplanes with no RNG. */
  /** Hyperplane components are md5-derived CONSTANTS — computed once
    * on the driver and embedded as array literals, so the per-row
    * bucket fold does zero hashing. The oracle recomputes the same
    * md5 formula in SQL; the values agree by construction. */
  private def hpComponentValue(p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hexStr = md.digest(s"hp_${p}_$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    (java.lang.Long.parseLong(hexStr, 16) % 1000).toDouble - 499.5
  }

  private def hyperplane(p: Int): Seq[Double] =
    (0 until Dim).map(i => hpComponentValue(p, i))

  private def hpComponentSql(p: Int, iExpr: String): String =
    s"(CAST(CAST(('0x' || substring(md5('hp_${p}_' || CAST($iExpr AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS DOUBLE) - 499.5)"

  /** Per-vector LSH bucket: bit p of the bucket id is the sign of the
    * dot product with hyperplane p. One scan, no joins over data —
    * the bucket id is a per-row fold, codegen-friendly. */
  private def bucketCol(emb: Column): Column =
    (0 until LshPlanes).map { p =>
      val hp = array(hyperplane(p).map(lit): _*)
      val dotP = aggregate(
        zip_with(emb, hp, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(dotP >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  private val bucketColSql: String =
    (0 until LshPlanes).map { p =>
      val dotP = s"list_sum([CAST(embedding[i + 1] AS DOUBLE) * " +
        s"${hpComponentSql(p, "i")} FOR i IN range(0, $Dim)])"
      s"(CASE WHEN $dotP >= 0.0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  /** Bucket assignment per vector (hash-checked: the LSH partitioning
    * itself, plus per-bucket population counts downstream). */
  def annLshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", bucketCol($"embedding").as("bucket"))
      .orderBy($"vec_id")
  }

  val annLshBucketsSql: String =
    s"""SELECT vec_id, $bucketColSql AS bucket
       |FROM embeddings ORDER BY vec_id""".stripMargin

  /** LSH-bucketed approximate top-k: score ONLY same-bucket
    * candidates (bucket equi-join), exact cosine on candidates,
    * per-query top-k. Recall < 1 by construction; the candidate set
    * is the 1/2^planes fraction sharing the query's bucket. */
  def annLshTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding", bucketCol($"embedding").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = vecs.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"), $"bucket".as("q_bucket"))
    val scored = vecs.join(broadcast(queries),
        $"bucket" === $"q_bucket" && $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosine($"q_emb", $"embedding").as("cosine"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  val annLshTopkSql: String =
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, $bucketColSql AS bucket FROM embeddings
       |), queries AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
       |  FROM bucketed WHERE vec_id < $NumQueries
       |), scored AS (
       |  SELECT q.query_id, v.vec_id AS neighbor_id,
       |    ${cosineSql("q.q_emb", "v.embedding")} AS cosine
       |  FROM bucketed v JOIN queries q
       |    ON v.bucket = q.q_bucket AND v.vec_id <> q.query_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------- cosine near-dup
  /** Embedding-cosine near-duplicate PAIRS (the dedup variant of the
    * brief: drop one of any pair with cosine ≥ threshold). Candidates
    * from the same LSH bucket equi-join — a self-join on the bucket
    * id, never all-pairs; exact cosine only on candidates. Recall is
    * the LSH trade (multi-probe/more tables raise it); the oracle
    * mirrors the same bucketing so results agree exactly.
    *
    * The synthetic embeddings carry NO planted duplicates (max pair
    * cosine ≈ 0.6), so the threshold sits at the top-0.01% tail of
    * the pair distribution to exercise the candidate + exact-rescore
    * path with a non-empty result; a production corpus would use
    * ~0.95. */
  val NearDupThreshold = 0.45

  def dedupEmbeddingCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding", bucketCol($"embedding").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.as("a").join(vecs.as("b"),
        $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"),
        cosine($"a.embedding", $"b.embedding").as("cosine"))
      .filter($"cosine" >= NearDupThreshold)
      .orderBy($"d1", $"d2")
  }

  val dedupEmbeddingCosineSql: String =
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, $bucketColSql AS bucket FROM embeddings
       |)
       |SELECT a.vec_id AS d1, b.vec_id AS d2,
       |  ${cosineSql("a.embedding", "b.embedding")} AS cosine
       |FROM bucketed a JOIN bucketed b
       |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${cosineSql("a.embedding", "b.embedding")} >= $NearDupThreshold
       |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------------ array stats
  /** Array/struct operators over the embedding column: length, L2
    * norm, min/max/mean element — per-row folds, shuffle-free. */
  def embeddingStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val asDouble = transform($"embedding", x => x.cast("double"))
    Tables.load(spark, sfDir, "embeddings")
      .select(
        $"vec_id", $"label",
        size($"embedding").cast("long").as("n_dims"),
        sqrt(aggregate(asDouble, lit(0.0), (acc, v) => acc + v * v)).as("l2_norm"),
        array_min(asDouble).as("min_v"),
        array_max(asDouble).as("max_v"),
        (aggregate(asDouble, lit(0.0), (acc, v) => acc + v) / Dim).as("mean_v"))
      .orderBy($"vec_id")
  }

  val embeddingStatsSql: String =
    s"""SELECT vec_id, label,
       |  CAST(len(embedding) AS BIGINT) AS n_dims,
       |  sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) FOR i IN range(1, ${Dim + 1})])) AS l2_norm,
       |  list_min([CAST(embedding[i] AS DOUBLE) FOR i IN range(1, ${Dim + 1})]) AS min_v,
       |  list_max([CAST(embedding[i] AS DOUBLE) FOR i IN range(1, ${Dim + 1})]) AS max_v,
       |  (list_sum([CAST(embedding[i] AS DOUBLE) FOR i IN range(1, ${Dim + 1})]) / $Dim) AS mean_v
       |FROM embeddings ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_cosine" -> (annTopkCosine _),
    "ann_lsh_buckets" -> (annLshBuckets _),
    "ann_lsh_topk" -> (annLshTopk _),
    "dedup_embedding_cosine" -> (dedupEmbeddingCosine _),
    "embedding_stats" -> (embeddingStats _))

  val oracles: Map[String, String] = Map(
    "ann_topk_cosine" -> annTopkCosineSql,
    "ann_lsh_buckets" -> annLshBucketsSql,
    "ann_lsh_topk" -> annLshTopkSql,
    "dedup_embedding_cosine" -> dedupEmbeddingCosineSql,
    "embedding_stats" -> embeddingStatsSql)
}
