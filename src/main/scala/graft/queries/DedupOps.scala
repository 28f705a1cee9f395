package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact
  * (hash-groupBy), word-shingle Jaccard via an inverted index,
  * MinHash+LSH banding, and SimHash. No reference counterpart — these
  * extend the engine beyond arthur-redshift-etl's SQL-transform
  * surface.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison.
  * Candidate pairs come from equi-joins on derived keys (shingle,
  * band signature, simhash band) — plain shuffles that Spark
  * distributes; only candidates are scored exactly.
  */
object DedupOps {

  import TextOps.{normText, normTextSql}

  // ------------------------------------------------------------ exact
  /** Exact dedup, keep-first: group by content fingerprint, keep the
    * smallest doc_id per group. One shuffle on the 128-bit hash (not
    * the full text!), uniform distribution by construction. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select($"doc_id", md5(normText($"text")).as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_doc_id")
  }

  val dedupExactSql: String =
    s"""SELECT fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
       |FROM (SELECT doc_id, md5($normTextSql) AS fp FROM documents)
       |GROUP BY fp ORDER BY keep_doc_id""".stripMargin

  // ------------------------------------------------------------ shingles
  /** Distinct word 3-gram shingles per doc (shared by jaccard +
    * minhash). Tokens from normalized text → sliding triples. */
  private def shingleDf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select($"doc_id", split(normText($"text"), " ").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as("shingle"))
      .distinct()
  }

  private val shingleSql: String =
    s"""SELECT DISTINCT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shingle
       |FROM (SELECT doc_id, string_split($normTextSql, ' ') AS w FROM documents)
       |WHERE len(w) >= 3""".stripMargin

  // ------------------------------------------------------------ jaccard
  /** N-gram Jaccard near-dup pairs ≥ 0.8 via a shingle inverted
    * index: explode → equi-join on shingle → count common → exact
    * Jaccard. The join IS the candidate generation — pairs sharing no
    * shingle never meet. At 100 TB, hot shingles are the skew risk:
    * drop top-frequency shingles (stopword shingles) before the join;
    * here the threshold keeps the semantics exact for the oracle. */
  def dedupJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = shingleDf(spark, sfDir).cache()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
      $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.as("sa"), $"d1" === $"sa.doc_id")
      .join(sizes.as("sb"), $"d2" === $"sb.doc_id")
      .select($"d1", $"d2", $"common",
        ($"common".cast("double") / ($"sa.n" + $"sb.n" - $"common")).as("jaccard"))
      .filter($"jaccard" >= 0.8)
      .orderBy($"d1", $"d2")
  }

  val dedupJaccardSql: String =
    s"""WITH sh AS ($shingleSql),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT d1, d2, common, CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
       |FROM pairs JOIN sizes sa ON d1 = sa.doc_id JOIN sizes sb ON d2 = sb.doc_id
       |WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8
       |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------------------ minhash
  /** MinHash signatures + LSH banding. 16 universal-hash permutations
    * over 32-bit md5 shingle hashes, banded 4×4; docs sharing a band
    * signature are candidate pairs. Candidate generation is an
    * equi-join on (band, signature) — no all-pairs stage. 16
    * permutations ride one shuffle (explode × tiny broadcast). */
  val MinhashPerms = 16
  val BandSize = 4
  val MinhashPrime = 4294967311L // smallest prime > 2^32

  def minhashBands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perms = spark.range(MinhashPerms).select(
      $"id".cast("int").as("j"),
      ($"id" * 2 + 1).as("a"),
      ($"id" * 101 + 7).as("b"))
    val hashed = shingleDf(spark, sfDir)
      .select($"doc_id",
        conv(substring(md5($"shingle"), 1, 8), 16, 10).cast("long").as("h"))
    hashed.join(broadcast(perms))
      .groupBy($"doc_id", $"j")
      .agg(min(($"a" * $"h" + $"b") % MinhashPrime).as("mh"))
      .groupBy($"doc_id", ($"j" / BandSize).cast("int").as("band"))
      .agg(array_join(transform(array_sort(collect_list(struct($"j", $"mh"))),
        s => s.getField("mh").cast("string")), ",").as("sig"))
  }

  private val minhashBandsSql: String =
    s"""SELECT doc_id, CAST(j // $BandSize AS INT) AS band,
       |  string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
       |FROM (
       |  SELECT doc_id, j, MIN((a * h + b) % $MinhashPrime) AS mh
       |  FROM (SELECT doc_id, CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT) AS h
       |        FROM ($shingleSql))
       |  CROSS JOIN (SELECT CAST(i AS INT) AS j, i * 2 + 1 AS a, i * 101 + 7 AS b FROM range($MinhashPerms) t(i))
       |  GROUP BY doc_id, j
       |) GROUP BY doc_id, band""".stripMargin

  /** The per-doc banded signatures themselves (hash-checked). */
  def dedupMinhashSig(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    minhashBands(spark, sfDir).orderBy($"doc_id", $"band")
  }

  val dedupMinhashSigSql: String =
    s"SELECT * FROM ($minhashBandsSql) ORDER BY doc_id, band"

  /** LSH candidate pairs: docs sharing any band signature. */
  def dedupMinhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = minhashBands(spark, sfDir)
    bands.as("a").join(bands.as("b"),
      $"a.band" === $"b.band" && $"a.sig" === $"b.sig" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
      .orderBy($"d1", $"d2")
  }

  val dedupMinhashPairsSql: String =
    s"""WITH bands AS ($minhashBandsSql)
       |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------------------ simhash
  /** 60-bit SimHash per document over distinct word hashes (60 bits so
    * the value fits a signed BIGINT in every engine). Near-dup pairs =
    * hamming distance ≤ 6 via bit_count(xor). Pair generation here is
    * the exact small-scale path (self-join); the scale path buckets on
    * 4×15-bit sub-hashes first (pigeonhole: distance ≤ 6 ⇒ at least
    * one of 7 bands equal) — same shape as the minhash band join. */
  val SimhashBits = 60

  def simhashDocs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tokens = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", explode(split(normText($"text"), " ")).as("tok"))
      .distinct()
      .select($"doc_id",
        conv(substring(md5($"tok"), 1, 15), 16, 10).cast("long").as("h"))
    val bits = spark.range(SimhashBits).select($"id".cast("int").as("bit"))
    tokens.join(broadcast(bits))
      .groupBy($"doc_id", $"bit")
      .agg(sum(when(expr("shiftright(h, bit)").bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as("s"))
      .groupBy($"doc_id")
      .agg(sum(when($"s" >= 0L, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .otherwise(0L)).as("simhash"))
      .orderBy($"doc_id")
  }

  val simhashDocsSql: String =
    s"""SELECT doc_id,
       |  SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS simhash
       |FROM (
       |  SELECT doc_id, bit,
       |    SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM (
       |    SELECT DISTINCT doc_id, CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
       |    FROM (SELECT doc_id, unnest(string_split($normTextSql, ' ')) AS tok FROM documents)
       |  )
       |  CROSS JOIN (SELECT CAST(i AS INT) AS bit FROM range($SimhashBits) t(i))
       |  GROUP BY doc_id, bit
       |) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = simhashDocs(spark, sfDir)
    sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).as("hamming"))
      .filter($"hamming" <= 6)
      .orderBy($"d1", $"d2")
  }

  val simhashPairsSql: String =
    s"""WITH sh AS (SELECT doc_id, simhash FROM ($simhashDocsSql))
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
       |ORDER BY d1, d2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupJaccard _),
    "dedup_minhash_sig" -> (dedupMinhashSig _),
    "dedup_minhash_pairs" -> (dedupMinhashPairs _),
    "dedup_simhash_docs" -> (simhashDocs _),
    "dedup_simhash_pairs" -> (simhashPairs _))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupJaccardSql,
    "dedup_minhash_sig" -> dedupMinhashSigSql,
    "dedup_minhash_pairs" -> dedupMinhashPairsSql,
    "dedup_simhash_docs" -> simhashDocsSql,
    "dedup_simhash_pairs" -> simhashPairsSql)
}
