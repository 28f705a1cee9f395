package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Measured retrieval recall for the approximate ANN paths against the
  * exact brute-force baseline — the correctness gate's hash-match
  * proves cross-engine implementation fidelity (Spark and DuckDB
  * compute the SAME buckets/cells), not that the approximation
  * retrieves the true neighbors; this spec turns that standing caveat
  * into a measured floor. Recall@k = |approx ∩ exact| / |exact| over
  * the per-query top-k sets, averaged across queries. */
class AnnRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.01"

  /** The synthetic embeddings are RANDOM 64-dim vectors — no planted
    * clusters — so recall here is the theory-bounded worst case, not
    * the clustered-corpus regime the methods target. At sf0.01
    * (n=500, planes=5), a true top-3 neighbor sits at cosine ≈ 0.45
    * (angle ≈ 63°), giving per-bit agreement ≈ 0.65 and
    * P(bucket-hamming ≤ 1) ≈ 0.40; the 1-bit multi-probe set spans
    * 6/32 buckets ≈ 19% of the corpus for a random pair. Measured
    * recall (deterministic — md5 planes, fixed corpus) is 0.20 for
    * both paths. The floor is set to catch real regressions (a broken
    * bucket/cell derivation collapses recall toward 1/32 ≈ 0.03), not
    * to certify clustered-corpus quality. */
  private val RecallFloor = 0.15

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** (query_id -> retrieved neighbor set) of a top-k result frame. */
  private def neighborSets(
      df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.map(_.getLong(1)).toSet
      }

  private def recallAgainst(exact: Map[Long, Set[Long]],
                            approx: Map[Long, Set[Long]]): Double = {
    val perQuery = exact.map { case (q, truth) =>
      val got = approx.getOrElse(q, Set.empty)
      (truth & got).size.toDouble / truth.size
    }
    perQuery.sum / perQuery.size
  }

  test(s"LSH and IVF top-k recall >= $RecallFloor vs brute force at sf0.01 (random-data worst case)") {
    val exact = neighborSets(AnnOps.annTopkCosine(spark, sfDir))
    assert(exact.size == AnnOps.NumQueries)

    val lshRecall = recallAgainst(exact,
      neighborSets(AnnOps.annLshTopk(spark, sfDir)))
    val ivfRecall = recallAgainst(exact,
      neighborSets(AnnOps.annIvfTopk(spark, sfDir)))
    info(f"recall@${AnnOps.TopK}: lsh=$lshRecall%.2f ivf=$ivfRecall%.2f")
    assert(lshRecall >= RecallFloor,
      f"LSH multi-probe recall $lshRecall%.2f below floor $RecallFloor")
    assert(ivfRecall >= RecallFloor,
      f"IVF nprobe recall $ivfRecall%.2f below floor $RecallFloor")
  }
}
