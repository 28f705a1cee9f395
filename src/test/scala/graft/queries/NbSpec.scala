package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Naive Bayes train + score: the trainer's sufficient statistics are
  * pinned on a planted corpus, and the scorer recovers the classes of
  * a vocabulary-separated dataset perfectly — including docs holding
  * out-of-model tokens (the smoothing path). */
class NbSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

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

  private def planted() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "sports", "goal match striker goal penalty"),
      (2L, "sports", "match referee goal corner"),
      (3L, "sports", "striker penalty match"),
      (4L, "finance", "bond yield equity dividend"),
      (5L, "finance", "equity bond market dividend yield"),
      (6L, "finance", "market yield bond"),
      (7L, "science", "quark photon neutrino lab"),
      (8L, "science", "photon lab experiment quark"),
      (9L, "science", "neutrino experiment photon")
    ).toDF("doc_id", "lang", "text")
  }

  test("trainer emits exact per-class sufficient statistics") {
    val s = spark
    import s.implicits._
    val model = TextOps.nbTrain(planted(), "lang", "text")
    val rows = model.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    // hand-counted: 'goal' appears 3x in sports; sports has 3 docs and
    // 12 token occurrences
    assert(rows.contains(("sports", "goal", 3L, 3L, 12L)))
    assert(rows.contains(("finance", "bond", 3L, 3L, 12L)))
    // no cross-class contamination: 'goal' has no finance/science row
    assert(rows.count(_._2 == "goal") == 1)
    // ordered by (class, token) for the oracle hash
    assert(rows.sortBy(r => (r._1, r._2)).toSeq == rows.toSeq)
  }

  test("scorer recovers planted classes, handles unseen tokens, is deterministic") {
    val s = spark
    import s.implicits._
    val model = TextOps.nbTrain(planted(), "lang", "text")
    // held-out docs: class vocab plus tokens the model never saw
    val test = Seq(
      (101L, "penalty goal goal zzz"),
      (102L, "dividend market bond unseen"),
      (103L, "photon quark lab qqq")
    ).toDF("doc_id", "text")
    def predict() = TextOps.nbScore(test, model, "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = predict()
    assert(got == Seq((101L, "sports"), (102L, "finance"), (103L, "science")))
    assert(predict() == got, "scoring must be deterministic")
    // self-classification on the training set is perfect for a
    // vocabulary-separated corpus
    val self = TextOps.nbScore(planted(), model, "text")
      .join(planted().select($"doc_id", $"lang"), "doc_id")
      .filter($"predicted" === $"lang").count()
    assert(self == 9L)
  }
}
