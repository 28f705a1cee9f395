package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class ExtractSpec extends AnyFunSuite {

  test("maximizePartitions reproduces the reference doctest cases") {
    // database_extractor.py:66-94 (max_partitions = 64).
    val cases = Seq(
      1L -> 1, 10485750L -> 1, 10485760L -> 1, 10485770L -> 1,
      20971510L -> 1, 20971520L -> 2, 30971520L -> 2, 41943040L -> 4,
      671088630L -> 60, 671088640L -> 64, 671088650L -> 64,
      470958407680L -> 64, 0L -> 1)
    cases.foreach { case (size, expected) =>
      assert(Extract.maximizePartitions(size, maxPartitions = 64) == expected,
        s"size=$size")
    }
  }

  test("maximizePartitions invariants: bounded, multiple-of-4 or 1/2, min size") {
    val rng = new scala.util.Random(42)   // deterministic property sweep
    (1 to 2000).foreach { _ =>
      val size = math.abs(rng.nextLong()) % (1L << 40)
      val maxP = Seq(4, 8, 16, 32, 64)(rng.nextInt(5))
      val p = Extract.maximizePartitions(size, maxP)
      assert(p >= 1 && p <= maxP, s"size=$size maxP=$maxP p=$p")
      assert(p == 1 || p == 2 || p % 4 == 0, s"size=$size maxP=$maxP p=$p")
      // each partition ≥ 10MB unless already down to a single one
      if (p > 1) assert(size.toDouble / p >= 10 * 1024 * 1024, s"size=$size p=$p")
    }
  }

  test("sampling raises the minimum partition size to 100MB") {
    // database_extractor.py:42-53: sampling only for tables > 100MB.
    assert(Extract.minPartitionSize(50L * 1024 * 1024, useSampling = true) == 10L * 1024 * 1024)
    assert(Extract.minPartitionSize(200L * 1024 * 1024, useSampling = true) == 100L * 1024 * 1024)
    assert(Extract.minPartitionSize(200L * 1024 * 1024, useSampling = false) == 10L * 1024 * 1024)
  }

  private def designWith(extra: String, colType: String = "long",
                         constraints: String = "constraints:\n  - primary_key: [k]"): TableDesign =
    TableDesign.load(
      s"""name: src.t
         |source_name: src
         |columns:
         |  - name: k
         |    type: $colType
         |    not_null: true
         |  - name: v
         |    type: string
         |$constraints
         |$extra""".stripMargin)

  test("partition key: split_by wins, else single-column numeric/temporal PK") {
    // relation.py:417-473.
    val pkOnly = designWith("")
    assert(Extract.findPartitionKey(pkOnly).contains("k"))
    val explicit = designWith("extract_settings:\n  split_by: [k]")
    assert(Extract.findPartitionKey(explicit).contains("k"))
    // two-column PK → no key
    val twoCol = TableDesign.load(
      """name: src.t
        |source_name: src
        |columns:
        |  - name: a
        |    type: long
        |    not_null: true
        |  - name: b
        |    type: long
        |    not_null: true
        |constraints:
        |  - primary_key: [a, b]
        |""".stripMargin)
    assert(Extract.findPartitionKey(twoCol).isEmpty)
    // string-typed PK → not usable
    val strPk = designWith("", colType = "string")
    assert(Extract.findPartitionKey(strPk).isEmpty)
  }

  test("temporal split keys are cast to epoch IN THE SOURCE DIALECT (sqoop.py:186-195)") {
    val ts = designWith("extract_settings:\n  split_by: [k]", colType = "timestamp")
    // the split expression runs on the remote database, not Spark
    assert(Extract.splitExpression(ts, "k") ==
      "CAST(DATE_PART('epoch', k) AS BIGINT)")
    assert(Extract.splitExpression(ts, "k", dialect = "spark") ==
      "CAST(unix_timestamp(k) AS BIGINT)")
    intercept[IllegalArgumentException] {
      Extract.splitExpression(ts, "k", dialect = "oracle")
    }
    val lng = designWith("")
    assert(Extract.splitExpression(lng, "k") == "k")
  }

  test("boundary query: user-specified wins over MIN/MAX") {
    val custom = designWith(
      "extract_settings:\n  split_by: [k]\n  boundary_query: SELECT 0, 100")
    assert(Extract.boundaryQuery(custom, "k", "t") == "SELECT 0, 100")
    val default = designWith("")
    assert(Extract.boundaryQuery(default, "k", "t") ==
      "SELECT MIN(k) AS lower_bound, MAX(k) AS upper_bound FROM t")
  }

  test("planPartitions: no key → 1 mapper; design num_partitions capped by max") {
    // sqoop.py:178-207.
    val noKey = designWith("", colType = "string")
    assert(Extract.planPartitions(noKey, 1L << 32).numPartitions == 1)
    val pinned = designWith("extract_settings:\n  split_by: [k]\n  num_partitions: 48")
    assert(Extract.planPartitions(pinned, 1L << 32, maxPartitions = 32).numPartitions == 32)
    val dynamic = designWith("")
    assert(Extract.planPartitions(dynamic, 671088640L, maxPartitions = 64).numPartitions == 64)
  }

  test("planPartitions merges extract condition and sampling predicate") {
    val d = designWith("extract_settings:\n  split_by: [k]\n  condition: v IS NOT NULL")
    val small = Extract.planPartitions(d, 1L << 20, useSampling = true)
    assert(small.condition.contains("v IS NOT NULL"))     // no sampling under 100MB
    val big = Extract.planPartitions(d, 1L << 31, useSampling = true)
    assert(big.condition.contains("v IS NOT NULL AND (MOD(k, 10) = 1)"))
  }

  test("--use-sampling: the MOD(key,10)=1 predicate reaches the JDBC subquery") {
    // commands.py:1022-1027 → database_extractor.py:141-152: the
    // sampling predicate must be evaluated BY THE SOURCE, inside the
    // pushed-down subquery — never client-side after a full read.
    val d = designWith("")
    val plan = Extract.planPartitions(d, 200L * 1024 * 1024, useSampling = true)
    val sub = Extract.subquery(d, plan)
    assert(sub.contains("WHERE (MOD(k, 10) = 1)"), sub)
    // and without the flag the subquery is unfiltered
    val plain = Extract.subquery(d, Extract.planPartitions(d, 200L * 1024 * 1024))
    assert(!plain.contains("MOD"), plain)
  }
}
