package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
class FanoutProbe extends AnyFunSuite {
  test("ablate2") {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val names = Tables.load(spark, "/root/testdata/sf0.1", "customer")
      .select($"c_custkey".as("id"), $"c_name".as("name"))
    names.cache().count()
    val t = Tuning(maxVariantDf = 16)
    FuzzyJoin.pairsWithin2(names, 128, t).count() // warm
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"STEP $tag rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val d1e = expr("transform(sequence(1, length(name)), i -> concat(substring(name, 1, i - 1), substring(name, i + 1, length(name))))")
    val d2e = expr("""CASE WHEN length(name) >= 2 THEN flatten(transform(sequence(1, length(name) - 1), i -> transform(sequence(i + 1, length(name)), j -> concat(substring(name, 1, i - 1), substring(name, i + 1, j - i - 1), substring(name, j + 1, length(name)))))) ELSE CAST(array() AS ARRAY<STRING>) END""")
    val variants = names.select($"id", $"name", explode(array_distinct(concat(array($"name"), d1e, d2e))).as("v")).select(xxhash64($"v").as("vh"), $"id", $"name")
    time("variants-scan")(variants.count())
    val hot = variants.groupBy($"vh").agg(count(lit(1)).as("df")).filter($"df" > 16)
    time("hot-agg")(hot.count())
    val tagged = variants.join(hot, Seq("vh"), "left").persist()
    time("tagged-materialize")(tagged.count())
    val heavy = tagged.filter($"df".isNotNull)
      .withColumn("nc", ceil($"df" / lit(1024)).cast("int"))
      .withColumn("c", pmod(hash($"id"), $"nc").cast("int"))
      .select($"vh", $"c", $"id", $"name", explode(expr("sequence(0, nc - 1)")).as("tk"))
      .select($"vh", least($"c", $"tk").as("i"), greatest($"c", $"tk").as("j"), $"c", $"id", $"name")
      .as[FuzzyJoin.VChunkRow]
    val emitted = heavy.groupByKey(r => (r.vh, r.i, r.j)).flatMapGroups {
      (key: (Long, Int, Int), it: Iterator[FuzzyJoin.VChunkRow]) =>
        val rows = it.toArray
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var x = 0
        while (x < rows.length) {
          var y = x + 1
          while (y < rows.length) {
            val u = rows(x); val v = rows(y)
            if (u.id != v.id) {
              val d = FuzzyJoin.boundedLev(u.name, v.name, 2)
              if (d >= 0) buf += ((math.min(u.id, v.id), math.max(u.id, v.id), d.toLong))
            }
            y += 1
          }
          x += 1
        }
        buf.iterator
    }.toDF("id1", "id2", "dist")
    time("heavy-emit")(emitted.count())
    time("heavy-distinct")(emitted.distinct().count())
    spark.stop()
  }
}
