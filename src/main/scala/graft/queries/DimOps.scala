package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Warehouse maintenance operators past a full rebuild: the reference
  * rebuilds every dimension from scratch on each `load`
  * (/root/reference/python/etl/load.py:1217-1305 — CTAS the whole
  * relation again), which is exactly what stops scaling first at
  * 100 TB. These two operators are the incremental counterparts a
  * Spark warehouse needs:
  *
  *  - [[scd2MergeDim]]: slowly-changing-dimension type-2 merge — keep
  *    attribute history instead of overwriting, computed from ONE
  *    key-partitioned full-outer join of the current dimension against
  *    the incoming snapshot (no windows, no corpus re-sort).
  *  - [[rollupIncremental]]: materialized-rollup maintenance — merge a
  *    batch's partial aggregates into the STORED aggregate table
  *    instead of re-aggregating the corpus; decimal accumulation makes
  *    the merged result bit-equal to a full recompute.
  *
  * Both oracle entries hash-check the incremental plan against DuckDB
  * computing the same answer the direct way.
  */
object DimOps {

  private val D1 = "2024-01-01" // current rows' open date
  private val D2 = "2024-06-01" // the incoming snapshot's as-of date
  private val Hi = "9999-12-31" // open-ended valid_to

  /** SCD2 merge of the customer dimension against a deterministic
    * "six months later" snapshot (derived from the same table so the
    * oracle sees identical inputs: some balances moved, some segments
    * changed, some customers gone, some new).
    *
    * Shape: ONE full-outer equi-join on the dimension key, then each
    * key emits its 1–2 version rows from an array+explode (unchanged →
    * carry the open row; changed → close old at D2 + open new;
    * deleted → close old; new → open). A key-partitioned join is the
    * whole cost — no window over the dimension, no global sort except
    * the presentation orderBy — so the plan survives a dimension with
    * billions of members (Spark plans full outer joins as shuffle
    * SMJ/SHJ; neither side is ever broadcast). */
  def scd2MergeDim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, sfDir, "customer")
    val cur = cust.select($"c_custkey".as("customer_key"),
      struct($"c_name", $"c_acctbal", $"c_mktsegment").as("cur_a"))
    val snap = cust
      .filter(pmod($"c_custkey", lit(17)) =!= 4) // departed customers
      .select($"c_custkey".as("customer_key"),
        struct(
          $"c_name",
          when(pmod($"c_custkey", lit(7)) === 3, $"c_acctbal" + lit(100.0))
            .otherwise($"c_acctbal").as("c_acctbal"),
          when(pmod($"c_custkey", lit(11)) === 5, lit("MACHINERY"))
            .otherwise($"c_mktsegment").as("c_mktsegment")).as("snap_a"))
      .unionByName(cust
        .filter(pmod($"c_custkey", lit(13)) === 0) // brand-new members
        .select(($"c_custkey" + lit(1000000L)).as("customer_key"),
          struct($"c_name", lit(50.0).as("c_acctbal"),
            lit("BUILDING").as("c_mktsegment")).as("snap_a")))
    val joined = cur.join(snap.hint("shuffle_hash"),
      Seq("customer_key"), "full_outer")
    val changed = $"cur_a".isNotNull && $"snap_a".isNotNull &&
      !($"cur_a" <=> $"snap_a")
    def version(a: Column, from: String, to: String, open: Boolean): Column =
      struct(a.getField("c_name").as("c_name"),
        a.getField("c_acctbal").as("c_acctbal"),
        a.getField("c_mktsegment").as("c_mktsegment"),
        lit(from).as("valid_from"), lit(to).as("valid_to"),
        lit(open).as("is_current"))
    val versions = array(
      // close the current row when its attributes changed or the key left
      when($"cur_a".isNotNull && (changed || $"snap_a".isNull),
        version($"cur_a", D1, D2, open = false)),
      // carry the untouched current row forward
      when($"cur_a".isNotNull && $"snap_a".isNotNull && !changed,
        version($"cur_a", D1, Hi, open = true)),
      // open a new version for changed attributes or a new key
      when($"snap_a".isNotNull && (changed || $"cur_a".isNull),
        version($"snap_a", D2, Hi, open = true)))
    joined
      .select($"customer_key",
        explode(filter(versions, v => v.isNotNull)).as("v"))
      .select($"customer_key", $"v.c_name", $"v.c_acctbal",
        $"v.c_mktsegment", $"v.valid_from", $"v.valid_to", $"v.is_current")
      .orderBy($"customer_key", $"valid_from")
  }

  val scd2MergeDimSql: String =
    s"""WITH cur AS (
       |  SELECT c_custkey AS customer_key, c_name, c_acctbal, c_mktsegment
       |  FROM customer
       |), snap AS (
       |  SELECT c_custkey AS customer_key, c_name,
       |    CASE WHEN c_custkey % 7 = 3 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
       |    CASE WHEN c_custkey % 11 = 5 THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment
       |  FROM customer WHERE c_custkey % 17 <> 4
       |  UNION ALL
       |  SELECT c_custkey + 1000000, c_name, 50.0, 'BUILDING'
       |  FROM customer WHERE c_custkey % 13 = 0
       |)
       |SELECT * FROM (
       |  SELECT c.customer_key AS customer_key, c.c_name AS c_name,
       |    c.c_acctbal AS c_acctbal, c.c_mktsegment AS c_mktsegment,
       |    '$D1' AS valid_from, '$D2' AS valid_to, FALSE AS is_current
       |  FROM cur c LEFT JOIN snap s ON c.customer_key = s.customer_key
       |  WHERE s.customer_key IS NULL OR c.c_name <> s.c_name
       |     OR c.c_acctbal <> s.c_acctbal OR c.c_mktsegment <> s.c_mktsegment
       |  UNION ALL
       |  SELECT c.customer_key, c.c_name, c.c_acctbal, c.c_mktsegment,
       |    '$D1', '$Hi', TRUE
       |  FROM cur c JOIN snap s ON c.customer_key = s.customer_key
       |  WHERE c.c_name = s.c_name AND c.c_acctbal = s.c_acctbal
       |    AND c.c_mktsegment = s.c_mktsegment
       |  UNION ALL
       |  SELECT s.customer_key, s.c_name, s.c_acctbal, s.c_mktsegment,
       |    '$D2', '$Hi', TRUE
       |  FROM snap s LEFT JOIN cur c ON c.customer_key = s.customer_key
       |  WHERE c.customer_key IS NULL OR c.c_name <> s.c_name
       |     OR c.c_acctbal <> s.c_acctbal OR c.c_mktsegment <> s.c_mktsegment
       |)
       |ORDER BY customer_key, valid_from""".stripMargin

  // ---------------------------------------- stored rollup lifecycle
  /** The monoid PARTIAL rows of the (status, month) order rollup —
    * what the stored table holds. COUNT and decimal SUM are
    * commutative monoids, so folding any partition of the corpus's
    * partials equals the one-shot aggregate EXACTLY. */
  def rollupPartials(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 6))).as("sum_dec"))

  /** Seed the stored rollup as a REAL warehouse table (staging build
    * + atomic pointer re-point — the band/IVF index lifecycle applied
    * to an aggregate). */
  def rollupBuild(wh: graft.etl.Warehouse, table: graft.etl.TableName,
                  orders: DataFrame): Unit = {
    wh.writeTable(table, rollupPartials(orders)); ()
  }

  /** Extend the rollup by one batch: append the BATCH's partial rows
    * under its batch tag — an at-least-once replay replaces its own
    * files instead of double-counting (exactly-once state), and
    * history is never rewritten. Θ(batch) scan + |touched keys|
    * appended rows; the corpus is never re-read. */
  def rollupAppend(wh: graft.etl.Warehouse, table: graft.etl.TableName,
                   batchOrders: DataFrame, tag: String): Boolean =
    wh.appendToTableIdempotent(table, rollupPartials(batchOrders), tag)

  /** Serve the rollup: fold the stored partials by group key. The
    * read costs Θ(|partial rows|) — never the corpus — and
    * `vacuum --compact` folds append-grown files under the same
    * pointer without changing this result. */
  def rollupServe(spark: SparkSession, table: graft.etl.TableName): DataFrame =
    spark.table(table.quoted)
      .groupBy(col("o_orderstatus"), col("order_month"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("sum_dec")).cast("double").as("sum_price"))

  /** One batch SCD2 maintenance step against the STORED dimension —
    * the batch twin of the streaming form
    * ([[graft.streaming.EventStreams]]'s scd2Stream): read the
    * published dim, [[scd2Upsert]] the updates, write-and-re-point.
    * Replaying the same updates converges (re-delivered attributes
    * change nothing in scd2Upsert), so an at-least-once orchestrator
    * is safe. */
  def scd2Apply(wh: graft.etl.Warehouse, dim: graft.etl.TableName,
                updates: DataFrame, key: String, attrs: Seq[String]): Unit = {
    wh.spark.catalog.refreshTable(dim.quoted)
    wh.writeTable(dim,
      scd2Upsert(wh.spark.table(dim.quoted), updates, key, attrs))
    ()
  }

  /** Materialized-rollup maintenance END-TO-END through the warehouse
    * lifecycle: seed the stored rollup from the pre-batch corpus
    * slice ([[rollupBuild]] — staging + pointer swap), extend it with
    * one batch's partials ([[rollupAppend]] — batch-tagged idempotent
    * append), and serve the fold ([[rollupServe]]). The oracle checks
    * the served result against DuckDB's full recompute under the
    * hash — the monoid identity merge(stored, partial(batch)) ==
    * partial(corpus), now carried by a real table instead of a temp
    * dir. */
  def rollupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, sfDir, "orders")
    val wh = new graft.etl.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_rollup_q_").toString,
      sfDir)
    val table = graft.etl.TableName.parse("rollup.orders_status_month")
    rollupBuild(wh, table, orders.filter(pmod($"o_orderkey", lit(5)) =!= 0))
    rollupAppend(wh, table, orders.filter(pmod($"o_orderkey", lit(5)) === 0),
      "batch-1")
    rollupServe(spark, table)
      .orderBy($"o_orderstatus", $"order_month")
  }

  val rollupIncrementalSql: String =
    """SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS order_month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------ distinct-count sketch rollup
  /** The aggregate [[rollupIncremental]] CANNOT maintain: COUNT
    * DISTINCT is not summable — merging per-batch distinct counts
    * overcounts users active in both batches. Its HLL SKETCH is a
    * monoid, though: per-day Datasketches-HLL sketches of the user
    * column are STORED (the band-index/IVF lifecycle applied to an
    * aggregate), so extending the rollup by a day costs Θ(day) scan
    * plus one appended ~KB sketch row, and ANY date-range distinct
    * count is the union of its day sketches — the corpus is never
    * re-scanned. Spark's native `hll_sketch_agg` / `hll_union_agg` /
    * `hll_sketch_estimate` do all the work (map-side-combinable
    * aggregate state, no UDF). Union is associative and
    * deterministic at fixed lgK, so merged-vs-one-shot estimate
    * equality is EXACT — the spec pins it, alongside a
    * within-2%-of-exact accuracy bound and idempotent re-append.
    * No DuckDB oracle by nature (DuckDB's approx_count_distinct is a
    * different HLL implementation); the contract is DimOpsSpec. */
  def userSketchByDay(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))

  /** Append one batch's day sketches to the stored rollup with the
    * batch-tagged idempotent append (replays replace, never double
    * merge — though a doubled sketch row would not even change the
    * estimate: HLL union is idempotent in the values too). */
  def appendUserSketches(wh: graft.etl.Warehouse,
                         table: graft.etl.TableName,
                         batch: DataFrame, tag: String): Unit =
    wh.appendToTableIdempotent(table, userSketchByDay(batch), tag)

  /** Distinct users over [from, to] from the STORED day sketches
    * alone: union the range's sketches, estimate once. */
  def distinctUsersInRange(spark: SparkSession,
                           table: graft.etl.TableName,
                           from: String, to: String): Long =
    spark.table(table.quoted)
      .filter(col("day").between(from, to))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n"))
      .collect()(0).getLong(0)

  // --------------------------------------- histogram quantile rollup
  /** Mergeable PERCENTILES for the rollup family: exact quantiles
    * need a global sort and are not summable, and the usual sketch
    * answers (KLL, t-digest) are RANDOMIZED — merge order changes
    * the bytes, which breaks this warehouse's replay/idempotency
    * discipline. A fixed-bin histogram is the deterministic monoid
    * alternative (the Prometheus-histogram design): per (day, type,
    * bin) counts are plain integers, merge is vector addition (exact,
    * associative, idempotent under the batch-tagged append), and any
    * date-range quantile reads cumulative sums over ≤ range/width
    * bins — the corpus is never re-scanned. Error is bounded by the
    * bin width (1/[[HistScale]]), unconditionally, not
    * probabilistically.
    *
    * Scale shape: the histogram build is one map-side-combinable
    * groupBy whose shuffle carries at most |days × types × bins|
    * partial rows (metadata-sized); the quantile query runs windows
    * over per-type partitions of ≤ #bins rows — bounded by
    * construction, never by the data. */
  val HistScale = 10L

  /** Per-(day, event_type, bin) counts — the stored rollup rows. */
  def valueHistogram(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("day"), col("event_type"),
        floor(col("value") * HistScale).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Append one batch's histogram rows idempotently (replays replace;
    * a histogram row-set is also safe to re-merge structurally since
    * bins are summed at query time from distinct stored rows). */
  def appendValueHistogram(wh: graft.etl.Warehouse,
                           table: graft.etl.TableName,
                           batch: DataFrame, tag: String): Unit =
    wh.appendToTableIdempotent(table, valueHistogram(batch), tag)

  /** p50/p95/p99 per event_type from histogram rows alone: merge bins
    * (vector add), cumulative-sum per type, and take the first bin
    * whose cumulative count reaches the integer rank threshold
    * `⌈total·q/100⌉` — all-integer until the final bin→value division,
    * so the DuckDB oracle is bit-identical. */
  def histQuantiles(hist: DataFrame): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val merged = hist.groupBy($"event_type", $"bin").agg(sum($"n").as("n"))
    val totals = merged.groupBy($"event_type").agg(sum($"n").as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = merged.withColumn("cum", sum($"n").over(w))
      .join(broadcast(totals), "event_type")
    def pick(q: Int): Column =
      (min(when($"cum" >= expr(s"(total * $q + 99) div 100"), $"bin"))
        / lit(HistScale.toDouble))
    cum.groupBy($"event_type")
      .agg(pick(50).as("p50"), pick(95).as("p95"), pick(99).as("p99"))
      .orderBy($"event_type")
  }

  /** The oracle entry: build the per-day histogram from `events`,
    * merge it back down, and answer the three standard percentiles —
    * exactly what the stored-rollup read path computes. */
  def quantileHistogram(spark: SparkSession, sfDir: String): DataFrame =
    histQuantiles(valueHistogram(Tables.load(spark, sfDir, "events")))

  val quantileHistogramSql: String =
    """WITH hist AS (
      |  SELECT event_type, CAST(floor(value * 10) AS BIGINT) AS bin,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2
      |), cum AS (
      |  SELECT event_type, bin, n,
      |    SUM(n) OVER (PARTITION BY event_type ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(n) OVER (PARTITION BY event_type) AS total
      |  FROM hist
      |)
      |SELECT event_type,
      |  MIN(CASE WHEN cum >= (total * 50 + 99) // 100 THEN bin END) / 10.0 AS p50,
      |  MIN(CASE WHEN cum >= (total * 95 + 99) // 100 THEN bin END) / 10.0 AS p95,
      |  MIN(CASE WHEN cum >= (total * 99 + 99) // 100 THEN bin END) / 10.0 AS p99
      |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin

  // ----------------------------------- incremental JOIN maintenance
  /** Materialized-JOIN maintenance — the other half of incremental
    * view maintenance next to [[rollupIncremental]]'s aggregates. A
    * stored denormalized join M = A ⋈ B under appends to BOTH sides
    * follows the classic delta rule
    *
    *   M_new = M ∪ (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * so extending M costs three Θ(Δ·matches) key-partitioned joins —
    * the stored old ⋈ old is NEVER recomputed and history is never
    * rewritten (each term lands as one batch-tagged idempotent
    * append; an at-least-once replay replaces its own files). The
    * A_old ⋈ ΔB term is the expensive one at 100 TB (old facts × new
    * dim rows) — it stays a key-partitioned equi-join on the fact
    * side's join key, and when ΔB is append-only NEW keys (the usual
    * dimension growth), only facts referencing those keys move.
    *
    * The serve projects a per-segment count, a decimal revenue sum,
    * AND a content fingerprint (sum of a 48-bit md5 prefix over the
    * row identity) so the oracle hash is sensitive to ROW CONTENT of
    * the maintained join, not just its cardinality — a lost or
    * doubled row anywhere in the four terms breaks the fingerprint. */
  def joinIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey",
        $"o_totalprice".cast(DecimalType(18, 6)).as("price"))
    val cust = Tables.load(spark, sfDir, "customer")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
    val (oldO, newO) = (orders.filter(pmod($"o_orderkey", lit(4)) =!= 0),
      orders.filter(pmod($"o_orderkey", lit(4)) === 0))
    val (oldC, newC) = (cust.filter(pmod($"c_custkey", lit(5)) =!= 0),
      cust.filter(pmod($"c_custkey", lit(5)) === 0))
    val wh = new graft.etl.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_deltajoin_q_").toString,
      sfDir)
    val table = graft.etl.TableName.parse("mart.orders_enriched")
    deltaJoinMaintain(wh, table, oldO, newO, oldC, newC)
    spark.table(table.quoted)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum($"price").cast("double").as("revenue"),
        sum(conv(substring(md5(concat_ws("|",
          $"o_orderkey", $"c_name")), 1, 12), 16, 10).cast("long"))
          .as("content_fp"))
      .orderBy($"c_mktsegment")
  }

  /** The enriched-join projection shared by every delta term. */
  private def enrichJoin(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.hint("shuffle_hash"), a("o_custkey") === b("c_custkey"))
      .select(a("o_orderkey"), a("o_custkey"), a("price"), b("c_name"),
        b("c_mktsegment"))

  /** Seed the stored join from old ⋈ old, then append the three delta
    * terms batch-tagged — the spec replays a tag to prove the append
    * is idempotent and diffs the stored rows against a direct join. */
  private[graft] def deltaJoinMaintain(wh: graft.etl.Warehouse,
                                       table: graft.etl.TableName,
                                       oldO: DataFrame, newO: DataFrame,
                                       oldC: DataFrame, newC: DataFrame): Unit = {
    wh.writeTable(table, enrichJoin(oldO, oldC))
    wh.appendToTableIdempotent(table, enrichJoin(newO, oldC), "delta-orders")
    wh.appendToTableIdempotent(table, enrichJoin(oldO, newC), "delta-cust")
    wh.appendToTableIdempotent(table, enrichJoin(newO, newC), "delta-both")
    ()
  }

  val joinIncrementalSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(('0x' || substring(md5(o_orderkey || '|' || c_name), 1, 12)) AS BIGINT)) AS BIGINT) AS content_fp
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------ row-level CDC diff
  /** Row-level CHANGE-DATA-CAPTURE between two dimension snapshots —
    * the change feed (insert / update / delete + before/after images)
    * a downstream consumer replays, computed from ONE key-partitioned
    * full-outer join; unchanged keys are dropped by a null-safe
    * struct compare. The snapshot derivation reuses
    * [[scd2MergeDim]]'s deterministic "six months later" state so the
    * oracle sees identical inputs. At scale this is the file-level
    * [[graft.etl.Warehouse]] snapshot diff pushed down to rows: the
    * join is the only shuffle, never broadcast (both snapshots are
    * corpus-sized), and the change feed is Θ(|changed keys|). */
  def cdcDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, sfDir, "customer")
    val v1 = cust.select($"c_custkey".as("k"),
      struct($"c_name", $"c_acctbal", $"c_mktsegment").as("a1"))
    val v2 = cust
      .filter(pmod($"c_custkey", lit(17)) =!= 4)
      .select($"c_custkey".as("k"),
        struct(
          $"c_name",
          when(pmod($"c_custkey", lit(7)) === 3, $"c_acctbal" + lit(100.0))
            .otherwise($"c_acctbal").as("c_acctbal"),
          when(pmod($"c_custkey", lit(11)) === 5, lit("MACHINERY"))
            .otherwise($"c_mktsegment").as("c_mktsegment")).as("a2"))
      .unionByName(cust
        .filter(pmod($"c_custkey", lit(13)) === 0)
        .select(($"c_custkey" + lit(1000000L)).as("k"),
          struct($"c_name", lit(50.0).as("c_acctbal"),
            lit("BUILDING").as("c_mktsegment")).as("a2")))
    v1.join(v2.hint("shuffle_hash"), Seq("k"), "full_outer")
      .withColumn("op",
        when($"a1".isNull, "I")
          .when($"a2".isNull, "D")
          .when(!($"a1" <=> $"a2"), "U"))
      .filter($"op".isNotNull)
      .select($"k".as("customer_key"), $"op",
        $"a1.c_acctbal".as("old_acctbal"), $"a2.c_acctbal".as("new_acctbal"),
        $"a1.c_mktsegment".as("old_segment"),
        $"a2.c_mktsegment".as("new_segment"))
      .orderBy($"customer_key")
  }

  val cdcDiffSql: String =
    """WITH v2 AS (
      |  SELECT c_custkey AS k, c_name,
      |    CASE WHEN c_custkey % 7 = 3 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
      |    CASE WHEN c_custkey % 11 = 5 THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey % 17 <> 4
      |  UNION ALL
      |  SELECT c_custkey + 1000000, c_name, 50.0, 'BUILDING'
      |  FROM customer WHERE c_custkey % 13 = 0
      |)
      |SELECT COALESCE(a.c_custkey, b.k) AS customer_key,
      |  CASE WHEN a.c_custkey IS NULL THEN 'I'
      |       WHEN b.k IS NULL THEN 'D'
      |       ELSE 'U' END AS op,
      |  a.c_acctbal AS old_acctbal, b.c_acctbal AS new_acctbal,
      |  a.c_mktsegment AS old_segment, b.c_mktsegment AS new_segment
      |FROM customer a FULL OUTER JOIN v2 b ON a.c_custkey = b.k
      |WHERE a.c_custkey IS NULL OR b.k IS NULL
      |   OR a.c_name <> b.c_name OR a.c_acctbal <> b.c_acctbal
      |   OR a.c_mktsegment <> b.c_mktsegment
      |ORDER BY customer_key""".stripMargin

  // ------------------------------------------------- shared SCD2 core
  /** Open every snapshot row as the dimension's first version — the
    * seed of an SCD2 table maintained by [[scd2Upsert]]. */
  def scd2Init(snapshot: DataFrame, key: String, attrs: Seq[String],
               from: String, hi: String = Hi): DataFrame =
    snapshot.select((col(key) +: attrs.map(col)) ++ Seq(
      lit(from).as("valid_from"), lit(hi).as("valid_to"),
      lit(true).as("is_current")): _*)

  /** UPSERT-style SCD2 merge for PARTIAL batches (the streaming/CDC
    * form of [[scd2MergeDim]], which is the full-snapshot form where
    * absence means deletion — absence here means "no news"):
    * `updates` carries (key, attrs, as_of ISO date). Per key the
    * LATEST update in the batch wins (max on (as_of, attrs) — a
    * micro-batch collapses to its final state; intermediate
    * versions inside one batch are not historized). An update
    * applies when the key is new, or its attributes differ from the
    * current row AND its as_of is strictly after the current row's
    * valid_from (stale or same-day re-deliveries never invert the
    * interval order). Applying closes the current row at as_of and
    * opens the new version; a re-delivery of already-applied
    * attributes changes nothing, so at-least-once replay CONVERGES —
    * the property the streaming twin leans on.
    *
    * Cost shape: historical rows pass through untouched; only the
    * current slice joins the batch (one key-partitioned full-outer
    * join, never broadcast). */
  def scd2Upsert(dim: DataFrame, updates: DataFrame, key: String,
                 attrs: Seq[String], hi: String = Hi): DataFrame = {
    val latest = updates
      .select(col(key), struct((col("as_of") +: attrs.map(col)): _*).as("u"))
      .groupBy(col(key)).agg(max(col("u")).as("u"))
    val cur = dim.filter(col("is_current"))
      .select(col(key), struct(attrs.map(col): _*).as("cur_a"),
        col("valid_from").as("cur_from"))
    val hist = dim.filter(!col("is_current"))
    val uA = struct(attrs.map(n => col("u").getField(n).as(n)): _*)
    val applies = col("u").isNotNull && (col("cur_a").isNull ||
      (!(col("cur_a") <=> uA) && col("u").getField("as_of") > col("cur_from")))
    def version(a: Column, from: Column, to: Column, open: Boolean): Column =
      struct(attrs.map(n => a.getField(n).as(n)) ++ Seq(
        from.as("valid_from"), to.as("valid_to"),
        lit(open).as("is_current")): _*)
    val versions = array(
      when(col("cur_a").isNotNull && !applies,
        version(col("cur_a"), col("cur_from"), lit(hi), open = true)),
      when(col("cur_a").isNotNull && applies,
        version(col("cur_a"), col("cur_from"),
          col("u").getField("as_of"), open = false)),
      when(applies,
        version(col("u"), col("u").getField("as_of"), lit(hi), open = true)))
    val merged = cur.join(latest.hint("shuffle_hash"), Seq(key), "full_outer")
      .select(col(key), explode(filter(versions, v => v.isNotNull)).as("v"))
      .select((col(key) +: attrs.map(n => col("v").getField(n).as(n))) ++ Seq(
        col("v").getField("valid_from").as("valid_from"),
        col("v").getField("valid_to").as("valid_to"),
        col("v").getField("is_current").as("is_current")): _*)
    hist.unionByName(merged)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_merge_dim" -> (scd2MergeDim _),
    "rollup_incremental" -> (rollupIncremental _),
    "quantile_histogram" -> (quantileHistogram _),
    "join_incremental" -> (joinIncremental _),
    "cdc_diff" -> (cdcDiff _))

  val oracles: Map[String, String] = Map(
    "scd2_merge_dim" -> scd2MergeDimSql,
    "rollup_incremental" -> rollupIncrementalSql,
    "quantile_histogram" -> quantileHistogramSql,
    "join_incremental" -> joinIncrementalSql,
    "cdc_diff" -> cdcDiffSql)
}
