package graft.etl

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

final class FailedConstraintError(msg: String) extends RuntimeException(msg)
final class RequiredRelationLoadError(msg: String) extends RuntimeException(msg)
/** `update --scheduled-start-time` found no extract event newer than
  * the scheduled time within the wait budget (the reference's
  * MissingExtractEventError, monitor.py:825-859). */
final class MissingExtractEventError(msg: String) extends RuntimeException(msg)

/** Result of one relation build (feeds the monitor + audits). */
final case class BuildResult(
    identifier: String,
    kind: String,              // table | ctas | view
    rowcount: Long,
    skipped: Boolean = false)

/** Outcome of [[Warehouse.vacuum]]: `deleted` build locations, plus
  * the relations it REFUSED to touch because no live location was
  * resolvable (or a pointer file was unreadable). Automation must be
  * able to tell "nothing to reclaim" from "refused to act" — `Cli
  * vacuum` exits non-zero when `refused` is non-empty. */
final case class VacuumResult(deleted: Seq[String], refused: Seq[String])

/** The load engine: the reference's `build_one_relation` + schema
  * lifecycle, on the Spark catalog
  * (/root/reference/python/etl/load.py:703-744, 497-551,
  * data_warehouse.py:48-205).
  *
  * Tables are EXTERNAL parquet tables at versioned locations under
  * `warehouseDir/data/<schema>.<table>/<buildId>`. That makes
  * publish/backup/restore **metadata-only pointer swaps**: promoting a
  * staging build re-points the standard table at the staging build's
  * location — no data is copied, and the previous location stays
  * registered under `etl_backup$schema` for restore. (Redshift gives
  * the reference `ALTER SCHEMA RENAME`; the Spark catalog has no
  * cross-database rename, so the swap IS the idiomatic equivalent.)
  *
  * At 100 TB this matters: publish cost is O(#tables) catalog calls,
  * not O(bytes). Builds themselves are plain distributed writes.
  */
final class Warehouse(
    val spark: SparkSession,
    val warehouseDir: String,
    val sourceDir: String,                  // parquet stand-in for upstream (COPY, S10)
    val monitor: Monitor = new Monitor()) {

  /** Build ids must be unique across JVM RUNS, not just within one:
    * a counter restarting at 0 would hand a second CLI run the same
    * versioned locations the published standard tables still point
    * at, and mode(overwrite) would destroy live data mid-build (the
    * backup pointer would reference the overwritten path too). Seeded
    * from the max build id already on disk under `data/<s>.<t>/<id>`,
    * via the Hadoop FS API so any warehouse scheme (file/HDFS/object
    * store) works. One LIST at construction — not per build. */
  private val buildCounter =
    new java.util.concurrent.atomic.AtomicLong(maxExistingBuildId())

  private def maxExistingBuildId(): Long = {
    import org.apache.hadoop.fs.Path
    val dataPath = new Path(s"$warehouseDir/data")
    val fs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dataPath)) 0L
    else fs.listStatus(dataPath).filter(_.isDirectory)
      .flatMap(t => fs.listStatus(t.getPath))
      .filter(_.isDirectory)
      .flatMap(b => scala.util.Try(b.getPath.getName.toLong).toOption)
      .foldLeft(0L)(math.max)
  }

  // ------------------------------------------------------------ naming
  private def dataLocation(name: TableName, buildId: Long): String =
    s"$warehouseDir/data/${name.schema}.${name.table}/$buildId"

  def ensureDatabase(schema: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$schema`")

  def createSchemas(relations: Seq[Relation], pos: SchemaPosition.Value): Unit =
    relations.map(_.name.inPosition(pos).schema).distinct.foreach(ensureDatabase)

  // ------------------------------------------------------ query rewrite
  /** Rewrite fully-qualified dependency references in a transform
    * query for a lifecycle position (T5, load.py:221-245). The
    * reference regex-rewrites `schema.table` tokens and can corrupt a
    * string literal containing a dependency name; this rewrite is
    * PLAN-based — parser origins give the exact character span of
    * each relation reference ([[Bootstrap.rewriteReferences]]), so
    * literals and comments are structurally out of reach. */
  def rewriteQuery(query: String, deps: Seq[TableName], pos: SchemaPosition.Value,
                   inRun: Option[Set[String]] = None): String =
    Bootstrap.rewriteReferences(spark, query,
      deps.map { d =>
        // A dependency OUTSIDE the current load set has no staging
        // table (the last publish dropped it) — it resolves at its
        // published standard position. This is what makes
        // --continue-from work under staging: upstream relations
        // skipped by the fast-forward are read where they live.
        val effective =
          if (inRun.forall(_.contains(d.identifier))) pos
          else SchemaPosition.Standard
        d.identifier.toLowerCase -> d.inPosition(effective)
      }.toMap)

  // ------------------------------------------------------ constraint (C1)
  /** Duplicate check per declared constraint (load.py:564-634):
    * `GROUP BY key HAVING COUNT(*) > 1 LIMIT 5`; for `unique`, null
    * keys are exempt (Redshift UNIQUE semantics). Non-empty ⇒
    * [[FailedConstraintError]] carrying sample keys. */
  def verifyConstraints(df: DataFrame, design: TableDesign,
                        trustEngineIdentity: Boolean = true): Unit =
    design.constraints.foreach { ct =>
      // A surrogate key on the engine's own identity column is unique
      // BY CONSTRUCTION (row_number over a total order, Identity.scala)
      // — re-checking would shuffle the whole fact table to prove a
      // tautology. Redshift's IDENTITY gives no such guarantee, which
      // is why the reference re-checks (load.py:564-634); ours does.
      // The standalone check_constraints path passes
      // trustEngineIdentity=false: it audits tables AT REST, where
      // "built by this engine's identity assignment" is a provenance
      // claim, not a property of the data in front of it.
      val engineGenerated = trustEngineIdentity && ct.kind == "surrogate_key" &&
        design.identityColumn.exists(ic => ct.columns == Seq(ic.name))
      if (!engineGenerated) {
      val keyCols = ct.columns.map(col)
      val base = if (ct.kind == "unique")
        df.filter(ct.columns.map(col(_).isNotNull).reduce(_ && _))
      else df
      // aliased aggregate, not .count(): a constraint column literally
      // named "count" would make filter(col("count")) ambiguous and
      // fail every build of that relation regardless of data
      val dups = base.groupBy(keyCols: _*)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("__dup_count"))
        .filter(col("__dup_count") > 1).limit(5).collect()
      if (dups.nonEmpty)
        throw new FailedConstraintError(
          s"relation '${design.name.identifier}' violates ${ct.kind} " +
            s"(${ct.columns.mkString(", ")}); examples: " +
            dups.map(_.toSeq.mkString("(", ",", ")")).mkString(" "))
      }
    }

  // ------------------------------------------------------ build one
  /** The reference's `build_one_relation` (load.py:703-744):
    * create-or-replace, load (COPY stand-in or CTAS insert), verify
    * constraints, count rows. */
  def buildOneRelation(rel: Relation, pos: SchemaPosition.Value = SchemaPosition.Standard,
                       skipCopy: Boolean = false,
                       inRun: Option[Set[String]] = None,
                       step: String = "load"): BuildResult =
    monitor.monitored(rel.identifier, step) {
      val design = rel.design
      val target = rel.name.inPosition(pos)
      val r =
        if (design.isView) buildView(design, pos, target, inRun)
        else {
          val (df, ctasCleanup) =
            if (skipCopy) (spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], design.toStructType),
              () => ())
            else if (design.isCtas) ctasDataFrameManaged(design, pos, inRun)
            else (sourceDataFrame(design), () => ())
          // everything from here on runs under the cleanup's finally:
          // the identity build above already persisted its frames, so
          // ANY exit path — NA-row construction, pointer read, write,
          // constraint check — must release them
          val rowcount = try {
          val hasNaRow =
            !skipCopy && design.isCtas && design.name.table.startsWith("dim_")
          val out = if (hasNaRow) withNaRow(design, df) else df
          // Constraints are verified against the WRITTEN table, as
          // the reference does (load.py:564-634 queries the loaded
          // relation): checking the DataFrame pre-write would execute
          // the whole CTAS/COPY plan twice. A failing check must then
          // UNDO the registration — publish() promotes whatever
          // staging location exists, and a direct standard build has
          // already re-pointed the live name — so the pointer is
          // restored to the pre-build location (or dropped if the
          // relation is new) before the error propagates. The
          // engine-generated NA row (T3) is excluded from the check —
          // identity keys start at 1, so sk=0 IS the NA row — else a
          // real source key 0 would false-positive against it.
          val prevLocation = locationOf(target)
          val rowcount0 = writeTable(target, out, Some(design))
          if (!skipCopy) {
            val written = spark.table(target.quoted)
            val checked = (design.identityColumn, hasNaRow) match {
              case (Some(ic), true) => written.filter(col(ic.name) =!= 0)
              // identity-less dim: no column marks the NA row in the
              // written table — check the pre-NA frame (re-executes
              // the plan, but only for this rare design shape)
              case (None, true) => df
              case _ => written
            }
            try verifyConstraints(checked, design)
            catch { case e: FailedConstraintError =>
              prevLocation match {
                case Some(loc) => registerAt(target, loc, Some(design))
                case None =>
                  spark.sql(s"DROP TABLE IF EXISTS ${target.quoted}")
                  deletePointer(target)
              }
              throw e
            }
          }
          rowcount0
          } finally ctasCleanup()   // drop the identity build's cache
          BuildResult(rel.identifier, if (design.isCtas) "ctas" else "table",
            rowcount, skipCopy)
        }
      (r, Some(r.rowcount))
    }

  /** COPY (S10, dialect/redshift.py:297-369): ingest the relation's
    * upstream extract. A manifest artifact (`<schema>.<table>/` with
    * gzip CSV / Avro / JSON part files — what `Cli extract` writes) is
    * loaded as the reference's `COPY ... FROM manifest` would; a bare
    * parquet stand-in is read directly. */
  def sourceDataFrame(design: TableDesign): DataFrame =
    Extract.copyDataFrame(spark, sourceDir, design)

  /** CTAS materialization (T1/T2/T3, load.py:467-551): run the
    * rewritten query, enforce design column order, assign the
    * identity surrogate key over the design's sort order if declared,
    * and append the missing-dimension NA row for `dim_*` tables. */
  def ctasDataFrame(design: TableDesign, pos: SchemaPosition.Value,
                    inRun: Option[Set[String]] = None): DataFrame =
    ctasDataFrameManaged(design, pos, inRun)._1

  /** As [[ctasDataFrame]], also returning the identity build's cache
    * cleanup — [[buildOneRelation]] runs it after the write action so
    * the sorted intermediate doesn't stay persisted for the rest of
    * the session (one leaked frame per identity build, observed as
    * steady storage-memory growth across a multi-relation load). */
  private[etl] def ctasDataFrameManaged(design: TableDesign,
                                        pos: SchemaPosition.Value,
                                        inRun: Option[Set[String]] = None): (DataFrame, () => Unit) = {
    val q = rewriteQuery(design.query, design.dependsOn, pos, inRun)
    var df = spark.sql(q)
    var cleanup: () => Unit = () => ()
    design.identityColumn.foreach { idCol =>
      val orderCols =
        (if (design.sortKeys.nonEmpty) design.sortKeys
         else design.activeColumns.filterNot(_.identity).map(_.name))
          .map(col)
      val (keyed, cl) = Identity.withSurrogateKeyManaged(df, idCol.name, orderCols)
      df = keyed
      cleanup = cl
    }
    (df.select(design.activeColumns.map(c =>
      col(c.name).cast(c.dataType).as(c.name)): _*), cleanup)
  }

  /** Missing-dimension NA row (T3, load.py:506-526). */
  def withNaRow(design: TableDesign, df: DataFrame): DataFrame = {
    val naRow = design.activeColumns.map(c =>
      expr(design.naValueSql(c)).cast(c.dataType).as(c.name))
    df.unionByName(spark.range(1).select(naRow: _*))
  }

  private def buildView(design: TableDesign, pos: SchemaPosition.Value,
                        target: TableName,
                        inRun: Option[Set[String]] = None): BuildResult = {
    val q = rewriteQuery(design.query, design.dependsOn, pos, inRun)
    spark.sql(s"CREATE OR REPLACE VIEW ${target.quoted} AS $q")
    BuildResult(design.name.identifier, "view", 0L)
  }

  /** Bucket count for distkey-bucketed tables: both sides of a
    * co-located join must agree, so it is one warehouse-wide constant
    * (Redshift's analog is the slice count). */
  val BucketCount = 8
  import Warehouse.HiveDefaultPartition

  /** Write as an external parquet table at a fresh versioned location
    * and (re-)register it — DROP+CREATE like the reference's
    * create_or_replace_relation (T7, load.py:342-374).
    *
    * A design `distribution` key maps to Spark bucketing (SURVEY
    * §1.4: distkey → bucketBy): both sides of a join bucketed on the
    * key skip the shuffle entirely — the Redshift KEY-distribution
    * co-location property. `compound_sort` maps to sortBy within
    * buckets (sortkey). */
  def writeTable(target: TableName, df: DataFrame,
                 design: Option[TableDesign] = None): Long = {
    val loc = dataLocation(target, buildCounter.incrementAndGet())
    val capture = LoadMetricsCapture.install(spark)   // before the action
    capture.discard(loc)   // a late delivery from a prior run must not leak in
    val distKeys = design.flatMap(_.distribution).getOrElse(Seq.empty)
    if (distKeys.nonEmpty) {
      ensureDatabase(target.schema)
      // the bucketed path must DROP before saveAsTable; if the write
      // then fails (executor OOM, source error) the relation would be
      // gone from the catalog while its old data and pointer are
      // intact — re-register the previous build (as an unbucketed
      // external table: data readable, bucket metadata re-established
      // by the next successful build) before rethrowing
      val prevLoc = locationOf(target).orElse(readPointer(target))
      spark.sql(s"DROP TABLE IF EXISTS ${target.quoted}")
      try {
        val w0 = df.write.mode("overwrite").format("parquet")
          .option("path", loc)
          .bucketBy(BucketCount, distKeys.head, distKeys.tail: _*)
        val sorted = design.map(_.sortKeys).filter(_.nonEmpty)
          .map(sk => w0.sortBy(sk.head, sk.tail: _*)).getOrElse(w0)
        sorted.saveAsTable(target.quoted)
      } catch {
        case e: Throwable =>
          // registerAt verifies the declared layout against the old
          // build's files: a previous build that predates the
          // distribution keys re-registers PLAIN (CLUSTERED BY over
          // unbucketed files would let bucketed joins skip their
          // required shuffle — silently wrong results), while a
          // genuinely bucketed previous build keeps its elision
          try prevLoc.foreach(p => registerAt(target, p, design))
          catch { case re: Throwable => e.addSuppressed(re) }
          throw e
      }
      writePointer(target, loc)
    } else {
      val partCols = design.map(_.partitionBy).getOrElse(Seq.empty)
      val zCols = design.map(_.interleavedSort).getOrElse(Seq.empty)
      val style = design.flatMap(_.distStyle)
      if (partCols.nonEmpty)
        // hive-style partition dirs: the scan prunes whole directories
        // for predicates on the partition key — the 100 TB layout for
        // time/source-sliced tables (beyond-reference; Redshift has no
        // partitions, SURVEY §1.4 maps only distkey/sortkey)
        df.write.mode("overwrite").partitionBy(partCols: _*).parquet(loc)
      else if (zCols.nonEmpty)
        // INTERLEAVED SORTKEY (table_design.schema:206, dialect/
        // redshift.py:136-137) → Z-order clustered write: range-
        // partition + sort by the Morton key so EVERY interleaved
        // column gets tight per-file min/max ranges and filters on
        // any of them prune files/row-groups — Redshift's interleaved
        // "equal weight to each sort column" property, expressed in
        // parquet statistics instead of zone maps.
        zorderClustered(df, zCols).write.mode("overwrite").parquet(loc)
      else if (style.contains("even"))
        // DISTSTYLE EVEN → round-robin repartition: rows spread
        // uniformly across output files regardless of any skewed
        // upstream partitioning, the Redshift even-slices property.
        // (A skew-free layout is what EVEN buys at 100 TB: every
        // downstream scan task gets the same bytes.)
        df.repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(loc)
      else if (style.contains("all"))
        // DISTSTYLE ALL → replicate-to-every-node is Spark's
        // broadcast: land the table as ONE compact file so
        // size-based auto-broadcast (or an explicit hint) replicates
        // it to every executor at join time — the Redshift
        // copy-on-every-slice property without a shuffle.
        // WarehouseSpec pins the join plan.
        df.coalesce(1).write.mode("overwrite").parquet(loc)
      else {
        // "auto": engine default. Parallelize the write when the plan
        // under-splits (single-split local source scans made every
        // COPY-stand-in write a one-task stage — 0.9 s serial per
        // source on the lifecycle's critical path); no-op at scale,
        // and never applied over a deliberate sort order (identity
        // builds arrive range-partitioned+sorted and keep that file
        // layout; declared sort keys likewise rule the layout).
        // modest cap: enough parallelism to hide per-task encode/commit
        // latency without fanning a small table into cores-many files
        // (32 near-empty write tasks measured as pure deser/scheduling
        // overhead under the level-parallel source loads)
        // spreadWide (all-columns hash), not spread: a generic
        // relation's head column can be low-cardinality or skewed,
        // which would collapse the fan-out into 1-2 hot write tasks
        val out = if (design.exists(_.sortKeys.nonEmpty)) df
                  else graft.queries.Tables.spreadWide(df, cap = 8)
        out.write.mode("overwrite").parquet(loc)
      }
      registerAt(target, loc, design)
    }
    // S11 load diagnostics: pick up this build's SQL metrics (keyed
    // by output location, so parallel D5 builds never cross-read) and
    // stage them for the monitor's finish event.
    val metrics = capture.await(loc)
    monitor.attachMetrics(metrics)
    // Rowcount from the write command's own metrics — re-scanning the
    // table just to count it would read every build's output twice
    // (the reference likewise reads stl_load_commits, not the table).
    // Fallback scan only if the listener missed the build.
    metrics.map(_.rowsWritten)
      .getOrElse(spark.table(target.quoted).count())
  }

  /** Z-order clustering for `interleaved_sort` writes: normalize each
    * column to `[0, 2^bits)` over its P01..P99 range (ONE
    * approxQuantile pass; clamping at the caps keeps a single outlier
    * from compressing the whole interior into a few cells — min/max
    * scaling loses the clustering exactly when the data is skewed),
    * interleave with the native codegen'd `zorder_key` expression,
    * then range-repartition + sort by the key. One extra shuffle at
    * WRITE time buys multi-dimensional file/row-group pruning on
    * every read — the standard clustering trade. Nulls coalesce to
    * the low cap so they cluster with the low edge instead of
    * scattering; ties and constant columns degrade gracefully
    * (span 1). */
  private def zorderClustered(df: DataFrame, cols: Seq[String]): DataFrame = {
    val res = (1L << graft.queries.ZorderKey.bitsPerInput(cols.size)) - 1
    // DATE cannot cast to DOUBLE in Spark 4 (DATATYPE_MISMATCH), yet
    // table_design allows date interleaved-sort columns — route dates
    // through their epoch-day integer (unix_date), which Z-orders on
    // exactly the calendar order a date sort key means.
    def asDouble(c: String): org.apache.spark.sql.Column = {
      val resolved = df.schema.fields
        .find(_.name.equalsIgnoreCase(c)).map(_.dataType)
      resolved match {
        case Some(org.apache.spark.sql.types.DateType) =>
          unix_date(col(c)).cast("double")
        case _ => col(c).cast("double")
      }
    }
    val doubled = df.select(cols.map(c => asDouble(c).as(c)): _*)
    val quantiles = doubled.stat.approxQuantile(
      cols.toArray, Array(0.01, 0.99), 0.001)
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val qs = quantiles(i)
      val (mn, mx) = if (qs.isEmpty) (0.0, 0.0) else (qs(0), qs(1))
      val span = if (mx > mn) mx - mn else 1.0
      val v = coalesce(asDouble(c), lit(mn))
      least(lit(res), greatest(lit(0L),
        floor((v - lit(mn)) * res / lit(span)).cast("long")))
    }
    graft.queries.DotF.register(spark)
    // explicit partition count: an AQE-coalesced range exchange would
    // collapse small builds to one file and lose the clustering
    df.withColumn("__zkey", call_function("zorder_key", array(scaled: _*)))
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions,
        col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Append rows IN PLACE to an existing (non-bucketed) external
    * parquet table: new part files land in the LIVE location — no
    * fresh versioned location, no rewrite of existing data. This is
    * the O(batch) ingest path for ACCUMULATING tables (the MinHash
    * band index an incremental dedup run extends each day): the cost
    * is the batch's files, independent of the table's size. Such
    * tables sit outside the build lifecycle — no backup/publish
    * interplay — and are rebuilt via [[writeTable]] only when full
    * re-derivation is intended. */
  def appendToTable(target: TableName, df: DataFrame): Unit = {
    // SCHEMA GUARD: parquet reads resolve columns by name against the
    // catalog schema, so a drifted batch would not fail — an extra
    // column is silently DROPPED on read and a missing one surfaces
    // as nulls. Refuse the mixed append loudly; schema evolution is a
    // rebuild (writeTable), not an append.
    requireAppendShape(target, df)
    df.write.mode("append").parquet(appendLocation(target))
    spark.catalog.refreshTable(target.quoted)
  }

  /** MERGE INTO the published table — Redshift's MERGE statement
    * (matched rows UPDATE to the source row, or DELETE when
    * `matchedDelete`; unmatched source rows INSERT), re-expressed as
    * ONE key-partitioned LEFT ANTI join: current rows whose key has
    * no source match survive, the source contributes its rows (all
    * of them for upsert; only its current-unmatched rows for the
    * delete arm — Redshift's delete form still inserts non-matches).
    * The merged set is written as a NEW versioned build and
    * atomically re-pointed — the same staging discipline as every
    * build, so readers never see half a merge and the superseded dir
    * is vacuum's to reclaim.
    *
    * Scale shape: both sides shuffle on the merge keys (a fact-sized
    * target and an unbounded source both forbid broadcast — the anti
    * join is hinted shuffle), and the rewrite cost is one pass over
    * target + source. Contract (Redshift's own): the source must be
    * key-unique — duplicate source keys would multiply matched rows.
    * Column sets must agree; source columns are realigned to the
    * target's order.
    *
    * A bucketed or partitioned target must pass its `design` so the
    * rewritten table keeps its physical layout — merging WITHOUT it
    * is refused rather than silently de-bucketing/de-partitioning
    * the relation (the layout is what co-located joins and partition
    * pruning depend on at scale). */
  def mergeInto(target: TableName, source: DataFrame, keys: Seq[String],
                matchedDelete: Boolean = false,
                design: Option[TableDesign] = None): Long = {
    import org.apache.spark.sql.functions.col
    require(keys.nonEmpty, "mergeInto needs at least one merge key")
    spark.catalog.refreshTable(target.quoted)
    if (design.isEmpty) {
      // Only an absent table may skip the layout guard — any OTHER
      // catalog failure must propagate, or a transient error would
      // silently de-bucket/de-partition the very layout this check
      // exists to protect.
      val meta = try Some(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          target.table, Some(target.schema)))) catch {
        case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException => None
        case _: org.apache.spark.sql.catalyst.analysis.NoSuchDatabaseException => None
      }
      meta.foreach { t =>
        require(t.bucketSpec.isEmpty && t.partitionColumnNames.isEmpty,
          s"mergeInto '${target.identifier}': target is bucketed/partitioned — " +
            "pass its TableDesign so the rewrite keeps the physical layout")
      }
    }
    val current = spark.table(target.quoted)
    require(source.columns.map(_.toLowerCase).toSet ==
        current.columns.map(_.toLowerCase).toSet,
      s"mergeInto column mismatch: target has ${current.columns.mkString(",")}, " +
        s"source has ${source.columns.mkString(",")}")
    val aligned = source.select(current.columns.map(col): _*)
    val sourceKeys = aligned.select(keys.map(col): _*)
    val survivors = current.join(sourceKeys.hint("shuffle_hash"), keys, "left_anti")
    val merged =
      if (matchedDelete)
        survivors.unionByName(
          aligned.join(current.select(keys.map(col): _*).hint("shuffle_hash"),
            keys, "left_anti"))
      else survivors.unionByName(aligned)
    writeTable(target, merged, design)
  }

  /** Partition-scoped rebuild — the BACKFILL form of T6's
    * delete-then-reload (load.py:422-425 deletes then re-COPYs the
    * whole relation; on a date-partitioned 100 TB fact only the
    * affected dates should move). Dynamic partition overwrite
    * replaces EXACTLY the hive-style partitions present in `df`;
    * every other partition's files are untouched, and the catalog's
    * partition entries follow the insert. In-place under the live
    * location, like [[appendToTableIdempotent]] — the pointer does
    * not move, so staging/publish semantics don't apply; the unit of
    * atomicity is the partition directory.
    *
    * `expect`: the declared backfill scope as `col=value/...` specs —
    * a batch carrying rows for any OTHER partition is refused before
    * a byte is written (a mis-scoped backfill silently clobbering an
    * unrelated day is the classic warehouse incident).
    *
    * Returns the rebuilt partition specs, sorted. */
  def rebuildPartitions(target: TableName, df: DataFrame,
                        expect: Option[Set[String]] = None): Seq[String] = {
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      target.table, Some(target.schema))
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    val partCols = meta.partitionColumnNames
    require(partCols.nonEmpty,
      s"'${target.identifier}' is not partitioned — use writeTable/updateRelations")
    require(meta.bucketSpec.isEmpty,
      s"'${target.identifier}' is bucketed; partition backfill would drop bucketing")
    // name specs the way the FILESYSTEM will, so expect-scopes and
    // reports match the on-disk layout: nulls (and empty strings) land
    // in Hive's default-partition directory, and values with chars
    // Hive escapes in dir names (':', ' ', '/', '%'…) get the same
    // %-escaping the dynamic-partition writer applies
    // format values with SPARK'S OWN cast-to-string — the exact
    // function the dynamic-partition writer names directories from —
    // not JVM toString: java.sql.Timestamp.toString carries a ".0"
    // fraction the directory never has, renders in the JVM default
    // timezone instead of spark.sql.session.timeZone, and with
    // datetime.java8API enabled the collected value is an Instant
    // whose toString ("…T00:00:00Z") matches nothing. Casting inside
    // the query sidesteps every collected-representation mismatch by
    // construction.
    val touched = df
      .select(partCols.map(c => col(c).cast("string").as(c)): _*)
      .distinct().collect()
      .map(r => partCols.indices.map { i =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(partCols(i), r.getString(i))
      }.mkString("/"))
      .toSeq.sorted
    require(touched.nonEmpty, "backfill batch is empty")
    expect.foreach { want =>
      val bad = touched.filterNot(want)
      require(bad.isEmpty,
        s"backfill touches undeclared partitions: ${bad.mkString(", ")} " +
          s"(declared: ${want.toSeq.sorted.mkString(", ")})")
    }
    // insertInto is positional: align to the catalog's column order
    // (data columns first, partition columns last)
    val ordered = df.select(meta.schema.fieldNames.map(col): _*)
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf, "dynamic")
    // belt and braces: writer-level option too — a STATIC overwrite
    // here would truncate every other partition
    try ordered.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").insertInto(target.quoted)
    finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
    spark.catalog.refreshTable(target.quoted)
    monitor.record(target.identifier, "backfill", "finish", 0.0,
      message = Some(touched.mkString(", ")))
    touched
  }

  /** Per-partition compaction — [[compactTable]] for partitioned
    * tables, where the whole-table rewrite it performs would move
    * 100 TB to fold one append-fragmented day. A partition compaction
    * IS an identity backfill: re-write the partition's own rows
    * through [[rebuildPartitions]] (dynamic overwrite, scope-guarded
    * to exactly the requested specs), which lands them as one
    * task-sized file set. Other partitions' files never move.
    * Returns per-spec (filesBefore, filesAfter); a spec already at or
    * under `maxDataFiles` is skipped (absent from the result). */
  def compactPartitions(target: TableName, specs: Seq[String],
                        maxDataFiles: Int = 16,
                        dryRun: Boolean = false): Map[String, (Int, Int)] = {
    require(specs.nonEmpty, "compactPartitions needs at least one spec")
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      target.table, Some(target.schema))
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    require(meta.partitionColumnNames.nonEmpty,
      s"'${target.identifier}' is not partitioned — use compactTable")
    // a PARTIAL spec on a multi-column-partitioned table would count
    // 0 direct files (only subdirectories live there) and be silently
    // reported as already compact — refuse it loudly instead
    specs.foreach { s =>
      val depth = s.count(_ == '/') + 1
      require(depth == meta.partitionColumnNames.length,
        s"spec '$s' names $depth of ${meta.partitionColumnNames.length} " +
          s"partition columns (${meta.partitionColumnNames.mkString("/")}) " +
          "— compactPartitions takes full specs only")
    }
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileCount(spec: String): Int = {
      val p = new org.apache.hadoop.fs.Path(root, spec)
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(f => f.isFile && {
        val n = f.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
    }
    val crowded = specs.map(s => s -> fileCount(s))
      .filter { case (_, n) => n > maxDataFiles }
    if (dryRun || crowded.isEmpty)
      return crowded.map { case (s, n) => s -> (n, n) }.toMap
    crowded.map { case (spec, before) =>
      // hop through a temp copy: the overwrite must not read the very
      // files it deletes at commit (a recomputed task after commit
      // would find them gone). Compaction cost stays 2× the PARTITION,
      // never the table. Partition columns are not stored in the data
      // files — restore them typed from the spec.
      val tmp = new org.apache.hadoop.fs.Path(
        s"$warehouseDir/tmp/compact_${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        val restored = spec.split('/').foldLeft(
          spark.read.parquet(s"$root/$spec")) { (df, kv) =>
          val Array(k0, v) = kv.split("=", 2)
          // specs carry Hive path-escaped names/values — undo the
          // escaping before restoring the typed column. The default-
          // partition directory holds NULL values — restore them as
          // nulls, not as the sentinel string.
          val k = org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.unescapePathName(k0)
          val value =
            if (v == HiveDefaultPartition) lit(null).cast(meta.schema(k).dataType)
            else lit(org.apache.spark.sql.catalyst.catalog
              .ExternalCatalogUtils.unescapePathName(v))
              .cast(meta.schema(k).dataType)
          df.withColumn(k, value)
        }
        restored.write.parquet(tmp.toString)
        rebuildPartitions(target, spark.read.parquet(tmp.toString),
          expect = Some(Set(spec)))
      } finally {
        tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(tmp, true)
        ()
      }
      spec -> (before, fileCount(spec))
    }.toMap
  }

  /** Live location for an in-place append, refusing bucketed and
    * partitioned tables: a bucketed table's files carry bucket-id
    * assignments, and a partitioned table's rows live in partition
    * DIRECTORIES — raw root-level parquet appends would corrupt
    * either layout. The accumulating-table pattern is for plain
    * unbucketed, unpartitioned indexes. */
  private def appendLocation(target: TableName): String = {
    val meta =
      try Some(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(target.table, Some(target.schema))))
      catch {
        // pointer-only accumulating tables legitimately have no
        // catalog entry; any other catalog failure propagates (a
        // swallowed transient error would let a raw append corrupt a
        // bucketed/partitioned layout this guard exists to refuse)
        case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException => None
        case _: org.apache.spark.sql.catalyst.analysis.NoSuchDatabaseException => None
      }
    if (meta.exists(_.bucketSpec.isDefined))
      throw new IllegalStateException(
        s"'${target.identifier}' is bucketed; in-place append would corrupt " +
          "bucket assignments — rebuild with writeTable instead")
    if (meta.exists(_.partitionColumnNames.nonEmpty))
      throw new IllegalStateException(
        s"'${target.identifier}' is partitioned; root-level appends would " +
          "bypass the partition directories — rebuild with writeTable instead")
    val loc = locationOf(target).orElse(readPointer(target)).getOrElse(
      throw new IllegalStateException(
        s"no live location for '${target.identifier}' — build it with writeTable first"))
    // pointer-only path (fresh JVM, no catalog entry): the metadata
    // guards above were vacuous, so detect the layout from the data
    // itself — a cross-JVM raw append into a partitioned or bucketed
    // layout is exactly the corruption those guards refuse
    if (meta.isEmpty) {
      val (hasPartDirs, hasBucketFiles, _) = sniffLayout(loc)
      if (hasPartDirs)
        throw new IllegalStateException(
          s"'${target.identifier}' has partition directories at $loc; " +
            "root-level appends would bypass them — rebuild with writeTable")
      if (hasBucketFiles)
        throw new IllegalStateException(
          s"'${target.identifier}' holds bucketed files at $loc; in-place " +
            "append would corrupt bucket assignments — rebuild with writeTable")
    }
    loc
  }

  /** [[appendToTable]] made IDEMPOTENT per `batchTag` — the ingest
    * primitive for at-least-once runtimes (Structured Streaming's
    * `foreachBatch` replays a batch id after a failure; a re-run cron
    * job replays a day). The batch's rows land as part files with
    * DETERMINISTIC tag-derived names, and a hidden `_applied_<tag>`
    * marker records completion:
    *
    *   - replay of an APPLIED batch: marker present → no-op (false);
    *   - replay of an INTERRUPTED batch: every `batch-<tag>-*` file
    *     from the partial attempt is deleted before the new files
    *     move in, so the final state holds exactly one copy.
    *
    * The batch stages under `_staging_<tag>` inside the live location
    * (underscore-prefixed paths are invisible to table scans, so
    * readers never see half a batch) and moves in via per-file
    * renames. Returns true if this call applied the batch. */
  private def requireAppendShape(target: TableName, df: DataFrame): Unit = {
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name.toLowerCase, f.dataType)).sortBy(_._1).toSeq
    // pointer-only table (fresh JVM: the in-memory catalog has no
    // entry but the pointers manifest resolves a live location — the
    // documented re-run-cron / restarted-stream case): take the
    // schema from the data itself, or every cross-JVM append dies
    // here before appendLocation's pointer fallback can run
    val tableSchema =
      try spark.table(target.quoted).schema
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          spark.read.parquet(
            locationOf(target).orElse(readPointer(target)).getOrElse(
              throw new IllegalStateException(
                s"no live location for '${target.identifier}' — build " +
                  "it with writeTable first"))).schema
      }
    val want = shape(tableSchema)
    val got = shape(df.schema)
    require(got == want,
      s"append schema drift for ${target.identifier}: table has " +
        s"${want.map(_._1).mkString(",")} but batch has " +
        s"${got.map(_._1).mkString(",")} (or a column changed type) — " +
        "evolve the table with a rebuild, not a silent mixed append")
  }

  def appendToTableIdempotent(target: TableName, df: DataFrame,
                              batchTag: String): Boolean = {
    requireAppendShape(target, df)
    val loc = appendLocation(target)
    // Sanitizing alone would COLLIDE distinct tags ('b.1' and 'b:1'
    // both become 'b_1', silently dropping the second batch); a raw-tag
    // hash suffix keeps sanitized names unique per raw tag.
    val sanitized = batchTag.replaceAll("[^A-Za-z0-9_-]", "_")
    val tag = if (sanitized == batchTag) batchTag else {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(batchTag.getBytes("UTF-8"))
      sanitized + "-" + md.take(4).map("%02x".format(_)).mkString
    }
    val hp = new org.apache.hadoop.fs.Path(loc)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(hp, s"_applied_$tag")
    if (fs.exists(marker)) return false
    // Upgrade path: before the hash suffix existed, a special-char tag
    // was recorded under its plain sanitized name. Honor that legacy
    // marker (the batch IS applied — re-applying would double-count it)
    // and stamp the new-scheme marker alongside so the next replay hits
    // the fast path. Caveat, documented: if TWO distinct legacy tags
    // collided on one sanitized name, only the first was ever applied —
    // that data loss already happened under the old scheme and cannot
    // be distinguished here; new-scheme tags never collide.
    if (tag != sanitized) {
      val legacy = new org.apache.hadoop.fs.Path(hp, s"_applied_$sanitized")
      if (fs.exists(legacy)) {
        fs.create(marker).close()
        return false
      }
    }
    val staging = new org.apache.hadoop.fs.Path(hp, s"_staging_$tag")
    df.write.mode("overwrite").parquet(staging.toString)
    // clear any partial earlier attempt, then move the staged files
    // in. ANCHORED match, not a glob: `batch-$tag-*` would also match
    // files of any other tag that EXTENDS this tag with a dash
    // ("batch-b1-*" matches tag b1-2's "batch-b1-2-0.parquet") and
    // delete committed data whose own marker still stands — permanent
    // silent loss. Only this tag's index-suffixed files may die.
    val ownFile = java.util.regex.Pattern.compile(
      "^batch-" + java.util.regex.Pattern.quote(tag) + "-\\d+(\\..*)?$")
    fs.listStatus(hp).iterator
      .filter(f => ownFile.matcher(f.getPath.getName).matches())
      .foreach(f => fs.delete(f.getPath, false))
    fs.listStatus(staging).iterator
      .filter(_.getPath.getName.startsWith("part-"))
      .zipWithIndex.foreach { case (f, i) =>
        val ext = f.getPath.getName.dropWhile(_ != '.')
        val dest = new org.apache.hadoop.fs.Path(hp, s"batch-$tag-$i$ext")
        // Hadoop rename signals failure by RETURNING FALSE, not
        // throwing; ignoring it would delete the staged copy below,
        // stamp the marker, and lose the rows with every replay
        // no-opping on the marker
        require(fs.rename(f.getPath, dest),
          s"append '$batchTag' to ${target.identifier}: rename " +
            s"${f.getPath} -> $dest failed; batch NOT marked applied")
      }
    fs.delete(staging, true)
    fs.create(marker).close()
    if (spark.catalog.tableExists(target.quoted))
      spark.catalog.refreshTable(target.quoted)
    true
  }

  /** Compact an ACCUMULATING table: [[appendToTable]] adds one file
    * set per batch forever, and at daily-batch cadence the scan's
    * file-listing + open cost eventually dominates the read (the
    * 100 TB failure mode of any append-grown index). When the live
    * location holds more than `maxDataFiles` data files, rewrite the
    * table into a FRESH versioned location (the parquet scan packs
    * small files into size-bounded splits, so the rewrite comes out
    * in ~128 MB files) and atomically re-point the table there —
    * readers never observe a partial state, exactly like publish.
    * The `_applied_<tag>` idempotency markers are carried forward so
    * a replayed batch stays a no-op after compaction. The superseded
    * build directory is left for [[vacuum]] to reclaim (it is now
    * unreferenced). Must not run concurrently with appends, same as
    * vacuum-vs-load.
    *
    * Returns (files before, files after), or None when under the
    * threshold. `dryRun` previews only: returns (before, before) when
    * the table WOULD compact, touching nothing. */
  def compactTable(target: TableName,
                   maxDataFiles: Int = 64,
                   dryRun: Boolean = false,
                   clusterBy: Seq[String] = Nil): Option[(Int, Int)] = {
    val loc = appendLocation(target)
    val hp = new org.apache.hadoop.fs.Path(loc)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).filter(f => f.isFile && {
        val n = f.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
    val before = dataFiles(hp).length
    // a plain compaction below the file-count threshold is a no-op;
    // a CLUSTERED rewrite (OPTIMIZE ... ZORDER) runs regardless —
    // re-establishing locality after unsorted appends is its point
    if (clusterBy.isEmpty && before <= maxDataFiles) return None
    if (dryRun) return Some((before, before))
    val newLoc = dataLocation(target, buildCounter.incrementAndGet())
    val source = spark.read.parquet(loc)
    val rewritten =
      if (clusterBy.isEmpty) source else zorderClustered(source, clusterBy)
    rewritten.write.mode("overwrite").parquet(newLoc)
    fs.listStatus(hp).filter(_.getPath.getName.startsWith("_applied_"))
      .foreach { m =>
        fs.create(new org.apache.hadoop.fs.Path(newLoc, m.getPath.getName)).close()
      }
    // atomic re-point (appendLocation already proved the table is a
    // plain unbucketed parquet relation, so ALTER is shape-safe)
    if (spark.catalog.tableExists(target.quoted))
      spark.sql(s"ALTER TABLE ${target.quoted} SET LOCATION '$newLoc'")
    writePointer(target, newLoc)
    spark.catalog.refreshTable(target.quoted)
    Some((before, dataFiles(new org.apache.hadoop.fs.Path(newLoc)).length))
  }

  /** (Re-)point `target` at `location`. When the name already holds a
    * parquet table with the same bucketing shape this is a single
    * `ALTER TABLE ... SET LOCATION` — an atomic metadata call, so a
    * concurrent reader never observes a missing relation (the table
    * analog of the CREATE OR REPLACE VIEW promote). Only a shape
    * change (bucketing added/removed/rekeyed, or a view occupying the
    * name) falls back to drop-then-create. */
  /** What the files at `location` physically are:
    * (partition directories present, bucket-named part files present,
    * any entries at all). Spark's bucketed writer names files
    * `part-NNNNN-<uuid>_BBBBB.cNNN...` — the `_BBBBB.c` infix is the
    * bucket id, absent from plain writes (`...-cNNN`). */
  private def sniffLayout(location: String): (Boolean, Boolean, Boolean) = {
    val p = new org.apache.hadoop.fs.Path(location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (false, false, false)
    else {
      val entries = fs.listStatus(p)
        .filterNot(_.getPath.getName.startsWith("_"))
      val partDirs = entries.exists(e =>
        e.isDirectory && e.getPath.getName.contains("="))
      val bucketRe = java.util.regex.Pattern
        .compile("part-\\d+-.*_\\d{5}\\.c\\d+.*")
      def anyBucketFile(es: Array[org.apache.hadoop.fs.FileStatus]): Boolean =
        es.exists(e =>
          !e.isDirectory && bucketRe.matcher(e.getPath.getName).matches())
      // a partitioned+bucketed build nests its bucket-named files
      // INSIDE the partition dirs — one representative leaf path is
      // enough to corroborate (Spark writes every partition with the
      // same bucketing), so descend the first `k=v` chain instead of
      // listing the whole tree
      var bucketFiles = anyBucketFile(entries)
      if (!bucketFiles && partDirs) {
        var dir = entries.find(e =>
          e.isDirectory && e.getPath.getName.contains("=")).map(_.getPath)
        var depth = 0
        while (!bucketFiles && dir.isDefined && depth < 8) {
          val inner = fs.listStatus(dir.get)
            .filterNot(_.getPath.getName.startsWith("_"))
          bucketFiles = anyBucketFile(inner)
          dir = inner.find(e =>
            e.isDirectory && e.getPath.getName.contains("=")).map(_.getPath)
          depth += 1
        }
      }
      (partDirs, bucketFiles, entries.nonEmpty)
    }
  }

  private def registerAt(target: TableName, location: String,
                         design: Option[TableDesign] = None): Unit = {
    ensureDatabase(target.schema)
    // trust, then VERIFY the physical layout: rollback/restore paths
    // re-register an OLDER build under the CURRENT design, and a
    // design that gained distribution keys (or partitioning) since
    // that build would declare CLUSTERED BY over plain files —
    // bucketed joins then skip their required shuffle and return
    // silently wrong rows (or a PARTITIONED BY table over a flat
    // directory scans as empty). When the location already holds
    // files, only declare a layout the files corroborate; an EMPTY
    // location (external schema declared ahead of data) keeps the
    // design's word. Residual risk accepted: files bucketed under
    // RENAMED keys are indistinguishable by name — a design that
    // re-keys distribution must rebuild, not restore.
    val (hasPartDirs, hasBucketFiles, hasAnyData) = sniffLayout(location)
    val wantBuckets = design.flatMap(_.distribution).filter(_.nonEmpty)
      .filter(_ => !hasAnyData || hasBucketFiles)
      .map(d => (d, design.map(_.sortKeys).filter(_.nonEmpty).getOrElse(Seq.empty)))
    val existing =
      try Some(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(target.table, Some(target.schema))))
      catch { case _: Exception => None }
    // ALTER keeps the catalog's stored schema, so it is only safe when
    // that schema already equals the design's (nullability aside) —
    // any drift falls back to drop-then-create, which re-infers.
    val wantSchema = design.map(_.toStructType)
    val wantParts = design.map(_.partitionBy.map(_.toLowerCase)).getOrElse(Seq.empty)
      .filter(_ => !hasAnyData || hasPartDirs)
    val sameShape = existing.exists { t =>
      t.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL &&
        t.provider.exists(_.equalsIgnoreCase("parquet")) &&
        t.bucketSpec.map(b => (b.bucketColumnNames, b.sortColumnNames)) ==
          wantBuckets &&
        t.bucketSpec.forall(_.numBuckets == BucketCount) &&
        t.partitionColumnNames.map(_.toLowerCase) == wantParts &&
        wantSchema.exists(s =>
          t.schema.fields.toSeq.map(f => (f.name.toLowerCase, f.dataType)).sortBy(_._1) ==
            s.fields.toSeq.map(f => (f.name.toLowerCase, f.dataType)).sortBy(_._1))
    }
    if (sameShape) {
      spark.sql(s"ALTER TABLE ${target.quoted} SET LOCATION '$location'")
      // a partitioned table's catalog partition entries still point at
      // the OLD location, and RECOVER PARTITIONS only ADDS missing
      // specs — an existing spec keeps its stale absolute location and
      // scans would keep serving the superseded build (then fail once
      // vacuum reclaims it). Drop every stored partition entry first
      // (metadata-only: retainData leaves the old files for vacuum),
      // then RECOVER rebuilds the full set from the new directory
      // layout. The table itself is never missing from the catalog.
      if (wantParts.nonEmpty) {
        val ident = org.apache.spark.sql.catalyst.TableIdentifier(
          target.table, Some(target.schema))
        val cat = spark.sessionState.catalog
        val stale = cat.listPartitions(ident)
        if (stale.nonEmpty)
          cat.dropPartitions(ident, stale.map(_.spec),
            ignoreIfNotExists = true, purge = false, retainData = true)
        spark.sql(s"ALTER TABLE ${target.quoted} RECOVER PARTITIONS")
      }
      // SET LOCATION swaps the data but PRESERVES catalog stats from
      // any prior ANALYZE — the CBO would then size joins (and flip
      // broadcast decisions) from the previous build's row counts.
      // Drop them; drop-then-create clears stats implicitly, and
      // analyzeAfter re-ANALYZEs post-publish when requested.
      if (existing.exists(_.stats.isDefined))
        spark.sessionState.catalog.alterTableStats(
          org.apache.spark.sql.catalyst.TableIdentifier(
            target.table, Some(target.schema)), None)
      spark.catalog.refreshTable(target.quoted)
    } else {
      if (existing.exists(_.tableType ==
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW))
        spark.sql(s"DROP VIEW IF EXISTS ${target.quoted}")
      else spark.sql(s"DROP TABLE IF EXISTS ${target.quoted}")
      val clustered = wantBuckets.map { case (d, sk) =>
        val sortSpec =
          if (sk.nonEmpty) s" SORTED BY (${sk.mkString(", ")})" else ""
        s" CLUSTERED BY (${d.mkString(", ")})$sortSpec INTO $BucketCount BUCKETS"
      }.getOrElse("")
      // bucketed/partitioned CREATE TABLE requires an explicit column
      // list (schema inference + bucketing is rejected by the
      // analyzer; an EMPTY partitioned location has nothing to infer
      // from); both imply a design, so the schema is available
      val cols = if (clustered.nonEmpty || wantParts.nonEmpty)
        wantSchema.map(s => s" (${s.toDDL})").getOrElse("")
      else ""
      val partitioned =
        if (wantParts.nonEmpty) s" PARTITIONED BY (${wantParts.mkString(", ")})"
        else ""
      spark.sql(
        s"CREATE TABLE ${target.quoted}$cols USING parquet$clustered$partitioned " +
          s"LOCATION '$location'")
      // register the partition directories already at the location
      if (wantParts.nonEmpty)
        spark.sql(s"ALTER TABLE ${target.quoted} RECOVER PARTITIONS")
    }
    writePointer(target, location)
  }

  private def locationOf(target: TableName): Option[String] =
    try {
      val t = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(target.table, Some(target.schema)))
      Some(t.location.toString)
    } catch { case _: Exception => None }

  // ------------------------------------------------- pointers manifest
  /** The session catalog is in-memory: a fresh JVM knows no live
    * locations, so [[vacuum]] run standalone would resolve an empty
    * live set and delete EVERYTHING — standard and backup builds
    * included. Every (re-)registration therefore also persists the
    * live location to `warehouseDir/pointers/<schema>.<table>`, the
    * on-disk twin of the catalog pointer; vacuum unions both. One
    * tiny file write per registration — publish stays O(#tables). */
  private def pointerPath(name: TableName): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s"$warehouseDir/pointers/${name.schema}.${name.table}")

  /** Pointer I/O goes through the RAW filesystem where the scheme has
    * a checksumming wrapper (the local FS): `ChecksumFileSystem` writes
    * a `.crc` sidecar next to every file and renames it with the
    * target, so the pointers dir would accumulate sidecars — and a
    * sidecar left stale by any raw-path write makes every later
    * checksummed read fail (ChecksumException → pointer unresolvable →
    * vacuum refuses a healthy relation). Pointers are self-validating
    * (empty/unreadable ⇒ refuse), so client-side checksums add no
    * safety here. HDFS/object stores are not `ChecksumFileSystem`s and
    * pass through unchanged. */
  private def pointerFs(p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  /** Drop a `.crc` sidecar left by a pre-raw-path write, so legacy
    * warehouses converge to sidecar-free pointer dirs. */
  private def dropLegacySidecar(fs: org.apache.hadoop.fs.FileSystem,
                                p: org.apache.hadoop.fs.Path): Unit = {
    val crc = new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}.crc")
    if (fs.exists(crc)) fs.delete(crc, false)
  }

  /** Pointer writes must be ATOMIC: `fs.create(p, overwrite)` truncates
    * in place, so a crash mid-write leaves an empty pointer — and if any
    * OTHER position's pointer survives, vacuum's live set is non-empty,
    * the fail-safe does not trigger, and the build whose pointer was
    * lost gets deleted. Write a temp file and rename over the target
    * (atomic on HDFS/local; object stores emulate rename — their
    * non-atomicity is why [[pointerState]] ALSO treats a
    * present-but-empty pointer as unresolvable and vacuum refuses). */
  private def writePointer(name: TableName, location: String): Unit =
    writePointerFileAt(pointerPath(name), location)

  private def writePointerFileAt(p: org.apache.hadoop.fs.Path,
                                 location: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = pointerFs(p)
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}.tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(location.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem =>
        // POSIX rename(2) replaces the target atomically; Hadoop's
        // FileContext route would re-wrap local in its checksum layer.
        if (!fs.rename(tmp, p)) {
          fs.delete(tmp, false)
          throw new java.io.IOException(s"pointer rename failed: $tmp -> $p")
        }
      case _ =>
        // FileContext.rename(OVERWRITE): the only Hadoop rename with
        // defined replace-existing semantics across schemes.
        org.apache.hadoop.fs.FileContext
          .getFileContext(fs.makeQualified(p).toUri, conf)
          .rename(fs.makeQualified(tmp), fs.makeQualified(p),
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    dropLegacySidecar(fs, p)
  }

  private def deletePointer(name: TableName): Unit = {
    val p = pointerPath(name)
    val fs = pointerFs(p)
    if (fs.exists(p)) fs.delete(p, false)
    dropLegacySidecar(fs, p)
  }

  /** What a position's on-disk pointer says. `Unresolvable` (present
    * but empty/unreadable — a torn write) is distinct from `Absent`:
    * vacuum must REFUSE the relation on an unresolvable pointer, never
    * filter it down to "no pointer" and carry on. */
  private[etl] sealed trait PointerState
  private[etl] case object PointerAbsent extends PointerState
  private[etl] case object PointerUnresolvable extends PointerState
  private[etl] final case class PointerLive(location: String) extends PointerState

  private[etl] def pointerState(name: TableName): PointerState =
    pointerStateAt(pointerPath(name))

  private[etl] def pointerStateAt(p: org.apache.hadoop.fs.Path): PointerState = {
    val fs = pointerFs(p)
    if (!fs.exists(p)) PointerAbsent
    else {
      val content = try {
        val in = fs.open(p)
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          Some(new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8).trim)
        } finally in.close()
      } catch { case _: java.io.IOException => None }
      content match {
        case Some(loc) if loc.nonEmpty => PointerLive(loc)
        case _ => PointerUnresolvable
      }
    }
  }

  // ------------------------------------------------- snapshots
  /** Named, metadata-only snapshots — the reproducibility pin a
    * training pipeline needs ("run X trained on exactly THIS
    * corpus"). Builds are immutable versioned directories and a
    * table is just a pointer to one, so a snapshot is ONE tiny
    * pointer file per table under
    * `warehouseDir/snapshots/<tag>/<schema>.<table>` recording the
    * live build location at pin time — O(#tables) metadata, zero
    * data copied, any warehouse size. [[vacuum]] counts pinned
    * locations as live (and refuses a relation whose snapshot file
    * is torn, same discipline as the lifecycle pointers), so later
    * rebuilds never reclaim a pinned build; [[dropSnapshot]]
    * releases the pin and the next vacuum reclaims. Beyond-reference
    * lifecycle: Redshift has no time travel — the reference's only
    * rewind is the backup/restore pair (load.py:604-660), which this
    * generalizes from one implicit "previous" slot to arbitrarily
    * many named pins. */
  private val SnapshotTagPattern = "[A-Za-z0-9][A-Za-z0-9._-]{0,127}"

  private def requireSnapshotTag(tag: String): Unit =
    require(tag.matches(SnapshotTagPattern),
      s"invalid snapshot tag '$tag': must match $SnapshotTagPattern " +
        "(tags name directories; no sanitizing — distinct tags must stay distinct)")

  private def snapshotsRoot: org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$warehouseDir/snapshots")

  private def snapshotFile(tag: String, name: TableName): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      snapshotsRoot, s"$tag/${name.schema}.${name.table}")

  /** Pin the CURRENT build of each table under `tag`. Refuses an
    * existing tag (a pin is a statement about a past run — silently
    * re-pointing it would lie to whoever recorded the tag) and any
    * table whose live location cannot be resolved (nothing durable
    * to pin). Views have no storage to pin and are refused. */
  def createSnapshot(tag: String, tables: Seq[TableName]): Unit = {
    requireSnapshotTag(tag)
    require(tables.nonEmpty, "createSnapshot needs at least one table")
    val root = snapshotsRoot
    val fs = pointerFs(root)
    val dir = new org.apache.hadoop.fs.Path(root, tag)
    require(!fs.exists(dir), s"snapshot '$tag' already exists; drop it first")
    val resolved = tables.map { t =>
      val loc = locationOf(t).orElse(readPointer(t)).getOrElse(
        throw new IllegalArgumentException(
          s"cannot snapshot '${t.identifier}': no resolvable live location " +
            "(unregistered table, or a view)"))
      (t, loc)
    }
    // All-or-nothing pin set: write every pointer into a hidden temp
    // directory, then one rename publishes the tag. A crash mid-loop
    // leaves only `.tmp_<tag>` (invisible to listSnapshots, deleted on
    // retry) — never a partial tag that blocks re-creation while
    // restoring/diffing incompletely.
    val tmp = new org.apache.hadoop.fs.Path(root, s".tmp_$tag")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    fs.mkdirs(tmp)
    resolved.foreach { case (t, loc) =>
      writePointerFileAt(
        new org.apache.hadoop.fs.Path(tmp, s"${t.schema}.${t.table}"), loc)
    }
    if (!fs.rename(tmp, dir))
      throw new IllegalStateException(
        s"snapshot '$tag': publishing rename failed (concurrent create?)")
  }

  /** Read the data exactly as pinned — a time-travel scan. Raw
    * parquet read of the frozen build directory: bucketing metadata
    * is not replayed (reads are correct; only a bucket-join shortcut
    * against it would be lost), and a partitioned build's partition
    * columns come back via directory discovery. */
  def readSnapshot(tag: String, name: TableName): DataFrame = {
    requireSnapshotTag(tag)
    val p = snapshotFile(tag, name)
    pointerStateAt(p) match {
      case PointerLive(loc) => spark.read.parquet(loc)
      case PointerAbsent => throw new IllegalArgumentException(
        s"no snapshot '$tag' for '${name.identifier}'")
      case PointerUnresolvable => throw new IllegalStateException(
        s"snapshot '$tag' for '${name.identifier}' exists but is unreadable (torn write)")
    }
  }

  /** Re-point the live table at a pinned build — rollback to the
    * snapshot. Metadata-only, same registerAt discipline as publish;
    * pass the design when the table is bucketed/partitioned so the
    * recreated relation keeps its shape. The pin itself stays. */
  def restoreSnapshot(tag: String, name: TableName,
                      design: Option[TableDesign] = None): Unit = {
    requireSnapshotTag(tag)
    pointerStateAt(snapshotFile(tag, name)) match {
      case PointerLive(loc) =>
        registerAt(name, loc, design)
        spark.catalog.refreshTable(name.quoted)
      case PointerAbsent => throw new IllegalArgumentException(
        s"no snapshot '$tag' for '${name.identifier}'")
      case PointerUnresolvable => throw new IllegalStateException(
        s"snapshot '$tag' for '${name.identifier}' exists but is unreadable (torn write)")
    }
  }

  /** All pins: (tag, table identifier, pinned location). Unreadable
    * files list with an empty location — visible, never silently
    * skipped. */
  def listSnapshots(): Seq[(String, String, String)] = {
    val root = snapshotsRoot
    val fs = pointerFs(root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(d =>
        d.isDirectory && !d.getPath.getName.startsWith(".")).toSeq.flatMap { d =>
      fs.listStatus(d.getPath).filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith(".")).toSeq.map { f =>
          val loc = pointerStateAt(f.getPath) match {
            case PointerLive(l) => l
            case _ => ""
          }
          (d.getPath.getName, f.getPath.getName, loc)
        }
    }.sortBy(t => (t._1, t._2))
  }

  /** Release a pin. The data itself is reclaimed by the NEXT vacuum
    * (if no other pin or lifecycle pointer still references it) —
    * dropping a tag never deletes data directly. */
  def dropSnapshot(tag: String): Unit = {
    requireSnapshotTag(tag)
    val dir = new org.apache.hadoop.fs.Path(snapshotsRoot, tag)
    val fs = pointerFs(dir)
    require(fs.exists(dir), s"no snapshot '$tag'")
    fs.delete(dir, true)
    ()
  }

  /** Metadata-only diff of two pins — "what changed between training
    * run A and run B" answered without reading a row: per table, the
    * pin status (`only_a` / `only_b` / `same` build / `changed`
    * build) and each side's on-disk bytes (one recursive LIST per
    * pinned build — O(#files), no jobs). Builds are immutable, so
    * `same` means bit-identical data, not merely equal counts. */
  def diffSnapshots(tagA: String, tagB: String)
      : Seq[(String, String, Long, Long)] = {
    requireSnapshotTag(tagA); requireSnapshotTag(tagB)
    val byTag = listSnapshots().groupBy(_._1)
    def pins(t: String): Map[String, String] = byTag.getOrElse(t, Seq.empty)
      .map { case (_, table, loc) => table -> loc }.toMap
    val (a, b) = (pins(tagA), pins(tagB))
    require(a.nonEmpty, s"no snapshot '$tagA'")
    require(b.nonEmpty, s"no snapshot '$tagB'")
    def bytes(loc: String): Long =
      if (loc.isEmpty) -1L
      else {
        val p = new org.apache.hadoop.fs.Path(loc)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) -1L
        else fs.getContentSummary(p).getLength
      }
    (a.keySet ++ b.keySet).toSeq.sorted.map { table =>
      (a.get(table), b.get(table)) match {
        case (Some(la), None) => (table, "only_a", bytes(la), -1L)
        case (None, Some(lb)) => (table, "only_b", -1L, bytes(lb))
        case (Some(la), Some(lb)) if la == lb =>
          val n = bytes(la); (table, "same", n, n)
        case (Some(la), Some(lb)) => (table, "changed", bytes(la), bytes(lb))
        case _ => throw new IllegalStateException("unreachable")
      }
    }
  }

  /** Pinned locations for one table across ALL tags, plus whether any
    * pin file is torn (vacuum refuses the relation in that case — an
    * unknown pinned location could be any build dir). */
  /** Every tag's pins in ONE sweep, keyed by `schema.table` — vacuum
    * consults pins for every relation, and a per-relation probe of
    * every tag directory is O(#relations x #tags) filesystem round
    * trips (expensive on object stores) for a pin set that is static
    * across the pass. Dot-prefixed dirs (createSnapshot's `.tmp_<tag>`
    * staging, same filter listSnapshots applies) are skipped: a torn
    * TEMP pin from a crashed createSnapshot must not refuse the
    * relation forever while listSnapshots shows nothing to drop. */
  private def allSnapshotPins(): Map[String, (Set[String], Boolean)] = {
    val root = snapshotsRoot
    val fs = pointerFs(root)
    if (!fs.exists(root)) Map.empty
    else {
      val states = for {
        d <- fs.listStatus(root).toSeq
        if d.isDirectory && !d.getPath.getName.startsWith(".")
        f <- fs.listStatus(d.getPath).toSeq
        if f.isFile
      } yield f.getPath.getName -> pointerStateAt(f.getPath)
      states.groupBy(_._1).map { case (n, ss) =>
        n -> ((ss.map(_._2).collect { case PointerLive(l) => l }.toSet,
          ss.map(_._2).contains(PointerUnresolvable)))
      }
    }
  }

  private[etl] def readPointer(name: TableName): Option[String] =
    pointerState(name) match {
      case PointerLive(loc) => Some(loc)
      case _ => None
    }

  /** Version stamp for freshness contracts (the MV-rewrite staleness
    * probe): the live build location plus an md5 over the RECURSIVE
    * data-file listing (path, length, mtime) — every mutation moves
    * it: rebuilds/compactions move the location, appends add files,
    * and partition-scoped backfills rewrite files in nested
    * `col=value/` directories (which a top-level listing would miss —
    * a stale MV would keep rewriting over a backfilled base). The
    * mtime term catches a same-name same-size rewrite; md5 keeps
    * collisions out of a correctness gate. */
  def tableVersion(name: TableName): String =
    readPointer(name).orElse(locationOf(name)).map { loc =>
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = pointerFs(p)
      val b = Seq.newBuilder[String]
      if (fs.exists(p)) {
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val s = it.next()
          b += s"${s.getPath}:${s.getLen}:${s.getModificationTime}"
        }
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(b.result().sorted.mkString(",")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      loc + "|" + md.digest().map("%02x".format(_)).mkString
    }.getOrElse("absent")

  /** Per-partition version stamps for a hive-partitioned live
    * location: one hash per top-level `col=value` directory (its
    * recursive file listing), plus a `""` entry for any files sitting
    * at the root. The MV rewrite uses these to stay armed for queries
    * provably confined to partitions a backfill did not touch —
    * whole-table [[tableVersion]] moves on ANY mutation, which would
    * needlessly disarm day-B queries after a day-A backfill. For
    * multi-column partitioning the granularity is the FIRST partition
    * column (a change anywhere below `day=x/` moves `day=x`'s stamp —
    * coarser, never wrong). */
  def partitionVersions(name: TableName): Map[String, String] =
    readPointer(name).orElse(locationOf(name)).map { loc =>
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = pointerFs(p)
      if (!fs.exists(p)) Map.empty[String, String]
      else {
        def hashOf(entries: Seq[String]): String = {
          val md = java.security.MessageDigest.getInstance("MD5")
          md.update(entries.sorted.mkString(",")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          md.digest().map("%02x".format(_)).mkString
        }
        val top = fs.listStatus(p)
        val (dirs, files) = top.partition(_.isDirectory)
        val perDir = dirs.filter(_.getPath.getName.contains("=")).map { d =>
          val b = Seq.newBuilder[String]
          val it = fs.listFiles(d.getPath, true)
          while (it.hasNext) {
            val s = it.next()
            b += s"${s.getPath}:${s.getLen}:${s.getModificationTime}"
          }
          d.getPath.getName -> hashOf(b.result())
        }.toMap
        perDir + ("" -> hashOf(files.toSeq.map(s =>
          s"${s.getPath}:${s.getLen}:${s.getModificationTime}")))
      }
    }.getOrElse(Map.empty)

  // ------------------------------------------------------ full load (D1-D7)
  /** Load a set of relations in execution order (load.py:1131-1214):
    * create schemas, build each relation; a failed relation marks its
    * dependents skip-copy (load.py:202-219) unless required, in which
    * case the whole load aborts with [[RequiredRelationLoadError]].
    * Relations on the same execution level are independent; source
    * tables are built concurrently (D5) via parallel collections over
    * Spark's thread-safe job submission. */
  def loadRelations(relations: Seq[Relation],
                    pos: SchemaPosition.Value = SchemaPosition.Standard,
                    maxConcurrency: Int = 4,
                    analyzeAfter: Boolean = false,
                    skipCopyAll: Boolean = false,
                    step: String = "load"): Seq[BuildResult] = {
    val ordered = Dag.orderByDependencies(relations)
    createSchemas(ordered, pos)
    // Dependencies outside this run (continue-from fast-forwards past
    // them) resolve at their published standard position.
    val inRun = Some(ordered.map(_.identifier).toSet)
    val failed = mutable.Set[String]()
    val skipCopy = mutable.Set[String]()
    val results = mutable.Buffer[BuildResult]()
    // Group by level: within a level there are no mutual deps (D5/D7).
    ordered.groupBy(_.executionLevel).toSeq.sortBy(_._1).foreach { case (_, levelRels) =>
      val levelResults = parallelMap(levelRels, maxConcurrency) { rel =>
        val mustSkip = skipCopyAll ||
          rel.dependencies.exists(d => failed.contains(d.identifier)) ||
          rel.dependencies.exists(d => skipCopy.contains(d.identifier))
        try Right(buildOneRelation(rel, pos, skipCopy = mustSkip, inRun = inRun,
          step = step))
        catch { case e: Exception => Left((rel, e)) }
      }
      levelResults.foreach {
        case Right(r) =>
          if (r.skipped) skipCopy += r.identifier
          results += r
        case Left((rel, e)) =>
          if (rel.isRequired)
            throw new RequiredRelationLoadError(
              s"required relation '${rel.identifier}' failed: ${e.getMessage}")
          System.err.println(
            s"[load] relation '${rel.identifier}' failed (dependents will skip copy): ${e.getMessage}")
          failed += rel.identifier
      }
    }
    // Post-build ANALYZE (load.py:554-561) behind a flag: CBO stats
    // for downstream transformations, skipping failed/empty builds.
    if (analyzeAfter) results.filter(r => r.kind != "view" && !r.skipped)
      .foreach(r => analyze(TableName.parse(r.identifier).inPosition(pos)))
    results.toSeq
  }

  /** The reference maps load concurrency onto Redshift WLM slots
    * (commands.py: wlm_query_slot_count); the Spark analog is a FAIR
    * scheduler pool. Every concurrent build thread tags its jobs with
    * this pool name so that, when the session runs with
    * `spark.scheduler.mode=FAIR`, parallel relation builds share
    * executors fairly instead of FIFO-starving each other. Under the
    * default FIFO mode the property is inert — safe to set always. */
  val LoadSchedulerPool = "graft-load"

  private[etl] def parallelMap[A, B](xs: Seq[A], parallelism: Int)(f: A => B): Seq[B] =
    if (xs.size <= 1 || parallelism <= 1) xs.map(f)
    else {
      import java.util.concurrent.Executors
      import scala.concurrent._
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(math.min(parallelism, xs.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(xs.map(x => Future {
        // local properties are thread-local: each worker thread tags
        // its Spark jobs with the load pool (and clears after, since
        // executor threads are reused across levels)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", LoadSchedulerPool)
        try f(x)
        finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      })), Duration.Inf)
      finally pool.shutdown()
    }

  // ------------------------------------------------ lifecycle (L1-L4)
  /** Build everything into staging, then publish: backup the standard
    * tables and promote staging via pointer swaps
    * (data_warehouse.py:105-205, load.py:1202-1214). On failure the
    * standard schemas are untouched — staging IS the isolation. */
  def loadWithStagingAndPublish(relations: Seq[Relation],
                                maxConcurrency: Int = 4,
                                analyzeAfter: Boolean = false): Seq[BuildResult] = {
    val results = loadRelations(relations, SchemaPosition.Staging, maxConcurrency)
    publish(relations)
    // Stats must attach to the PUBLISHED catalog entries: the staging
    // names are dropped by the promote, taking any stats with them.
    if (analyzeAfter) analyzeAll(relations.filter(rel =>
      results.exists(r => r.identifier == rel.identifier && !r.skipped)))
    results
  }

  /** Promote staging → standard (backup current standard first). */
  def publish(relations: Seq[Relation]): Unit = {
    val ordered = Dag.orderByDependencies(relations)
    createSchemas(ordered, SchemaPosition.Standard)
    createSchemas(ordered, SchemaPosition.Backup)
    ordered.foreach { rel =>
      val std = rel.name
      val stg = rel.name.inPosition(SchemaPosition.Staging)
      val bak = rel.name.inPosition(SchemaPosition.Backup)
      if (rel.isView) {
        // Views re-point at standard-position references on promote.
        // CREATE OR REPLACE (not drop-then-create): a concurrent
        // reader never observes a missing relation.
        def holdsTable(n: TableName): Boolean =
          spark.catalog.tableExists(n.identifier) &&
            spark.catalog.getTable(n.identifier).tableType != "VIEW"
        // A relation published as a table MORE than once also left a
        // backup TABLE + pointer; a view is never restored from backup,
        // and a stale backup pointer pins a dead build location as
        // live if the relation reverts to a table.
        if (holdsTable(bak)) spark.sql(s"DROP TABLE ${bak.quoted}")
        else spark.sql(s"DROP VIEW IF EXISTS ${bak.quoted}")
        deletePointer(bak)
        val q = rewriteQuery(rel.design.query, rel.design.dependsOn,
          SchemaPosition.Standard)
        // if the standard name currently holds a TABLE (relation kind
        // changed between runs), replace-view would fail — clear it
        // first; any OTHER failure must surface untouched
        if (holdsTable(std)) {
          spark.sql(s"DROP TABLE ${std.quoted}")
          // the dropped table's pointer would otherwise permanently
          // mark its (now dead) build location live in vacuum's set —
          // and pin a re-used location if the relation reverts to a
          // table later
          deletePointer(std)
        }
        spark.sql(s"CREATE OR REPLACE VIEW ${std.quoted} AS $q")
        spark.sql(s"DROP VIEW IF EXISTS ${stg.quoted}")
      } else {
        val d = Some(rel.design)
        locationOf(std).foreach(registerAt(bak, _, d))       // L2 backup
        locationOf(stg) match {
          case Some(loc) =>
            registerAt(std, loc, d)                           // L3 promote
            spark.sql(s"DROP TABLE IF EXISTS ${stg.quoted}")
            deletePointer(stg)   // its build now lives behind the standard pointer
          case None => ()
        }
      }
    }
  }

  /** Restore standard from backup (L4, load.py:1202-1206). */
  def restoreFromBackup(relations: Seq[Relation]): Unit =
    Dag.orderByDependencies(relations).foreach { rel =>
      if (!rel.isView) {
        val bak = rel.name.inPosition(SchemaPosition.Backup)
        locationOf(bak).foreach(registerAt(rel.name, _, Some(rel.design)))
      }
    }

  // ------------------------------------------------------ upgrade
  /** The reference's third core data-processing command: `upgrade`
    * (commands.py:1152-1276, load.py:1217-1305) — in-place rebuild of
    * a selection at the STANDARD position, each table visible to
    * readers as its pointer swaps ("the rebuild is visible to users",
    * i.e. outside a transaction — distinct from `load`'s
    * staging+publish and `update`'s all-or-nothing refresh). By
    * default the selection expands to everything transitively
    * depending on it, like `load`; `onlySelected` restricts the
    * rebuild to exactly the matched relations (the reference's
    * `--only-selected`: "leaves warehouse in inconsistent state, for
    * debugging only"), optionally widened by the dependent VIEWs with
    * no CTAS in between (`--include-immediate-views` — what a
    * Redshift `DROP TABLE .. CASCADE` would have taken down and the
    * rebuild must put back). */
  def upgradeRelations(relations: Seq[Relation], selector: TableSelector,
                       onlySelected: Boolean = false,
                       includeImmediateViews: Boolean = false,
                       continueFrom: Option[String] = None,
                       skipCopy: Boolean = false,
                       maxConcurrency: Int = 4,
                       targetSchema: Option[String] = None): Seq[BuildResult] = {
    // --into-schema implies --only-selected (commands.py:1219-1224)
    val effectiveOnly = onlySelected || targetSchema.isDefined
    val selected = Dag.selectInExecutionOrder(relations, selector,
      includeDependents = !effectiveOnly,
      includeImmediateViews = includeImmediateViews,
      continueFrom = continueFrom)
    // load.py:1274-1285: surface which immediate views are NOT part
    // of an --only-selected upgrade — their queries read tables this
    // rebuild replaces underneath them.
    if (effectiveOnly && !includeImmediateViews) {
      val missed = Dag.findImmediateViews(
        Dag.orderByDependencies(relations), selector)
      if (missed.nonEmpty)
        System.err.println("[upgrade] these views are not part of the upgrade: " +
          missed.map(_.identifier).mkString(", "))
    }
    targetSchema match {
      case None =>
        loadRelations(selected, SchemaPosition.Standard,
          maxConcurrency = maxConcurrency, skipCopyAll = skipCopy,
          step = "upgrade")
      case Some(ts) =>
        // `--into-schema` (load.py:1248-1272): build the selection
        // into a side schema (a scratch copy for debugging) while the
        // queries still read dependencies at their NORMAL positions —
        // which is exactly why the selection may not span execution
        // levels: a selected relation depending on another selected
        // one would read the ORIGINAL, not the relocated copy.
        val levels = selected.map(_.executionLevel).distinct
        if (levels.size > 1)
          throw new InvalidSelectionError(
            "relations might depend on each other while target schema is in effect " +
              s"(involved execution levels: ${levels.sorted.mkString(", ")})")
        val relocated = selected.map(r => r.copy(design =
          r.design.copy(name = TableName(ts, r.name.table))))
        loadRelations(relocated, SchemaPosition.Standard,
          maxConcurrency = maxConcurrency, skipCopyAll = skipCopy,
          step = "upgrade")
    }
  }

  // ------------------------------------------------------------ T6
  /** The `update` command (delete-then-reload,
    * load.py:1308-1367, 422-425): refresh the selected tables AND
    * their downstream transformations in place, in execution order
    * (`onlySelected` restricts to the matched tables, the reference's
    * `--only-selected` debugging flag). Views are untouched.
    *
    * The reference wraps the whole refresh in ONE Redshift
    * transaction — a failure anywhere rolls every table back
    * (load.py:1357-1364). The pointer-swap equivalent (SURVEY §7.3):
    * each table's pre-update location is captured up front, builds
    * re-point the standard names in order (later CTAS reads earlier
    * tables' fresh data, as inside the reference's transaction), and
    * on ANY failure every already-swapped pointer is restored — after
    * the command the warehouse holds either all-new or all-old data,
    * never a mix. Rolled-back build locations are left for [[vacuum]]
    * (no pointer references them). Readers DURING the run may see a
    * mix — the price of updating in place without staging; `load`'s
    * staging+publish is the isolation path. */
  def updateRelations(relations: Seq[Relation], selector: TableSelector,
                      scheduledStartMs: Option[Long] = None,
                      eventLog: Option[String] = None,
                      waitTimeoutMs: Long = 3600 * 1000L,
                      pollMs: Long = 30 * 1000L,
                      onlySelected: Boolean = false): Seq[BuildResult] = {
    val selected = Dag.selectInExecutionOrder(relations, selector,
      includeDependents = !onlySelected)
    // `update --scheduled-start-time T`: the reference blocks until
    // every selected SOURCE table has an extract-finish event newer
    // than T (monitor.py:825-859, load.py:1343-1355) — the daily
    // refresh must not reload yesterday's extract. Events come from
    // the in-memory monitor and/or a cross-process JSON-lines log.
    scheduledStartMs.foreach { since =>
      awaitExtractEvents(
        selected.filterNot(_.isTransformation).map(_.identifier),
        since, eventLog, waitTimeoutMs, pollMs)
    }
    val tables = selected.filterNot(_.isView)
    val prior: Seq[(Relation, Option[String])] =
      tables.map(r => r -> locationOf(r.name))
    val done = mutable.Buffer[String]()
    try tables.map { rel =>
      val r = buildOneRelation(rel, SchemaPosition.Standard, step = "update")
      done += rel.identifier
      r
    } catch { case e: Throwable =>
      // the "rollback": restore every already-swapped table to its
      // pre-update location; a table that did not exist before the
      // update is dropped again. The FAILING table is restored too:
      // buildOneRelation undoes its own registration only on a
      // constraint failure, but a bucketed table's write path runs
      // DROP TABLE before saveAsTable, so a mid-write failure would
      // otherwise leave it dropped (registerAt is idempotent — re-
      // registering a table the failure never touched is a no-op).
      prior.filter { case (r, _) =>
        done.contains(r.identifier) ||
          (done.size < tables.size && r.identifier == tables(done.size).identifier)
      }.foreach {
          case (r, Some(loc)) => registerAt(r.name, loc, Some(r.design))
          case (r, None) =>
            spark.sql(s"DROP TABLE IF EXISTS ${r.name.quoted}")
            deletePointer(r.name)
        }
      throw e
    }
  }

  // ------------------------------------------------------------ C1 (standalone)
  /** Standalone constraint re-verification over ALREADY-LOADED tables
    * (commands.py:1552-1574, load.py:1407-1421): no rebuild — read
    * each selected table at `pos` and run its declared constraints.
    * Collects every violation instead of throwing on the first, so
    * the CLI reports the full damage in one pass. Identity surrogate
    * keys are NOT trusted here: the table at rest is being audited,
    * not a build this engine just produced. */
  def checkConstraints(relations: Seq[Relation], selector: TableSelector,
                       pos: SchemaPosition.Value = SchemaPosition.Standard)
      : Seq[(String, String)] =
    relations.filter(r => !r.isView && selector.matches(r.name)).flatMap { rel =>
      val target = rel.name.inPosition(pos)
      try {
        verifyConstraints(spark.table(target.quoted), rel.design,
          trustEngineIdentity = false)
        None
      } catch {
        case e: FailedConstraintError => Some(rel.identifier -> e.getMessage)
        case e: Exception =>   // e.g. the table was never loaded at `pos`
          Some(rel.identifier -> s"not checkable: ${e.getMessage}")
      }
    }

  /** Block until every id in `ids` has an extract `finish` event
    * stamped at or after `sinceMs`, polling the monitor buffer and the
    * optional cross-run event log; [[MissingExtractEventError]] after
    * `timeoutMs` (reference: 30 s poll / 1 h timeout). */
  private[etl] def awaitExtractEvents(ids: Seq[String], sinceMs: Long,
                                      eventLog: Option[String],
                                      timeoutMs: Long, pollMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var pending = ids.toSet
    while (pending.nonEmpty) {
      val seen = (monitor.events ++
          eventLog.toSeq.flatMap(Monitor.readLog))
        .filter(e => e.step == "extract" && e.event == "finish" &&
          e.ts.exists(_ >= sinceMs))
        .map(_.target).toSet
      pending = pending.filterNot(seen)
      if (pending.nonEmpty) {
        if (System.currentTimeMillis() >= deadline)
          throw new MissingExtractEventError(
            s"no extract event at/after epoch-ms $sinceMs for: " +
              pending.toSeq.sorted.mkString(", "))
        Thread.sleep(pollMs)
      }
    }
  }

  // ------------------------------------------------------------ D6
  /** Event-driven load ("concurrent extract", load.py:790-988): the
    * reference polls DynamoDB for per-table extract-finish events and
    * loads each table as its extract lands, with an idle timeout.
    * Here the event store is a marker directory: the extractor drops
    * `<schema>.<table>.extracted`; this poller builds each source as
    * its marker appears, then runs transformations in order. */
  def eventDrivenLoad(relations: Seq[Relation], markerDir: String,
                      idleTimeoutMs: Long = 3600 * 1000L,
                      pollMs: Long = 100L): Seq[BuildResult] = {
    val ordered = Dag.orderByDependencies(relations)
    createSchemas(ordered, SchemaPosition.Standard)
    val sources = ordered.filterNot(_.isTransformation)
    val results = mutable.Buffer[BuildResult]()
    val pending = mutable.Set[String](sources.map(_.identifier): _*)
    // Markers through the Hadoop FS API (not java.nio): the marker
    // directory lives wherever the extractor runs — HDFS or an object
    // store in production, file: in tests — and all schemes must work.
    val markerBase = new org.apache.hadoop.fs.Path(markerDir)
    val markerFs =
      markerBase.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var lastProgress = System.currentTimeMillis()
    while (pending.nonEmpty) {
      val arrived = pending.toSeq.sorted.filter { id =>
        markerFs.exists(
          new org.apache.hadoop.fs.Path(markerBase, s"$id.extracted"))
      }
      if (arrived.nonEmpty) {
        arrived.foreach { id =>
          results += buildOneRelation(sources.find(_.identifier == id).get)
          pending -= id
        }
        lastProgress = System.currentTimeMillis()
      } else if (System.currentTimeMillis() - lastProgress > idleTimeoutMs) {
        throw new RequiredRelationLoadError(
          s"idle timeout waiting for extract events: ${pending.toSeq.sorted.mkString(", ")}")
      } else Thread.sleep(pollMs)
    }
    ordered.filter(_.isTransformation).foreach(rel =>
      results += buildOneRelation(rel))
    results.toSeq
  }

  // ------------------------------------------------------------ L6
  /** ANALYZE (load.py:554-561): refresh table statistics so the CBO
    * has row counts/sizes — the reference runs this after every
    * build. VACUUM's Spark analog (small-file compaction) is
    * unnecessary here: each build writes fresh, right-sized files —
    * but see [[vacuum]] for the storage-reclamation half of the
    * reference's VACUUM. */
  def analyze(target: TableName): Unit =
    spark.sql(s"ANALYZE TABLE ${target.quoted} COMPUTE STATISTICS")

  /** ANALYZE every table built by a load, at its LIVE (post-publish)
    * position — stats live on the catalog entry, so they must be
    * computed after the pointer swap, not on the dropped staging
    * name. Views carry no stats. */
  def analyzeAll(relations: Seq[Relation]): Unit =
    relations.filterNot(_.isView).foreach(rel => analyze(rel.name))

  /** Storage reclamation — the role the reference's VACUUM plays
    * (load.py:767-784). Every [[writeTable]] lands at a fresh
    * versioned location and publish keeps only the standard + one
    * backup pointer, so superseded build directories accumulate: a
    * nightly-rebuilt warehouse would leak a full copy of every table
    * per day. This deletes, per relation, every build directory under
    * `data/<positionSchema>.<table>/` — writeTable keys the data dir
    * by the BUILD position's name, so a staged build lands under
    * `data/etl_staging__<schema>.<table>/` and publish re-points the
    * standard name there — that no lifecycle pointer (standard,
    * staging, backup) references. Hadoop FS API throughout — one LIST
    * + O(#dead builds) deletes per position dir, any scheme.
    *
    * Run it after publish (or offline); it must not run concurrently
    * with a load, whose newest build directory is unreferenced until
    * the write's own registration. Returns the deleted locations plus
    * the relations refused (unresolvable live set) — callers surface
    * refusals, they are not "nothing to do".
    *
    * `dryRun` reports exactly what a real pass would delete (same
    * liveness resolution, same refusals) without touching the
    * filesystem — the safety preview an operator runs before the
    * first vacuum of an unfamiliar warehouse. */
  def vacuum(relations: Seq[Relation], dryRun: Boolean = false,
             scratchGraceMs: Long = 60 * 60 * 1000L): VacuumResult = {
    import org.apache.hadoop.fs.Path
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    def qualified(p: Path): String = {
      val fs = p.getFileSystem(hadoopConf)
      fs.makeQualified(p).toUri.getPath
    }
    val positions =
      Seq(SchemaPosition.Standard, SchemaPosition.Staging, SchemaPosition.Backup)
    val deleted = mutable.Buffer[String]()
    val refused = mutable.Buffer[String]()
    // one snapshot-tree sweep for the whole pass (see allSnapshotPins)
    val pinsByName = allSnapshotPins()
    relations.filterNot(_.isView).foreach { rel =>
      // Live = session catalog ∪ the persisted pointers manifest: a
      // standalone `Cli vacuum` runs with an EMPTY in-memory catalog,
      // and before the manifest existed that resolved zero live
      // locations — and deleted every build, standard and backup
      // included. The manifest is the cross-JVM source of truth.
      val posNames = positions.map(rel.name.inPosition)
      val states = posNames.map(pointerState)
      // Snapshot pins count as live: a pinned build is someone's
      // frozen training corpus. A torn pin file refuses the relation
      // exactly like a torn lifecycle pointer — the unknown pinned
      // location could be any build dir about to be deleted.
      val (pins, pinTorn) = pinsByName.getOrElse(
        s"${rel.name.schema}.${rel.name.table}", (Set.empty[String], false))
      val live: Set[String] = posNames.flatMap(n => locationOf(n).toSeq)
        .++(states.collect { case PointerLive(loc) => loc })
        .++(pins)
        .map(loc => qualified(new Path(loc)))
        .toSet
      val hasData = posNames.exists { posName =>
        val tableDir =
          new Path(s"$warehouseDir/data/${posName.schema}.${posName.table}")
        tableDir.getFileSystem(hadoopConf).exists(tableDir)
      }
      if (states.contains(PointerUnresolvable) || pinTorn) {
        // A pointer file EXISTS but cannot be read (torn write): one
        // position's live location is unknown, so any delete might hit
        // it. Refuse the whole relation — even if other positions
        // resolve.
        refused += rel.identifier
        System.err.println(
          s"[vacuum] refusing '${rel.identifier}': a pointer or snapshot file " +
            "exists but is empty/unreadable; re-run a load/publish (or re-pin " +
            "the snapshot) first")
      } else if (live.isEmpty) {
        // Fail-safe: data on disk but NO resolvable live pointer means
        // we cannot tell dead builds from live ones (e.g. a pre-manifest
        // warehouse vacuumed from a fresh JVM). Refuse to guess.
        if (hasData) {
          refused += rel.identifier
          System.err.println(
            s"[vacuum] refusing '${rel.identifier}': build data exists but no " +
              "live location is resolvable (catalog or pointers manifest); " +
              "re-run a load/publish to establish pointers first")
        }
      } else posNames.foreach { posName =>
        val tableDir =
          new Path(s"$warehouseDir/data/${posName.schema}.${posName.table}")
        val fs = tableDir.getFileSystem(hadoopConf)
        if (fs.exists(tableDir)) {
          fs.listStatus(tableDir).filter(_.isDirectory).foreach { st =>
            if (!live.contains(qualified(st.getPath))) {
              if (!dryRun) { fs.delete(st.getPath, true); () }
              deleted += st.getPath.toString
            }
          }
        }
      }
    }
    // scratch sweep: compactPartitions hops through <warehouse>/tmp —
    // a crash between its write and its finally can orphan a scratch
    // dir there. Nothing live is ever under tmp/ — but a compaction
    // IN FLIGHT in another process has its scratch there right now,
    // so only reclaim entries older than the grace window (an active
    // compaction finishes well within it; an orphan only ages).
    val tmpDir = new Path(s"$warehouseDir/tmp")
    val tmpFs = tmpDir.getFileSystem(hadoopConf)
    val scratchCutoff = System.currentTimeMillis() - scratchGraceMs
    if (tmpFs.exists(tmpDir))
      tmpFs.listStatus(tmpDir).foreach { st =>
        if (st.getModificationTime < scratchCutoff) {
          if (!dryRun) { tmpFs.delete(st.getPath, true); () }
          deleted += st.getPath.toString
        }
      }
    VacuumResult(deleted.toSeq, refused.toSeq)
  }
}

object Warehouse {
  /** Hive's directory name for a NULL partition value. */
  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"
}
