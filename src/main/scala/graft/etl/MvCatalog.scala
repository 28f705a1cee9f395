package graft.etl

import org.apache.spark.sql.SparkSession

import graft.plans.MvRewrite

/** Durable MV definitions — `CREATE MATERIALIZED VIEW` /
  * `REFRESH MATERIALIZED VIEW` as CLI verbs. The in-session rewrite
  * registry ([[graft.plans.MvRewrite]]) dies with the session; a CLI
  * tool is one process per command, so definitions persist as JSON
  * sidecars under `<warehouse>/_mvs/` and every later command that
  * opens the warehouse re-arms them (`armAll`). Each def stores the
  * base version stamp captured at (re)build; the rewrite stays
  * freshness-gated exactly as in-session — a base that moved since
  * the last refresh disarms its view until `refresh_mv`. */
object MvCatalog {

  final case class StoredMv(name: String, base: String, mv: String,
                            groupCols: Seq[String], aggCols: Seq[String],
                            version: String,
                            partCol: Option[String] = None,
                            partVersions: Map[String, String] = Map.empty)

  private def dir(wh: Warehouse): String = s"${wh.warehouseDir}/_mvs"

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def save(wh: Warehouse, d: StoredMv): Unit =
    ArtifactIo.writeText(s"${dir(wh)}/${d.name}.json",
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(d))

  def list(wh: Warehouse): Seq[StoredMv] =
    if (!ArtifactIo.exists(dir(wh))) Seq.empty
    else ArtifactIo.listFilesRecursive(dir(wh))
      .filter(_.endsWith(".json")).sorted
      .map { f =>
        val d = mapper.readValue(
          ArtifactIo.readText(s"${dir(wh)}/$f"), classOf[StoredMv])
        // defs written before partition stamps existed deserialize
        // with null fields — normalize to the whole-table contract
        d.copy(
          partCol = Option(d.partCol).flatten,
          partVersions = Option(d.partVersions).getOrElse(Map.empty))
      }

  /** Build (or rebuild) the partials table and persist the def with
    * the base's CURRENT version — create and refresh are the same
    * operation at different times. */
  /** First partition column of `t`, when the catalog knows one and
    * it is among the MV's group columns (partition-scoped freshness
    * needs the rewrite to keep the pinning filter). */
  private def partColOf(spark: SparkSession, t: TableName,
                        groupCols: Seq[String]): Option[String] =
    try spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t.table, Some(t.schema)))
      .partitionColumnNames.headOption.filter(groupCols.contains)
    catch { case _: Exception => None }

  def createOrRefresh(spark: SparkSession, wh: Warehouse, name: String,
                      base: TableName, mv: TableName,
                      groupCols: Seq[String], aggCols: Seq[String]): StoredMv = {
    wh.writeTable(mv,
      MvRewrite.partials(spark.table(base.quoted), groupCols, aggCols))
    val pc = partColOf(spark, base, groupCols)
    val d = StoredMv(name, base.identifier, mv.identifier,
      groupCols, aggCols, wh.tableVersion(base),
      partCol = pc,
      partVersions =
        if (pc.isDefined) wh.partitionVersions(base) else Map.empty)
    save(wh, d)
    arm(spark, wh, d)
    d
  }

  private def arm(spark: SparkSession, wh: Warehouse, d: StoredMv): Unit =
    MvRewrite.registerMv(spark, d.name,
      spark.table(TableName.parse(d.base).quoted),
      spark.table(TableName.parse(d.mv).quoted),
      d.groupCols, d.aggCols, d.version,
      () => wh.tableVersion(TableName.parse(d.base)),
      partCol = d.partCol,
      partVersions = d.partVersions,
      currentPartVersions =
        () => wh.partitionVersions(TableName.parse(d.base)))

  /** Arm every stored def in this session. A def whose base or MV
    * table has been dropped is skipped (warned), not fatal — the
    * warehouse stays operable while a dangling def awaits cleanup. */
  def armAll(spark: SparkSession, wh: Warehouse): Int = {
    val defs = list(wh)
    defs.count { d =>
      try { arm(spark, wh, d); true }
      catch {
        case e: Exception =>
          System.err.println(
            s"[mv] skipping '${d.name}': ${e.getMessage}")
          false
      }
    }
  }
}
