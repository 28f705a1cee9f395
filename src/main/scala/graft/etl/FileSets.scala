package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Relation file sets (Q6 + discovery): the reference assembles each
  * relation from files found by path convention —
  * `schemas/{schema}/{source_schema}-{table}.yaml` with an optional
  * sibling `.sql` holding the transform query
  * (/root/reference/python/etl/file_sets.py:42-110, regex at 60-68).
  * Same convention here: a directory tree of YAML designs + SQL files
  * becomes the relation set the DAG/load operate on. */
object FileSets {

  private val FileRe =
    raw"""(?:^|.*/)schemas/(\w+)/(?:(\w+)-)?(\w+)\.(yaml|sql)$$""".r

  final case class FileInfo(path: Path, schema: String,
                            sourceSchema: String, table: String, ext: String)

  def parseFilename(path: Path): Option[FileInfo] =
    path.toString.replace('\\', '/') match {
      case FileRe(schema, sourceSchema, table, ext) =>
        Some(FileInfo(path, schema,
          Option(sourceSchema).getOrElse(schema), table, ext))
      case _ => None
    }

  /** Discover every relation under `root`: designs from `.yaml`,
    * queries attached from the matching `.sql` (lazy in the
    * reference, eager here — designs are small). */
  def discover(root: String): Seq[Relation] = {
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return Seq.empty
    val files = Files.walk(rootPath).iterator().asScala
      .filter(Files.isRegularFile(_)).flatMap(parseFilename).toSeq
    val byTable = files.groupBy(f => (f.schema, f.table))
    byTable.toSeq.sortBy(_._1).flatMap { case ((_, _), fs) =>
      fs.find(_.ext == "yaml").map { y =>
        val text = new String(Files.readAllBytes(y.path), StandardCharsets.UTF_8)
        val design = TableDesign.fromYaml(text)
        val withQuery = fs.find(_.ext == "sql") match {
          case Some(q) if design.query.isEmpty =>
            design.copy(query =
              new String(Files.readAllBytes(q.path), StandardCharsets.UTF_8))
          case _ => design
        }
        // Queries are authored in the reference's Redshift dialect;
        // the shim rewrite runs once at load, not per execution.
        val shimmed =
          if (withQuery.query.nonEmpty)
            withQuery.copy(query = DialectShims.rewriteRedshiftSql(withQuery.query))
          else withQuery
        shimmed.validate()
        Relation(shimmed)
      }
    }
  }

  /** `arthur ls` (Q6, commands.py:1657-1686): list the file sets per
    * relation. */
  def ls(root: String): Seq[(String, Seq[String])] = {
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return Seq.empty
    Files.walk(rootPath).iterator().asScala
      .filter(Files.isRegularFile(_)).flatMap(parseFilename).toSeq
      .groupBy(f => s"${f.schema}.${f.table}")
      .map { case (id, fs) => id -> fs.map(_.path.toString).sorted }
      .toSeq.sortBy(_._1)
  }
}
