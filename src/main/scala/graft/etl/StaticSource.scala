package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Static sources + manifests (S7, S8, S9): a static source's
  * "extract" only verifies `_SUCCESS` exists over pre-existing files
  * and (re)writes the COPY manifest
  * (/root/reference/python/etl/extract/static.py:9-36,
  * manifest_only.py:9-27, extractor.py:203-260). Reading the data is
  * a plain schema-enforced `spark.read`. */
object StaticSource {

  final class MissingSuccessError(msg: String) extends RuntimeException(msg)

  /** S7: verify the prefix is a complete extract (`_SUCCESS` present)
    * and write its manifest — the whole static "extract" step. */
  def extractStatic(prefix: String): String = {
    requireSuccess(prefix)
    writeManifest(prefix)
  }

  /** S8: manifest-only re-extract — regenerate the manifest for data
    * that is already in place. */
  def extractManifestOnly(prefix: String): String = writeManifest(prefix)

  def requireSuccess(prefix: String): Unit =
    if (!ArtifactIo.exists(s"$prefix/_SUCCESS"))
      throw new MissingSuccessError(s"no _SUCCESS marker under $prefix")

  /** S9: COPY-manifest JSON over the part files
    * (`{"entries": [{"url": ..., "mandatory": true}]}`). Hadoop-FS
    * I/O, so the prefix may live on any scheme, not just local
    * disk. */
  def writeManifest(prefix: String): String = {
    requireSuccess(prefix)
    val entries = ArtifactIo.listNames(prefix)
      .filter(_.startsWith("part-"))
      .sorted
      .map(n => s"""{"url": "$prefix/$n", "mandatory": true}""")
    val path = s"$prefix/manifest.json"
    ArtifactIo.writeText(path, s"""{"entries": [${entries.mkString(", ")}]}""")
    path
  }

  /** The read side: schema-enforced load of a static prefix in any of
    * the reference's formats (gzip CSV / JSON / Avro,
    * extract/__init__.py:4-5) plus parquet. */
  def read(spark: SparkSession, design: TableDesign, prefix: String,
           format: String = "csv"): DataFrame = {
    requireSuccess(prefix)
    val base = spark.read.schema(design.toStructType)
      .option("pathGlobFilter", "part-*")
    (format match {
      case "csv" => base.option("nullValue", "\\N")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(prefix)
      case "json" => base.json(prefix)
      case "parquet" => base.parquet(prefix)
      case "avro" => AvroIO.read(spark, prefix, design.toStructType)
      case other => throw new IllegalArgumentException(s"unsupported format '$other'")
    })
  }
}
