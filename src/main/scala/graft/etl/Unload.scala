package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** UNLOAD / reload (S12, S13): the reference exports with
  * `UNLOAD ('SELECT ...') TO s3://... DELIMITER ',' ESCAPE ADDQUOTES
  * GZIP NULL AS '\\N' MANIFEST` and writes a `columns.yaml` so the
  * data can re-enter the warehouse as a static source
  * (/root/reference/python/etl/dialect/redshift.py:548-581,
  * unload.py:40-169, validate.py:266-325).
  *
  * Spark-first: `df.write.csv` with the same format options. The
  * distributed write IS the unload; `columns.yaml` + the manifest
  * keep the reference's observable contract so round-trips work. */
object Unload {

  /** Export a relation: gzip CSV, quoted fields, `\N` nulls, plus
    * columns.yaml and a manifest listing the part files. */
  def unload(df: DataFrame, design: TableDesign, destDir: String): Long = {
    val cols = design.activeColumns.map(_.name)
    val out = df.selectExpr(cols: _*)
    val capture = LoadMetricsCapture.install(df.sparkSession)
    capture.discard(destDir)
    out.write.mode("overwrite")
      .option("compression", "gzip")
      .option("quoteAll", "true")
      .option("nullValue", "\\N")
      // both: parquet-sourced naive timestamps surface as TIMESTAMP_NTZ
      // in Spark 4, which the CSV writer formats via timestampNTZFormat
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(destDir)
    writeColumnsYaml(design, destDir)
    writeManifest(destDir)
    // rowcount from the write's own metrics — recounting would
    // re-execute the source query end to end
    capture.await(destDir).map(_.rowsWritten).getOrElse(out.count())
  }

  private def writeColumnsYaml(design: TableDesign, destDir: String): Unit = {
    val yaml = new StringBuilder("columns:\n")
    design.activeColumns.foreach { c =>
      yaml.append(s"  - name: ${c.name}\n    type: ${c.tpe}\n")
      if (c.sqlType.nonEmpty) yaml.append(s"    sql_type: ${c.sqlType}\n")
    }
    ArtifactIo.writeText(s"$destDir/columns.yaml", yaml.toString)
  }

  /** Redshift COPY manifest shape (extract/extractor.py:203-260):
    * `{"entries": [{"url": ..., "mandatory": true}]}` over part
    * files; requires the `_SUCCESS` marker Spark wrote. Hadoop-FS
    * I/O — the unload destination may be on any scheme. */
  private def writeManifest(destDir: String): Unit = {
    require(ArtifactIo.exists(s"$destDir/_SUCCESS"),
      s"no _SUCCESS marker in $destDir")
    val entries = ArtifactIo.listNames(destDir)
      .filter(_.startsWith("part-"))
      .sorted
      .map(n => s"""{"url": "$destDir/$n", "mandatory": true}""")
    ArtifactIo.writeText(s"$destDir/manifest.json",
      s"""{"entries": [${entries.mkString(", ")}]}""")
  }

  /** Reload-ability (S13): read the unloaded CSV back with the
    * columns.yaml schema — the static-source extract path. */
  def reload(spark: SparkSession, destDir: String): DataFrame = {
    val yamlText = ArtifactIo.readText(s"$destDir/columns.yaml")
    val design = columnsFromYaml(yamlText)
    spark.read
      .schema(org.apache.spark.sql.types.StructType(design.map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.dataType))))
      .option("compression", "gzip")
      .option("nullValue", "\\N")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .option("pathGlobFilter", "part-*")   // skip columns.yaml/manifest.json
      .csv(destDir)
  }

  private[etl] def columnsFromYaml(text: String): Seq[ColumnDef] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val root = mapper.readTree(text)
    import scala.jdk.CollectionConverters._
    root.get("columns").elements.asScala.map { c =>
      ColumnDef(c.get("name").asText,
        Option(c.get("type")).map(_.asText).getOrElse("string"),
        Option(c.get("sql_type")).map(_.asText).getOrElse(""))
    }.toSeq
  }
}
