package graft.etl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TableDesignSpec extends AnyFunSuite {

  private val ctasYaml =
    """name: rep.fact
      |source_name: CTAS
      |depends_on: [src.t]
      |columns:
      |  - name: id
      |    type: long
      |    not_null: true
      |    identity: true
      |  - name: amount
      |    type: decimal
      |    sql_type: numeric(12,2)
      |  - name: note
      |    type: string
      |  - name: hidden
      |    type: string
      |    skipped: true
      |constraints:
      |  - surrogate_key: [id]
      |query: SELECT 1
      |""".stripMargin

  test("YAML design parses: kinds, columns, constraints, deps") {
    val d = TableDesign.load(ctasYaml)
    assert(d.name == TableName("rep", "fact"))
    assert(d.isCtas && !d.isView && d.isTransformation)
    assert(d.columns.size == 4 && d.activeColumns.size == 3)
    assert(d.identityColumn.map(_.name).contains("id"))
    assert(d.dependsOn == Seq(TableName.parse("src.t")))
    assert(d.constraints == Seq(Constraint("surrogate_key", Seq("id"))))
  }

  test("generic types map to Spark types (SURVEY §1.3)") {
    assert(TableDesign.genericToSpark("boolean") == BooleanType)
    assert(TableDesign.genericToSpark("date") == DateType)
    assert(TableDesign.genericToSpark("int") == IntegerType)
    assert(TableDesign.genericToSpark("long") == LongType)
    assert(TableDesign.genericToSpark("double") == DoubleType)
    assert(TableDesign.genericToSpark("float") == FloatType)
    assert(TableDesign.genericToSpark("string") == StringType)
    assert(TableDesign.genericToSpark("timestamp") == TimestampType)
    assert(TableDesign.genericToSpark("uuid") == StringType)
    assert(TableDesign.genericToSpark("decimal", "numeric(12,2)") == DecimalType(12, 2))
    intercept[TableDesignError] { TableDesign.genericToSpark("blob") }
  }

  test("toStructType keeps order, nullability; drops skipped columns") {
    val st = TableDesign.load(ctasYaml).toStructType
    assert(st == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DecimalType(12, 2)),
      StructField("note", StringType))))
  }

  test("identity must be not_null (design/load.py:116-132)") {
    val bad = ctasYaml.replace("    not_null: true\n    identity: true",
      "    identity: true")
    val e = intercept[TableDesignError] { TableDesign.load(bad) }
    assert(e.getMessage.contains("identity column must be set to not null"))
  }

  test("surrogate key must equal the identity column") {
    val bad = ctasYaml.replace("surrogate_key: [id]", "surrogate_key: [note]")
    val e = intercept[TableDesignError] { TableDesign.load(bad) }
    assert(e.getMessage.contains("surrogate key must be identity column"))
  }

  test("constraints may not reference unknown or skipped columns") {
    val bad = ctasYaml.replace("surrogate_key: [id]", "unique: [hidden]")
    val e = intercept[TableDesignError] { TableDesign.load(bad) }
    assert(e.getMessage.contains("unknown unique column"))
  }

  test("VIEW designs allow only column names (design/load.py:160-180)") {
    val good = TableDesign.load(
      """name: rep.v
        |source_name: VIEW
        |depends_on: [rep.fact]
        |columns:
        |  - name: a
        |  - name: b
        |query: SELECT 1 AS a, 2 AS b
        |""".stripMargin)
    assert(good.isView)
    val bad =
      """name: rep.v
        |source_name: VIEW
        |columns:
        |  - name: a
        |    type: long
        |    not_null: true
        |query: SELECT 1 AS a
        |""".stripMargin
    val e = intercept[TableDesignError] { TableDesign.load(bad) }
    assert(e.getMessage.contains("too much information for column of a VIEW"))
  }

  test("upstream tables may not declare depends_on or natural keys") {
    val e1 = intercept[TableDesignError] { TableDesign.load(
      """name: src.t
        |source_name: src
        |depends_on: [src.other]
        |columns:
        |  - name: a
        |""".stripMargin) }
    assert(e1.getMessage.contains("has dependencies listed"))
    val e2 = intercept[TableDesignError] { TableDesign.load(
      """name: src.t
        |source_name: src
        |columns:
        |  - name: a
        |    type: long
        |constraints:
        |  - natural_key: [a]
        |""".stripMargin) }
    assert(e2.getMessage.contains("unexpected natural_key"))
  }

  test("split-by column must exist, be not-null, and be int/long/date/timestamp") {
    def src(extra: String, colExtra: String = ""): String =
      s"""name: src.t
         |source_name: src
         |columns:
         |  - name: k
         |    type: string$colExtra
         |extract_settings:
         |  $extra
         |""".stripMargin
    val e1 = intercept[TableDesignError] { TableDesign.load(src("split_by: [missing]")) }
    assert(e1.getMessage.contains("does not exist"))
    val e2 = intercept[TableDesignError] { TableDesign.load(src("split_by: [k]")) }
    assert(e2.getMessage.contains("not-null"))
    val e3 = intercept[TableDesignError] {
      TableDesign.load(src("split_by: [k]", "\n    not_null: true")) }
    assert(e3.getMessage.contains("must be int, long, date or timestamp"))
  }

  test("extract settings are rejected on transformations (CTAS)") {
    val bad = ctasYaml + "extract_settings:\n  condition: a > 1\n"
    val e = intercept[TableDesignError] { TableDesign.load(bad) }
    assert(e.getMessage.contains("not supported for transformations"))
  }

  test("unknown design / column keys are rejected (schema pass)") {
    intercept[TableDesignError] {
      TableDesign.fromYaml("name: a.b\nsource_name: src\nbogus: 1\ncolumns:\n  - name: x\n")
    }
    intercept[TableDesignError] {
      TableDesign.fromYaml("name: a.b\nsource_name: src\ncolumns:\n  - name: x\n    wat: 1\n")
    }
  }

  test("distribution enum arm (DISTSTYLE all/auto/even) parses; bad style rejected") {
    def withDist(v: String) = ctasYaml.replace("query: SELECT 1",
      s"attributes:\n  distribution: $v\nquery: SELECT 1")
    val all = TableDesign.load(withDist("ALL"))
    assert(all.distStyle.contains("all") && all.distribution.isEmpty,
      "scalar distribution must parse as style, not distkey")
    assert(TableDesign.load(withDist("even")).distStyle.contains("even"))
    assert(TableDesign.load(withDist("AUTO")).distStyle.contains("auto"))
    // round-trip through toYaml keeps the enum arm
    assert(TableDesign.fromYaml(TableDesign.toYaml(all)) == all.copy(query = ""))
    intercept[TableDesignError](TableDesign.load(withDist("ring")))
    // the list arm still means distkey
    val keyed = TableDesign.load(withDist("[id]"))
    assert(keyed.distribution.contains(Seq("id")) && keyed.distStyle.isEmpty)
    // compound_sort's enum arm: auto accepted (engine decides — the
    // Spark default), any other scalar is a typo and fails loudly
    def withSort(v: String) = ctasYaml.replace("query: SELECT 1",
      s"attributes:\n  compound_sort: $v\nquery: SELECT 1")
    assert(TableDesign.load(withSort("AUTO")).sortKeys.isEmpty)
    intercept[TableDesignError](TableDesign.load(withSort("fastest")))
  }

  test("NA row defaults per type (load.py:506-526)") {
    val d = TableDesign.load(
      """name: rep.dim_x
        |source_name: CTAS
        |depends_on: [src.t]
        |columns:
        |  - name: id
        |    type: long
        |    not_null: true
        |    identity: true
        |  - name: name
        |    type: string
        |    not_null: true
        |  - name: flag
        |    type: boolean
        |    not_null: true
        |  - name: amt
        |    type: double
        |    not_null: true
        |  - name: opt
        |    type: string
        |query: SELECT 1
        |""".stripMargin)
    val na = d.activeColumns.map(c => c.name -> d.naValueSql(c)).toMap
    assert(na("id") == "0")
    assert(na("name") == "'N/A'")
    assert(na("flag") == "false")
    assert(na("amt") == "CAST(0 AS DOUBLE)")
    assert(na("opt") == "CAST(NULL AS STRING)")
  }

  test("staging/backup naming convention (names.py:21-28, Spark-legal)") {
    val t = TableName.parse("Rep.Orders")
    assert(t == TableName("rep", "orders"))
    assert(t.inPosition(SchemaPosition.Staging) == TableName("etl_staging__rep", "orders"))
    assert(t.inPosition(SchemaPosition.Backup) == TableName("etl_backup__rep", "orders"))
    assert(t.inPosition(SchemaPosition.Standard) == t)
    assert(t.quoted == "`rep`.`orders`")
  }
}
