package graft
object DumpSql {
  def main(args: Array[String]): Unit = {
    java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
      SparkEntry.oracleSql(args(0)).getBytes("UTF-8"))
    ()
  }
}
