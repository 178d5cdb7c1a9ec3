package graft.operators
/** Scratch (dev-side): dump the generated DuckDB XXH64 CTE chain so the
  * driver-side python validator can check it against reference values
  * for multi-chunk (9-31 byte) inputs the corpus never exercises.
  */
object ProbeXxSql {
  def main(args: Array[String]): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/xx_ctes.sql")),
      XxHash64Sql.ctes + "\n-- LAST=" + XxHash64Sql.last)
}
