package graft

import org.apache.spark.sql.SparkSession

/** Scratch runner for the Fellegi-Sunter queries: dumps fs_em_params /
  * fs_em_match parquet + their oracle SQL for a one-query DuckDB
  * compare (tools/check_verify.py over the dump dir). */
object FsDebug {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("fs_em_params", "fs_em_match")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    for (name <- names) {
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val json = names
      .map(k => s"${q(k)}: ${q(SparkEntry.oracleSql(k))}").mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    System.err.println(f"[fsdebug] done in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
