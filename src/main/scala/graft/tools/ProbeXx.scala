package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch: dump xxhash64 reference values for oracle validation. */
object ProbeXx {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq("a","ab","abc","abcd","abcde","abcdef","abcdefg","abcdefgh",
        "the","quick","zebra777","", "0123456789012345678901234567890")
      .toDF("t").select(col("t"), xxhash64(col("t")).as("h"))
      .collect().foreach(r => println(s"XX|${r.getString(0)}|${r.getLong(1)}"))
    spark.stop()
  }
}
