package graft
import org.apache.spark.sql.functions._
object DebugGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graftshim.DatasetShim
    val df = spark.range(3).select(concat(lit("hello world text sample"), col("id").cast("string")).as("t"))
    val c = DatasetShim.column(graft.functions.SimHashGrams(DatasetShim.expression(col("t")), 6, "g2|"))
    df.select(c.as("fp")).show()
    spark.stop()
  }
}
