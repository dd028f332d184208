package graft
import graft.core.Graft
/** Dev smoke: mirrors the driver's entry() rows>0 check. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")
    spark.stop()
  }
}
