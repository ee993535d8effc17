package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected registered queries —
  * the iterate-until-it's-the-plan-you-want loop for scale review
  * (pushdown reached the scan? broadcast where intended? how many
  * exchanges?). Usage: runMain graft.tools.PlanAudit [names...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.Registry.all.map(_.name)
    names.foreach { n =>
      println(s"\n================ $n ================")
      graft.Registry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
