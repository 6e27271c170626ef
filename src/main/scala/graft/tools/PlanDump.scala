package graft.tools

/** Print the executed plan of registered queries — the PLANS.md
  * regeneration tool. Usage:
  * {{{
  *   sbt "runMain graft.tools.PlanDump <sfDir> <queryName> [more...]"
  * }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <queryName>...")
    val sfDir = args.head
    val spark = graft.LocalSession.create("ERROR")
    args.tail.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
