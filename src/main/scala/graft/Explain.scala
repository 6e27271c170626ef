package graft

/** Plan-audit helper: print the executed plan of registered queries.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName...] — with no names,
  * audits every registered query and reports only the scale anti-
  * patterns (nested-loop / cartesian joins), so a full-registry sweep
  * stays readable.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Explain <sfDir> [queryName...]")
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(
      unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"
    )
    val spark = LocalSession.create("ERROR")
    try {
      val selected =
        if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
        else names.map(n => n -> SparkEntry.queries(n))
      // audit logic lives in PlanAudit (shared with PlanAuditSpec, which
      // enforces the same sweep on every sbt test)
      selected.foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val nlJoins = PlanAudit.nestedLoopJoins(df)
          val unboundedKinds = PlanAudit.unboundedJoins(df)
          if (names.nonEmpty) {
            println(s"==== $name ====")
            println(df.queryExecution.executedPlan.toString)
          }
          if (unboundedKinds.nonEmpty && !PlanAudit.contractBounded(name))
            println(s"[antipattern] $name: ${unboundedKinds.distinct.mkString(", ")}")
          else if (nlJoins.nonEmpty)
            println(s"[bounded-bnl] $name: ${nlJoins.size} nested-loop join(s), bounded by plan structure or operator contract")
          else if (names.isEmpty) println(s"[ok] $name")
        } catch {
          case e: Throwable => println(s"[error] $name: ${e.getMessage}")
        }
      }
    } finally spark.stop()
  }
}
