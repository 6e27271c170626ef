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
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
      import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
      import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec}
      // A nested-loop/cartesian join is tolerable ONLY when one side is
      // provably bounded — a global (group-less) aggregate or an
      // explicit limit somewhere below it. That is a scalar subquery in
      // join clothing: O(N) work, no shuffle, the same as a
      // ScalarSubquery node. The check is STRUCTURAL, not a name
      // allowlist — if a formerly-bounded query regresses to
      // broadcasting an unbounded side, it fails the sweep.
      def bounded(p: SparkPlan): Boolean = p.collectFirst {
        case a: BaseAggregateExec if a.groupingExpressions.isEmpty => ()
        case _: GlobalLimitExec => ()
        case _: LocalLimitExec => ()
      }.isDefined
      // Brute-force ANN is deliberately query-set x corpus: the
      // broadcast side's boundedness is the OPERATOR's contract (the
      // caller passes a small query set — here a filter on 5 ids the
      // structural check can't prove bounded). Only these two carry a
      // contract-level exemption; everything else must prove it in
      // the plan.
      val contractBounded = Set("ann_bruteforce_topk", "ann_quantized_topk")
      selected.foreach { case (name, fn) =>
        try {
          val rootPlan = fn(spark, sfDir).queryExecution.executedPlan
          val physical = rootPlan match {
            case a: AdaptiveSparkPlanExec => a.executedPlan
            case p => p
          }
          val nlJoins = physical.collect {
            case b: BroadcastNestedLoopJoinExec => ("BroadcastNestedLoopJoin", b.left, b.right)
            case cj: CartesianProductExec => ("CartesianProduct", cj.left, cj.right)
          }
          val unboundedHits =
            nlJoins.filterNot { case (_, l, r) => bounded(l) || bounded(r) }
          if (names.nonEmpty) {
            println(s"==== $name ====")
            println(physical.toString)
          }
          if (unboundedHits.nonEmpty && !contractBounded(name))
            println(
              s"[antipattern] $name: ${unboundedHits.map(_._1).distinct.mkString(", ")}"
            )
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
