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
      val bad = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
      // Audited exceptions: each of these queries attaches a PROVABLY
      // 1-row (or k-row query-side) broadcast — a scalar subquery in
      // join clothing, O(N) with no shuffle. Catalyst constant-folds
      // the literal join key into a BNL, but the work is what a
      // ScalarSubquery node would do. Any query NOT in this set that
      // plans a BNL/cartesian is a real regression.
      val boundedBroadcast = Set(
        "ann_bruteforce_topk", // k-row query side vs one corpus scan
        "ann_quantized_topk", // same, over int8-quantized vectors
        "text_tfidf", // 1-row corpus doc-count
        "q22_idle_customers", // 1-row global average
        "profile_psi_drift", // 1-row global min/max bin edges
        "profile_missing_days" // 1-row global day span
      )
      selected.foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val hits = bad.filter(plan.contains)
          if (names.nonEmpty) {
            println(s"==== $name ====")
            println(plan)
          }
          if (hits.nonEmpty && !boundedBroadcast(name))
            println(s"[antipattern] $name: ${hits.mkString(", ")}")
          else if (hits.nonEmpty)
            println(s"[bounded-bnl] $name: audited 1-row/k-row broadcast")
          else if (names.isEmpty) println(s"[ok] $name")
        } catch {
          case e: Throwable => println(s"[error] $name: ${e.getMessage}")
        }
      }
    } finally spark.stop()
  }
}
