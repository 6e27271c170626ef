package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget packs (the
  * training-example assembly step — concatenate-and-split wastes
  * document boundaries, padding wastes compute; first-fit packing of
  * whole documents is the standard middle ground).
  *
  * Scale shape: ZERO shuffle — each partition packs its own documents
  * with a first-fit-decreasing pass inside `mapPartitions`, and pack
  * ids are namespaced by partition id. Packing quality is a local
  * property; global coordination would buy a few percent of fill for
  * a full shuffle of the corpus — the wrong trade at 100 TB.
  * Oversized documents (> budget tokens) get a singleton pack flagged
  * `oversize` so callers can split or drop them explicitly.
  *
  * Output is partitioning-dependent (pack membership depends on which
  * docs share a partition), so this ships as API + invariant specs
  * rather than a cross-engine oracle query: every doc lands in exactly
  * one pack, no non-oversize pack exceeds the budget, and every pack
  * except possibly one per partition is more than half full (the
  * classical first-fit bound).
  */
object Packing {

  /** @param df     input with an id column and a token-count column
    * @param budget max tokens per pack (e.g. a model context length)
    * @return (pack_id, doc_id, n_tokens, oversize)
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokenCountCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(
        col(idCol).cast("long").as("doc_id"),
        col(tokenCountCol).cast("long").as("n_tokens")
      )
      .as[(Long, Long)]
    prepared.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        // first-fit-decreasing: sort the partition's docs by size desc,
        // place each into the first open pack with room
        val sorted = it.toArray.sortBy { case (id, n) => (-n, id) }
        val packs = scala.collection.mutable.ArrayBuffer
          .empty[(scala.collection.mutable.ArrayBuffer[(Long, Long)], Long)]
        val oversize = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        sorted.foreach { case (id, n) =>
          if (n > budget) oversize += ((id, n))
          else {
            val slot = packs.indexWhere { case (_, used) => used + n <= budget }
            if (slot < 0)
              packs += ((scala.collection.mutable.ArrayBuffer((id, n)), n))
            else {
              val (members, used) = packs(slot)
              members += ((id, n))
              packs(slot) = (members, used + n)
            }
          }
        }
        packs.iterator.zipWithIndex.flatMap { case ((members, _), i) =>
          members.iterator.map { case (id, n) => (s"p$pid-$i", id, n, false) }
        } ++ oversize.iterator.zipWithIndex.map { case ((id, n), i) =>
          (s"p$pid-oversize-$i", id, n, true)
        }
      }
      .toDF("pack_id", "doc_id", "n_tokens", "oversize")
  }
}
