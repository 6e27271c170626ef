package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

class ExpressionTypeCheckSpec extends SparkSpec {
  import spark.implicits._

  test("shingleHashes rejects arrays with nullable elements at analysis time") {
    // the kernel reads raw longs, so a null slot would silently hash as
    // 0 — nullable-element inputs must fail analysis, not corrupt data
    val nullable = Seq((1L, Seq[java.lang.Long](1L, null, 3L)))
      .toDF("id", "hashes")
    val ex = intercept[Exception] {
      nullable
        .select(hashExpressions.shingleHashes(col("hashes"), 2).as("s"))
        .collect()
    }
    assert(
      ex.isInstanceOf[AnalysisException] ||
        ex.getMessage.contains("non-null elements"),
      s"unexpected error: $ex"
    )
  }

  test("array_compact is the documented remediation — it narrows containsNull") {
    // filter(a, x -> x IS NOT NULL) keeps containsNull=true and still
    // fails analysis; array_compact's result type is containsNull=false
    val nullable = Seq((1L, Seq[java.lang.Long](1L, null, 3L, 4L)))
      .toDF("id", "hashes")
    val out = nullable
      .select(hashExpressions.shingleHashes(array_compact(col("hashes")), 2).as("s"))
      .collect()
    assert(out.head.getSeq[Long](0).length == 2)
  }

  test("minhash/simhash skip null slots instead of hashing them as zero") {
    val df = Seq(
      (1L, Seq[java.lang.Long](7L, null, 9L)),
      (2L, Seq[java.lang.Long](7L, 9L))
    ).toDF("id", "hashes")
    val rows = df
      .select(
        col("id"),
        hashExpressions.minhashSignature(col("hashes"), 4).as("mh"),
        hashExpressions.simhash64(col("hashes")).as("sh")
      )
      .orderBy("id")
      .collect()
    // a null slot contributes nothing: signatures equal the null-free row's
    assert(rows(0).getSeq[Long](1) == rows(1).getSeq[Long](1))
    assert(rows(0).getLong(2) == rows(1).getLong(2))
  }

  test("shingleHashes accepts non-null-element arrays (tokenHashes output)") {
    val out = Seq((1L, "a b c d"))
      .toDF("id", "text")
      .select(
        hashExpressions
          .shingleHashes(hashExpressions.tokenHashes(col("text")), 2)
          .as("s")
      )
      .collect()
    assert(out.head.getSeq[Long](0).length == 3)
  }

  test("topKBy rejects wrong input types and non-positive k at analysis time") {
    val df = Seq(("a", 1L, 2.0)).toDF("g", "id", "m")
    // metric must be double, id bigint — a swapped argument order is
    // the likely caller mistake and must fail analysis, not corrupt
    val swapped = intercept[Exception] {
      df.groupBy("g").agg(topkAggregate.topKBy(col("id"), col("m"), 3)).collect()
    }
    assert(swapped.getMessage.contains("requires (double, bigint)"), swapped.getMessage)
    val badK = intercept[Exception] {
      df.groupBy("g").agg(topkAggregate.topKBy(col("m"), col("id"), 0)).collect()
    }
    assert(badK.getMessage.contains("k > 0"), badK.getMessage)
  }
}
