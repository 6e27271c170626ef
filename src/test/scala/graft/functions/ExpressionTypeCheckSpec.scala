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
}
