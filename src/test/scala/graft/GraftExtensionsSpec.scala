package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql sees the registered kernels and the topk_by aggregate") {
    val base = SparkSpec.spark // ensures the shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // new session over the SAME SparkContext, with extensions applied
    val s = SparkSession
      .builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s ne base, "extensions need a fresh session to apply")
      s.range(1).createOrReplaceTempView("one")
      // kernels via SQL == kernels via the Column API
      val viaSql = s
        .sql("SELECT simhash64(token_hashes('a b c')) AS h, " +
          "dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d FROM one")
        .collect()
        .head
      import org.apache.spark.sql.functions._
      val viaCol = s
        .sql("SELECT 1")
        .select(
          graft.functions.hashExpressions
            .simhash64(graft.functions.hashExpressions.tokenHashes(lit("a b c")))
            .as("h")
        )
        .collect()
        .head
      assert(viaSql.getLong(0) == viaCol.getLong(0))
      assert(math.abs(viaSql.getDouble(1) - 11.0) < 1e-6)

      // the aggregate registers with partial support intact
      val rows = s
        .sql(
          "SELECT g, topk_by(CAST(m AS DOUBLE), CAST(id AS BIGINT), 2) AS t FROM VALUES " +
            "('a', 1.0, 1), ('a', 3.0, 2), ('a', 2.0, 3), ('b', 5.0, 4) AS v(g, m, id) " +
            "GROUP BY g ORDER BY g"
        )
        .collect()
      val a = rows(0).getSeq[org.apache.spark.sql.Row](1)
      assert(a.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 2L), (2.0, 3L)))
      assert(rows(1).getSeq[org.apache.spark.sql.Row](1).length == 1)

      // r10 scalar kernels: jpeg_dims + char_entropy via SQL
      val media = s
        .sql(
          "SELECT jpeg_dims(unhex('FFD8FFC000110801E0028003011100021101031101')) AS d, " +
            "char_entropy('abcab') AS h, jpeg_dims(unhex('FFD8FFE0')) AS bad FROM one"
        )
        .collect()
        .head
      assert(media.getSeq[Long](0) == Seq(640L, 480L))
      assert(math.abs(media.getDouble(1) - (math.log(5) - 4 * math.log(2) / 5)) < 1e-12)
      assert(media.isNullAt(2))

      // r11 unicode kernels via SQL
      val uni = s
        .sql(
          // NOTE: Spark's chr() is ASCII-mod-256 (unlike DuckDB's), so
          // the combining acute rides the SQL text as a UTF-8 literal
          "SELECT unicode_normalize('e\u0301', 'NFC') AS nfc, " +
            "unicode_normalize('ﬁ', 'NFKC') AS nfkc, " +
            "strip_accents('e\u0301') AS stripped FROM one"
        )
        .collect()
        .head
      assert(uni.getString(0) == "é")
      assert(uni.getString(1) == "fi")
      assert(uni.getString(2) == "e")
      val e4 = intercept[Exception](
        s.sql("SELECT unicode_normalize('a', 'NFX') FROM one").collect()
      )
      assert(e4.getMessage.contains("NFC"), e4.getMessage)

      // literal-k misuse fails analysis with a clear message
      val e = intercept[Exception](s.sql("SELECT topk_by(1.0, 1L, id) FROM one").collect())
      assert(e.getMessage.contains("literal INT"))

      // wrong arity names the function and its usage, not a raw
      // head-of-empty-list crash
      val e2 = intercept[Exception](s.sql("SELECT token_hashes()").collect())
      assert(e2.getMessage.contains("token_hashes expects 1 argument"), e2.getMessage)
      val e3 = intercept[Exception](s.sql("SELECT shingle_hashes('a b')").collect())
      assert(e3.getMessage.contains("shingle_hashes expects 2 argument"), e3.getMessage)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
