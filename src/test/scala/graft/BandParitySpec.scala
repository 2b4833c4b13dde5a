package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sBandKeys parity on non-ASCII text: the single-pass JVM kernel must
  * agree bit-for-bit with the SQL band definition — code-point `substr`,
  * md5 over UTF-8 bytes, top-28-bit base hash, 12 affine mins — including
  * on NON-BMP code points (emoji, CJK ext-B) where UTF-16 indexing would
  * silently desync the shingle windows (VERDICT r3 item 4). The oracle is
  * Spark's own codegen'd expression path: `substring`/`length` on
  * UTF8String count code points exactly like DuckDB's `substr`, so kernel
  * ≡ this derivation ⟹ kernel ≡ the DuckDB oracle CTE on any input.
  */
class BandParitySpec extends AnyFunSuite with SparkTestBase {

  test("band keys: JVM kernel equals the SQL-expression derivation on non-BMP text") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld — größe façade übermäßig çà et là",
      "emoji 😀😃😄 inside 🜁 the shingle window plus trailing words",
      ("😀" * 60) + " tail beyond the one-twenty code point window is ignored here",
      "𠀀𠀁𠀂𠀃𠀄𠀅𠀆𠀇𠀈𠀉", // CJK ext-B: every char non-BMP, 10 code points
      "short",
      "😀", // a single non-BMP code point (< one shingle)
      "")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    // the SQL definition, as Spark expressions (interpreted HOFs — fine at
    // 8 rows; the kernel exists precisely because this form is 25-30x
    // slower per corpus pass)
    val t = substring(col("text"), 1, 120)
    val hs = transform(
      sequence(lit(1), greatest(length(t) - 7, lit(1))),
      i => conv(substring(md5(encode(t.substr(i, lit(8)), "UTF-8")), 1, 7), 16, 10)
        .cast("long"))
    val mins = (0 until 12).map { j =>
      val (a, b) = SparkEntry.SBandAB(j)
      array_min(transform(hs, h => (h * lit(a) + lit(b)) % lit(SparkEntry.SBandP)))
    }
    val sqlBands = array((0 until 4).map(b =>
      concat_ws(":", lit(b), mins(3 * b), mins(3 * b + 1), mins(3 * b + 2))): _*)

    val rows = d.select(col("doc_id"),
        SparkEntry.sBandKeys(col("text")).as("kernel"), sqlBands.as("sql"))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"band-key desync on doc ${r.getLong(0)} (text: ${texts(r.getLong(0).toInt).take(40)})")
    }
  }
}
