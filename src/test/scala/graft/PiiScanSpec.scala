package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PiiScan
import graft.sources.Tables

/** Shared reference semantics for the graft_pii_scan parity specs:
  * straight java.util.regex, the exact composition q_t10's DuckDB
  * oracle still runs. */
private[graft] object PiiScanReference {
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
  private val NumRe = "[0-9]{9,}".r

  def viaRegex(s: String): (Int, Int, String) = {
    val nEmails = EmailRe.findAllIn(s).size
    val nLong = NumRe.findAllIn(s).size
    val redacted = NumRe.replaceAllIn(
      EmailRe.replaceAllIn(s, "<EMAIL>"), "<NUM>")
    (nEmails, nLong, redacted)
  }

  def viaScan(s: String): (Int, Int, String) = {
    val r = PiiScan.scan(UTF8String.fromString(s))
    (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
  }

  /** ASCII weighted toward the pattern's special characters so local
    * runs, domains, dots and digit runs collide in every combination. */
  val adversarial: Gen[String] = {
    val atom = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      3 -> Gen.oneOf("@", ".", "-", "_", "%", "+", " "),
      2 -> Gen.oneOf("123456789", "88888888", "0000000000"),
      1 -> Gen.oneOf("@mail.example.org", "a@b.co", ".co", "@x.", "tel "))
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, atom).map(_.mkString))
  }
}

/** Generated-input parity: hundreds of adversarial strings through both
  * the byte scanner and the regex composition (pure JVM, no Spark). */
object PiiScanPropertySpec extends Properties("pii_scan") {
  import PiiScanReference._
  property("scan == two-pass regex composition") =
    Prop.forAll(adversarial) { s => viaScan(s) == viaRegex(s) }
}

/** graft_pii_scan must agree BIT-FOR-BIT with the two-pass regex
  * composition it replaces (and that the q_t10 DuckDB oracle still runs):
  * n_emails/n_longnums via regexp matches on the raw text, redacted via
  * `replace(email -> <EMAIL>)` then `replace([0-9]{9,} -> <NUM>)`.
  * Checked on real corpus rows (the exact q_t10 construction) and the
  * hand-picked regex-semantics edge cases the scanner's Scaladoc argues
  * through; [[PiiScanPropertySpec]] adds the generated sweep.
  */
class PiiScanSpec extends AnyFunSuite {
  import PiiScanReference._

  private def check(s: String): Unit =
    assert(viaScan(s) === viaRegex(s), s"input: ${s.take(200)}")

  test("hand-picked regex-semantics edges") {
    Seq(
      "", "@", "a@", "@b.co", "a@b", "a@b.c", "a@b.co", "a@b.co9",
      "a@b.co.uk", "a@b.co.x9", "a@.co", "a@b@c.com", "a@@b.co",
      "x@y z@w.org", "user.name+tag@sub.domain-x.org trailing",
      "12345678@x.com", "123456789@x.com tel 888812345",
      "9digits: 123456789, 8digits: 12345678, split 1234<EMAIL>56789",
      "run 1234567890123 inside a@1234567890.co end",
      "a@b.co-x@y.com", "a@b.commaexample", "dots..everywhere@...co",
      "-@-.ab", "_%+-@x-y.ZZ", "UPPER@CASE.COM",
      "email in digits 123456789user@mail.org987654321",
      "tel 999999999 a@b.co 888888888",
      "unicode é@b.co naïve 123456789",
      "a@b.co" * 40,
      ("1" * 100) + "@" + ("2" * 50) + ".abc"
    ).foreach(check)
  }

  test("q_t10 row construction on the real corpus matches") {
    val spark = GraftSession.get(4)
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("raw",
        concat(col("text"), lit(" contact: user"),
          col("doc_id").cast("string"), lit("@mail.example.org tel "),
          lpad((col("doc_id") * 37 % 1000000000L).cast("string"), 9, "8")))
      .select("raw").collect().map(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach(check)
  }
}
