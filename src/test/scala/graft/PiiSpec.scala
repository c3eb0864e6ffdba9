package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** d49's pattern semantics on crafted adversarial strings — the corpus
  * query proves the plumbing and engine parity; these prove the patterns
  * themselves (the synthetic corpus carries no natural email/phone/IP).
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): (Long, Long, Long, Long, String) = {
    val df = Seq(s).toDF("t").select(
      Text.piiCount($"t", Text.PiiPatterns(0)._2).as("n_email"),
      Text.piiCount($"t", Text.PiiPatterns(1)._2).as("n_phone"),
      Text.piiCount($"t", Text.PiiPatterns(2)._2).as("n_ip"),
      Text.piiCount($"t", Text.PiiPatterns(3)._2).as("n_name"),
      Text.redactPii($"t").as("red"))
    val r = df.collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("d49 pii: each pattern matches and redacts its canonical form") {
    val (ne, np, ni, nn, red) = redactOne(
      "mail a.b+c@sub.ex.com call 202-555-0042 host 10.0.37.3 the customer left")
    assert((ne, np, ni, nn) === ((1L, 1L, 1L, 1L)))
    assert(red === "mail <EMAIL> call <PHONE> host <IP> the <NAME> left")
  }

  test("d49 pii: word boundaries reject embedded and partial forms") {
    // digits flanking a phone break \b; 'customers' is not 'customer';
    // a 5-group dotted string still contains a 4-group IP match (the
    // naive IPv4 pattern is documented as syntactic, not semantic).
    val (_, np, _, nn, _) = redactOne("x1202-555-00423 customers customering")
    assert(np === 0L)
    assert(nn === 0L)
  }

  test("d49 pii: multiple occurrences all counted and redacted") {
    val (ne, np, ni, nn, red) = redactOne(
      "a@b.co c@d.io 111-222-3333 999-888-7777 1.2.3.4 customer customer")
    assert((ne, np, ni, nn) === ((2L, 2L, 1L, 2L)))
    assert(!red.contains("@") && !red.contains("customer"))
    assert(red === "<EMAIL> <EMAIL> <PHONE> <PHONE> <IP> <NAME> <NAME>")
  }

  test("d49 pii: redaction order keeps digit patterns off email local parts") {
    // an address whose local part looks phone-ish must be eaten whole by
    // the email pass (first in PiiPatterns), not split by the phone pass
    val (ne, np, _, _, red) = redactOne("reach 202-555-0042@ex.com now")
    assert(ne === 1L)
    assert(np === 1L) // the count pass sees both patterns pre-redaction
    assert(red === "reach <EMAIL> now")
  }

  test("d49 pii: clean text passes through untouched") {
    val s = "no personal data in this row at all"
    val (ne, np, ni, nn, red) = redactOne(s)
    assert((ne, np, ni, nn) === ((0L, 0L, 0L, 0L)))
    assert(red === s)
  }
}
