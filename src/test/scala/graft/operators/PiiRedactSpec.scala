package graft.operators

import graft.SparkSpec

/** The driver corpus contains no PII-shaped text (no digits, no '@'), so
  * the checked key proves only engine agreement on the null case; THIS
  * spec drives [[TextAnalysis.piiRedact]] with synthetic PII-laden
  * documents and asserts the real behavior. */
class PiiRedactSpec extends SparkSpec {

  private def frame(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("counts and redacts emails, phones, and IPs") {
    val out = TextAnalysis.piiRedact(frame(
      1L -> "contact jane.doe+spam@example.co.uk or call 555-123-4567 today",
      2L -> "server at 10.0.255.3 and 192.168.1.1; intl +44 20-555-0199 x nope",
      3L -> "no pii here at all",
      4L -> "a@b.io b@c.net 1-222-333-4444and 007-000-111-2222"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((1L, 1L, 0L)))
    // "+44 20-555-0199" has a 2-digit trunk, not the 3-3-4 shape -> only IPs
    assert(out(2L) === ((0L, 0L, 2L)))
    assert(out(3L) === ((0L, 0L, 0L)))
    // two emails; "222-333-4444" matches inside the first run, "000-111-2222"
    // inside the second (the optional +cc group needs a separator after it)
    assert(out(4L) === ((2L, 2L, 0L)))
  }

  test("redaction replaces every match with its typed tag and nothing else") {
    val row = TextAnalysis.piiRedact(frame(
      1L -> "mail x.y@a.org, dial 555-123-4567, ping 8.8.8.8 twice 8.8.4.4"))
      .collect().head
    // recompute the redaction inline to compare the md5 against known text
    val expected = "mail <EMAIL>, dial <PHONE>, ping <IP> twice <IP>"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getString(5) === md)
    assert(row.getLong(4) === expected.length.toLong)
  }

  test("clean text passes through byte-identical (md5 of the original)") {
    val out = TextAnalysis.piiRedact(frame(5L -> "just words and spaces"))
      .collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("just words and spaces".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.getString(5) === md)
  }
}
