package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for PII/link scrubbing (D17). */
class ScrubSpec extends SparkSpec {

  private def scrubOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Scrub.scrubPii(col("t"))).head().getString(0)
  }

  test("emails, URLs, and long digit runs are redacted; clean text is untouched") {
    assert(scrubOne("mail a.b+c@foo-bar.org now") === "mail <EMAIL> now")
    assert(scrubOne("see https://x.io/p?q=1#f and http://y.z/") ===
      "see <URL> and <URL>")
    assert(scrubOne("call 5551234567 but keep 42 and 123456") ===
      "call <NUM> but keep 42 and 123456")
    assert(scrubOne("plain words only, none of it sensitive 7 99") ===
      "plain words only, none of it sensitive 7 99")
  }

  test("an email-shaped token inside a URL is scrubbed as part of the URL") {
    assert(scrubOne("x https://ex.com/u/bob@mail.com/profile y") ===
      "x <URL> y")
  }
}
