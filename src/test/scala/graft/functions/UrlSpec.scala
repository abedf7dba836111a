package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D62 — URL canonicalization: surface variants of one resource must
  * collapse; semantically different URLs must not. */
class UrlSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Url.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("equivalent surface forms collapse to one canonical URL") {
    val out = canon(
      "https://example.com/a/b?x=1&y=2",
      "HTTPS://EXAMPLE.COM/a/b?y=2&x=1",
      "https://www.example.com:443/a/b/?x=1&y=2#frag",
      "https://example.com/a/b?utm_source=tw&y=2&x=1&fbclid=abc")
    assert(out.distinct === Seq("https://example.com/a/b?x=1&y=2"))
  }

  test("semantic differences survive canonicalization") {
    val out = canon(
      "https://example.com/a",       // baseline
      "http://example.com/a",        // scheme differs
      "https://example.com/a?x=1",   // query differs
      "https://example.com/A",       // path case is significant
      "https://example.com:8443/a",  // non-default port stays
      "https://sub.example.com/a")   // host differs
    assert(out.distinct.length === out.length, s"collapsed wrongly: $out")
  }

  test("default ports strip only for their own scheme") {
    assert(canon("http://e.com:80/x") === Seq("http://e.com/x"))
    assert(canon("https://e.com:443/x") === Seq("https://e.com/x"))
    // http on 443 is unusual but NOT the default — must stay
    assert(canon("http://e.com:443/x") === Seq("http://e.com:443/x"))
  }

  test("empty query after tracking-param removal drops the '?' entirely") {
    assert(canon("https://e.com/x?utm_source=a&utm_medium=b") ===
      Seq("https://e.com/x"))
  }
}
