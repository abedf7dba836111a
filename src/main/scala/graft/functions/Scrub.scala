package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** D17: PII / link scrubbing — the redaction pass (emails, URLs, long
  * digit runs) every web-scale training corpus runs before anything
  * else sees the text. Pure codegen'd `regexp_replace` chains: no UDF,
  * map-side, whole-stage-codegen friendly, so at 100 TB this is one
  * streaming pass over the scan.
  *
  * Patterns are deliberately RE2-compatible (no backreferences or
  * lookaround) so the DuckDB oracle replays them verbatim and a
  * Flink/Trino port would too.
  */
object Scrub {

  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** 7+ digit runs: phone-ish numbers and ids; short quantities stay. */
  val LongDigitPattern = "[0-9]{7,}"

  /** URLs first (an email-shaped token inside a URL is part of the
    * URL), then emails, then long digit runs. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      LongDigitPattern, "<NUM>")
}
