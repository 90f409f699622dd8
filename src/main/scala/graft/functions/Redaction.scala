package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora: regex-match counts
  * and in-place masking of emails and phone numbers (the standard
  * pre-training scrub; patterns kept to the regex subset with identical
  * semantics in Java regex (Spark codegen) and RE2 (DuckDB) — character
  * classes, bounded repetition, no backtracking constructs).
  *
  * Narrow projection, no shuffle, no UDFs — regexp_replace /
  * regexp_extract_all are codegen'd builtins, so at 100 TB this runs
  * inside the scan stage.
  *
  * The synthetic corpus contains no PII, so the gate query INJECTS a
  * deterministic email + phone per row ([[withSyntheticPii]]) before
  * scrubbing — the oracle twin injects the identical strings, making
  * the regex paths a real (non-vacuous) parity check.
  */
object Redaction {

  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRx = "\\+1-555-[0-9]{4}"
  val EmailMask = "[EMAIL]"
  val PhoneMask = "[PHONE]"

  // ---------------------------------------------------------------- Spark

  /** Deterministic fake PII appended per row (test fixture only). */
  def withSyntheticPii(text: Column, id: Column): Column =
    concat(text, lit(" contact user"), id.cast("string"),
      lit("@example.com call +1-555-"),
      lpad(pmod(id, lit(10000L)).cast("string"), 4, "0"))

  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailRx), lit(0))).cast("long")

  def phoneCount(c: Column): Column =
    size(regexp_extract_all(c, lit(PhoneRx), lit(0))).cast("long")

  /** Mask every email, then every phone (order matters: the email regex
    * could otherwise eat into adjacent text the phone regex expects).
    */
  def redact(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRx, EmailMask), PhoneRx, PhoneMask)

  // --------------------------------------------------- DuckDB oracle SQL

  def duckWithSyntheticPii(textCol: String, idCol: String): String =
    s"$textCol || ' contact user' || CAST($idCol AS VARCHAR) || " +
      s"'@example.com call +1-555-' || lpad(CAST($idCol % 10000 AS VARCHAR), 4, '0')"

  def duckEmailCount(c: String): String =
    s"CAST(len(regexp_extract_all($c, '$EmailRx')) AS BIGINT)"

  def duckPhoneCount(c: String): String =
    s"CAST(len(regexp_extract_all($c, '$PhoneRx')) AS BIGINT)"

  def duckRedact(c: String): String =
    s"regexp_replace(regexp_replace($c, '$EmailRx', '$EmailMask', 'g'), '$PhoneRx', '$PhoneMask', 'g')"
}
