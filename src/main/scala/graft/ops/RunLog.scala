package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Run-log and email-report surface — the reference's K2/K3 side
  * channels (reference: outreach_etl.py:27-32 logging setup,
  * outreach_etl.py:124-219 message grammar, outreach_etl.py:237-243
  * send step; etl_tools.py:113-171 `SendMessageWithAttachment`)
  * re-expressed as data operations:
  *
  *  - the run LOG is a structured table (one row per event, append
  *    sink), not a mutable text file — queryable with every other
  *    operator in the engine and safe under concurrent runs;
  *  - the email REPORT is a deterministic RFC-2822 multipart MIME
  *    builder plus the Gmail REST payload shape (base64url of the raw
  *    message). The network send itself stays out of scope (the
  *    harness is zero-egress; SURVEY §2.11 maps K2 to report
  *    CONSTRUCTION) — a production deployment plugs the rendered
  *    payload into any SMTP/REST client;
  *  - the message grammar reproduces the reference's log lines
  *    byte-for-byte, so diffing a migration run against a legacy run
  *    is a string compare.
  *
  * Scale shape: per-sync log volume is O(1) rows (count + first/last
  * page + upload marker — the reference's per-page line is summarized,
  * not enumerated, so a 10⁶-page resource doesn't mint 10⁶ driver-side
  * rows); the append sink is one tiny parquet write per run.
  */
object RunLog {

  /** One structured log event. `seq` orders events within a run;
    * (runId, seq) is the natural key across runs.
    */
  final case class RunEvent(runId: String, seq: Long, level: String,
                            resource: String, message: String)

  // ------------------------------------------------------------ grammar
  // the reference's exact log strings (outreach_etl.py:124-219)

  /** outreach_etl.py:124 — `'There are no {}'` */
  def emptyMsg(resource: String): String = s"There are no $resource"

  /** outreach_etl.py:129 — `'Number of {} is {}'` */
  def countMsg(resource: String, n: Long): String =
    s"Number of $resource is $n"

  /** outreach_etl.py:131,155 — `'Completed Page {} out of {}'` */
  def pageMsg(page: Long, pages: Long): String =
    s"Completed Page $page out of $pages"

  /** outreach_etl.py:219 — `'Completed BigQuery Upload'` */
  val uploadMsg: String = "Completed BigQuery Upload"

  /** Column forms of the grammar, for building report lines inside a
    * distributed plan instead of collecting counts to the driver.
    */
  def countMsgCol(resource: Column, n: Column): Column =
    concat(lit("Number of "), resource, lit(" is "), n.cast("string"))

  def pageMsgCol(page: Column, pages: Column): Column =
    concat(lit("Completed Page "), page.cast("string"),
      lit(" out of "), pages.cast("string"))

  // ------------------------------------------------------------ K3: log

  /** The bounded event list a paginated sync of `n` rows emits
    * (page size `pageSize`, reference default 1000 — its
    * `page[limit]`): count line, first/last page lines, upload marker.
    * O(1) events regardless of page count.
    */
  def syncEvents(runId: String, resource: String, n: Long,
                 pageSize: Long = 1000L): Seq[RunEvent] = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    if (n == 0)
      Seq(RunEvent(runId, 0, "INFO", resource, emptyMsg(resource)))
    else {
      val pages = (n + pageSize - 1) / pageSize
      Seq(
        RunEvent(runId, 0, "INFO", resource, countMsg(resource, n)),
        RunEvent(runId, 1, "INFO", resource, pageMsg(1, pages)),
        RunEvent(runId, 2, "INFO", resource, pageMsg(pages, pages)),
        RunEvent(runId, 3, "INFO", resource, uploadMsg))
    }
  }

  /** Append structured events to the parquet run-log table. */
  def appendTo(spark: SparkSession, path: String,
               events: Seq[RunEvent]): Unit = {
    import spark.implicits._
    events.toDS().write.mode(SaveMode.Append).parquet(path)
  }

  /** Read the run-log table back as a typed Dataset. */
  def read(spark: SparkSession, path: String): Dataset[RunEvent] = {
    import spark.implicits._
    spark.read.parquet(path).as[RunEvent]
  }

  /** Render a log table to the attachment text: one
    * `LEVEL - message` line per event in (runId, seq) order — the
    * reference's `format = '%(asctime)s - %(levelname)s - %(message)s'`
    * minus the wall-clock field (timestamps would break deterministic
    * tests; a deployment adds them at append time as a column).
    */
  def renderLogText(events: Seq[RunEvent]): String =
    events.sortBy(e => (e.runId, e.seq))
      .map(e => s"${e.level} - ${e.message}")
      .mkString("", "\n", "\n")

  // ---------------------------------------------------------- K2: email

  /** Deterministic RFC-2822 multipart/mixed message with one text body
    * and one text attachment — the exact structure
    * `SendMessageWithAttachment` builds (etl_tools.py:130-165:
    * MIMEMultipart, MIMEText body, text/plain attachment with
    * Content-Disposition). The boundary is caller-supplied (callers
    * wanting uniqueness pass one; tests pass a constant).
    */
  def renderEmail(sender: String, to: String, subject: String,
                  bodyText: String, attachmentName: String,
                  attachmentText: String,
                  boundary: String = "graft-mime-boundary"): String = {
    require(!bodyText.contains(boundary) &&
      !attachmentText.contains(boundary),
      "MIME boundary collides with content")
    val crlf = "\r\n"
    Seq(
      s"To: $to",
      s"From: $sender",
      s"Subject: $subject",
      "MIME-Version: 1.0",
      s"""Content-Type: multipart/mixed; boundary="$boundary"""",
      "",
      s"--$boundary",
      """Content-Type: text/plain; charset="utf-8"""",
      "",
      bodyText,
      s"--$boundary",
      """Content-Type: text/plain; charset="utf-8"""",
      s"""Content-Disposition: attachment; filename="$attachmentName"""",
      "",
      attachmentText,
      s"--$boundary--",
      "").mkString(crlf)
  }

  /** The Gmail REST `{"raw": …}` payload value: base64url (no
    * padding stripped — the reference's `urlsafe_b64encode` keeps
    * padding) of the raw message bytes (etl_tools.py:166-168).
    */
  def gmailRawPayload(message: String): String =
    java.util.Base64.getUrlEncoder
      .encodeToString(message.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
