package graft.trade

/** The flow-failure Slack payload as a PURE function of the failure facts —
  * /root/reference/pipelines/utils/slack_failure_handler.py:11-103
  * (`send_flow_failure_notification`) re-expressed like [[SlackSummary]]:
  * deterministic blocks-JSON assembly in-engine, webhook transport
  * out-of-engine (SURVEY §7.6). Block structure, truncation arithmetic
  * (traceback kept under a code block's limits: last 1950 chars +
  * "... (truncated)" marker; parameters cut at 197 + "..."), and the
  * optional context section mirror the reference f-strings exactly. */
object SlackFailure {
  import Blocks._

  /** slack_failure_handler.py:27-28: a missing channel is a hard error. */
  def formatFlowFailure(
      flowName: String,
      errorType: String,
      errorMessage: String,
      traceback: String,
      channel: String,
      runId: Option[String] = None,
      parameters: Option[String] = None): String = {
    require(channel != null && channel.nonEmpty,
      "SLACK_CHANNEL environment variable not set")
    // slack_failure_handler.py:31-38: keep the traceback inside Slack's
    // code-block budget — LAST 1950 chars survive (the failure site is at
    // the bottom of a traceback), with an explicit truncation marker
    val tb =
      if (traceback.length > 2000) traceback.takeRight(1950) + "\n... (truncated)"
      else traceback
    // slack_failure_handler.py:40-48: optional run-id/parameters context
    val contextLines =
      runId.map(id => s"*Run ID:* `$id`").toSeq ++
        parameters.map { p =>
          val ps = if (p.length > 200) p.take(197) + "..." else p
          s"*Parameters:* `$ps`"
        }.toSeq
    val blocks = Seq(
      header(s"🚨 Flow Failed: $flowName"),
      section(s"*Error Type:* `$errorType`\n*Error Message:* $errorMessage")) ++
      (if (contextLines.nonEmpty) Seq(section(contextLines.mkString("\n"))) else Nil) ++
      Seq(divider, section("*Traceback:*\n```" + tb + "```"))
    JO(
      "channel" -> JS(channel),
      "text" -> JS(s"🚨 Flow Failed: $flowName"),
      "blocks" -> JA(blocks)).render
  }

  /** The JVM-side analogue of the hook's error extraction
    * (slack_failure_handler.py:119-137): error type = the throwable's
    * simple class name (Python's `type(error).__name__`), message =
    * `str(error)` (null-safe), traceback rendered in PYTHON orientation —
    * outermost frame first, raise site and "Type: message" LAST — because
    * the reference's keep-the-last-1950-chars truncation assumes the
    * failure site sits at the bottom; a raw JVM printStackTrace (raise
    * site first) would have exactly the useful part cut off. */
  def fromThrowable(
      flowName: String,
      error: Throwable,
      channel: String,
      runId: Option[String] = None,
      parameters: Option[String] = None): String = {
    val frames = error.getStackTrace.reverseIterator
      .map(f => s"  at $f").mkString("\n")
    val tb = s"Traceback (most recent call last):\n$frames\n" +
      s"${error.getClass.getName}: ${Option(error.getMessage).getOrElse("")}"
    formatFlowFailure(
      flowName,
      error.getClass.getSimpleName,
      Option(error.getMessage).getOrElse(""),
      tb,
      channel, runId, parameters)
  }
}
