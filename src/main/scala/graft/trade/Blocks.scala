package graft.trade

/** Minimal JSON renderer for Slack blocks payloads (strings/objects/arrays
  * only — these payloads carry no bare numbers), rendered compactly with
  * stable insertion order so golden tests compare exact strings. Shared by
  * [[SlackSummary]] (daily summary) and [[SlackFailure]] (failure hook). */
private[trade] object Blocks {
  sealed trait J { def render: String }
  final case class JS(s: String) extends J {
    def render: String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  }
  final case class JO(fields: (String, J)*) extends J {
    def render: String =
      fields.map { case (k, v) => JS(k).render + ": " + v.render }
        .mkString("{", ", ", "}")
  }
  final case class JA(xs: Seq[J]) extends J {
    def render: String = xs.map(_.render).mkString("[", ", ", "]")
  }

  def mrkdwn(text: String): J = JO("type" -> JS("mrkdwn"), "text" -> JS(text))
  def section(text: String): J = JO("type" -> JS("section"), "text" -> mrkdwn(text))
  val divider: J = JO("type" -> JS("divider"))
  def header(text: String): J = JO(
    "type" -> JS("header"),
    "text" -> JO("type" -> JS("plain_text"), "text" -> JS(text)))
}
