package graft.util

import scala.util.matching.Regex

/** The `%`/`*` wildcard matcher used across the include/exclude surfaces
  * (P1 table scope, K1 topic mapping, M-family field patterns) — one
  * implementation so anchoring/escaping fixes cannot drift between
  * copies.
  */
object Wildcards {

  /** Case-insensitive anchored regex for one `%`/`*` wildcard pattern;
    * every other character matches literally.
    */
  def regex(pattern: String): Regex = {
    val sb = new StringBuilder("(?i)\\A")
    pattern.foreach {
      case '%' | '*' => sb.append(".*")
      case c => sb.append(java.util.regex.Pattern.quote(c.toString))
    }
    // \z, not $: Java's $ also matches just before a trailing line
    // terminator, so an un-trimmed name ending in '\n' would silently
    // scope in under a pattern meant to match the exact name
    sb.append("\\z").result().r
  }

  /** Any-of matcher over a pattern list; empty list matches everything. */
  def matcher(patterns: Seq[String]): String => Boolean =
    if (patterns.isEmpty) _ => true
    else {
      val rs = patterns.map(regex)
      s => rs.exists(_.findFirstIn(s).isDefined)
    }
}
