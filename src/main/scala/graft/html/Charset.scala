package graft.html

import java.nio.charset.{Charset => JCharset, StandardCharsets}

/** Charset sniff + decode — the "orient" stage. Analogue of the reference's
  * document-orientation classify+correct
  * (/root/reference/src/oarocr/preprocess.rs:58-143): a cheap per-row
  * classifier whose decision is recorded so downstream offsets can be mapped
  * back to the raw input space.
  */
object Charset {

  final case class Decision(charset: JCharset, declared: Boolean)

  private val win1252 = JCharset.forName("windows-1252")

  /** Sniff the charset from a BOM or a `<meta charset=...>` /
    * `<meta http-equiv content="...charset=...">` declaration in the first
    * `limit` bytes; default UTF-8 (the modern-web default).
    */
  def sniff(html: Array[Byte], limit: Int = 2048): Decision = {
    if (html.length >= 3 && (html(0) & 0xff) == 0xef &&
        (html(1) & 0xff) == 0xbb && (html(2) & 0xff) == 0xbf)
      return Decision(StandardCharsets.UTF_8, declared = true)
    val n = math.min(html.length, limit)
    // ASCII-lowercased prefix is safe for both candidate charsets
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val b = html(i)
      sb.append((if (b >= 'A' && b <= 'Z') (b + 32) else (b & 0xff)).toChar)
      i += 1
    }
    val head = sb.toString
    val key = "charset="
    val at = head.indexOf(key)
    if (at >= 0) {
      var s = at + key.length
      while (s < head.length && (head.charAt(s) == '"' || head.charAt(s) == '\'' || head.charAt(s) == ' ')) s += 1
      var e = s
      while (e < head.length && (head.charAt(e).isLetterOrDigit || head.charAt(e) == '-' || head.charAt(e) == '_')) e += 1
      val name = head.substring(s, e)
      val cs = name match {
        case "utf-8" | "utf8"                       => StandardCharsets.UTF_8
        case "windows-1252" | "cp1252" | "iso-8859-1" => win1252
        case "us-ascii" | "ascii"                   => StandardCharsets.US_ASCII
        case other =>
          try JCharset.forName(other) catch { case _: Exception => StandardCharsets.UTF_8 }
      }
      Decision(cs, declared = true)
    } else Decision(StandardCharsets.UTF_8, declared = false)
  }

  /** Decode bytes [from, until) with `cs`; malformed sequences are replaced,
    * never thrown (graceful degradation). */
  def decode(html: Array[Byte], from: Int, until: Int, cs: JCharset): String =
    new String(html, from, until - from, cs)

  /** Charsets whose bytes < 0x80 ARE ASCII (safe for byte-level fast paths).
    * Conservative allowlist — UTF-16/EBCDIC and friends are not. */
  def asciiTransparent(cs: JCharset): Boolean =
    (cs eq StandardCharsets.UTF_8) || (cs eq StandardCharsets.US_ASCII) ||
      (cs eq win1252) || cs.name() == "windows-1252" || cs.name() == "ISO-8859-1"
}
