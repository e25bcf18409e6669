package graft.html

/** Byte-level single-pass HTML tokenizer (SAX-style), the "detect" kernel.
  *
  * This is the analogue of the reference's DB binarize+contour stage
  * (/root/reference/src/processors/db_postprocess.rs:127-173): raw bytes in,
  * flat candidate structure out. Design constraints:
  *
  *   - operates directly on the RAW byte array so span offsets are byte
  *     offsets into the original html (coordinate-space discipline, see
  *     /root/reference/src/oarocr/result.rs:130-145) — tags are ASCII in both
  *     UTF-8 and windows-1252 so byte-level tag scanning is charset-safe;
  *   - zero allocation in the scan loop apart from tag-name strings (interned
  *     via a small cache) — this is the hot path at 100 TB;
  *   - robust to malformed input: a '<' not opening a plausible construct is
  *     literal text; unclosed tags at EOF are silently closed;
  *   - raw-text elements (script/style/template/textarea/title/noscript/svg)
  *     are skipped wholesale — the reference's "mask regions then detect"
  *     (/root/reference/src/utils/image.rs:781,
  *      /root/reference/src/oarocr/structure.rs:1981-1990).
  */
object Tokenizer {

  trait Sink {
    /** lower-cased tag name; attrs is the raw bytes INSIDE the tag after the
      * name (may be empty); selfClosing covers both `<br/>` and void tags. */
    def startTag(name: String, attrsBegin: Int, attrsEnd: Int, selfClosing: Boolean): Unit
    def endTag(name: String): Unit
    /** raw text run [begin, end) in BYTE offsets into the original html */
    def text(begin: Int, end: Int): Unit
  }

  private val voidTags: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  private val rawTextTags: Set[String] = Set(
    "script", "style", "template", "textarea", "title", "noscript", "svg")

  @inline private def isAsciiAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  @inline private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  // tiny tag-name intern cache: tag vocabulary is small; avoids per-tag
  // String garbage on multi-MB pages
  private final class NameCache {
    private val map = new java.util.HashMap[String, String](64)
    def intern(bytes: Array[Byte], from: Int, until: Int): String = {
      val sb = new java.lang.StringBuilder(until - from)
      var i = from
      while (i < until) { sb.append(lower(bytes(i)).toChar); i += 1 }
      val s = sb.toString
      val got = map.get(s)
      if (got != null) got else { map.put(s, s); s }
    }
  }

  /** Scan `html` emitting events into `sink`. Never throws on malformed
    * input. Returns normally at EOF.
    */
  def tokenize(html: Array[Byte], sink: Sink): Unit = {
    val n = html.length
    val names = new NameCache
    var i = 0
    var textStart = 0

    def flushText(until: Int): Unit =
      if (until > textStart) sink.text(textStart, until)

    while (i < n) {
      val b = html(i)
      if (b == '<' && i + 1 < n) {
        val c = html(i + 1)
        if (isAsciiAlpha(c)) {
          // start tag
          flushText(i)
          var j = i + 1
          while (j < n && (isAsciiAlpha(html(j)) || (html(j) >= '0' && html(j) <= '9'))) j += 1
          val name = names.intern(html, i + 1, j)
          val attrsBegin = j
          // scan to '>' honoring quoted attribute values
          var quote: Byte = 0
          var k = j
          var gt = -1
          while (k < n && gt < 0) {
            val d = html(k)
            if (quote != 0) { if (d == quote) quote = 0 }
            else if (d == '"' || d == '\'') quote = d
            else if (d == '>') gt = k
            k += 1
          }
          if (gt < 0) { // unclosed tag at EOF: treat rest as consumed
            sink.startTag(name, attrsBegin, n, selfClosing = voidTags.contains(name))
            i = n; textStart = n
          } else {
            // a trailing '/' is the self-closing marker ONLY when it follows
            // the tag name, whitespace, or a closing quote — a '/' ending an
            // UNQUOTED attribute value is part of the value (WHATWG 13.1.2.3:
            // unquoted values end at whitespace or '>'). Real crawled HTML
            // hits this constantly: <a href=http://x.com/> is NOT
            // self-closing, and treating it so would close the anchor before
            // its link text.
            val selfClose = gt > attrsBegin && html(gt - 1) == '/' && {
              val p = html(gt - 2) // gt-2 >= attrsBegin-1 = name end, safe
              gt - 1 == attrsBegin || p == ' ' || p == '\t' || p == '\n' ||
                p == '\r' || p == '\f' || p == '"' || p == '\''
            }
            val attrsEnd = if (selfClose) gt - 1 else gt
            val isVoid = voidTags.contains(name)
            sink.startTag(name, attrsBegin, attrsEnd, selfClose || isVoid)
            i = gt + 1
            textStart = i
            if (!selfClose && !isVoid && rawTextTags.contains(name)) {
              // skip to matching </name> (case-insensitive), masking content
              val close = findCloseTag(html, i, name)
              if (close < 0) { i = n; textStart = n; sink.endTag(name) }
              else {
                // close points at '<' of `</name`; find its '>'
                var g = close
                while (g < n && html(g) != '>') g += 1
                i = if (g < n) g + 1 else n
                textStart = i
                sink.endTag(name)
              }
            }
          }
        } else if (c == '/') {
          // end tag
          flushText(i)
          var j = i + 2
          while (j < n && (isAsciiAlpha(html(j)) || (html(j) >= '0' && html(j) <= '9'))) j += 1
          val name = names.intern(html, i + 2, j)
          var g = j
          while (g < n && html(g) != '>') g += 1
          if (name.nonEmpty) sink.endTag(name)
          i = if (g < n) g + 1 else n
          textStart = i
        } else if (c == '!') {
          flushText(i)
          if (i + 3 < n && html(i + 1) == '!' && html(i + 2) == '-' && html(i + 3) == '-') {
            // abruptly closed comments (WHATWG: '<!-->' and '<!--->' END the
            // comment) — the general scan below starts PAST their '--' and
            // would otherwise swallow the rest of the document
            if (i + 4 < n && html(i + 4) == '>') i += 5
            else if (i + 5 < n && html(i + 4) == '-' && html(i + 5) == '>') i += 6
            else {
              // comment: skip to -->
              var j = i + 4
              var end = -1
              while (j + 2 < n && end < 0) {
                if (html(j) == '-' && html(j + 1) == '-' && html(j + 2) == '>') end = j + 3
                j += 1
              }
              i = if (end > 0) end else n
            }
          } else {
            // doctype / CDATA-ish: skip to '>'
            var g = i + 2
            while (g < n && html(g) != '>') g += 1
            i = if (g < n) g + 1 else n
          }
          textStart = i
        } else if (c == '?') {
          // processing instruction: skip to '>'
          flushText(i)
          var g = i + 2
          while (g < n && html(g) != '>') g += 1
          i = if (g < n) g + 1 else n
          textStart = i
        } else {
          i += 1 // literal '<' in text
        }
      } else {
        i += 1
      }
    }
    flushText(n)
  }

  /** Find index of '<' beginning `</name` (ASCII case-insensitive) at or
    * after `from`; -1 if absent. */
  private def findCloseTag(html: Array[Byte], from: Int, name: String): Int = {
    val n = html.length
    val m = name.length
    var i = from
    while (i + m + 2 <= n) {
      if (html(i) == '<' && html(i + 1) == '/') {
        var k = 0
        var ok = true
        while (ok && k < m) {
          if (lower(html(i + 2 + k)) != name.charAt(k)) ok = false
          k += 1
        }
        if (ok) {
          // next byte must end the name
          val after = i + 2 + m
          if (after >= n || !isAsciiAlpha(html(after))) return i
        }
      }
      i += 1
    }
    -1
  }
}
