package graft.html

import java.nio.charset.{Charset => JCharset}

/** DOM-walk block discovery: consumes tokenizer events, emits candidate text
  * blocks with boilerpipe-scoring inputs. The analogue of the reference's
  * box-extraction stage (/root/reference/src/processors/db_bitmap.rs:81-142):
  * flat candidate regions out of the masked detection surface, each carrying
  * the score inputs and the back-mapped source coordinates (here: byte
  * offsets into the raw html).
  */
object BlockBuilder {

  /** One candidate block, pre-classification. `cellRuns` is non-empty only
    * for captured data tables: per-cell (beginByte, endByte) for the span
    * table. */
  final case class RawBlock(
      tag: String,
      kind: String, // title|paragraph|list_item|table
      level: Int,   // h1..h6 => 1..6, else 0
      text: String, // collapsed visible text (tables: canonical HTML)
      beginByte: Long,
      endByte: Long,
      chars: Int,        // non-whitespace visible chars
      anchorChars: Int,  // non-whitespace chars inside <a>
      dropped: Boolean,  // discovered inside a structurally-dropped subtree
      cellRuns: Array[(Long, Long)]
  )

  // subtrees dropped wholesale (mask-then-detect, reference
  // /root/reference/src/oarocr/structure.rs:1981-1990)
  private val dropTags = Set("nav", "aside", "header", "footer", "form",
    "button", "select", "iframe", "object", "menu", "dialog")

  // class/id substrings that mark boilerplate containers (Readability-style
  // negative indicators)
  private val dropClassRe = java.util.regex.Pattern.compile(
    "(?:^|[\\s_-])(?:nav|menu|sidebar|banner|cookie|consent|footer|header|" +
    "breadcrumb|promo|advert|ads?|social|share|related|comments?|widget|" +
    "pagination|masthead)(?:$|[\\s_-])")

  private val blockTags = Set("p", "h1", "h2", "h3", "h4", "h5", "h6", "li",
    "pre", "blockquote", "figcaption", "dt", "dd", "td", "th", "caption",
    "math")

  private val containerTags = Set("div", "section", "article", "main", "body",
    "html", "ul", "ol", "dl", "table", "thead", "tbody", "tfoot", "tr",
    "center", "figure", "details", "summary", "address", "fieldset")

  @inline private def titleLevel(tag: String): Int =
    if (tag.length == 2 && tag.charAt(0) == 'h' &&
        tag.charAt(1) >= '1' && tag.charAt(1) <= '6') tag.charAt(1) - '0'
    else 0

  def build(html: Array[Byte], cs: JCharset): Vector[RawBlock] = {
    val out = Vector.newBuilder[RawBlock]

    final class Sink extends Tokenizer.Sink {
      // element stack: (name, startedDrop, startedBlock, startedAnchor)
      private val stack = new scala.collection.mutable.ArrayBuffer[(String, Boolean, Boolean, Boolean)](64)
      private var dropDepth = 0
      private var anchorDepth = 0

      // current block accumulation
      private val buf = new CollapseBuf(256)
      private var blkTag = "body"
      private var blkKind = "paragraph"
      private var blkLevel = 0
      private var blkBegin = -1L
      private var blkEnd = -1L
      private var blkChars = 0
      private var blkAnchor = 0
      private var blkDropped = false

      /** Readability-style negative class/id indicator on a container tag. */
      private def hasDropClass(ab: Int, ae: Int): Boolean = {
        if (ae <= ab) return false
        // cheap pre-scan: most attributed tags carry no class/id at all, so
        // skip the Map-allocating Attrs.parse unless the bytes could hold
        // one (substring check — a false positive just pays the old parse)
        var mayHave = false
        var i = ab
        while (!mayHave && i < ae - 1) {
          val b = html(i) | 0x20
          if (b == 'c' && i + 4 < ae && (html(i + 1) | 0x20) == 'l' &&
            (html(i + 2) | 0x20) == 'a' && (html(i + 3) | 0x20) == 's' &&
            (html(i + 4) | 0x20) == 's') mayHave = true
          else if (b == 'i' && (html(i + 1) | 0x20) == 'd') mayHave = true
          i += 1
        }
        if (!mayHave) return false
        val attrs = Attrs.parse(html, ab, ae)
        val cls = attrs.getOrElse("class", "") + " " + attrs.getOrElse("id", "")
        cls.length > 1 && dropClassRe.matcher(cls.toLowerCase).find()
      }

      // table capture state
      private var tblDepth = 0 // >0: inside a captured data table
      private var tblNested = 0
      private var tblRows = Vector.empty[Vector[(Int, Int, Boolean, String)]]
      private var tblRow = Vector.empty[(Int, Int, Boolean, String)]
      private var tblCellBuf: CollapseBuf = null
      private var tblCellSpan: (Int, Int, Boolean) = null
      private var tblCellRuns = Vector.empty[(Long, Long)]
      private var tblCellBegin = -1L
      private var tblCellEnd = -1L
      private var tblBegin = -1L
      private var tblDroppedCtx = false

      private def flushBlock(): Unit = {
        // blkBegin >= 0 ⇔ at least one visible char was recorded; a
        // whitespace-only verbatim buffer (<pre>   </pre>) would otherwise
        // emit a block with the invalid span [-1, -1)
        if (buf.nonEmpty && blkBegin >= 0) {
          out += RawBlock(blkTag, blkKind, blkLevel, buf.result(), blkBegin, blkEnd,
            blkChars, blkAnchor, blkDropped, Array.empty)
        }
        buf.reset()
        blkBegin = -1L; blkEnd = -1L; blkChars = 0; blkAnchor = 0
      }

      private def startBlock(tag: String): Unit = {
        flushBlock()
        blkTag = tag
        blkLevel = titleLevel(tag)
        blkKind =
          if (blkLevel > 0) "title"
          else if (tag == "li" || tag == "dt" || tag == "dd") "list_item"
          else if (tag == "pre") "preformatted"
          else if (tag == "figcaption") "caption"   // rendered *text* (structure.rs:337-343)
          else if (tag == "math") "formula"         // rendered $$text$$ (structure.rs:310-316)
          else "paragraph"
        buf.verbatim = tag == "pre"
        blkDropped = dropDepth > 0
      }

      private def flushTableCell(): Unit = {
        if (tblCellBuf != null) {
          tblRow :+= ((tblCellSpan._1, tblCellSpan._2, tblCellSpan._3, tblCellBuf.result()))
          if (tblCellBegin >= 0) tblCellRuns :+= ((tblCellBegin, tblCellEnd))
          tblCellBuf = null; tblCellSpan = null; tblCellBegin = -1L; tblCellEnd = -1L
        }
      }

      private def flushTableRow(): Unit = {
        flushTableCell()
        if (tblRow.nonEmpty) { tblRows :+= tblRow; tblRow = Vector.empty }
      }

      private def finishTable(endByte: Long): Unit = {
        flushTableRow()
        if (tblRows.nonEmpty) {
          val grid = TableGrid.resolve(tblRows)
          val htmlText = TableGrid.render(grid)
          val nonWs = htmlText.count(c => !c.isWhitespace)
          // endByte is approximated by the last text end, which predates
          // tblBegin when the table captured cells but no text (e.g. a bare
          // <table><tr><td> at end of input) — clamp so the span stays a
          // valid [begin, end) range
          out += RawBlock("table", "table", 0, htmlText, tblBegin,
            math.max(tblBegin, endByte),
            nonWs, 0, tblDroppedCtx, tblCellRuns.toArray)
        }
        tblDepth = 0; tblNested = 0; tblRows = Vector.empty; tblRow = Vector.empty
        tblCellRuns = Vector.empty; tblBegin = -1L
      }

      override def startTag(name: String, ab: Int, ae: Int, selfClosing: Boolean): Unit = {
        if (tblDepth > 0) {
          name match {
            // self-closing: no stack entry will ever pop it — counting it
            // would make the capture's own </table> decrement tblNested
            // instead of finishing, losing the rest of the document
            case "table" if !selfClosing => tblNested += 1
            case "tr" if tblNested == 0 => flushTableRow()
            case "td" | "th" if tblNested == 0 =>
              flushTableCell()
              val attrs = Attrs.parse(html, ab, ae)
              tblCellSpan = (Attrs.intAttr(attrs, "rowspan", 1),
                Attrs.intAttr(attrs, "colspan", 1), name == "th")
              tblCellBuf = new CollapseBuf(32)
            // line/block boundaries inside a cell separate words the same
            // way they do in normal flow ('123 Main St<br>Springfield' must
            // not fuse to 'StSpringfield'); inside a NESTED table (whose
            // text flattens into the enclosing cell, below) the nested
            // tr/td boundaries separate the same way
            case _ if tblCellBuf != null &&
              (name == "br" || name == "hr" ||
                name == "tr" || name == "td" || name == "th" ||
                blockTags.contains(name) || containerTags.contains(name)) =>
              tblCellBuf.wsHint()
            case _ => ()
          }
          if (!selfClosing) stack += ((name, false, false, false))
          return
        }

        var startedDrop = false
        var startedBlock = false
        var startedAnchor = false

        if (dropTags.contains(name)) {
          flushBlock()
          dropDepth += 1; startedDrop = true
        } else if ((containerTags.contains(name) || blockTags.contains(name)) && hasDropClass(ab, ae)) {
          flushBlock()
          dropDepth += 1; startedDrop = true
        }
        // bare text directly inside the drop subtree (no intervening block/
        // container tag to reset the state) must accumulate as DROPPED —
        // without this it kept the enclosing block's dropped=false and
        // boilerplate leaked into content (fusing with following text when
        // the drop tag is not a container)
        if (startedDrop) blkDropped = true

        if (!startedDrop) {
          if (name == "table") {
            val attrs = Attrs.parse(html, ab, ae)
            // "wired" table: explicitly marked data (border attr / ARIA role);
            // "wireless": CSS-styled data table detected structurally by the
            // forward probe (th density + regular rows, no block content) —
            // the analogue of the reference's wired/wireless/unknown
            // classification (/root/reference/src/oarocr/table_analyzer.rs:177-198)
            val isData = attrs.contains("border") ||
              attrs.get("role").exists(_.equalsIgnoreCase("table")) ||
              probeDataTable(html, ae)
            // a self-closing <table/> contains nothing: entering capture
            // would have no stack entry to ever finish it, and every byte
            // after it would be silently swallowed by the capture branch
            if (isData && !selfClosing) {
              flushBlock()
              tblDepth = 1
              tblDroppedCtx = dropDepth > 0
              tblBegin = ab.toLong
              stack += ((name, false, false, false))
              return
            } else {
              flushBlock() // layout table / contentless self-closing table
            }
          } else if (name == "a") {
            anchorDepth += 1; startedAnchor = true
          } else if (name == "img") {
            // figure harvesting: an <img> with non-empty alt is a standalone
            // figure element whose caption is the alt text — the domain
            // analogue of the reference's Image/Chart layout element rendered
            // ![Figure](caption) (/root/reference/src/domain/structure.rs:318-326).
            // Alt-less images carry no text and are ignored.
            val attrs = Attrs.parse(html, ab, ae, cs)
            val alt = attrs.getOrElse("alt", "")
            if (alt.nonEmpty) {
              val cb = new CollapseBuf(32)
              val nonWs = cb.putRun(alt) // entity-decode + ws-collapse
              if (nonWs > 0) {
                flushBlock()
                out += RawBlock("img", "figure", 0, cb.result(), ab.toLong,
                  ae.toLong, nonWs, 0, dropDepth > 0, Array.empty)
              }
            }
          } else if (blockTags.contains(name)) {
            startBlock(name); startedBlock = true
          } else if (containerTags.contains(name)) {
            if (blkKind == "preformatted") {
              // block content inside <pre> is invalid HTML that browsers
              // render as part of the pre: keep verbatim mode and the
              // preformatted kind; the container's text flows through
              flushBlock()
            } else {
              flushBlock()
              blkTag = name; blkKind = "paragraph"; blkLevel = 0
              buf.verbatim = false
              blkDropped = dropDepth > 0
            }
          } else if (name == "br" || name == "hr") {
            buf.wsHint()
            if (name == "hr") flushBlock()
          }
          // other inline tags: text flows through
        }
        if (!selfClosing) stack += ((name, startedDrop, startedBlock, startedAnchor))
        else {
          // a self-closing element CONTAINS nothing, and with no stack entry
          // its depth increments would never be undone — real crawled HTML
          // hits this constantly via unquoted attribute values ending in '/'
          // (<a href=http://x.com/>), which the tokenizer marks self-closing;
          // a leaked anchorDepth counts every later char as link text and a
          // leaked dropDepth drops the entire rest of the document
          if (startedDrop) { dropDepth -= 1; blkDropped = dropDepth > 0 }
          if (startedAnchor) anchorDepth = math.max(0, anchorDepth - 1)
        }
      }

      override def endTag(name: String): Unit = {
        // pop to nearest matching open element; ignore stray end tags
        var i = stack.length - 1
        while (i >= 0 && stack(i)._1 != name) i -= 1
        if (i < 0) return
        // unwind everything above (implicitly closed malformed elements)
        var j = stack.length - 1
        while (j >= i) {
          val (nm, sd, sb, sa) = stack(j)
          if (sd) {
            // the drop subtree's own bare text flushes AS dropped here —
            // buffered drop text must not fuse (undropped) with whatever
            // follows the closing tag
            flushBlock()
            dropDepth -= 1
            blkDropped = dropDepth > 0
          }
          if (sa) anchorDepth = math.max(0, anchorDepth - 1)
          if (tblDepth > 0) {
            nm match {
              case "table" =>
                // finish the capture whenever the captured table's element is
                // popped — even implicitly by a stray end tag below it
                if (tblNested > 0) tblNested -= 1
                else finishTable(endOfCurrentTag())
              case "tr" if tblNested == 0 => flushTableRow()
              case "td" | "th" if tblNested == 0 => flushTableCell()
              case _ => ()
            }
          } else if (sb) {
            flushBlock()
            blkTag = "body"; blkKind = "paragraph"; blkLevel = 0
            buf.verbatim = false
            blkDropped = dropDepth > 0
          } else if (containerTags.contains(nm)) {
            flushBlock()
            blkDropped = dropDepth > 0
          }
          stack.remove(j)
          j -= 1
        }
      }

      // byte offset just past the current end tag — approximated by the last
      // text end; precise table end byte is refined by the caller if needed
      private var lastTextEnd = 0L
      private def endOfCurrentTag(): Long = lastTextEnd

      override def text(begin: Int, end: Int): Unit = {
        lastTextEnd = end.toLong
        if (tblDepth > 0) {
          // tblNested > 0 included: a nested table's text FLATTENS into the
          // enclosing cell (browsers render it; silently discarding it lost
          // real content from bordered tables) — the wsHint on nested
          // tr/td/table boundaries above keeps its words separated
          if (tblCellBuf != null) {
            val nonWs = tblCellBuf.putRunBytes(html, begin, end, cs)
            if (nonWs > 0) {
              if (tblCellBegin < 0) tblCellBegin = begin.toLong
              tblCellEnd = end.toLong
            }
          }
          return
        }
        // single fused pass: ASCII bytes append directly, everything else
        // charset-decodes once, then entity-decode + whitespace-collapse +
        // char accounting in one sweep into the block buffer (no synthetic
        // inter-run space: HTML whitespace semantics — inline tags
        // (<b>wo</b>rd) must not split words; source ws decides)
        val nonWs = buf.putRunBytes(html, begin, end, cs)
        if (nonWs > 0) {
          if (blkBegin < 0) blkBegin = begin.toLong
          blkEnd = end.toLong
          blkChars += nonWs
          if (anchorDepth > 0) blkAnchor += nonWs
        }
      }

      def finish(): Unit = {
        if (tblDepth > 0) finishTable(lastTextEnd)
        flushBlock()
      }
    }

    val sink = new Sink
    Tokenizer.tokenize(html, sink)
    sink.finish()
    out.result()
  }

  /** Forward probe from just past a `<table>` open tag: is this a CSS-styled
    * DATA table (no border attr / role) rather than a layout table?
    *
    * Wireless criteria (mirroring the reference's wireless-table class,
    * /root/reference/src/oarocr/table_analyzer.rs:177-198): at least 2 header
    * cells and 2 rows, and the table's own level contains no nested table and
    * no block-level content (div/p/ul/h*) — block content inside cells is the
    * signature of page-layout tables. Scan is capped at 64 KB; a table bigger
    * than that without resolving is treated as layout (safe default).
    */
  private val probeBlockTags = Set("div", "p", "ul", "ol", "dl", "section",
    "article", "h1", "h2", "h3", "h4", "h5", "h6")
  private[html] def probeDataTable(html: Array[Byte], from: Int): Boolean = {
    val limit = math.min(html.length, from + 64 * 1024)
    var i = from
    var th = 0
    var tr = 0
    @inline def lower(b: Byte): Char =
      (if (b >= 'A' && b <= 'Z') b + 32 else b.toInt).toChar
    while (i < limit) {
      if (html(i) == '<') {
        // masked constructs the real tokenizer skips must not fool the probe:
        // comments and raw-text elements (script/style) are skipped wholesale
        if (i + 3 < limit && html(i + 1) == '!' && html(i + 2) == '-' && html(i + 3) == '-') {
          var j = i + 4
          while (j + 2 < limit && !(html(j) == '-' && html(j + 1) == '-' && html(j + 2) == '>')) j += 1
          i = if (j + 2 < limit) j + 2 else limit
        } else {
        var j = i + 1
        val closing = j < limit && html(j) == '/'
        if (closing) j += 1
        val ns = j
        while (j < limit && ((html(j) >= 'a' && html(j) <= 'z') ||
          (html(j) >= 'A' && html(j) <= 'Z') || (html(j) >= '0' && html(j) <= '9'))) j += 1
        if (j > ns) {
          val sb = new java.lang.StringBuilder(j - ns)
          var k = ns
          while (k < j) { sb.append(lower(html(k))); k += 1 }
          val name = sb.toString
          // quote-aware end of THIS tag: markup inside quoted attribute
          // values (onclick="show('<div>')") must not be parsed as tags by
          // the probe — the real tokenizer honors quotes, so a probe that
          // does not would mis-classify tables the tokenizer handles fine
          var tagEnd = limit
          var q: Int = 0
          var k2 = j
          while (k2 < limit && tagEnd == limit) {
            val d = html(k2)
            if (q != 0) { if (d == q) q = 0 }
            else if (d == '"' || d == '\'') q = d
            else if (d == '>') tagEnd = k2
            k2 += 1
          }
          if (name == "table") {
            // the probed table's own close: verdict on what was seen; an
            // OPENING table first means a nested table — the page-layout
            // signature, never a data table (so no depth tracking needed:
            // the scan ends at the first table tag either way)
            if (closing) return th >= 2 && tr >= 2
            return false
          } else if (!closing && (name == "script" || name == "style")) {
            // raw-text element: skip to its close tag (case-insensitive)
            var k = j
            var done = false
            while (!done && k + name.length + 2 < limit) {
              if (html(k) == '<' && html(k + 1) == '/' && {
                var m = 0
                var eq = true
                while (eq && m < name.length) {
                  if (lower(html(k + 2 + m)) != name.charAt(m)) eq = false
                  m += 1
                }
                eq
              }) done = true
              else k += 1
            }
            i = if (done) k else limit
          } else if (!closing) {
            if (name == "th") th += 1
            else if (name == "tr") tr += 1
            else if (probeBlockTags.contains(name)) return false
          }
          // resume past the tag's quote-aware '>' (script/style set their
          // own raw-text skip target above; don't walk it back)
          if (name != "script" && name != "style") i = math.max(i, tagEnd)
        }
        }
      }
      i += 1
    }
    false // unterminated / oversized: layout (safe default)
  }

  @inline private[html] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u00a0' || Character.isWhitespace(c)

  /** Whitespace-collapsing accumulator with fused entity decoding \u2014 the hot
    * path writes each visible char exactly once (no intermediate entity-decoded
    * or pre-collapse strings; those copies dominated allocation in profiling).
    * Collapse semantics identical to `collapse`: leading/trailing ws dropped,
    * runs fold to one space. */
  private[html] final class CollapseBuf(cap: Int) {
    private val buf = new java.lang.StringBuilder(cap)
    private var pendingSpace = false
    /** verbatim mode (<pre>): whitespace preserved exactly — the reference
      * keeps special-content blocks raw
      * (/root/reference/src/domain/structure.rs:310-316). */
    var verbatim = false
    // verbatim survives reset(): the mode belongs to the CURRENT block tag,
    // which outlives a mid-block flush (an <hr> or nested container inside
    // <pre> must not flip the rest of the pre to collapsed whitespace);
    // every blkTag (re)assignment site sets it explicitly
    def reset(): Unit = { buf.setLength(0); pendingSpace = false }
    @inline def put(c: Char): Unit =
      if (verbatim) buf.append(c)
      else if (isWs(c)) { if (buf.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { buf.append(' '); pendingSpace = false }
        buf.append(c)
      }
    /** a soft word-break (e.g. <br>): collapses like source whitespace */
    def wsHint(): Unit = if (buf.length() > 0) pendingSpace = true
    def nonEmpty: Boolean = buf.length() > 0
    def result(): String = buf.toString
    /** ASCII fast path: UTF-8, US-ASCII and windows-1252 are all
      * ASCII-transparent, so runs of bytes < 0x80 append without an
      * intermediate decoded String (the dominant case on web text). The
      * first high byte or '&' falls back to charset decode + putRun for the
      * remainder of the run. Returns non-ws chars appended. */
    def putRunBytes(html: Array[Byte], begin: Int, end: Int,
        cs: java.nio.charset.Charset): Int = {
      if (!Charset.asciiTransparent(cs))
        return putRun(Charset.decode(html, begin, end, cs))
      var nonWs = 0
      var i = begin
      while (i < end) {
        val b = html(i)
        if (b < 0 || b == '&') {
          // high byte (multi-byte charset territory) or entity: decode the
          // remainder once and reuse the string path
          return nonWs + putRun(Charset.decode(html, i, end, cs))
        }
        val c = b.toChar
        put(c)
        if (!isWs(c)) nonWs += 1
        i += 1
      }
      nonWs
    }

    /** Append a decoded-charset run, decoding entities inline; returns the
      * number of non-whitespace chars appended (anchor/char accounting). */
    def putRun(s: String): Int = {
      var nonWs = 0
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (c == '&') {
          val m = Entities.matchAt(s, i)
          if (m != null) {
            val rep = m._1
            var k = 0
            while (k < rep.length) {
              val rc = rep.charAt(k)
              put(rc)
              if (!isWs(rc)) nonWs += 1
              k += 1
            }
            i += m._2
          } else { put(c); nonWs += 1; i += 1 }
        } else {
          put(c)
          if (!isWs(c)) nonWs += 1
          i += 1
        }
      }
      nonWs
    }
  }

}
