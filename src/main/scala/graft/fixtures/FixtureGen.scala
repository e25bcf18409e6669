package graft.fixtures

import graft.model.Page
import graft.html.TableGrid
import graft.assemble.TitleLevel
import java.nio.charset.{Charset => JCharset, StandardCharsets}

/** Deterministic synthetic page corpus + independent golden oracle
  * (FIXTURES.md). Every decision derives from `Seed ⊕ rowId` via
  * java.util.Random (spec-fixed algorithm → stable across JVMs). The oracle
  * does NOT run the extractor: it computes the expected extracted text from
  * the generation grammar itself, so `extract(html) == expected` is a real
  * end-to-end byte-identity check (north rule).
  */
object FixtureGen {

  val Seed = 42L

  final case class Fixture(page: Page, expectedText: String, expectedSpanCount: Int)

  // ---- deterministic vocabulary -------------------------------------------

  private val syl1 = Array("ba", "re", "mo", "ta", "li", "sun", "ver", "ka",
    "del", "or", "min", "pa", "qui", "sto", "ne", "gra")
  private val syl2 = Array("lon", "mer", "tis", "den", "ro", "val", "ner",
    "sil", "tan", "cor", "bel", "dur", "fen", "gol", "han", "rim")
  private val syl3 = Array("a", "o", "um", "is", "er", "on", "ix", "us",
    "ia", "eth", "or", "an", "el", "in", "ar", "ey")

  /** latin pseudo-word i (pure function of i) */
  def word(i: Int): String = {
    val a = syl1((i * 7) & 15); val b = syl2((i * 13 >> 2) & 15); val c = syl3((i * 29 >> 4) & 15)
    if ((i & 3) == 0) a + b else a + b + c
  }

  /** CJK pseudo-word: 1-3 chars from the unified ideograph block */
  def cjkWord(i: Int): String = {
    val len = 1 + (i % 3)
    val sb = new StringBuilder
    var k = 0
    while (k < len) { sb.append((0x4E00 + ((i * 131 + k * 977) % 2000)).toChar); k += 1 }
    sb.toString
  }

  /** Arabic pseudo-word: 2-5 chars from the Arabic block */
  def arWord(i: Int): String = {
    val len = 2 + (i % 4)
    val sb = new StringBuilder
    var k = 0
    while (k < len) { sb.append((0x0627 + ((i * 37 + k * 11) % 26)).toChar); k += 1 }
    sb.toString
  }

  private val deExtras = Array("über", "größe", "straße", "müller", "käfer", "schön")

  private def wordFor(lang: String, i: Int): String = lang match {
    case "zh" => cjkWord(i)
    case "ar" => arWord(i)
    case "de" => if (i % 11 == 0) deExtras((i / 11) % deExtras.length) else word(i)
    case _    => word(i)
  }

  // entity token pairs: (html form, decoded form) — appended to a word
  private val entityPairs = Array(
    ("&amp;co", "&co"), ("&lt;x", "<x"), ("&#x4E2D;", "中"),
    ("&quot;q&quot;", "\"q\""), ("&gt;", ">"), ("&#169;", "©"))

  // ---- per-row generation --------------------------------------------------

  def fixture(rowId: Long): Fixture = {
    val r = new java.util.Random(Seed * 0x9E3779B97F4A7C15L + rowId * 0x2545F4914F6CDD1DL)
    val lang = Array("en", "zh", "de", "ar").apply((rowId % 4).toInt)
    val host = 1 + zipfHost(r)
    val url = s"https://host$host.example/${java.lang.Long.toString(rowId, 36)}"
    val ts = new java.sql.Timestamp(1767225600000L + rowId * 1000L) // 2026-01-01T00:00:00Z + rowId s

    val isPdf = rowId % 50 == 1
    if (isPdf) {
      val (bytes, expected, nSpans) = genPdf(r, lang)
      return Fixture(Page(url, ts, bytes, "", lang), expected, nSpans)
    }

    val giant = rowId % 200 == 3
    val cp1252 = !giant && (lang == "en" || lang == "de") && rowId % 20 == 5
    val malformed = rowId % 10 == 7
    val cs: JCharset =
      if (cp1252) JCharset.forName("windows-1252") else StandardCharsets.UTF_8

    val html = new java.lang.StringBuilder(4096)
    val pieces = Vector.newBuilder[String] // expected rendered blocks in order
    var spanCount = 0

    html.append("<!DOCTYPE html><html><head>")
    if (cp1252) html.append("<meta charset=\"windows-1252\">")
    else html.append("<meta charset=\"utf-8\">")
    html.append("<title>site ").append(host).append("</title>")
    html.append("<style>body{margin:0} .x>a{color:red}</style>")
    html.append("<script>var q = '<p>not content</p>'; if(1<2){}</script>")
    html.append("</head><body>")

    // boilerplate shell (must all be dropped)
    html.append("<header><h1>Site ").append(host).append("</h1>")
    html.append("<div class=\"masthead\">the finest synthetic pages</div></header>")
    html.append("<nav><ul>")
    for (k <- 0 until 5 + r.nextInt(6))
      html.append("<li><a href=\"/s").append(k).append("\">").append(word(k + 3)).append(" ").append(word(k + 9)).append("</a></li>")
    html.append("</ul></nav>")
    html.append("<div class=\"cookie-banner\">We use cookies to improve your experience ")
    html.append("<a href=\"/accept\">accept</a> <a href=\"/no\">decline</a></div>")
    html.append("<aside><h3>Trending</h3><ul>")
    for (k <- 0 until 4) html.append("<li><a href=\"/t").append(k).append("\">").append(word(40 + k)).append("</a></li>")
    html.append("</ul></aside>")
    html.append("<div class=\"sidebar\"><ul>")
    for (k <- 0 until 6) html.append("<li><a href=\"/r").append(k).append("\">").append(word(60 + k)).append(" ").append(word(70 + k)).append("</a></li>")
    html.append("</ul></div>")

    // main content
    html.append("<main><article>")

    val nSections = 1 + r.nextInt(3)
    var pieceSeed = r.nextInt(1 << 20)
    for (s <- 0 until nSections) {
      // optional numbered title
      if (r.nextInt(10) < 8) {
        val tagLevel = 1 + r.nextInt(3)
        // cp1252 pages must stay encodable: no CJK numbering prefix
        val numStyle0 = r.nextInt(5)
        val numStyle = if (cp1252 && numStyle0 == 2) 0 else numStyle0
        val tWords = (0 until 2 + r.nextInt(4)).map(i => wordFor(lang, pieceSeed + i * 17 + 5))
        val prefix = numStyle match {
          case 0 => s"${s + 1}. "
          case 1 => s"${s + 1}.${1 + r.nextInt(4)} "
          case 2 => Array("一、", "二、", "三、").apply(s % 3)
          case 3 => Array("I.", "II.", "IV.").apply(s % 3) + " "
          case _ => ""
        }
        val titleText = (prefix + tWords.mkString(" ")).trim
        html.append("<h").append(tagLevel).append('>').append(titleText)
        if (malformed && s == 0) html.append("</h9") // noise: broken end tag is skipped
        html.append("</h").append(tagLevel).append('>')
        val lvl = TitleLevel.resolve(titleText, tagLevel)
        pieces += ("#" * lvl) + " " + titleText
        spanCount += 1
      }

      val nParas = 1 + r.nextInt(4)
      for (pi <- 0 until nParas) {
        val n = 10 + r.nextInt(90)
        val base = pieceSeed + pi * 101
        val htmlWords = new scala.collection.mutable.ArrayBuffer[String](n)
        val expWords = new scala.collection.mutable.ArrayBuffer[String](n)
        for (wi <- 0 until n) {
          var hw = wordFor(lang, base + wi)
          var ew = hw
          if (wi % 13 == 7) {
            // cp1252 pages skip the CJK entity (index 2): not encodable
            var ei = (base + wi) % entityPairs.length
            if (cp1252 && ei == 2) ei = 0
            val (h, e) = entityPairs(ei)
            hw = hw + h; ew = ew + e
          }
          if (wi % 17 == 11) { // inline emphasis wrapping a whole word
            val t = Array("b", "em", "strong", "code").apply((base + wi) % 4)
            hw = s"<$t>$hw</$t>"
          }
          if (wi % 29 == 13) { // sparse in-content link (low link density)
            hw = s"<a href=\"/w$wi\">$hw</a>"
          }
          htmlWords += hw; expWords += ew
        }
        html.append("<p>")
        if (malformed && pi == 1) html.append("<b>") // unclosed inline tag
        html.append(htmlWords.mkString(" "))
        html.append("</p>")
        if (malformed && pi == 2) html.append("</span>") // stray end tag
        pieces += expWords.mkString(" ")
        spanCount += 1
      }

      // optional list
      if (r.nextInt(10) < 4) {
        val items = (0 until 3 + r.nextInt(5)).map { li =>
          (0 until 4 + r.nextInt(6)).map(i => wordFor(lang, pieceSeed + li * 31 + i)).mkString(" ")
        }
        html.append("<ul>")
        for (it <- items) { html.append("<li>").append(it).append("</li>"); pieces += ("- " + it); spanCount += 1 }
        html.append("</ul>")
      }

      // optional figure: img alt harvested as ![Figure](alt), figcaption as *caption*
      if (r.nextInt(10) < 3) {
        var alt = (0 until 2 + r.nextInt(4)).map(i => wordFor(lang, pieceSeed + i * 19 + 3)).mkString(" ")
        var altExp = alt
        if (r.nextInt(3) == 0) { // entity inside the alt attribute value
          var ei = r.nextInt(entityPairs.length)
          if (cp1252 && ei == 2) ei = 0
          val (h, e) = entityPairs(ei)
          alt = alt + h; altExp = altExp + e
        }
        html.append("<figure><img src=\"/img").append(s).append(".png\" alt=\"").append(alt).append("\">")
        pieces += s"![Figure]($altExp)"
        spanCount += 1
        if (r.nextInt(3) > 0) {
          val cap = (0 until 3 + r.nextInt(4)).map(i => wordFor(lang, pieceSeed + i * 23 + 8)).mkString(" ")
          html.append("<figcaption>").append(cap).append("</figcaption>")
          pieces += s"*$cap*"
          spanCount += 1
        }
        html.append("</figure>")
        // decorative alt-less image: must NOT produce a block
        if (r.nextInt(2) == 0) html.append("<img src=\"/spacer.gif\">")
      }

      // optional formula: math subtree rendered $$...$$
      if (r.nextInt(10) < 2) {
        val a = 1 + r.nextInt(9); val b2 = 1 + r.nextInt(9)
        html.append("<math><mi>x</mi><mo>=</mo><mn>").append(a)
          .append("</mn><mo>+</mo><mn>").append(b2).append("</mn></math>")
        pieces += ("$$" + s"x=$a+$b2" + "$$")
        spanCount += 1
      }

      // optional data table (border => captured)
      if (r.nextInt(10) < 3) {
        val nRows = 2 + r.nextInt(3)
        val nCols = 2 + r.nextInt(3)
        val useSpan = r.nextInt(3) == 0
        val rows = Vector.newBuilder[Vector[(Int, Int, Boolean, String)]]
        html.append("<table border=\"1\">")
        for (ri <- 0 until nRows) {
          html.append("<tr>")
          val row = Vector.newBuilder[(Int, Int, Boolean, String)]
          var ci = 0
          while (ci < nCols) {
            val hdr = ri == 0
            val colSpan = if (useSpan && ri == 1 && ci == 0 && nCols >= 2) 2 else 1
            val txt = wordFor(lang, pieceSeed + ri * 43 + ci * 7) +
              (if ((ri + ci) % 3 == 0) " " + wordFor(lang, pieceSeed + ri + ci + 99) else "")
            val tag = if (hdr) "th" else "td"
            html.append('<').append(tag)
            if (colSpan > 1) html.append(" colspan=\"").append(colSpan).append('"')
            html.append('>').append(txt).append("</").append(tag).append('>')
            row += ((1, colSpan, hdr, txt))
            spanCount += 1
            ci += colSpan
          }
          html.append("</tr>")
          rows += row.result()
        }
        html.append("</table>")
        pieces += TableGrid.render(TableGrid.resolve(rows.result()))
      }

      // optional wireless data table: CSS-styled, NO border attr — captured
      // via the structural probe (>=2 th, >=2 rows, no block content)
      if (r.nextInt(10) < 2) {
        val nRows = 2 + r.nextInt(3)
        val nCols = 2 + r.nextInt(2)
        val rows = Vector.newBuilder[Vector[(Int, Int, Boolean, String)]]
        html.append("<table class=\"data-grid\">")
        for (ri <- 0 until nRows) {
          html.append("<tr>")
          val row = Vector.newBuilder[(Int, Int, Boolean, String)]
          for (ci <- 0 until nCols) {
            val hdr = ri == 0
            val txt = wordFor(lang, pieceSeed + ri * 61 + ci * 13 + 21)
            val tag = if (hdr) "th" else "td"
            html.append('<').append(tag).append('>').append(txt)
              .append("</").append(tag).append('>')
            row += ((1, 1, hdr, txt))
            spanCount += 1
          }
          html.append("</tr>")
          rows += row.result()
        }
        html.append("</table>")
        pieces += TableGrid.render(TableGrid.resolve(rows.result()))
      }

      // optional borderless layout table: its cell texts are plain paragraphs
      if (r.nextInt(10) < 2) {
        val cells = (0 until 2).map { ci =>
          (0 until 5 + r.nextInt(6)).map(i => wordFor(lang, pieceSeed + ci * 53 + i + 7)).mkString(" ")
        }
        html.append("<table><tr>")
        for (c <- cells) { html.append("<td>").append(c).append("</td>"); pieces += c; spanCount += 1 }
        html.append("</tr></table>")
      }

      // inline noise between sections
      html.append("<!-- section ").append(s).append(" done -->")
      if (s == 0) html.append("<template><p>hidden template para</p></template>")
      pieceSeed += 7919
    }

    if (giant) {
      // skew tail: repeat a long paragraph until >= 2 MB of html
      val base = pieceSeed + 31337
      val para = (0 until 400).map(i => word(base + i)).mkString(" ")
      val reps = math.max(1, (2 * 1024 * 1024) / (para.length + 7) + 1)
      for (_ <- 0 until reps) { html.append("<p>").append(para).append("</p>"); pieces += para; spanCount += 1 }
    }

    html.append("</article></main>")
    html.append("<footer><p>copyright ").append(host).append(" — <a href=\"/tos\">terms</a> <a href=\"/privacy\">privacy</a></p></footer>")
    html.append("</body></html>")

    val bytes = html.toString.getBytes(cs)
    val expected = pieces.result().mkString("\n\n")
    Fixture(Page(url, ts, bytes, "", lang), expected, spanCount)
  }

  /** Zipf(~1.2)-ish host id over 64 hosts for hot-domain skew. */
  private def zipfHost(r: java.util.Random): Int = {
    val u = r.nextDouble()
    math.min(63, math.floor(math.pow(u, 3.0) * 64).toInt)
  }

  // ---- synthetic PDF payload ----------------------------------------------

  /** Pages of positioned text boxes in 1-3 columns; expected text derived
    * from the known column/line structure (column-major, lines '\n'-joined,
    * same-line fragments joined with space-after-ASCII-alpha). */
  private def genPdf(r: java.util.Random, lang: String): (Array[Byte], String, Int) = {
    val sb = new java.lang.StringBuilder(2048)
    sb.append("%PDF-GRAFT 1\n")
    val nPages = 1 + r.nextInt(4)
    val pageTexts = Vector.newBuilder[String]
    var nSpans = 0
    for (_ <- 0 until nPages) {
      sb.append("P 600 800\n")
      val nCols = 1 + r.nextInt(3)
      val colW = 600.0 / nCols
      val lines = Vector.newBuilder[String]
      // emit boxes in shuffled order to force the XY-cut to do real work
      val emit = new scala.collection.mutable.ArrayBuffer[String]()
      for (c <- 0 until nCols) {
        val x0 = c * colW + 10
        val nLines = 2 + r.nextInt(7)
        for (l <- 0 until nLines) {
          val y = 40 + l * 22
          val nFrag = 1 + r.nextInt(3)
          val frags = new scala.collection.mutable.ArrayBuffer[String]()
          var x = x0
          // total line width must stay inside the column so the X projection
          // keeps a clean gap between columns
          val fragBudget = (colW - 40.0) / nFrag - 1.0
          for (f <- 0 until nFrag) {
            val t = (0 until 1 + r.nextInt(3)).map(i => wordFor(lang, r.nextInt(4096))).mkString(" ")
            val w = math.max(8.0, math.min(t.length * 3.0, fragBudget))
            // locale-independent number formatting (the parser expects '.')
            def d1(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
            emit += s"T ${d1(x)} ${d1(y)} ${d1(w)} 12.0 $t"
            frags += t
            x += w + 0.5
            nSpans += 1
          }
          // same-line join: space only after ASCII alphabetic (oracle inlines
          // the rule rather than calling the engine's JoinRules)
          val line = frags.foldLeft("") { (acc, f) =>
            if (acc.nonEmpty && {
              val ch = acc.charAt(acc.length - 1)
              (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')
            }) acc + " " + f
            else acc + f
          }
          lines += line
        }
      }
      // shuffle emission order deterministically
      val order = emit.indices.toArray
      var i = order.length - 1
      while (i > 0) { val j = r.nextInt(i + 1); val t = order(i); order(i) = order(j); order(j) = t; i -= 1 }
      for (k <- order) sb.append(emit(k)).append('\n')
      sb.append("E\n")
      pageTexts += lines.result().mkString("\n")
    }
    val expected = pageTexts.result().mkString("\n\n--- Page Break ---\n\n")
    (sb.toString.getBytes(StandardCharsets.UTF_8), expected, nSpans)
  }

  def corpus(n: Int, from: Long = 0L): Iterator[Fixture] =
    Iterator.range(0, n).map(i => fixture(from + i))

  // ---- synthetic media payloads (multimodal column fixtures) ---------------

  /** Deterministic media payload for `mediaId`: rotates png/jpeg/wav/garbage.
    * Headers are structurally valid for our parsers (PNG IHDR, JPEG SOF0,
    * WAV fmt chunk); bodies are deterministic noise — the multimodal DECODE
    * stage is stubbed (see ops.Multimodal), the container metadata is real. */
  def media(mediaId: Long): Array[Byte] = {
    val r = new java.util.Random(Seed * 0x5DEECE66DL + mediaId * 0x9E3779B97F4A7C15L)
    val body = new Array[Byte](128 + r.nextInt(1024))
    r.nextBytes(body)
    (mediaId % 4) match {
      case 0 => // PNG with IHDR w/h
        val w = 16 + r.nextInt(2048); val h = 16 + r.nextInt(2048)
        val out = java.nio.ByteBuffer.allocate(33 + body.length)
        out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
        out.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
          .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        out.putInt(0) // CRC placeholder (parser reads IHDR fields only)
        out.put(body)
        out.array()
      case 1 => // JPEG: SOI, APP0 skip-chunk, SOF0 with h/w
        val w = 8 + r.nextInt(4000); val h = 8 + r.nextInt(4000)
        val out = java.nio.ByteBuffer.allocate(2 + 4 + 4 + 9 + body.length)
        out.put(0xff.toByte).put(0xd8.toByte)
        out.put(0xff.toByte).put(0xe0.toByte).putShort(6.toShort).putShort(0.toShort).putShort(0.toShort)
        out.put(0xff.toByte).put(0xc0.toByte).putShort(9.toShort).put(8.toByte)
          .putShort(h.toShort).putShort(w.toShort)
        out.put(body)
        out.array()
      case 2 => // WAV: RIFF/WAVE + fmt chunk (PCM, channels, sampleRate)
        val sr = Array(8000, 16000, 22050, 44100, 48000).apply(r.nextInt(5))
        val ch = 1 + r.nextInt(2)
        val out = java.nio.ByteBuffer.allocate(36 + body.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.put("RIFF".getBytes).putInt(28 + body.length).put("WAVE".getBytes)
        out.put("fmt ".getBytes).putInt(16).putShort(1.toShort).putShort(ch.toShort)
          .putInt(sr).putInt(sr * ch * 2).putShort((ch * 2).toShort).putShort(16.toShort)
        out.put(body)
        out.array()
      case _ => body // unknown format: parser must degrade gracefully
    }
  }
}
