package graft.pdf

import graft.geom.{Box, XYCut}
import graft.assemble.JoinRules
import graft.model.Span

/** Embedded-PDF payload branch: magic-byte sniff + columnar page-segmentation
  * parse, the analogue of the reference's PDF render path
  * (/root/reference/src/bin/server/pdf.rs:69-152, sniff :167-169) feeding the
  * XY-cut reading-order sort
  * (/root/reference/src/processors/sorting.rs:161-493).
  *
  * The container libraries for real PDF decoding are not available here, so
  * the payload is a deterministic synthetic dialect (FIXTURES.md §2) carrying
  * exactly what the layout branch consumes — positioned text boxes:
  *
  * {{{
  * %PDF-GRAFT 1\n
  * P <w> <h>\n                 -- page start
  * T <x> <y> <w> <h> <text>\n  -- one positioned text box (text = rest of line)
  * E\n                         -- page end
  * }}}
  *
  * The Spark-side plumbing (sniff, per-page flatten, geometric ordering,
  * byte-offset spans, page-break join) is the real, tested part; swapping a
  * real PDF text-object decoder in changes only `parsePayload`.
  */
object PdfParser {

  final case class TextBox(box: Box, text: String, beginByte: Long, endByte: Long)
  final case class PdfPage(width: Double, height: Double, boxes: Vector[TextBox])

  /** Matches the reference's page-join in multi-page responses
    * (/root/reference/src/bin/server/ocr.rs:190-240). */
  val PageBreak = "\n\n--- Page Break ---\n\n"

  def isPdf(html: Array[Byte]): Boolean =
    html.length >= 4 && html(0) == '%' && html(1) == 'P' &&
      html(2) == 'D' && html(3) == 'F'

  /** Parse the synthetic dialect tracking byte offsets of each box's text. */
  def parsePayload(bytes: Array[Byte]): Vector[PdfPage] = {
    val pages = Vector.newBuilder[PdfPage]
    var boxes = Vector.newBuilder[TextBox]
    var pw = 0.0; var ph = 0.0; var inPage = false
    val n = bytes.length
    var i = 0
    def lineEnd(from: Int): Int = {
      var j = from
      while (j < n && bytes(j) != '\n') j += 1
      j
    }
    while (i < n) {
      val e = lineEnd(i)
      if (e > i) {
        bytes(i) match {
          case 'P' if e > i + 1 && bytes(i + 1) == ' ' =>
            if (inPage) { pages += PdfPage(pw, ph, boxes.result()); boxes = Vector.newBuilder }
            val parts = new String(bytes, i + 2, e - i - 2, java.nio.charset.StandardCharsets.US_ASCII).split(' ')
            pw = parts.headOption.flatMap(p => p.toDoubleOption).getOrElse(0.0)
            ph = if (parts.length > 1) parts(1).toDoubleOption.getOrElse(0.0) else 0.0
            inPage = true
          case 'T' if e > i + 1 && bytes(i + 1) == ' ' =>
            // T x y w h text...
            var p = i + 2
            val nums = new Array[Double](4)
            var k = 0
            var ok = true
            while (k < 4 && ok) {
              var q = p
              while (q < e && bytes(q) != ' ') q += 1
              val s = new String(bytes, p, q - p, java.nio.charset.StandardCharsets.US_ASCII)
              s.toDoubleOption match {
                case Some(d) => nums(k) = d; p = q + 1; k += 1
                case None    => ok = false
              }
            }
            if (ok && p <= e) {
              val text = new String(bytes, p, e - p, java.nio.charset.StandardCharsets.UTF_8)
              val b = Box(nums(0), nums(1), nums(0) + nums(2), nums(1) + nums(3))
              boxes += TextBox(b, text, p.toLong, e.toLong)
            }
          case 'E' =>
            if (inPage) { pages += PdfPage(pw, ph, boxes.result()); boxes = Vector.newBuilder; inPage = false }
          case _ => () // header / unknown line: skip
        }
      }
      i = e + 1
    }
    if (inPage) pages += PdfPage(pw, ph, boxes.result())
    pages.result()
  }

  /** One page: XY-cut reading order, same-line fragments joined per the
    * space-after-ASCII-alpha rule, lines joined with '\n'. */
  def renderPage(page: PdfPage): (String, Vector[(Long, Long)]) = {
    if (page.boxes.isEmpty) return ("", Vector.empty)
    val order = XYCut.readingOrder(page.boxes.map(_.box).toArray)
    val ordered = order.toVector.map(page.boxes)
    val sb = new java.lang.StringBuilder(256)
    val offs = Vector.newBuilder[(Long, Long)]
    val lineTol = 10.0
    var prevY = Double.NaN
    var lineStartIdx = true
    var currentLine = new java.lang.StringBuilder(128)
    def flushLine(): Unit = {
      if (currentLine.length() > 0) {
        if (sb.length() > 0) sb.append('\n')
        sb.append(currentLine)
        currentLine = new java.lang.StringBuilder(128)
      }
    }
    for (tb <- ordered) {
      offs += ((tb.beginByte, tb.endByte))
      if (!prevY.isNaN && math.abs(tb.box.y1 - prevY) >= lineTol) flushLine()
      if (currentLine.length() > 0) {
        val c = currentLine.charAt(currentLine.length() - 1)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) currentLine.append(' ')
      }
      currentLine.append(tb.text)
      prevY = tb.box.y1
      lineStartIdx = false
    }
    flushLine()
    (sb.toString, offs.result())
  }

  /** Full payload: pages joined by the page break; spans carry kind
    * pdf_fragment with blockIdx = page index. */
  def extract(bytes: Array[Byte]): (String, Array[Span]) = {
    val pages = parsePayload(bytes)
    val texts = Vector.newBuilder[String]
    val spans = Array.newBuilder[Span]
    var pi = 0
    for (p <- pages) {
      val (t, offs) = renderPage(p)
      texts += t
      for ((b, e) <- offs) spans += Span(pi, b, e, "pdf_fragment")
      pi += 1
    }
    (texts.result().mkString(PageBreak), spans.result())
  }
}
