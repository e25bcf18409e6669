package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.model.Page
import graft.pdf.{PdfParser, RealPdf}

/** Parser-level contract for the real `%PDF-1.x` reader: genuine byte
  * streams parse into the shared page model; unparseable input ERRORS
  * (never silent empty text) — the graceful-degradation analogue of the
  * reference's load_pdf_from_byte_slice error path
  * (/root/reference/src/bin/server/pdf.rs:69-152).
  */
class RealPdfSpec extends AnyFunSuite {

  private val ts = new java.sql.Timestamp(0L)

  private def minimalPdf(content: String, withTrailer: Boolean = true,
      filter: String = "", length: Option[Int] = None): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    sb.append("%PDF-1.4\n")
    sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    sb.append("2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] /MediaBox [0 0 612 792] >>\nendobj\n")
    sb.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    sb.append(s"4 0 obj\n<< /Length ${length.getOrElse(content.length)}")
    if (filter.nonEmpty) sb.append(s" /Filter /$filter")
    sb.append(" >>\nstream\n").append(content).append("\nendstream\nendobj\n")
    if (withTrailer) sb.append("trailer\n<< /Size 5 /Root 1 0 R >>\n")
    sb.append("%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  test("isReal: real %PDF-1.x yes; synthetic dialect and non-PDF no") {
    assert(RealPdf.isReal("%PDF-1.7\nstuff".getBytes(ISO_8859_1)))
    assert(!RealPdf.isReal("%PDF-GRAFT 1\nP 600".getBytes(ISO_8859_1)))
    assert(!RealPdf.isReal("<html></html>".getBytes(ISO_8859_1)))
  }

  test("minimal one-page Tj text extracts through the full pipeline") {
    val bytes = minimalPdf("BT /F1 12 Tf 1 0 0 1 50 700 Tm (Hello real pdf world) Tj ET\n")
    val got = Extractor.extract(Page("t://real1", ts, bytes, "", "en"))
    assert(got.error == "", got.error)
    assert(got.isPdf)
    assert(got.text == "Hello real pdf world")
    // span carries the exact file byte range of the literal's content
    assert(got.spans.length == 1)
    val s = got.spans(0)
    val lit = new String(bytes, s.beginByte.toInt, (s.endByte - s.beginByte).toInt, ISO_8859_1)
    assert(lit == "Hello real pdf world")
  }

  test("TJ array with kerning joins fragments; ' and \" advance lines") {
    val ops =
      "BT /F1 12 Tf 22 TL 1 0 0 1 50 700 Tm [(Frag) -120 (mented) -80 ( run)] TJ " +
        "(second line here) ' ET\n"
    val got = Extractor.extract(Page("t://real2", ts, minimalPdf(ops), "", "en"))
    assert(got.error == "", got.error)
    assert(got.text.startsWith("Fragmented run"))
    assert(got.text.contains("second line here"))
  }

  test("FlateDecode content stream inflates and extracts") {
    val ops = "BT /F1 12 Tf 1 0 0 1 50 700 Tm (compressed words inside) Tj ET\n"
    val d = new java.util.zip.Deflater()
    val raw = ops.getBytes(ISO_8859_1)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) { val k = d.deflate(buf); out.write(buf, 0, k) }
    d.end()
    val comp = new String(out.toByteArray, ISO_8859_1)
    val got = Extractor.extract(Page("t://real3", ts,
      minimalPdf(comp, filter = "FlateDecode", length = Some(comp.length)), "", "en"))
    assert(got.error == "", got.error)
    assert(got.text == "compressed words inside")
  }

  test("UTF-16BE hex string decodes (CJK text)") {
    val t = "中文标题测试"
    val hex = "FEFF" + t.map(c => f"${c.toInt}%04X").mkString
    val got = Extractor.extract(Page("t://real4", ts,
      minimalPdf(s"BT /F1 12 Tf 1 0 0 1 50 700 Tm <$hex> Tj ET\n"), "", "zh"))
    assert(got.error == "", got.error)
    assert(got.text == t)
  }

  test("font-size-promoted titles render as markdown headings") {
    val ops =
      "BT /F1 24 Tf 1 0 0 1 50 742 Tm (Document Title) Tj ET\n" +
        "BT /F1 12 Tf 1 0 0 1 50 700 Tm (body text one) Tj ET\n" +
        "BT /F1 12 Tf 1 0 0 1 50 678 Tm (body text two) Tj ET\n" +
        "BT /F1 12 Tf 1 0 0 1 50 656 Tm (body text three) Tj ET\n"
    val got = Extractor.extract(Page("t://real5", ts, minimalPdf(ops), "", "en"))
    assert(got.error == "", got.error)
    assert(got.text.startsWith("# Document Title"), got.text)
  }

  test("truncated real PDF is an ERROR row, not silent empty text") {
    val got = Extractor.extract(Page("t://realerr1", ts,
      "%PDF-1.4\n1 0 obj\n<< /Type /Cat".getBytes(ISO_8859_1), "", "en"))
    assert(got.error.nonEmpty)
    assert(got.text == "")
  }

  test("image-only page (unsupported filter, no text ops) is an ERROR row") {
    val got = Extractor.extract(Page("t://realerr2", ts,
      minimalPdf("\u00FF\u00D8imagebytes", filter = "DCTDecode"), "", "en"))
    assert(got.error.nonEmpty)
    assert(got.text == "")
  }

  test("orphan fallback: text-bearing streams without a page tree still parse") {
    val bytes =
      ("%PDF-1.4\n" +
        "7 0 obj\n<< /Length 57 >>\nstream\n" +
        "BT /F1 12 Tf 1 0 0 1 50 700 Tm (orphan stream text) Tj ET\n" +
        "endstream\nendobj\n%%EOF\n").getBytes(ISO_8859_1)
    val got = Extractor.extract(Page("t://real6", ts, bytes, "", "en"))
    assert(got.error == "", got.error)
    assert(got.text == "orphan stream text")
  }

  test("object-scan resync: xref junk and a damaged object do not derail parsing") {
    val base = new String(minimalPdf("BT /F1 12 Tf 1 0 0 1 50 700 Tm (resync works) Tj ET\n"), ISO_8859_1)
    val junked = base.replace("%%EOF\n",
      "xref\n0 6\n0000000000 65535 f \n0000000017 00000 n \nbroken 9 obj <<\n%%EOF\n")
    val got = Extractor.extract(Page("t://real7", ts, junked.getBytes(ISO_8859_1), "", "en"))
    assert(got.error == "", got.error)
    assert(got.text == "resync works")
  }

  test("wrong /Length falls back to endstream scan") {
    val got = Extractor.extract(Page("t://real8", ts,
      minimalPdf("BT /F1 12 Tf 1 0 0 1 50 700 Tm (length lied) Tj ET\n",
        length = Some(999999)), "", "en"))
    assert(got.error == "", got.error)
    assert(got.text == "length lied")
  }

  test("ruling-line grid becomes a table: cells detected geometrically from painted re rects") {
    // 2x2 grid at (50, 600)..(250, 648) in PDF space: 3 horizontal + 3
    // vertical hairline rects, stroked; one 12pt run centered in each cell
    val ops = new java.lang.StringBuilder
    for (i <- 0 to 2) ops.append(s"50 ${600 + i * 24} 200 1 re ")
    for (j <- 0 to 2) ops.append(s"${50 + j * 100} 600 1 48 re ")
    ops.append("S\n")
    val texts = Vector("alpha", "beta", "gamma", "delta")
    var k = 0
    for (rj <- 0 until 2; ci <- 0 until 2) {
      val x = 52 + ci * 100
      val yb = 608 + (1 - rj) * 24
      ops.append(s"BT /F1 12 Tf 1 0 0 1 $x $yb Tm (${texts(k)}) Tj ET\n")
      k += 1
    }
    // body text elsewhere so the page has non-table content too
    ops.append("BT /F1 12 Tf 1 0 0 1 50 700 Tm (body above the table) Tj ET\n")
    val got = Extractor.extract(Page("t://realtable", ts, minimalPdf(ops.toString), "", "en"))
    assert(got.error == "", got.error)
    assert(got.text.contains("<table><tr><td>alpha</td><td>beta</td></tr>" +
      "<tr><td>gamma</td><td>delta</td></tr></table>"), got.text)
    assert(got.text.contains("body above the table"))
  }

  test("clip-path re (W n) and short/thick rects do not produce tables") {
    val ops =
      "0 0 612 792 re W n " + // page clip: discarded by n
        "50 600 200 20 re 50 560 200 20 re f " + // thick fills: not rulings
        "BT /F1 12 Tf 1 0 0 1 50 700 Tm (no table on this page) Tj ET\n"
    val got = Extractor.extract(Page("t://realnotable", ts, minimalPdf(ops), "", "en"))
    assert(got.error == "", got.error)
    assert(!got.text.contains("<table>"), got.text)
    assert(got.text == "no table on this page")
  }

  test("large-font run inside a table grid stays a cell, not a heading") {
    val ops = new java.lang.StringBuilder
    for (i <- 0 to 2) ops.append(s"50 ${600 + i * 24} 200 1 re ")
    for (j <- 0 to 2) ops.append(s"${50 + j * 100} 600 1 48 re ")
    ops.append("S\n")
    // 18pt header-row runs inside the grid + 12pt data row + body context
    ops.append("BT /F1 18 Tf 1 0 0 1 52 630 Tm (Name) Tj ET\n")
    ops.append("BT /F1 18 Tf 1 0 0 1 152 630 Tm (Qty) Tj ET\n")
    ops.append("BT /F1 12 Tf 1 0 0 1 52 608 Tm (bolt) Tj ET\n")
    ops.append("BT /F1 12 Tf 1 0 0 1 152 608 Tm (nine) Tj ET\n")
    ops.append("BT /F1 12 Tf 1 0 0 1 50 700 Tm (intro words) Tj ET\n")
    ops.append("BT /F1 12 Tf 1 0 0 1 50 680 Tm (more body here) Tj ET\n")
    ops.append("BT /F1 12 Tf 1 0 0 1 50 660 Tm (and more body) Tj ET\n")
    val got = Extractor.extract(Page("t://realtable2", ts, minimalPdf(ops.toString), "", "en"))
    assert(got.error == "", got.error)
    assert(!got.text.contains("## Name"), got.text)
    assert(got.text.contains("<td>Name</td><td>Qty</td>"), got.text)
    assert(got.text.contains("<td>bolt</td><td>nine</td>"), got.text)
  }

  test("two pages join with the page break in tree order") {
    val sb = new java.lang.StringBuilder
    sb.append("%PDF-1.4\n")
    sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    sb.append("2 0 obj\n<< /Type /Pages /Count 2 /Kids [3 0 R 5 0 R] /MediaBox [0 0 612 792] >>\nendobj\n")
    // kids emitted in REVERSE file order: tree order must win
    val c2 = "BT /F1 12 Tf 1 0 0 1 50 700 Tm (page two) Tj ET\n"
    val c1 = "BT /F1 12 Tf 1 0 0 1 50 700 Tm (page one) Tj ET\n"
    sb.append("5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n")
    sb.append(s"6 0 obj\n<< /Length ${c2.length} >>\nstream\n").append(c2).append("\nendstream\nendobj\n")
    sb.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    sb.append(s"4 0 obj\n<< /Length ${c1.length} >>\nstream\n").append(c1).append("\nendstream\nendobj\n")
    sb.append("trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n")
    val got = Extractor.extract(Page("t://real9", ts, sb.toString.getBytes(ISO_8859_1), "", "en"))
    assert(got.error == "", got.error)
    assert(got.text == "page one" + PdfParser.PageBreak + "page two")
  }
}
