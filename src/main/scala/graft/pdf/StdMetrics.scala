package graft.pdf

/** ASCII advance widths for the standard-14 Helvetica and Times families,
  * transcribed from the public Adobe Core-14 AFM metrics (glyph-space units,
  * /1000 = em). Standard-14 fonts are exactly the fonts a PDF may use
  * WITHOUT embedding /Widths (spec appendix D), so flat-estimate advances
  * (0.5 em) were previously the only signal for them; real metrics tighten
  * line grouping, right-gap soft-wrap and ruling-table cell assignment
  * (PdfParser.sortAndJoin) for the most common non-embedded fonts.
  *
  * Scope bound, by design: codes 32–126 only (the WinAnsi/Standard/Latin-1
  * ASCII-transparent range); codes outside fall back to the caller's
  * default estimate. Widths drive LAYOUT HEURISTICS only — extracted text
  * content never depends on them, so a transcription slip degrades a
  * threshold, never a byte. Courier family is handled upstream as a flat
  * 0.6 em (uniform 600/1000 metrics, exact for every code).
  *
  * Reference behavior: the reference rasterizes through PDFium, which ships
  * these same AFM tables (/root/reference/src/bin/server/pdf.rs:69-152).
  */
object StdMetrics {

  // per-family tables: widths for char codes 32..126 inclusive (95 entries)
  private val helvetica = Array(
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333, 278, 278,
    556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278, 584, 584, 584, 556,
    1015, 667, 667, 722, 722, 667, 611, 778, 722, 278, 500, 667, 556, 833, 722, 778,
    667, 778, 722, 667, 611, 722, 667, 944, 667, 667, 611, 278, 278, 278, 469, 556,
    333, 556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833, 556, 556,
    556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584)

  private val helveticaBold = Array(
    278, 333, 474, 556, 556, 889, 722, 238, 333, 333, 389, 584, 278, 333, 278, 278,
    556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 333, 333, 584, 584, 584, 611,
    975, 722, 722, 722, 722, 667, 611, 778, 722, 278, 556, 722, 611, 833, 722, 778,
    667, 778, 722, 667, 611, 722, 667, 944, 667, 667, 611, 333, 278, 333, 584, 556,
    333, 556, 611, 556, 611, 556, 333, 611, 611, 278, 278, 556, 278, 889, 611, 611,
    611, 611, 389, 556, 333, 611, 556, 778, 556, 556, 500, 389, 280, 389, 584)

  private val timesRoman = Array(
    250, 333, 408, 500, 500, 833, 778, 180, 333, 333, 500, 564, 250, 333, 250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 278, 278, 564, 564, 564, 444,
    921, 722, 667, 667, 722, 611, 556, 722, 722, 333, 389, 722, 611, 889, 722, 722,
    556, 722, 667, 556, 611, 722, 722, 944, 722, 722, 611, 333, 278, 333, 469, 500,
    333, 444, 500, 444, 500, 444, 333, 500, 500, 278, 278, 500, 278, 778, 500, 500,
    500, 500, 333, 389, 278, 500, 500, 722, 500, 500, 444, 480, 200, 480, 541)

  private val timesBold = Array(
    250, 333, 555, 500, 500, 1000, 833, 278, 333, 333, 500, 570, 250, 333, 250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 333, 333, 570, 570, 570, 500,
    930, 722, 667, 722, 722, 667, 611, 778, 778, 389, 500, 778, 667, 944, 722, 778,
    611, 778, 722, 556, 667, 722, 722, 1000, 722, 722, 667, 333, 278, 333, 581, 500,
    333, 500, 556, 444, 556, 444, 333, 500, 556, 278, 333, 556, 278, 833, 556, 500,
    556, 556, 444, 389, 333, 556, 500, 722, 500, 500, 444, 394, 220, 394, 520)

  private val timesItalic = Array(
    250, 333, 420, 500, 500, 833, 778, 214, 333, 333, 500, 675, 250, 333, 250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 333, 333, 675, 675, 675, 500,
    920, 611, 611, 667, 722, 611, 611, 722, 722, 333, 444, 667, 556, 833, 667, 722,
    611, 722, 611, 500, 556, 722, 611, 833, 611, 556, 556, 389, 278, 389, 422, 500,
    333, 500, 500, 444, 500, 444, 278, 500, 500, 278, 278, 444, 278, 722, 500, 500,
    500, 500, 389, 389, 278, 500, 444, 667, 444, 444, 389, 400, 275, 400, 541)

  private val timesBoldItalic = Array(
    250, 389, 555, 500, 500, 833, 778, 278, 333, 333, 500, 570, 250, 333, 250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 333, 333, 570, 570, 570, 500,
    832, 667, 667, 667, 722, 667, 667, 722, 778, 389, 500, 667, 611, 889, 722, 722,
    611, 722, 667, 556, 611, 722, 667, 889, 667, 611, 611, 333, 278, 333, 570, 500,
    333, 500, 500, 444, 500, 444, 333, 500, 556, 278, 278, 500, 278, 778, 556, 500,
    500, 500, 389, 389, 278, 556, 444, 667, 500, 444, 389, 348, 220, 348, 570)

  private def toMap(t: Array[Int]): Map[Int, Double] = {
    val b = Map.newBuilder[Int, Double]
    var i = 0
    while (i < t.length) { b += (32 + i) -> t(i) / 1000.0; i += 1 }
    b.result()
  }

  private val byKey: Map[String, Map[Int, Double]] = Map(
    "helv"   -> toMap(helvetica),
    "helv-b" -> toMap(helveticaBold),
    "times"   -> toMap(timesRoman),
    "times-b" -> toMap(timesBold),
    "times-i" -> toMap(timesItalic),
    "times-bi" -> toMap(timesBoldItalic))

  /** ASCII metrics for a /BaseFont name, None when the family is not a
    * Helvetica/Arial/Times standard-14 member. Subset prefixes
    * ("ABCDEF+Helvetica-Bold") strip; Arial aliases Helvetica (same metric
    * design); Oblique uses its upright weight's table (identical AFM
    * advances). */
  def widthsFor(baseFont: String): Option[Map[Int, Double]] = {
    val name0 = baseFont.indexOf('+') match {
      case i if i >= 0 && i < baseFont.length - 1 => baseFont.substring(i + 1)
      case _                                      => baseFont
    }
    val n = name0.toLowerCase
    val bold = n.contains("bold")
    val italic = n.contains("italic") || n.contains("oblique")
    if (n.contains("helvetica") || n.contains("arial"))
      byKey.get(if (bold) "helv-b" else "helv")
    else if (n.contains("times"))
      byKey.get(if (bold && italic) "times-bi" else if (bold) "times-b"
        else if (italic) "times-i" else "times")
    else None
  }
}
