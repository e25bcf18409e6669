package graft.assemble

import graft.model.{Block, Span}
import graft.html.BlockBuilder.RawBlock

/** Title-level refinement from numbering prefixes — port of the reference's
  * `format_title_with_level` regexes
  * (/root/reference/src/domain/structure.rs:17-43,59-94): arabic dotted
  * numbering depth, Chinese numerals, Roman numerals.
  */
object TitleLevel {
  private val arabic = java.util.regex.Pattern.compile(
    "^(\\d{1,3})((?:\\.\\d{1,3})*)[.、]?\\s")
  private val chinese = java.util.regex.Pattern.compile(
    "^[一二三四五六七八九十百千]+[、.．]\\s?")
  private val roman = java.util.regex.Pattern.compile(
    "^(?=[IVXLC])[IVXLC]{1,7}[.、]\\s")

  /** Resolve the render level for a title: numbering prefix wins over the
    * h-tag level; clamp to 1..6. */
  def resolve(text: String, tagLevel: Int): Int = {
    val m = arabic.matcher(text)
    if (m.find()) {
      val extraDots = m.group(2).count(_ == '.')
      return math.min(6, math.max(1, 1 + extraDots))
    }
    if (chinese.matcher(text).find()) return 1
    if (roman.matcher(text).find()) return 1
    math.min(6, math.max(1, if (tagLevel > 0) tagLevel else 2))
  }
}

/** Final text + span assembly — the reference's stitching stage
  * (/root/reference/src/oarocr/stitching.rs:70-227) and markdown renderer
  * (/root/reference/src/domain/structure.rs:227-392) collapsed into the
  * byte-identity-critical render rules:
  *   - title  -> "#"*level + " " + text
  *   - paragraph -> text
  *   - list_item -> "- " + text
  *   - figure -> "![Figure](alt)"   (structure.rs:318-326 Image/Chart)
  *   - caption -> "*text*"           (structure.rs:337-343 captions)
  *   - formula -> "$$text$$"         (structure.rs:310-316 Formula)
  *   - table -> canonical single-line HTML (tables retain HTML,
  *     /root/reference/src/oarocr/stitching.rs:9-12)
  *   - blocks joined by "\n\n"
  * Runs entirely per-row: all inputs are already colocated, no join.
  */
object Assembler {

  def render(blocks: Vector[Block]): String = {
    val sb = new java.lang.StringBuilder(1024)
    var first = true
    for (b <- blocks if b.keep) {
      if (!first) sb.append("\n\n")
      first = false
      b.kind match {
        case "title" =>
          val lvl = TitleLevel.resolve(b.text, b.level)
          var i = 0
          while (i < lvl) { sb.append('#'); i += 1 }
          sb.append(' ').append(b.text)
        case "list_item" => sb.append("- ").append(b.text)
        case "figure"    => sb.append("![Figure](").append(b.text).append(')')
        case "caption"   => sb.append('*').append(b.text).append('*')
        case "formula"   => sb.append("$$").append(b.text).append("$$")
        case _           => sb.append(b.text)
      }
    }
    sb.toString
  }

  /** Span table for kept blocks: table blocks expand to one span per cell;
    * offsets are byte positions into the RAW html (assembly order = the
    * 1-based order_index semantics,
    * /root/reference/src/oarocr/stitching.rs:257-267). */
  def spans(raws: Vector[RawBlock], blocks: Vector[Block]): Array[Span] = {
    val out = Array.newBuilder[Span]
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      if (b.keep) {
        val r = raws(i)
        if (b.kind == "table" && r.cellRuns.nonEmpty) {
          for ((cb, ce) <- r.cellRuns) out += Span(i, cb, ce, "table_cell")
        } else if (r.beginByte >= 0) {
          out += Span(i, r.beginByte, r.endByte, b.kind)
        }
      }
      i += 1
    }
    out.result()
  }
}

/** Line-join kernels shared by the PDF branch and any geometric assembly —
  * the reference's smart text join
  * (/root/reference/src/oarocr/stitching.rs:603-697,731-733).
  */
object JoinRules {
  /** Insert a space between two adjacent same-line fragments only when the
    * previous fragment ends in ASCII alphabetic (reference `needs_space_after`,
    * /root/reference/src/oarocr/stitching.rs:731-733); CJK and punctuation
    * join without a space. */
  @inline def needsSpaceAfter(prev: String): Boolean =
    prev.nonEmpty && {
      val c = prev.charAt(prev.length - 1)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    }

  def joinLine(fragments: Seq[String]): String = {
    val sb = new java.lang.StringBuilder(64)
    for (f <- fragments) {
      if (sb.length() > 0) {
        val c = sb.charAt(sb.length() - 1)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) sb.append(' ')
      }
      sb.append(f)
    }
    sb.toString
  }
}
