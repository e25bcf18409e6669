package graft.html

import java.nio.charset.{Charset => JCharset, StandardCharsets}

/** Minimal attribute scanner over the raw in-tag byte slice the tokenizer
  * hands out. Only called for tags whose attributes matter (meta, table,
  * td/th, a, and container class/id checks) — never in the per-byte hot loop.
  */
object Attrs {

  /** Parse `name=value` pairs in html[from,until). Names lower-cased;
    * values unquoted/entity-left-as-is, decoded with `cs` (attribute VALUES
    * may carry page-charset text, e.g. img alt; tag/attr names are ASCII).
    * Valueless attrs map to "".
    */
  def parse(html: Array[Byte], from: Int, until: Int,
      cs: JCharset = StandardCharsets.UTF_8): Map[String, String] = {
    var i = from
    var out = Map.empty[String, String]
    @inline def isSpace(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    while (i < until) {
      while (i < until && (isSpace(html(i)) || html(i) == '/')) i += 1
      if (i < until) {
        val nameStart = i
        while (i < until && !isSpace(html(i)) && html(i) != '=' && html(i) != '/') i += 1
        val name = new String(html, nameStart, i - nameStart, StandardCharsets.US_ASCII).toLowerCase
        while (i < until && isSpace(html(i))) i += 1
        if (i < until && html(i) == '=') {
          i += 1
          while (i < until && isSpace(html(i))) i += 1
          if (i < until && (html(i) == '"' || html(i) == '\'')) {
            val q = html(i); i += 1
            val vs = i
            while (i < until && html(i) != q) i += 1
            out += name -> new String(html, vs, i - vs, cs)
            if (i < until) i += 1
          } else {
            val vs = i
            while (i < until && !isSpace(html(i))) i += 1
            out += name -> new String(html, vs, i - vs, cs)
          }
        } else if (name.nonEmpty) {
          out += name -> ""
        }
      }
    }
    out
  }

  /** Positive int attribute, CAPPED: rowspan/colspan feed an occupancy-grid
    * fill of rowSpan × colSpan entries, so an adversarial
    * `rowspan="2000000"` would OOM one executor and kill the job. The HTML
    * spec itself clamps (colspan ≤ 1000, rowspan ≤ 65534); 512 covers every
    * real table while bounding the grid at input-proportional size. */
  val MaxSpan = 512
  def intAttr(attrs: Map[String, String], name: String, default: Int): Int =
    attrs.get(name).flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0).map(math.min(_, MaxSpan)).getOrElse(default)
}
