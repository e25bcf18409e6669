package graft.html

/** Data-table grid parse + canonical HTML re-render.
  *
  * Grid algorithm (rowspan occupancy tracking) is the reference's token→grid
  * parse re-expressed over our DOM cells
  * (/root/reference/src/processors/table_structure_decode.rs:210-291,326-392);
  * the canonical render mirrors `render_table_html`
  * (/root/reference/src/processors/table_structure_decode.rs:71-163) and the
  * markdown rule that tables retain HTML
  * (/root/reference/src/oarocr/stitching.rs:9-12).
  */
object TableGrid {

  final case class Cell(
      row: Int, col: Int, rowSpan: Int, colSpan: Int,
      header: Boolean, text: String)

  final case class Grid(cells: Vector[Cell], nRows: Int, nCols: Int)

  /** Resolve (row, col) for raw cells given per-row order + spans, tracking
    * occupancy from earlier rowspans.
    */
  /** Total occupancy-mark budget per table. Attrs.MaxSpan bounds ONE span
    * at 512, but a page full of 512×512 cells would still do
    * cells × 512² set insertions — this caps the aggregate. Real tables
    * (10³–10⁴ cells, small spans) never approach it; past the budget,
    * placement stops consulting rowspan overhang (the adversarial table's
    * tail degrades, the job does not). */
  private val MaxOccupancy = 1 << 22

  def resolve(rows: Vector[Vector[(Int, Int, Boolean, String)]]): Grid = {
    // rows(r) = ordered cells (rowSpan, colSpan, header, text)
    val occupied = scala.collection.mutable.Set.empty[(Int, Int)]
    val out = Vector.newBuilder[Cell]
    var budget = MaxOccupancy
    var maxCol = 0
    var r = 0
    while (r < rows.length) {
      var c = 0
      for ((rs, cs, hdr, text) <- rows(r)) {
        while (occupied.contains((r, c))) c += 1
        out += Cell(r, c, rs, cs, hdr, text)
        var dr = 0
        while (dr < rs && budget > 0) {
          var dc = 0
          while (dc < cs && budget > 0) {
            occupied += ((r + dr, c + dc))
            budget -= 1
            dc += 1
          }
          dr += 1
        }
        c += cs
        if (c > maxCol) maxCol = c
      }
      r += 1
    }
    Grid(out.result(), rows.length, maxCol)
  }

  /** 5-entity escape, hand-rolled for byte identity
    * (/root/reference/src/domain/structure.rs:535-541). */
  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '"'  => sb.append("&quot;")
        case '\'' => sb.append("&#39;")
        case ch   => sb.append(ch)
      }
      i += 1
    }
    sb.toString
  }

  /** Canonical single-line HTML: attributes only when spans > 1, th/td kept,
    * text escaped. This string is the byte-identity artifact for table blocks.
    */
  def render(grid: Grid): String = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("<table>")
    var r = 0
    val byRow = grid.cells.groupBy(_.row)
    while (r < grid.nRows) {
      sb.append("<tr>")
      for (cell <- byRow.getOrElse(r, Vector.empty).sortBy(_.col)) {
        val tag = if (cell.header) "th" else "td"
        sb.append('<').append(tag)
        if (cell.rowSpan > 1) sb.append(" rowspan=\"").append(cell.rowSpan).append('"')
        if (cell.colSpan > 1) sb.append(" colspan=\"").append(cell.colSpan).append('"')
        sb.append('>').append(escape(cell.text)).append("</").append(tag).append('>')
      }
      sb.append("</tr>")
      r += 1
    }
    sb.append("</table>")
    sb.toString
  }
}
