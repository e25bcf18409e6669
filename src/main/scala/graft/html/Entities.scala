package graft.html

/** HTML entity decoding — hand-rolled minimal table (named + numeric), the
  * analogue of the reference's 5-entity hand-rolled escape
  * (/root/reference/src/domain/structure.rs:535-541). Hand-rolled so the
  * byte-identity contract is under our control, not a library's.
  */
object Entities {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "laquo" -> "«", "raquo" -> "»",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "middot" -> "·", "bull" -> "•",
    "deg" -> "°", "plusmn" -> "±", "times" -> "×",
    "divide" -> "÷", "euro" -> "€", "pound" -> "£",
    "yen" -> "¥", "cent" -> "¢", "sect" -> "§",
    "para" -> "¶", "shy" -> ""
  )

  /** Decode entities in `s`. Unknown entities pass through verbatim. */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (i >= 0 && i < s.length) {
      val semi = s.indexOf(';', i + 1)
      var advanced = false
      if (semi > i && semi - i <= 10) {
        val body = s.substring(i + 1, semi)
        val rep: String =
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try String.valueOf(Character.toChars(Integer.parseInt(body.substring(2), 16)))
            catch { case _: Exception => null }
          } else if (body.startsWith("#")) {
            try String.valueOf(Character.toChars(Integer.parseInt(body.substring(1))))
            catch { case _: Exception => null }
          } else named.getOrElse(body, null)
        if (rep != null) {
          sb.append(s, last, i).append(rep)
          last = semi + 1
          advanced = true
        }
      }
      i = s.indexOf('&', if (advanced) last else i + 1)
    }
    sb.append(s, last, s.length)
    sb.toString
  }
}
