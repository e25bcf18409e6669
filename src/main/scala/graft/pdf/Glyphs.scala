package graft.pdf

/** Glyph-name → Unicode resolution for simple-font /Encoding /Differences
  * arrays (PDF 32000-1 Annex D; names per the public Adobe Glyph List).
  * Covers the AGL's uniXXXX / uXXXX[XX] generic forms, single-character
  * names, and an explicit table of ASCII + Latin-1 + typographic names —
  * the population real subsetted fonts actually use. Unknown names resolve
  * to None; the caller substitutes U+FFFD (never a silently-wrong char).
  */
object Glyphs {

  /** Explicit AGL subset: ASCII punctuation/digits, full Latin-1 supplement,
    * and the typographic set (quotes, dashes, ligatures, currency). */
  private val named: Map[String, String] = Map(
    // ASCII
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
    "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
    "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
    "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
    "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
    "greater" -> ">", "question" -> "?", "at" -> "@",
    "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
    "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
    "braceleft" -> "{", "bar" -> "|", "braceright" -> "}", "asciitilde" -> "~",
    // typographic (the codes WinAnsi puts in 0x80-0x9F)
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "quotesinglbase" -> "‚", "quotedblbase" -> "„",
    "emdash" -> "—", "endash" -> "–", "bullet" -> "•",
    "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
    "florin" -> "ƒ", "fraction" -> "⁄", "perthousand" -> "‰",
    "guilsinglleft" -> "‹", "guilsinglright" -> "›",
    "trademark" -> "™", "minus" -> "−", "Euro" -> "€",
    "fi" -> "ﬁ", "fl" -> "ﬂ", "dotlessi" -> "ı",
    "circumflex" -> "ˆ", "caron" -> "ˇ", "tilde" -> "˜",
    "breve" -> "˘", "dotaccent" -> "˙", "ring" -> "˚",
    "ogonek" -> "˛", "hungarumlaut" -> "˝",
    "OE" -> "Œ", "oe" -> "œ", "Scaron" -> "Š",
    "scaron" -> "š", "Zcaron" -> "Ž", "zcaron" -> "ž",
    "Ydieresis" -> "Ÿ",
    // Latin-1 supplement
    "exclamdown" -> "¡", "cent" -> "¢", "sterling" -> "£",
    "currency" -> "¤", "yen" -> "¥", "brokenbar" -> "¦",
    "section" -> "§", "dieresis" -> "¨", "copyright" -> "©",
    "ordfeminine" -> "ª", "guillemotleft" -> "«",
    "logicalnot" -> "¬", "registered" -> "®", "macron" -> "¯",
    "degree" -> "°", "plusminus" -> "±", "twosuperior" -> "²",
    "threesuperior" -> "³", "acute" -> "´", "mu" -> "µ",
    "paragraph" -> "¶", "periodcentered" -> "·",
    "cedilla" -> "¸", "onesuperior" -> "¹",
    "ordmasculine" -> "º", "guillemotright" -> "»",
    "onequarter" -> "¼", "onehalf" -> "½",
    "threequarters" -> "¾", "questiondown" -> "¿",
    "multiply" -> "×", "divide" -> "÷",
    "Agrave" -> "À", "Aacute" -> "Á", "Acircumflex" -> "Â",
    "Atilde" -> "Ã", "Adieresis" -> "Ä", "Aring" -> "Å",
    "AE" -> "Æ", "Ccedilla" -> "Ç", "Egrave" -> "È",
    "Eacute" -> "É", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icircumflex" -> "Î",
    "Idieresis" -> "Ï", "Eth" -> "Ð", "Ntilde" -> "Ñ",
    "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocircumflex" -> "Ô",
    "Otilde" -> "Õ", "Odieresis" -> "Ö", "Oslash" -> "Ø",
    "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucircumflex" -> "Û",
    "Udieresis" -> "Ü", "Yacute" -> "Ý", "Thorn" -> "Þ",
    "germandbls" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
    "atilde" -> "ã", "adieresis" -> "ä", "aring" -> "å",
    "ae" -> "æ", "ccedilla" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecircumflex" -> "ê", "edieresis" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icircumflex" -> "î",
    "idieresis" -> "ï", "eth" -> "ð", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocircumflex" -> "ô",
    "otilde" -> "õ", "odieresis" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucircumflex" -> "û",
    "udieresis" -> "ü", "yacute" -> "ý", "thorn" -> "þ",
    "ydieresis" -> "ÿ", "softhyphen" -> "­"
  )

  private def hexCp(s: String): Option[String] =
    try {
      val cp = Integer.parseInt(s, 16)
      if (Character.isValidCodePoint(cp) &&
        !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
        Some(new String(Character.toChars(cp)))
      else None
    } catch { case _: NumberFormatException => None }

  /** Resolve one glyph name; None for unknown (caller emits U+FFFD). */
  def resolve(name: String): Option[String] =
    if (name.isEmpty) None
    else if (name.length == 1) Some(name) // AGL single-char names (A-Z a-z ...)
    else if (name.startsWith("uni") && name.length == 7) hexCp(name.substring(3))
    // AGL names like "ugrave"/"uacute" also match the uXXXX shape; when the
    // suffix is not valid hex, fall through to the named table.
    else if (name.startsWith("u") && name.length >= 5 && name.length <= 7)
      hexCp(name.substring(1)).orElse(named.get(name))
    else named.get(name)

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private def charsetOr(name: String): java.nio.charset.Charset =
    try {
      if (java.nio.charset.Charset.isSupported(name)) java.nio.charset.Charset.forName(name)
      else Latin1
    } catch { case _: Exception => Latin1 }

  /** 256-entry byte→text table for a named base encoding. WinAnsi is
    * windows-1252 (the 0x80–0x9F typographic range Latin-1 gets WRONG);
    * MacRoman via the JDK charset when present; StandardEncoding and
    * anything else approximate as Latin-1 (documented bound — WinAnsi
    * dominates real files). */
  def baseTable(baseEncoding: String): Array[String] = {
    val cs = baseEncoding match {
      case "WinAnsiEncoding"  => charsetOr("windows-1252")
      case "MacRomanEncoding" => charsetOr("x-MacRoman")
      case _                  => Latin1
    }
    Array.tabulate(256)(b => new String(Array(b.toByte), cs))
  }
}
