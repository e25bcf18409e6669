package graft

import graft.model.Page

/** Offline adversarial fuzz campaign over the %PDF-sniffed branch — a
  * larger, mutation-richer complement to RealPdfSpec's in-suite 150-case
  * byte-flip test. Deterministic (fixed seed): every case must finish as
  * either extracted text or a clean error row (empty text), within a
  * per-row wall budget — the crawl contract under arbitrary damage.
  *
  * Mutations (composable): byte flips, truncation, window duplication
  * (incremental-update-like splices), structural token injection
  * (stream/obj/BI/ID/EI/filter/predictor keywords at random offsets),
  * window zeroing.
  *
  * Run: sbt "Test/runMain graft.FuzzCampaign 20000"
  * Exits 1 on any contract violation (non-empty text on an error row, or a
  * row exceeding the wall budget).
  */
object FuzzCampaign {

  private val Tokens = Array(
    " stream\n", "\nendstream", " obj ", " endobj\n", " BI ", " ID ", " EI ",
    "(", ")", "<<", ">>", "<", ">", "[", "]", " R ", " 0 R ",
    "/Filter /FlateDecode", "/Filter /LZWDecode", "/Predictor 12",
    "/Type /ObjStm", "/Type /XRef", "xref\n", "trailer\n", "%%EOF",
    " q ", " Q ", " Do ", " Tj ", " TJ ", " Tf ", " Tz ", " Tc ", " Tw ",
    " Tm ", " BT ", " ET ", "\\", "/Encrypt 9 0 R", "/Widths [500",
    "beginbfrange", "endbfrange", "/ToUnicode 8 0 R")

  private def mutate(rnd: java.util.Random, base: Array[Byte]): Array[Byte] = {
    var b = java.util.Arrays.copyOf(base, base.length)
    val nOps = 1 + rnd.nextInt(3)
    for (_ <- 0 until nOps) rnd.nextInt(5) match {
      case 0 => // flip 1..64 bytes after the magic
        if (b.length > 4)
          for (_ <- 0 to rnd.nextInt(64))
            b(4 + rnd.nextInt(b.length - 4)) = rnd.nextInt(256).toByte
      case 1 => // truncate (keep the magic plus at least one body byte)
        b = java.util.Arrays.copyOf(b, 5 + rnd.nextInt(math.max(1, b.length - 5)))
      case 2 => // duplicate a window and append (incremental-update-ish)
        val off = rnd.nextInt(b.length)
        val len = math.min(b.length - off, 1 + rnd.nextInt(4096))
        val out = java.util.Arrays.copyOf(b, b.length + len)
        System.arraycopy(b, off, out, b.length, len)
        b = out
      case 3 => // inject a structural token at a random offset
        val t = Tokens(rnd.nextInt(Tokens.length)).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val at = math.min(b.length, 4 + rnd.nextInt(math.max(1, b.length - 4)))
        val out = new Array[Byte](b.length + t.length)
        System.arraycopy(b, 0, out, 0, at)
        System.arraycopy(t, 0, out, at, t.length)
        System.arraycopy(b, at, out, at + t.length, b.length - at)
        b = out
      case _ => // zero a window
        if (b.length > 4) {
          val off = 4 + rnd.nextInt(b.length - 4)
          val len = math.min(b.length - off, 1 + rnd.nextInt(512))
          java.util.Arrays.fill(b, off, off + len, 0.toByte)
        }
    }
    b
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(5000)
    val budgetMs = 5000.0
    val rnd = new java.util.Random(20260818L)
    // all real-PDF fixture rows (rowId % 50 == 26) across the corpus
    val seeds = (26L until 2026L by 50L).map(graft.fixtures.FixtureGen.fixture(_).page.html).toArray
    val ts = new java.sql.Timestamp(0L)
    var ok = 0L; var err = 0L; var violations = 0L
    var maxMs = 0.0; var maxCase = -1
    val errClasses = scala.collection.mutable.HashMap.empty[String, Long]
    // distinct messages for classes other than the typed PdfParseException,
    // so a run self-documents which untyped throw sites fuzz reaches
    val rareMsgs = scala.collection.mutable.LinkedHashSet.empty[String]
    val t0 = System.nanoTime()
    for (k <- 0 until n) {
      val mut = mutate(rnd, seeds(k % seeds.length))
      val r0 = System.nanoTime()
      val got = Extractor.extract(Page(s"t://fuzzc$k", ts, mut, "", "en"))
      val ms = (System.nanoTime() - r0) / 1e6
      if (ms > maxMs) { maxMs = ms; maxCase = k }
      if (got.error.isEmpty) ok += 1
      else {
        err += 1
        val cls = got.error.takeWhile(_ != ':')
        errClasses(cls) = errClasses.getOrElse(cls, 0L) + 1
        if (cls != "PdfParseException" && rareMsgs.size < 20) rareMsgs += got.error
        if (got.text.nonEmpty) { violations += 1; println(s"VIOLATION case $k: error row with non-empty text") }
      }
      if (ms > budgetMs) { violations += 1; println(s"VIOLATION case $k: row took $ms ms") }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"cases=$n ok=$ok err=$err violations=$violations total=$secs%.1f s maxRowMs=$maxMs%.1f (case $maxCase)")
    for ((c, cnt) <- errClasses.toSeq.sortBy(-_._2)) println(f"  $cnt%7d  $c")
    for (m <- rareMsgs) println(s"  rare: $m")
    if (violations > 0) sys.exit(1)
  }
}
