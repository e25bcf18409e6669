package graft.spark

/** Per-row-class kernel cost profile: times the extraction kernel separately
  * over the real-PDF fixture rows (rowId%50==26), dialect-PDF rows
  * (rowId%50==1) and plain HTML rows, so a kernel-throughput regression can
  * be attributed to the row class that caused it. Diagnostic only; not part
  * of the library surface.
  * runMain graft.spark.ProfilePdf
  */
object ProfilePdf {
  def main(args: Array[String]): Unit = {
    // realpdf rows are rowId%50==26
    val ids = (0 until 40000).filter(_ % 50 == 26).map(_.toLong)
    val pages = ids.map(i => graft.fixtures.FixtureGen.fixture(i).page)
    // warmup
    pages.take(100).foreach(graft.Extractor.extract)
    var bytes = 0L
    val t0 = System.nanoTime()
    pages.foreach { p => bytes += p.html.length; val r = graft.Extractor.extract(p); require(r.error.isEmpty, r.error) }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"realpdf rows: ${pages.length} pages, ${bytes / 1e6}%.1f MB, $dt%.2f s, ${pages.length / dt}%.0f pages/s, per-page ${dt * 1000 / pages.length}%.2f ms")
    // dialect pdf rows rowId%50==1
    val ids2 = (0 until 40000).filter(_ % 50 == 1).map(_.toLong)
    val pages2 = ids2.map(i => graft.fixtures.FixtureGen.fixture(i).page)
    pages2.take(100).foreach(graft.Extractor.extract)
    val t1 = System.nanoTime()
    pages2.foreach(graft.Extractor.extract)
    val dt2 = (System.nanoTime() - t1) / 1e9
    println(f"dialect rows: ${pages2.length} pages, $dt2%.2f s, per-page ${dt2 * 1000 / pages2.length}%.2f ms")
    // html rows
    val ids3 = (0 until 4000).filterNot(i => i % 50 == 1 || i % 50 == 26).map(_.toLong)
    val pages3 = ids3.map(i => graft.fixtures.FixtureGen.fixture(i).page)
    // warm the HTML branch too — the PDF warmups above never touch
    // BlockBuilder/Classifier/Assembler, so without this the html numbers
    // would include their first-execution JIT and overstate the html class
    pages3.take(100).foreach(graft.Extractor.extract)
    val t2 = System.nanoTime()
    pages3.foreach(graft.Extractor.extract)
    val dt3 = (System.nanoTime() - t2) / 1e9
    println(f"html rows: ${pages3.length} pages, ${pages3.map(_.html.length.toLong).sum / 1e6}%.1f MB, $dt3%.2f s, per-page ${dt3 * 1000 / pages3.length}%.2f ms, ${pages3.map(_.html.length.toLong).sum / 1e6 / dt3}%.1f MB/s")
  }
}
