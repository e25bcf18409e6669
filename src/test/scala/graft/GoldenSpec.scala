package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.FixtureGen

/** End-to-end byte-identity gate (north rule): extracted text per url must
  * equal the grammar-derived golden EXACTLY, over the t2 corpus. The oracle
  * never runs the extractor — it derives expected text from the generation
  * grammar (FIXTURES.md §3).
  */
class GoldenSpec extends AnyFunSuite {

  private val N = 2000

  test(s"t2 golden: byte-identical extracted text for $N fixture pages") {
    var checked = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for (fx <- FixtureGen.corpus(N)) {
      val got = Extractor.extract(fx.page)
      assert(got.error == "", s"row ${fx.page.url}: extractor error ${got.error}")
      if (got.text != fx.expectedText && failures.length < 5) {
        val g = got.text; val e = fx.expectedText
        val at = g.zip(e).indexWhere { case (a, b) => a != b }
        val pos = if (at >= 0) at else math.min(g.length, e.length)
        failures += s"${fx.page.url} (lang=${fx.page.lang}, pdf=${got.isPdf}): first diff @$pos\n" +
          s"  got[${g.length}]: ...${g.slice(math.max(0, pos - 60), pos + 60)}...\n" +
          s"  exp[${e.length}]: ...${e.slice(math.max(0, pos - 60), pos + 60)}..."
      }
      checked += 1
    }
    assert(failures.isEmpty, s"${failures.length}+ mismatches of $checked:\n" + failures.mkString("\n"))
  }

  test("span invariants: offsets in bounds, ordered per block, span count matches oracle") {
    for (fx <- FixtureGen.corpus(500)) {
      val got = Extractor.extract(fx.page)
      val n = fx.page.html.length
      for (s <- got.spans) {
        // `_dec` spans index DECODED content-stream space (real-PDF
        // compressed streams), which can legitimately exceed the file length;
        // all other spans index the raw input bytes
        val bound = if (s.kind.endsWith("_dec")) Long.MaxValue else n.toLong
        assert(s.beginByte >= 0 && s.endByte <= bound && s.beginByte < s.endByte,
          s"${fx.page.url}: span out of bounds $s (html $n bytes)")
      }
      assert(got.spans.length == fx.expectedSpanCount,
        s"${fx.page.url}: ${got.spans.length} spans != expected ${fx.expectedSpanCount}")
    }
  }

  test("determinism: same rowId yields identical bytes and extraction") {
    val a = FixtureGen.fixture(123L)
    val b = FixtureGen.fixture(123L)
    assert(java.util.Arrays.equals(a.page.html, b.page.html))
    assert(Extractor.extract(a.page).text == Extractor.extract(b.page).text)
  }
}
