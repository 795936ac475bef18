package graft.etl

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.StreamingIngest.carve

/** Property suite (scalacheck, SURVEY.md §5.2) for the pure leftover-carry
  * kernel behind the streaming reassembly (T2, main.py:472-485): carving
  * complete `width`-char records off a buffer conserves content and leaves
  * a remainder shorter than `width`, regardless of how the input is split
  * into chunks.
  */
object CarveProps extends Properties("carve") {

  private val widths = Gen.choose(1, 64)
  private val texts  = Gen.asciiPrintableStr

  property("records+rest conserve the buffer; records are exactly width") =
    forAll(texts, widths) { (s, w) =>
      val (recs, rest) = carve(s, w)
      recs.mkString + rest == s &&
        recs.forall(_.length == w) &&
        rest.length < w
    }

  property("chunked carve with carry == whole-buffer carve") =
    forAll(texts, widths, Gen.choose(1, 7)) { (s, w, nCuts) =>
      // split s at arbitrary positions, feed chunks through the carry loop
      val cuts = (0 until nCuts).map(i => (s.length * i) / nCuts).distinct.sorted :+ s.length
      val chunks = cuts.sliding(2).map { case Seq(a, b) => s.substring(a, b) }.toSeq
      var buf = ""
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      chunks.foreach { c =>
        val (recs, rest) = carve(buf + c, w)
        out ++= recs
        buf = rest
      }
      if (buf.nonEmpty) out += buf // short tail kept (main.py:560-565)
      val (whole, wrest) = carve(s, w)
      val expect = if (wrest.nonEmpty) whole :+ wrest else whole
      out.toSeq == expect
    }
}
