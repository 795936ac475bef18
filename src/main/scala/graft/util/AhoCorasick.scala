package graft.util

import scala.collection.mutable

/** Aho-Corasick multi-pattern string matcher — the escalation path for
  * exact-substring decontamination when the probe set outgrows the
  * broadcast-nested-loop envelope (ref: main.py has no analogue; this is
  * the classic Aho-Corasick 1975 automaton, public algorithm knowledge).
  *
  * One pass over a text reports every distinct pattern that occurs in it,
  * in O(|text| + matches) regardless of pattern count — versus the
  * nested-loop's O(|text| × patterns). Built once on the driver and
  * broadcast; the per-node goto tables are plain hash maps, so memory is
  * O(total pattern chars) (~100 B/char: fine through ~10⁶ short probes,
  * the multi-benchmark eval-suite scale; beyond that, shard the pattern
  * set and union the audits).
  *
  * Matching semantics are "pattern occurs at least once" (set, not
  * occurrence count), mirroring SQL `contains(text, probe)`.
  */
final class AhoCorasick private (
    gotoTab: Array[mutable.HashMap[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]]) extends Serializable {

  /** Distinct pattern ids (as passed to [[AhoCorasick.apply]]) occurring in
    * `text`, as a BitSet — callers typically weight-sum over set bits.
    */
  def matchedIds(text: String): java.util.BitSet = {
    val bits = new java.util.BitSet()
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (state != 0 && !gotoTab(state).contains(c)) state = fail(state)
      state = gotoTab(state).getOrElse(c, 0)
      val o = out(state)
      var j = 0
      while (j < o.length) { bits.set(o(j)); j += 1 }
      i += 1
    }
    bits
  }
}

object AhoCorasick {

  /** Build the automaton over `patterns`; empty patterns are ignored
    * (they'd match everywhere and SQL `contains(x, '')` is true — callers
    * filter empties before building if that semantics matters).
    */
  def apply(patterns: Seq[String]): AhoCorasick = {
    val gotoTab = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outSets = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, id) =>
      if (p.nonEmpty) {
        var node = 0
        p.foreach { c =>
          node = gotoTab(node).getOrElseUpdate(c, {
            gotoTab += mutable.HashMap.empty[Char, Int]
            outSets += mutable.ArrayBuffer.empty[Int]
            gotoTab.length - 1
          })
        }
        outSets(node) += id
      }
    }
    val n = gotoTab.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    gotoTab(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoTab(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoTab(f).contains(c)) f = fail(f)
        fail(v) = if (gotoTab(f).contains(c) && gotoTab(f)(c) != v) gotoTab(f)(c) else 0
        // dictionary-suffix outputs fold into the node so the scan never
        // walks fail chains per position
        outSets(v) ++= outSets(fail(v))
        queue += v
      }
    }
    new AhoCorasick(gotoTab.toArray, fail, outSets.map(_.toArray).toArray)
  }
}
