package graft.plans

import org.apache.spark.sql.StringSingleInputType
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * SIGMOD 2003) straight from the document text: `string → array<long>`
  * of the document's DISTINCT selected fingerprints, each encoded as
  * `c = h·posEnc + (posEnc−1−p)` — the exact min-encoding the
  * higher-order + window-frame spelling
  * (`graft.operators.Dedup.winnowFingerprintsOfHof`, kept as the
  * differential reference) and the DuckDB oracle CTE compute, so the
  * decode `h = c div posEnc`, `p = posEnc−1 − c mod posEnc` reproduces
  * the same (hash, position) rows bit-for-bit.
  *
  * Per document, one compiled pass: hash every k-gram (character
  * substring, md5 low-60-bits mod `hashMod` — the cross-engine
  * `md5Hash60` spelling, byte-identical to
  * `conv(substring(md5(s), 18, 15), 16, 10) % hashMod`), slide a window
  * of `w` consecutive hashes, select each full window's minimum encoded
  * value (rightmost position on hash ties — the position term is
  * inverted, so the long `min` IS the tie-break), and emit a selection
  * only when it differs from the previous window's. That change-dedup
  * equals global `distinct`: selected positions strictly increase (a
  * superseding minimum persists in every later window that still
  * contains the superseded position), so a fingerprint can never be
  * re-selected after a different one.
  *
  * Why this replaces the HOF + window plan (r19 verdict #2): the former
  * spelling materialized every k-gram substring through an INTERPRETED
  * `transform` lambda (HigherOrderFunction is CodegenFallback), exploded
  * ~|text| rows per document, and paid a doc-keyed window shuffle plus a
  * `distinct` shuffle just to select ~2/(w+1) of them. This expression
  * selects inside the scan — the fingerprint frame becomes a NARROW
  * plan with zero shuffles, the shape a 100 TB fingerprint pass needs.
  *
  * Overflow guard (r19 ADVICE): the encoding assumes `p < posEnc`, so a
  * document with more characters than `posEnc + k − 1` would corrupt the
  * position term — on BOTH engines, which is exactly why the gate could
  * never catch it. The expression THROWS on such a document (loud,
  * per-row, executor-side) instead of silently fingerprinting it wrong;
  * a corpus of book-length texts raises `posEnc` (and shrinks `hashMod`
  * to keep `h·posEnc` inside a long) rather than filtering.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int,
    hashMod: Long, posEnc: Long)
    extends UnaryExpression with StringSingleInputType {

  require(k >= 1 && w >= 1, s"winnowing needs k,w >= 1, got k=$k w=$w")
  require(hashMod > 0 && posEnc > 0 && hashMod <= Long.MaxValue / posEnc,
    s"h*posEnc must fit a long: hashMod=$hashMod posEnc=$posEnc")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** The whole selection for one document — shared verbatim by the
    * interpreted eval and the generated code (one audited body; the
    * call is opaque to codegen but the row stays inside the
    * whole-stage-generated loop, the MinHash16 shape).
    */
  def computeArray(s: UTF8String): GenericArrayData = {
    val n = s.numChars()
    if (n >= posEnc + k) {
      throw new IllegalArgumentException(
        s"winnowing position overflow: document has $n chars but the " +
          s"fingerprint encoding holds positions < $posEnc — widen posEnc " +
          "(and narrow hashMod) for long-document corpora")
    }
    val m = n - k + 1 // k-gram count
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    // Hash k-grams from the document's UTF-8 bytes directly. The former
    // spelling (`s.substringSQL(i+1, k).getBytes` per k-gram) scanned the
    // string from its start on every char-indexed call — O(n²) per
    // document plus two allocations per position, severe exactly on the
    // long documents the overflow guard admits. One `getBytes` plus a
    // char→byte offset table (identity when the text is pure ASCII —
    // bytes.length == n — so the common case allocates nothing) makes the
    // pass O(n): each k-gram is md5'd in place via update(buf, off, len)
    // over the IDENTICAL byte slice the substring produced, so the
    // fingerprints are bit-for-bit unchanged (DedupSpec's codegen-vs-HOF
    // differential and the DuckDB oracle both pin it).
    val bytes = s.getBytes
    val off: Array[Int] =
      if (bytes.length == n) null // ASCII fast path: offset i IS byte i
      else {
        val o = new Array[Int](n + 1)
        var ci = 0
        var bi = 0
        while (ci < n) {
          o(ci) = bi
          bi += UTF8String.numBytesForFirstByte(bytes(bi))
          ci += 1
        }
        o(n) = bytes.length
        o
      }
    val md = java.security.MessageDigest.getInstance("MD5")
    val enc = new Array[Long](m)
    var i = 0
    while (i < m) {
      val from = if (off == null) i else off(i)
      val until = if (off == null) i + k else off(i + k)
      md.update(bytes, from, until - from)
      val d = md.digest()
      var h = 0L
      var b = 8
      while (b < 16) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h & ((1L << 60) - 1)) % hashMod
      enc(i) = h * posEnc + (posEnc - 1 - i)
      i += 1
    }
    val out = new Array[Long](m - w + 1)
    var nOut = 0
    var last = -1L
    var e = w - 1
    while (e < m) {
      var c = enc(e)
      var j = e - w + 1
      while (j < e) { if (enc(j) < c) c = enc(j); j += 1 }
      if (c != last) { out(nOut) = c; nOut = nOut + 1; last = c }
      e += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  override def nullSafeEval(input: Any): Any =
    computeArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("winnowImpl", this,
        classOf[WinnowFingerprints].getName)
      s"${ev.value} = $impl.computeArray($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
