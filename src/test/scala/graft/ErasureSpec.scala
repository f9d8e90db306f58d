package graft

/** The erasure certificate's own failure mode: an audit that cannot go
  * non-zero proves nothing, so beside the registered all-zero gate this
  * suite runs a deliberately PARTIAL erasure (one forget entry point
  * skipped) over a fresh store set and pins that exactly the skipped
  * tier reports residue.
  */
class ErasureSpec extends SparkSpec {

  test("complete erasure reads zero residue on every tier; remaining" +
      " counts are positive (the stores are not vacuously empty)") {
    val rows = q("erasure_certificate").collect()
    assert(rows.length == 11, s"expected 11 tiers, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) == 0, s"tier ${r.getString(0)} has residue")
      assert(r.getLong(2) > 0, s"tier ${r.getString(0)} is empty — vacuous audit")
    }
  }

  test("a deliberately skipped tier makes the certificate non-zero" +
      " (the audit can fail)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-cert-partial").toString
    operators.Erasure.buildAndEraseStores(spark, sf, base,
      skipForgets = Set("pos_index"))
    val rows = operators.Erasure.probeStores(spark, sf, base).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("pos_index") > 0,
      "skipped tier reads zero residue — the audit cannot fail")
    assert(rows.collect { case (t, n) if t != "pos_index" => (t, n) }
      .forall(_._2 == 0L),
      s"unskipped tiers must still read clean: $rows")
  }
}
