package graft

/** The erasure certificate's own failure mode: an audit that cannot go
  * non-zero proves nothing, so beside the registered all-zero gate this
  * suite runs a deliberately PARTIAL erasure (forget entry points
  * skipped) over a fresh store set and pins that exactly the skipped
  * tiers report residue.
  */
class ErasureSpec extends SparkSpec {

  test("complete erasure reads zero residue on every tier; remaining" +
      " counts are positive (the stores are not vacuously empty)") {
    val rows = q("erasure_certificate").collect()
    assert(rows.length == 16, s"expected 16 tiers, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) == 0, s"tier ${r.getString(0)} has residue")
      // cluster_redirects is EMPTIED by its erasure (path compression is
      // part of the swap), so zero remaining is its correct post-state —
      // every other tier must be non-vacuously populated
      if (r.getString(0) != "cluster_redirects")
        assert(r.getLong(2) > 0, s"tier ${r.getString(0)} is empty — vacuous audit")
    }
  }

  test("deliberately skipped tiers make the certificate non-zero" +
      " (the audit can fail)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-cert-partial").toString
    operators.Erasure.buildAndEraseStores(spark, sf, base,
      skipForgets = Set("pos_index", "clusters"))
    val rows = operators.Erasure.probeStores(spark, sf, base).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("pos_index") > 0,
      "skipped pos_index reads zero residue — the audit cannot fail")
    assert(rows("cluster_members") > 0,
      "skipped cluster erasure reads zero residue — the audit cannot fail")
    // cluster_redirects under the skip may legitimately read zero (a
    // victim need not have been a merge endpoint) — excluded with the
    // deliberately-skipped tiers from the must-be-clean set
    val skipped = Set("pos_index", "cluster_members", "cluster_redirects")
    assert(rows.collect { case (t, n) if !skipped.contains(t) => (t, n) }
      .forall(_._2 == 0L),
      s"unskipped tiers must still read clean: $rows")
  }
}
