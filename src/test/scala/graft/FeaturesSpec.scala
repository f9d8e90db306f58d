package graft

import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {

  test("events_value_mad flags exactly the driver-side median/MAD reconstruction") {
    val got = q("events_value_mad").collect()
    assert(got.nonEmpty)
    assert(got.forall(r => math.abs(r.getDouble(3)) > 3.5))
    // independent reconstruction with the same interpolated-median formula
    val evs = Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val expected = evs.groupBy(_._2).flatMap { case (_, es) =>
      val med = median(es.map(_._3).toSeq)
      val mad = median(es.map(e => math.abs(e._3 - med)).toSeq)
      if (mad > 0)
        es.toSeq.collect { case (id, _, v)
          if math.abs(0.6745 * (v - med) / mad) > 3.5 => id }
      else Seq.empty[Long]
    }.toSet
    assert(got.map(_.getLong(0)).toSet == expected,
      "robust-z flag set drifted from the median/MAD reconstruction")
  }

  test("fuzzy pairs: same block, bounded distance, and the planted typo pairs found") {
    val rows = q("fuzzy_part_name_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(d >= 1 && d <= 2)
      // block = second token (split_part semantics; "" when absent)
      assert(a.split(" ").lift(1).getOrElse("") == b.split(" ").lift(1).getOrElse(""),
        s"($a, $b) cross-block")
      assert(a < b)
    }
    // the fixture's planted adjective typo: cold X ~ old X at distance 1
    assert(rows.exists(r => r.getString(0).startsWith("cold ") &&
      r.getString(1).startsWith("old ") && r.getInt(2) == 1))
  }

  test("chunking covers every token: reassembling stride prefixes restores the doc") {
    val chunks = q("docs_chunked_overlap").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == docs.keySet)
    for ((id, rows) <- chunks) {
      val toks = docs(id).split(" ")
      // chunk k starts at k*stride and holds min(32, n - k*24) tokens
      rows.foreach { r =>
        val k = r.getInt(1)
        val expected = toks.slice(k * 24, k * 24 + 32)
        assert(r.getString(3) == expected.mkString(" "), s"doc $id chunk $k")
        assert(r.getInt(2) == expected.length)
      }
      // concatenating each chunk's first `stride` tokens (full tail for
      // the last chunk) restores the document exactly
      val rebuilt = rows.init.map(_.getString(3).split(" ").take(24))
        .flatten ++ rows.last.getString(3).split(" ")
      assert(rebuilt.mkString(" ") == docs(id), s"doc $id reassembly")
    }
  }

  test("packing bins are contiguous, capacity-bounded, and in doc order") {
    val rows = q("docs_token_packing").orderBy("doc_id").collect()
    var prevCum = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == prevCum + r.getInt(1)) // cumsum chains
      prevCum = r.getLong(2)
      assert(r.getLong(3) == (r.getLong(2) - r.getInt(1)) / 256)
    }
    // bin ids are non-decreasing in doc order; bins hold ≥ 1 doc; a bin's
    // pre-overflow load never exceeds budget + one doc
    val byBin = rows.groupBy(_.getLong(3))
    val binIds = rows.map(_.getLong(3))
    assert(binIds.zip(binIds.tail).forall { case (a, b) => a <= b })
    val maxDoc = rows.map(_.getInt(1)).max
    for ((_, members) <- byBin) {
      val load = members.map(_.getInt(1).toLong).sum
      assert(load <= 256L + maxDoc)
    }
  }

  test("mixture schedule: unique positions, fair round-robin while sources last") {
    val rows = q("corpus_mixture_schedule").orderBy("position").collect()
    val positions = rows.map(_.getLong(3))
    assert(positions.distinct.length == positions.length)
    assert(rows.length == Tables.documents(spark, sf).count())
    // while every language still has docs, each round of n_langs slots
    // holds one doc per language
    val langs = rows.map(_.getString(1)).distinct.sorted
    val minPerLang = rows.groupBy(_.getString(1)).values.map(_.length).min
    for (round <- 0 until minPerLang) {
      val slot = rows.filter(r => r.getLong(3) / langs.length == round)
      assert(slot.map(_.getString(1)).sorted.toSeq == langs.toSeq,
        s"round $round not a full rotation")
    }
  }

  test("zscore output only flags |z| > 2.5 and z reconstructs from group stats") {
    val out = q("events_value_zscore").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => math.abs(r.getDouble(3)) > 2.5))
    // reconstruct per-type mean/std from raw data (float tolerance)
    val stats = Tables.events(spark, sf).groupBy("event_type")
      .agg(avg("value").alias("m"), stddev_pop("value").alias("s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (m, s) = stats(r.getString(1))
      val z = (r.getDouble(2) - m) / s
      assert(math.abs(z - r.getDouble(3)) < 1e-6)
    }
  }

  test("packEfficiency conserves tokens and agrees with the packing assignment") {
    val bins = q("docs_pack_efficiency").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val packed = q("docs_token_packing").collect()
      .map(r => (r.getLong(3), r.getInt(1).toLong))
    assert(bins.map(_._3).sum == packed.map(_._2).sum, "token conservation")
    val wantByBin = packed.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    bins.foreach { case (bin, nDocs, used, fill) =>
      assert(wantByBin(bin) == ((nDocs, used)), s"bin $bin")
      assert(fill == used * 100.0 / 256)
    }
  }

  test("userPurchaseFeatures is point-in-time correct: every feature derives" +
      " only from state strictly before (or as-of) the label timestamp") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).alias("ts_us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).alias("ots")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = q("user_purchase_features").collect()
    assert(got.nonEmpty)
    val byId = events.map(e => e._1 -> e).toMap
    got.foreach { r =>
      val (pid, user) = (r.getLong(0), r.getLong(1))
      val (_, _, _, ts, _) = byId(pid)
      // history = rows ordered (ts, event_id) strictly before this one
      val prior = events.filter(e => e._2 == user &&
        (e._4 < ts || (e._4 == ts && e._1 < pid)))
      assert(r.getLong(2) == prior.length.toLong, s"n_prior_events for $pid")
      val wantCents = prior.filter(_._3 == "purchase")
        .map(e => math.round(e._5 * 100)).sum
      assert(r.getDouble(3) == wantCents / 100.0, s"prior_purchase_value for $pid")
      // as-of: newest order at-or-before ts, max orderkey tie-break; null if none
      val cand = orders.filter(o => o._1 == user && o._3 <= ts)
      if (cand.isEmpty) assert(r.isNullAt(4), s"expected null as-of for $pid")
      else {
        val best = cand.maxBy(o => (o._3, o._2))._2
        assert(r.getLong(4) == best, s"asof_order_key for $pid")
      }
    }
  }
}
