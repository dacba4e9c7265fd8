package graft

/** Statistical spec for the integer-hash samplers (round-11 verdict,
  * next-round #7): the Knuth multiplicative-hash uniforms driving
  * curate_temperature_mixture's keep test, curate_dsir_resample /
  * sample_weighted_ares' Gumbel/A-Res keys and
  * sample_hash_deterministic assume the hash is uniform OVER THE
  * ACTUAL doc-id spaces the engine sees — consecutive base ids AND the
  * scaled dirs' structured unions of arithmetic progressions (+c·10⁶
  * for documents, +c·10⁷ for embeddings/planted ids, c < copies). A
  * structured id space interacting badly with the multiplier would
  * silently bias keep rates; this spec turns that assumption into a
  * deterministic chi-square test over every id-space shape in use.
  *
  * Both in-repo hash variants are covered:
  *   u_plain = ((id · 2654435761) mod 2³²  + 1) / (2³² + 1)   (Gumbel/A-Res)
  *   u_off   = ((id · 2654435761 + 104729) mod 2³²) / 2³²     (keep tests)
  *
  * The tests are fully deterministic (fixed id sets, no RNG): measured
  * statistics are ~0.1–6 against a 103.44 critical value (χ²
  * df=63 at p=0.999, Wilson–Hilferty-checked numeric inversion), so a
  * failure means the id-space structure actually broke uniformity, not
  * test noise.
  */
class SamplerUniformitySpec extends SparkSpec {

  private val A = 2654435761L
  private val M = 4294967296L // 2^32
  private val Bins = 64
  // chi-square critical value at p = 0.999 for df = 63 (numeric
  // inversion of the regularized incomplete gamma; Wilson–Hilferty
  // approximation agrees to 0.1)
  private val Crit999Df63 = 103.442

  private def hashPlain(id: Long): Long = {
    val h = (id * A) % M
    if (h < 0) h + M else h
  }
  private def hashOff(id: Long): Long = {
    val h = (id * A + 104729L) % M
    if (h < 0) h + M else h
  }

  private def chiSquare(ids: Seq[Long], f: Long => Long): Double = {
    val counts = new Array[Long](Bins)
    ids.foreach { id => counts((f(id) * Bins / M).toInt) += 1 }
    val e = ids.size.toDouble / Bins
    counts.map(c => (c - e) * (c - e) / e).sum
  }

  private def docIds(dir: String): Seq[Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq

  /** Every id-space SHAPE the samplers actually run on: base dirs and
    * the ScaleStress offset unions (documents +c·10⁶, embeddings'
    * planted/copy ids +c·10⁷), at 10 and 100 copies. */
  private def idSpaces: Seq[(String, Seq[Long])] = {
    val base1 = docIds("/root/testdata/sf0.001")
    val base2 = docIds("/root/testdata/sf0.01")
    Seq(
      "sf0.001 base" -> base1,
      "sf0.01 base" -> base2,
      "sf0.01 +c*1e6 x10" ->
        (for (c <- 0L until 10L; i <- base2) yield i + c * 1000000L),
      "sf0.01 +c*1e6 x100" ->
        (for (c <- 0L until 100L; i <- base2) yield i + c * 1000000L),
      "sf0.01 +c*1e7 x100" ->
        (for (c <- 0L until 100L; i <- base2) yield i + c * 10000000L),
      // planted-embedding shape: base ∪ (multiples-of-5 + 10^7), then
      // copy offsets — the exact union dedup's Gumbel keys would see
      "sf0.01 planted x10" ->
        (for (c <- 0L until 10L;
              i <- base2 ++ base2.filter(_ % 5 == 0).map(_ + 10000000L))
          yield i + c * 10000000L))
  }

  test("Knuth-hash uniforms are chi-square-uniform over every actual " +
      "id-space shape (base, +c*1e6, +c*1e7, planted union)") {
    for ((label, ids) <- idSpaces; (hname, f) <-
        Seq("plain" -> (hashPlain _), "off104729" -> (hashOff _))) {
      val chi = chiSquare(ids, f)
      assert(chi < Crit999Df63,
        f"$label/$hname: chi-square $chi%.1f over $Bins bins exceeds " +
          f"the df=63 p=.999 critical value $Crit999Df63 " +
          f"(n=${ids.size}) — structured id space broke uniformity")
    }
  }

  test("integer keep test realizes its micro-rate within 1% absolute " +
      "on the structured 100x id space") {
    // the exact keep predicate of curate_temperature_mixture /
    // sample_hash_deterministic: hash * 1e6 div 2^32 < rate_micro
    val base = docIds("/root/testdata/sf0.01")
    val ids = for (c <- 0L until 100L; i <- base) yield i + c * 1000000L
    for (rateMicro <- Seq(100000L, 300000L, 500000L, 700000L, 900000L)) {
      val kept = ids.count(id => hashOff(id) * 1000000L / M < rateMicro)
      val realized = kept.toDouble / ids.size
      val target = rateMicro / 1e6
      assert(math.abs(realized - target) < 0.01,
        f"rate $target%.2f realized $realized%.4f on the +c*1e6 space")
    }
  }

  test("Gumbel/A-Res uniforms stay strictly inside (0,1): no " +
      "log-of-zero keys on any id space") {
    for ((label, ids) <- idSpaces) {
      // u_plain = (h + 1) / (2^32 + 1) ∈ (0, 1) requires h ∈ [0, 2^32)
      val bad = ids.filterNot { id =>
        val h = hashPlain(id); h >= 0L && h < M
      }
      assert(bad.isEmpty, s"$label: hash escaped [0, 2^32): " +
        bad.take(3).mkString(","))
    }
  }
}
