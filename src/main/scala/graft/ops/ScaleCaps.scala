package graft.ops

/** Declared scale posture for the lossless near-dup joins (x62/x63).
  *
  * Their REGISTERED forms are lossless by default — the driver's
  * brute-force DuckDB oracles demand it, and losslessness is the
  * operator contract at test scale. But the lossless candidate factor
  * (`Σ_sh df_prefix(sh)·df(sh)`) grows with the corpus even for
  * moderately common shingles, so at open scale the candidate-df cap is
  * the posture you deploy with: shingles hotter than the cap leave the
  * CANDIDATE indexes (verify joins stay exact), making candidate
  * cardinality linear in vocabulary size with declared recall
  * (CapRecallSpec pins exactly what a cap drops; SCALE.md carries the
  * measured pair-count growth at 1×/10×/30×).
  *
  * This seam wires that posture through the registered queries
  * themselves: set `SPARK_GRAFT_MAX_CAND_DF` (env, cluster submit) or
  * `graft.maxCandDf` (JVM property, tests) and x62/x63 run capped
  * everywhere — Verify, Bench, ScaleVerify, user code — with no
  * call-site changes. Unset ⇒ `Long.MaxValue`, which keeps the filter
  * out of the plan entirely (bit-equal to the lossless join).
  */
object ScaleCaps {

  /** Read at query-construction time, property first so tests can
    * toggle it per-case. An empty value is treated as unset (a common
    * shell accident: `export SPARK_GRAFT_MAX_CAND_DF=`); a malformed
    * non-empty value aborts with a message NAMING the setting — a
    * silently-ignored typo'd cap would deploy the lossless join at
    * open scale, which is exactly what the posture exists to prevent.
    */
  def maxCandDf: Long = cap("graft.maxCandDf", "SPARK_GRAFT_MAX_CAND_DF")

  /** Per-cell size bound for x145 SemDeDup's within-cell pair search
    * (round-12 verdict item 1). The registered oracle pins label-seeded
    * cells whose COUNT is fixed, so within-cell pair volume grows
    * quadratically with the corpus; at open scale a deployment sets
    * this bound and cells above it are hash-split into ceil(n/bound)
    * sub-cells — the SemDeDup paper's own k-grows-with-corpus recipe,
    * applied below the fixed cell layer — making pair volume linear
    * (~n·bound/2 per cell). Unset ⇒ `Long.MaxValue`, bit-equal to the
    * lossless within-cell join the oracle gates.
    */
  def maxCellSize: Long =
    cap("graft.maxCellSize", "SPARK_GRAFT_MAX_CELL_SIZE")

  /** Probe-slice modulus for x146's dedup-recall audit (round-17
    * verdict item 6 — the x181 precedent: the "production turns the
    * slice density down as the corpus grows" argument becomes a
    * REGISTERED dial). The audit compares a 1/mod slice of documents
    * exhaustively against the corpus, so audit cost scales with
    * 1/mod × corpus while the per-band recall estimate stays unbiased
    * at any density (the slice is hash-arbitrary in doc_id) — measured
    * across mods {11, 31, 101} × factors {1×, 10×, 30×} in SCALE.md
    * §round-18. Default 11 (the shipped oracle dial); set
    * `SPARK_GRAFT_PROBE_MOD` / `graft.probeMod` to thin the slice at
    * open scale. */
  def probeMod: Long =
    cap("graft.probeMod", "SPARK_GRAFT_PROBE_MOD") match {
      case Long.MaxValue => 11L
      case m => m
    }

  private def cap(prop: String, env: String): Long = {
    val raw = sys.props.get(prop).orElse(sys.env.get(env))
      .map(_.trim).filter(_.nonEmpty)
    raw match {
      case None => Long.MaxValue
      case Some(s) => s.toLongOption.filter(_ > 0).getOrElse(
        throw new IllegalArgumentException(
          s"$prop / $env must be a positive long, got '$s' — unset it " +
            "for the lossless form or pass the cap as a number"))
    }
  }
}
