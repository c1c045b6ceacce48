package graft.chem

/** Natural-product-likeness scoring (P12, NP_Score/npscorer.py:37-54):
  * score = sum of per-fragment contributions over the DISTINCT Morgan
  * radius-2 bits / heavy-atom count, with logarithmic damping outside
  * ±4.
  *
  * The reference's shipped model (`publicnp.model.gz`, a pickled
  * {Morgan bit -> float} dict) is loadable with `NPModel.load`, and
  * `graft.chem.Morgan` reproduces RDKit's Morgan bit ids exactly
  * (calibrated against the 26 NP_likeness values in the reference's
  * tests/data/testing_db.json — NPScoreParitySpec pins all of them to
  * 1e-9), so scores computed with the real model MATCH the reference
  * bit-for-bit. The deterministic pseudo-model remains the default for
  * callers that don't ship the model file.
  */
object NPScore {

  /** Deterministic placeholder model for model-less deployments. */
  val defaultModel: Long => Double = bit =>
    ((bit * 2654435761L) % 1000) / 250.0 - 2.0

  /** Reference-exact scoring: distinct Morgan-2 bits -> model lookup
    * (0.0 for unknown bits) -> / heavy atoms -> log damping.
    */
  def score(m: Molecule, model: Long => Double): Double = {
    val heavy = m.withoutExplicitH
    if (heavy.n == 0) return 0.0
    val bits = Morgan.bits(heavy, radius = 2)
    val raw = bits.toSeq.map(model).sum / heavy.n
    if (raw > 4) 4 + math.log10(raw - 4 + 1)
    else if (raw < -4) -4 - math.log10(-raw - 4 + 1)
    else raw
  }

  def score(m: Molecule): Double = score(m, defaultModel)

  def score(smiles: String): Double = score(Smiles.parse(smiles))

  /** Convenience: real-model scorer bound to a loaded model map. */
  def scorer(model: Map[Long, Double]): Molecule => Double =
    score(_, b => model.getOrElse(b, 0.0))
}
