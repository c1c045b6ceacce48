package graft.chem

/** Natural-product-likeness scoring (P12, NP_Score/npscorer.py:37-54):
  * score = sum of per-fragment contributions / heavy-atom count, with
  * logarithmic damping outside ±4.
  *
  * The reference loads fragment contributions from a published pickled
  * model (publicly distributed with RDKit); a pickle is unreadable here,
  * so the default model derives a deterministic pseudo-contribution per
  * fragment hash — the SCORING PIPELINE (fragment -> lookup -> sum/atoms
  * -> damping) is the reference's exactly, and a real model drops in as
  * a `Map[Int, Double]`.
  */
object NPScore {

  /** Deterministic placeholder model: fragment bit -> small weight. */
  val defaultModel: Int => Double = bit =>
    ((bit * 2654435761L) % 1000) / 250.0 - 2.0

  def score(m: Molecule, model: Int => Double = defaultModel): Double = {
    val heavy = (0 until m.n).count(i => m.atoms(i).elem != "H")
    if (heavy == 0) return 0.0
    val bits = Formula.fingerprint(m, nBits = 4096, maxLen = 4)
    val raw = bits.map(model).sum / heavy
    // log damping (npscorer.py:48-53)
    if (raw > 4) 4 + math.log10(raw - 4 + 1)
    else if (raw < -4) -4 - math.log10(-raw - 4 + 1)
    else raw
  }

  def score(smiles: String): Double = score(Smiles.parse(smiles))
}
