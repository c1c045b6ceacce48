package graft.chem

/** Bounded maximum-common-substructure search (the MCS filter's kernel,
  * filters/mcs.py + similarity.py:959-974).
  *
  * Exact MCS is NP-hard; this is a deterministic connected-growth
  * backtracking search with a state budget: seeded at every compatible
  * atom pair, grown over adjacent compatible pairs, keeping the best
  * (atoms + matched bonds). With the default budget it is exact on
  * small molecules and a lower bound on large ones — sufficient for the
  * reference's threshold-filter semantics
  * (score = (atoms+bonds)_mcs / (atoms+bonds)_target).
  */
object MCS {

  private def compatible(a: Molecule, i: Int, b: Molecule, j: Int): Boolean = {
    val x = a.atoms(i); val y = b.atoms(j)
    x.elem == y.elem && x.aromatic == y.aromatic && x.charge == y.charge
  }

  private def bondCompatible(x: Bond, y: Bond): Boolean =
    x.aromatic == y.aromatic && (x.aromatic || x.order == y.order)

  /** (mapped atoms, matched bonds) of the best common connected
    * subgraph found within the state budget.
    */
  def mcsSize(a0: Molecule, b0: Molecule, budget: Int = 200000): (Int, Int) = {
    val a = a0.withoutExplicitH
    val b = b0.withoutExplicitH
    var bestAtoms = 0
    var bestBonds = 0
    var states = 0

    def countBonds(mapAB: Map[Int, Int]): Int =
      mapAB.toSeq.map { case (ai, bi) =>
        a.adj(ai).count { case (an, abond) =>
          mapAB.get(an).exists { bn =>
            b.adj(bi).exists { case (x, bbond) =>
              x == bn && bondCompatible(abond, bbond)
            }
          }
        }
      }.sum / 2

    def record(mapAB: Map[Int, Int]): Unit =
      if (mapAB.size >= bestAtoms) {
        val bonds = countBonds(mapAB)
        if (mapAB.size > bestAtoms ||
          (mapAB.size == bestAtoms && bonds > bestBonds)) {
          bestAtoms = mapAB.size; bestBonds = bonds
        }
      }

    def grow(mapAB: Map[Int, Int], usedB: Set[Int]): Unit = {
      if (states >= budget) { record(mapAB); return }
      states += 1
      if (mapAB.size > bestAtoms) record(mapAB)
      // candidate extensions: adjacent compatible pairs (deterministic order)
      val cands = (for {
        (ai, bi) <- mapAB.toSeq.sortBy(_._1)
        (an, abond) <- a.adj(ai)
        if !mapAB.contains(an)
        (bn, bbond) <- b.adj(bi)
        if !usedB(bn) && compatible(a, an, b, bn) &&
          bondCompatible(abond, bbond)
      } yield (an, bn)).distinct
      if (cands.isEmpty) record(mapAB)
      else cands.foreach { case (an, bn) =>
        grow(mapAB + (an -> bn), usedB + bn)
      }
    }

    val seeds = for {
      i <- 0 until a.n if a.atoms(i).elem != "H"
      j <- 0 until b.n if b.atoms(j).elem != "H" && compatible(a, i, b, j)
    } yield (i, j)
    seeds.foreach { case (i, j) => grow(Map(i -> j), Set(j)) }
    (bestAtoms, bestBonds)
  }

  /** The reference's MCS score vs a target:
    * (atoms+bonds)_mcs / (atoms+bonds)_target (similarity.py:959-974).
    */
  def mcsScore(cpd: Molecule, target: Molecule, budget: Int = 200000): Double = {
    val t = target.withoutExplicitH
    val tSize = t.n + t.bonds.length
    if (tSize == 0) return 0.0
    val (atoms, bonds) = mcsSize(cpd, target, budget)
    (atoms + bonds).toDouble / tSize
  }
}
