package graft.chem

/** Bounded maximum-common-substructure search (the MCS filter's kernel,
  * similarity.py:942-974, which rides rdFMCS.FindMCS with
  * matchValences=False, ringMatchesRingOnly=False).
  *
  * Exact MCS is NP-hard; this is a deterministic connected-growth
  * backtracking search: seeded at every compatible atom pair, grown
  * over adjacent compatible pairs, keeping the best (atoms + matched
  * bonds). Partial maps are globally memoized so each distinct mapping
  * is explored once (the naive search re-visits every map once per
  * extension ORDER — factorially wasteful), and the budget counts
  * UNIQUE states. On molecules up to ~40 heavy atoms the effective
  * budget is raised so the search is exact in practice (mirroring
  * FindMCS, whose default timeout makes it exact at fixture scale);
  * above that it stays a budget-bounded lower bound.
  *
  * Atom compatibility is element-only, like FindMCS's default
  * CompareElements (charge and aromaticity are NOT matched on atoms;
  * aromaticity still constrains via bond compatibility).
  */
object MCS {

  private def compatible(a: Molecule, i: Int, b: Molecule, j: Int): Boolean =
    a.atoms(i).elem == b.atoms(j).elem

  private def bondCompatible(x: Bond, y: Bond): Boolean =
    x.aromatic == y.aromatic && (x.aromatic || x.order == y.order)

  /** (mapped atoms, matched bonds) of the best common connected
    * subgraph found within the state budget.
    */
  def mcsSize(a0: Molecule, b0: Molecule, budget: Int = 200000): (Int, Int) = {
    val a = a0.withoutExplicitH
    val b = b0.withoutExplicitH
    // exact-leaning on small molecules, bounded above
    val effBudget =
      if (math.min(a.n, b.n) <= 40) math.max(budget, 500000) else budget
    var bestAtoms = 0
    var bestBonds = 0
    var states = 0
    val visited = scala.collection.mutable.HashSet.empty[String]
    def stateKey(mapAB: Map[Int, Int]): String = {
      val arr = mapAB.toArray
      java.util.Arrays.sort(arr, java.util.Comparator.comparingInt(
        (t: (Int, Int)) => t._1))
      val sb = new StringBuilder(arr.length * 2)
      arr.foreach { case (x, y) =>
        sb.append(x.toChar).append(y.toChar)
      }
      sb.toString
    }

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

    def record(mapAB: Map[Int, Int]): Unit = {
      val bonds = countBonds(mapAB)
      // FindMCS seeds from common BONDS: an atom-only overlap (no
      // compatible bond) is no MCS at all, e.g. benzene/cyclohexane
      if (bonds < 1) return
      // FindMCS default objective is maximizeBonds=True: the BEST
      // common subgraph is the one with the most bonds (atoms break
      // ties) — NOT the most atoms. The two disagree exactly when a
      // denser (ring-heavy) overlap with fewer atoms competes with a
      // longer tree-shaped one, and the (atoms+bonds) score differs
      // with it.
      if (bonds > bestBonds ||
        (bonds == bestBonds && mapAB.size > bestAtoms)) {
        bestAtoms = mapAB.size; bestBonds = bonds
      }
    }

    def grow(mapAB: Map[Int, Int], usedB: Set[Int]): Unit = {
      if (states >= effBudget) { record(mapAB); return }
      if (!visited.add(stateKey(mapAB))) return // mapping already explored
      states += 1
      // matched bonds grow monotonically with the map, so recording at
      // leaves (and at budget exhaustion) dominates every prefix —
      // no mid-path record needed under either objective
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
