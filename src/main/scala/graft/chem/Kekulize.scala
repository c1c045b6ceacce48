package graft.chem

/** Kekulizability check — the remaining RDKit product-sanitization gate
  * (reactions.py:132-138 via `Chem.SanitizeMol`; "Can't kekulize mol"
  * branch of utils.postsanitize_smiles:461): an aromatic system is valid
  * only if its π bonds admit a perfect matching. Each aromatic atom
  * needs exactly (allowed valence − σ/order bond sum − own H) ∈ {0, 1}
  * in-system double bonds; needs-1 atoms must pair up along aromatic
  * edges (backtracking matching — aromatic systems here are small).
  *
  * A rule product whose template left an aromatic ring with an
  * unpairable π deficit (e.g. a pyridine-type N that lost its double-
  * bond partner) is chemically invalid and must be rejected, exactly as
  * RDKit throws it out.
  */
object Kekulize {

  private[chem] def allowedValence(elem: String, charge: Int): Option[Int] =
    elem match {
      case "C" => Some(4 - math.abs(charge))
      case "N" => Some(3 + charge)
      case "O" => Some(2 + charge)
      case "S" => Some(2 + charge) // aromatic S is thiophene-like
      case "P" => Some(3 + charge)
      case "B" => Some(3)
      case _ => None // no π model — skip
    }

  /** True when every aromatic system in the molecule admits a Kekulé
    * assignment. Molecules without aromatic bonds are trivially true.
    *
    * This is the expansion kernel's PER-PRODUCT hot path — it keeps
    * the original allocation-lean matcher (plain Int adjacency, no
    * bond-index bookkeeping) rather than delegating to [[assignment]],
    * whose picked-set tracking measurably slowed every engine query
    * when it briefly sat on this path.
    */
  def kekulizable(m: Molecule): Boolean = {
    val aromNeigh = Array.fill(m.n)(List.empty[Int])
    m.bonds.foreach { bd =>
      if (bd.aromatic) {
        aromNeigh(bd.a) = bd.b :: aromNeigh(bd.a)
        aromNeigh(bd.b) = bd.a :: aromNeigh(bd.b)
      }
    }
    val inSystem = (0 until m.n).filter(aromNeigh(_).nonEmpty)
    if (inSystem.isEmpty) return true
    val needs = Array.fill(m.n)(0)
    for (i <- inSystem) {
      val a = m.atoms(i)
      allowedValence(a.elem, a.charge) match {
        case None => needs(i) = 0
        case Some(v) =>
          val bondSum = m.adj(i).map { case (_, bd) =>
            if (bd.aromatic) 1 else bd.order
          }.sum
          val ownH = if (a.hCount >= 0) a.hCount else m.implicitH(i)
          val need = v - bondSum - ownH
          if (need < 0 || need > 1) return false
          needs(i) = need
      }
    }
    val need1 = inSystem.filter(needs(_) == 1).toArray
    if (need1.isEmpty) return true
    val matched = Array.fill(m.n)(false)
    def bt(idx: Int): Boolean = {
      if (idx == need1.length) true
      else {
        val u = need1(idx)
        if (matched(u)) bt(idx + 1)
        else {
          matched(u) = true
          val ok = aromNeigh(u).exists { v =>
            needs(v) == 1 && !matched(v) && {
              matched(v) = true
              val r = bt(idx + 1)
              if (!r) matched(v) = false
              r
            }
          }
          if (!ok) matched(u) = false
          ok
        }
      }
    }
    bt(0)
  }

  /** One concrete Kekulé assignment: the set of AROMATIC-bond indices
    * that carry the double bond. `Some(Set.empty)` for molecules whose
    * aromatic atoms all have π need 0 (or no aromatic bonds at all);
    * `None` when no perfect matching exists — RDKit's "Can't kekulize
    * mol". The strict sanitize audit uses the assignment to compute
    * integer valences over aromatic systems.
    */
  def assignment(m: Molecule): Option[Set[Int]] = {
    val aromNeigh = Array.fill(m.n)(List.empty[(Int, Int)]) // (atom, bondIdx)
    m.bonds.zipWithIndex.foreach { case (bd, bi) =>
      if (bd.aromatic) {
        aromNeigh(bd.a) = (bd.b, bi) :: aromNeigh(bd.a)
        aromNeigh(bd.b) = (bd.a, bi) :: aromNeigh(bd.b)
      }
    }
    val inSystem = (0 until m.n).filter(aromNeigh(_).nonEmpty)
    if (inSystem.isEmpty) return Some(Set.empty)

    // π need per aromatic atom: allowed valence − bond sum (aromatic
    // bonds count 1 σ) − own H
    val needs = Array.fill(m.n)(0)
    for (i <- inSystem) {
      val a = m.atoms(i)
      allowedValence(a.elem, a.charge) match {
        case None => needs(i) = 0
        case Some(v) =>
          val bondSum = m.adj(i).map { case (_, bd) =>
            if (bd.aromatic) 1 else bd.order
          }.sum
          // own H only (explicit-H NEIGHBORS are already in bondSum);
          // implicit H uses the molecule's aromatic-aware derivation
          val ownH = if (a.hCount >= 0) a.hCount else m.implicitH(i)
          val need = v - bondSum - ownH
          if (need < 0 || need > 1) return None
          needs(i) = need
      }
    }
    // perfect matching of needs-1 atoms along aromatic edges, per
    // connected component, by backtracking (systems are small)
    val need1 = inSystem.filter(needs(_) == 1).toArray
    if (need1.isEmpty) return Some(Set.empty)
    val matched = Array.fill(m.n)(false)
    val picked = scala.collection.mutable.Set.empty[Int]
    def bt(idx: Int): Boolean = {
      if (idx == need1.length) true
      else {
        val u = need1(idx)
        if (matched(u)) bt(idx + 1)
        else {
          matched(u) = true
          val ok = aromNeigh(u).exists { case (v, bi) =>
            needs(v) == 1 && !matched(v) && {
              matched(v) = true
              picked += bi
              val r = bt(idx + 1)
              if (!r) { matched(v) = false; picked -= bi }
              r
            }
          }
          if (!ok) matched(u) = false
          ok
        }
      }
    }
    if (bt(0)) Some(picked.toSet) else None
  }
}
