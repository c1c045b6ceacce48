package graft.chem

/** RDKit `SanitizeMol` valence emulation — the rejection gate behind
  * the reference's "Explicit valence greater than permitted" product
  * discards (reactions.py:132-138). RDKit kekulizes, computes each
  * atom's EXPLICIT valence (integer bond-order sum + bound H), and
  * throws when it exceeds the element's maximum default valence
  * (charge-adjusted). This module reproduces that check over our
  * molecule model using one concrete Kekulé assignment from
  * [[Kekulize.assignment]], with NO aromatic-atom exemption — the
  * laxity audit found the birth-time `validValences` skip of
  * aromatic-bonded atoms let through products RDKit rejects.
  */
object RdkitValence {

  /** Maximum permitted total valence per (element, formal charge) —
    * RDKit's default-valence table with the standard isoelectronic
    * charge shifts for the organic subset. `None` = unchecked (metals
    * and anything RDKit gives default valence −1).
    */
  def maxAllowed(elem: String, charge: Int): Option[Int] = elem match {
    case "H" => Some(1)
    case "B" => Some(3 - charge) // boron is LEFT of carbon: B- borate 4
    case "C" => Some(if (charge == 0) 4 else 3) // C+ 3, C- 3 (carbanion)
    case "N" => Some(3 + (if (charge > 0) 1 else if (charge < 0) -1 else 0))
    case "O" => Some(2 + charge) // O+ 3, O- 1
    case "F" | "Cl" | "Br" | "I" =>
      // isoelectronic shift: X- ~ noble gas (valence 0), X+ ~ the
      // chalcogen to the left (halonium, valence 2)
      if (charge == 0) Some(1)
      else if (charge < 0) Some(0)
      else Some(2)
    case "P" => Some(if (charge > 0) 4 else 5) // P(V); P+ phosphonium 4
    case "S" | "Se" =>
      // cations shift left isoelectronically (S+ ~ P: max 5); anions
      // stay at the neutral hypervalent cap — KNOWN-LAX vs RDKit's
      // S- ~ Cl shift, kept because thiolate/persulfide anions with
      // multiple bonds would otherwise need the full valence-list
      // model rather than a single max
      Some(if (charge > 0) 6 - charge else 6)
    case "Si" => Some(4)
    case "As" => Some(5)
    case _ => None
  }

  /** RDKit-strict sanitize: kekulizable AND every atom's integer
    * valence (kekulized bond sum + total H) within the permitted
    * maximum. The reference throws these products out at birth; a
    * kernel that keeps them over-generates against the pinned counts.
    */
  def sanitizeOk(m: Molecule): Boolean =
    Kekulize.assignment(m) match {
      case None => false
      case Some(doubled) =>
        val bondIdx = m.bonds.zipWithIndex.toMap
        (0 until m.n).forall { i =>
          val a = m.atoms(i)
          maxAllowed(a.elem, a.charge) match {
            case None => true
            case Some(mx) =>
              // bs already includes bonds to explicit-H NEIGHBORS, so
              // only the atom's OWN H (bracket or implicit) adds
              val bs = m.adj(i).map { case (_, bd) =>
                if (bd.aromatic) {
                  if (doubled(bondIdx(bd))) 2 else 1
                } else bd.order
              }.sum
              val ownH =
                if (a.hCount >= 0) a.hCount else m.implicitH(i)
              bs + ownH <= mx
          }
        }
    }
}
