package graft.chem

/** Aromaticity perception (Hückel-lite): Kekulé-written rings
  * (C1=CC=CC=C1) must canonicalize to the same structure as their
  * aromatic form (c1ccccc1), or content-addressed identity breaks.
  *
  * Scope: simple rings of size 5-6 (fused systems handled atom-wise),
  * π counting: 1 for an atom with any double bond (sp2), 2 for a
  * heteroatom lone pair (N-H, O, S without a double bond), 0 for a
  * carbon whose only double bond is exocyclic (2-pyridone style);
  * aromatic iff every ring atom contributes and Σπ ≡ 2 (mod 4).
  */
object Aromatize {

  def perceive(m: Molecule): Molecule = {
    val rings = findRings(m, maxSize = 6)
    if (rings.isEmpty) return m
    val atoms = m.atoms.toArray
    val bonds = m.bonds.toArray
    def bondBetween(a: Int, b: Int): Option[Int] =
      bonds.indices.find { k =>
        (bonds(k).a == a && bonds(k).b == b) ||
          (bonds(k).a == b && bonds(k).b == a)
      }
    def hasDouble(i: Int): Boolean =
      m.adj(i).exists { case (_, bd) => bd.order == 2 && !bd.aromatic }

    val aromaticRings = rings.filter { ring =>
      // only perceive Kekulé rings (some non-aromatic in-ring bond)
      val ringBonds = ring.indices.map { k =>
        bondBetween(ring(k), ring((k + 1) % ring.length))
      }
      if (ringBonds.exists(_.isEmpty)) false
      else if (ringBonds.forall(k => bonds(k.get).aromatic)) false
      else {
        val pis = ring.map { i =>
          val a = atoms(i)
          if (a.aromatic) Some(1) // shared edge with an aromatic ring
          else if (hasDouble(i)) {
            val inRingDouble = m.adj(i).exists { case (j, bd) =>
              bd.order == 2 && !bd.aromatic && ring.contains(j)
            }
            // a fusion atom's double bond lies in the NEIGHBORING ring:
            // still 1 π; only a double to a non-ring atom (C=O) is 0
            val doubleToRingAtom = m.adj(i).exists { case (j, bd) =>
              bd.order == 2 && !bd.aromatic && m.inRing(j)
            }
            if (inRingDouble || doubleToRingAtom) Some(1)
            else if (a.elem == "C") Some(0) // exocyclic C=O etc.
            else Some(1)
          } else a.elem match {
            case "N" | "O" | "S" => Some(2) // lone pair
            case _ => None
          }
        }
        pis.forall(_.isDefined) && pis.flatten.sum % 4 == 2
      }
    }
    if (aromaticRings.isEmpty) return m

    // freeze H counts before flipping bond orders
    val totalH = Array.tabulate(m.n)(m.totalH)
    val newBonds = bonds.clone()
    val isArom = Array.fill(m.n)(false)
    for (ring <- aromaticRings) {
      ring.foreach(i => isArom(i) = true)
      for (k <- ring.indices) {
        val bi = bondBetween(ring(k), ring((k + 1) % ring.length)).get
        newBonds(bi) = newBonds(bi).copy(order = 1, aromatic = true)
      }
    }
    val newAtoms = Array.tabulate(m.n) { i =>
      if (isArom(i)) atoms(i).copy(aromatic = true) else atoms(i)
    }
    val out = new Molecule(newAtoms.toVector, newBonds.toVector)
    // re-fix H where the aromatic-derived implicit count changed
    val fixed = Array.tabulate(m.n) { i =>
      val a = out.atoms(i)
      if (!isArom(i)) a
      else {
        val explicitHNeighbors = out.adj(i).count { case (j, bd) =>
          out.atoms(j).elem == "H" && bd.order == 1 && !bd.aromatic
        }
        val own = totalH(i) - explicitHNeighbors
        val derived =
          if (a.hCount >= 0) -1 // bracket count kept as-is below
          else Molecule.derivedH(a, out.bondOrderSum(i))
        if (a.hCount >= 0) a
        else if (derived == own) a
        else a.copy(hCount = math.max(own, 0))
      }
    }
    new Molecule(fixed.toVector, out.bonds)
  }

  /** All unique simple cycles of size <= maxSize: shortest alternative
    * path search per bond.
    */
  private def findRings(m: Molecule, maxSize: Int): Seq[Vector[Int]] = {
    val seen = scala.collection.mutable.Set.empty[Set[Int]]
    val out = Seq.newBuilder[Vector[Int]]
    for (bd <- m.bonds) {
      // BFS from bd.a to bd.b avoiding bd
      val prev = Array.fill(m.n)(-1)
      val dist = Array.fill(m.n)(Int.MaxValue)
      dist(bd.a) = 0
      val q = scala.collection.mutable.Queue(bd.a)
      while (q.nonEmpty) {
        val u = q.dequeue()
        if (dist(u) < maxSize - 1) {
          for ((v, b2) <- m.adj(u) if b2 ne bd) {
            if (dist(v) == Int.MaxValue) {
              dist(v) = dist(u) + 1; prev(v) = u; q += v
            }
          }
        }
      }
      if (dist(bd.b) != Int.MaxValue && dist(bd.b) + 1 <= maxSize) {
        var path = List(bd.b)
        while (path.head != bd.a) path = prev(path.head) :: path
        val ring = path.toVector
        if (ring.length >= 3 && seen.add(ring.toSet)) out += ring
      }
    }
    out.result()
  }
}
