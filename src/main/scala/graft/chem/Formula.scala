package graft.chem

/** Formula, atom counts, exact (monoisotopic) mass, fingerprints and
  * similarity — the scalar chemistry functions of the reference
  * (utils.py:520-553 atom counts, databases.py:559 ExactMolWt,
  * similarity.py:478-489 fingerprints/Tanimoto) as pure Scala.
  */
object Formula {

  /** Monoisotopic masses (public IUPAC/NIST values). */
  val monoMass: Map[String, Double] = Map(
    "H" -> 1.00782503207, "B" -> 11.0093054, "C" -> 12.0,
    "N" -> 14.0030740048, "O" -> 15.9949146196, "F" -> 18.99840322,
    "Na" -> 22.9897692809, "Mg" -> 23.9850417, "Si" -> 27.9769265325,
    "P" -> 30.97376163, "S" -> 31.97207100, "Cl" -> 34.96885268,
    "K" -> 38.96370668, "Ca" -> 39.96259098, "Fe" -> 55.9349375,
    "Se" -> 79.9165213, "Br" -> 78.9183371, "I" -> 126.904473)

  private val electronMass = 0.00054857990946

  /** Element -> count map including implicit+explicit H ("*" excluded). */
  def atomCounts(m: Molecule): Map[String, Int] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for (i <- 0 until m.n) {
      val e = m.atoms(i).elem
      if (e != "*") counts(e) = counts.getOrElse(e, 0) + 1
      if (e != "H") {
        val h = if (m.atoms(i).hCount >= 0) m.atoms(i).hCount else m.implicitH(i)
        if (h > 0) counts("H") = counts.getOrElse("H", 0) + h
      }
    }
    counts.toMap
  }

  /** Hill-order formula: C, H, then other elements alphabetically. */
  def hillFormula(m: Molecule): String = {
    val c = atomCounts(m)
    def part(e: String) = c.get(e) match {
      case Some(1) => e
      case Some(k) => s"$e$k"
      case None => ""
    }
    if (c.contains("C"))
      part("C") + part("H") +
        c.keys.filter(e => e != "C" && e != "H").toSeq.sorted.map(part).mkString
    else c.keys.toSeq.sorted.map(part).mkString
  }

  /** Parse a Hill formula string into counts — the reference's
    * get_atom_count regex (utils.py:541: `([A-Z][a-z]*)(\d*)`).
    */
  def parseFormula(f: String): Map[String, Int] =
    "([A-Z][a-z]*)(\\d*)".r.findAllMatchIn(f).toSeq
      .groupMapReduce(_.group(1))(mm =>
        if (mm.group(2).isEmpty) 1 else mm.group(2).toInt)(_ + _)

  /** Exact monoisotopic mass, electron-corrected for net charge. */
  def exactMass(m: Molecule): Double =
    atomCounts(m).map { case (e, k) =>
      monoMass.getOrElse(e, 0.0) * k
    }.sum - electronMass * m.formalCharge

  /** Bit fingerprint in RDKFingerprint's shape — the reference's
    * similarity filters ride on RDKFingerprint
    * (filters/similarity.py:121,483). Like RDKit's (public) algorithm,
    * this enumerates every connected BOND subgraph of 1..`maxLen`
    * bonds — branched subgraphs included, not just linear paths —
    * canonically hashes each (WL refinement over element/aromatic/
    * charge atom invariants + bond orders, permutation-invariant), and
    * sets 2 bits per subgraph in an `nBits` vector (RDKit
    * nBitsPerHash=2). Bit-identical RDKit parity is impossible (RDKit
    * seeds an RNG per subgraph hash), but matching the feature CLASS
    * (branched subgraphs by bond count) and bit density keeps Tanimoto
    * values in the same regime, which is what the reference's cutoff
    * semantics depend on.
    */
  def fingerprint(m: Molecule, nBits: Int = 2048, maxLen: Int = 7): Array[Int] = {
    import scala.collection.mutable
    import scala.util.hashing.MurmurHash3
    // heavy-atom bonds only (H atoms contribute via invariants, not paths)
    val hb = m.bonds.filter(bd =>
      m.atoms(bd.a).elem != "H" && m.atoms(bd.b).elem != "H")
    val nb = hb.length
    if (nb == 0) return Array.empty
    val bondLab = hb.map(bd => if (bd.aromatic) 4 else bd.order).toArray
    val bondsAt = Array.fill(m.n)(List.empty[Int])
    for (k <- 0 until nb) {
      bondsAt(hb(k).a) ::= k; bondsAt(hb(k).b) ::= k
    }
    val atomInv: Array[Int] = Array.tabulate(m.n) { i =>
      val a = m.atoms(i)
      MurmurHash3.stringHash(
        s"${a.elem}${if (a.aromatic) "a" else ""}${a.charge}")
    }

    val bits = mutable.SortedSet.empty[Int]
    // permutation-invariant subgraph hash, RDKit-style: the subgraph is
    // reduced to the SORTED MULTISET of its symmetrized per-bond hashes
    // (atom invariants of both ends + bond order) plus the bond count —
    // deliberately weaker than a canonical graph hash, matching the
    // public RDKFingerprint algorithm's bond-hash-list scheme; the
    // collisions between near-duplicate subgraphs this causes are part
    // of the fingerprint's observable similarity behavior
    def emit(bondSet: Vector[Int], atomSet: Set[Int]): Unit = {
      // subgraph-local degree of each endpoint (RDKit folds the
      // within-path atom degrees into the bond hashes)
      val deg = new mutable.HashMap[Int, Int]
      bondSet.foreach { k =>
        deg(hb(k).a) = deg.getOrElse(hb(k).a, 0) + 1
        deg(hb(k).b) = deg.getOrElse(hb(k).b, 0) + 1
      }
      val bondKeys = bondSet.map { k =>
        val ia = atomInv(hb(k).a) * 31 + deg(hb(k).a)
        val ib = atomInv(hb(k).b) * 31 + deg(hb(k).b)
        val (p, q) = if (ia <= ib) (ia, ib) else (ib, ia)
        p.toLong * 2654435761L + q.toLong * 40503L + bondLab(k)
      }.sorted
      var h = bondSet.length
      bondKeys.foreach(v => h = MurmurHash3.mix(h, (v ^ (v >>> 32)).toInt))
      val key = MurmurHash3.finalizeHash(h, bondKeys.length)
      bits += math.floorMod(key, nBits)
      bits += math.floorMod(MurmurHash3.mix(key, 0x9e3779b9), nBits)
    }

    // enumerate connected bond subgraphs, smallest first; a size-k set
    // arises from several size-(k-1) parents, so dedup per level
    var level = (0 until nb).map(k =>
      (Vector(k), Set(hb(k).a, hb(k).b))).toList
    level.foreach { case (bs, as) => emit(bs, as) }
    var size = 1
    while (size < maxLen && level.nonEmpty) {
      size += 1
      val seen = mutable.HashSet.empty[String]
      val next = mutable.ListBuffer.empty[(Vector[Int], Set[Int])]
      level.foreach { case (bs, as) =>
        val inSet = bs.toSet
        as.foreach { a =>
          bondsAt(a).foreach { c =>
            if (!inSet(c)) {
              val nbs = (bs :+ c).sorted
              if (seen.add(nbs.mkString(","))) {
                val nas = as + hb(c).a + hb(c).b
                next += ((nbs, nas))
                emit(nbs, nas)
              }
            }
          }
        }
      }
      level = next.toList
    }
    bits.toArray
  }

  /** Crippen-STYLE logP atom-contribution estimate (the reference
    * stores `AllChem.CalcCrippenDescriptors(mol)[0]` on every core
    * compound, databases.py:562, and ms_adduct_search filters on a
    * logP window, metabolomics.py:965). RDKit's exact Wildman-Crippen
    * table (68 SMARTS atom types) is not reproducible here, so this is
    * a deterministic coarse-class estimator — hydrophobic carbon
    * positive, heteroatoms negative, halogens positive — DOCUMENTED
    * DEVIATION: same sign conventions and rough magnitudes, not
    * value-parity. Swap in a real table via the `contrib` parameter.
    */
  def logPEstimate(
      m: Molecule,
      contrib: (String, Boolean, Int, Int) => Double =
        defaultLogPContrib): Double = {
    var s = 0.0
    for (i <- 0 until m.n if m.atoms(i).elem != "H") {
      val a = m.atoms(i)
      val doubleBonds = m.adj(i).count(t => t._2.order == 2 && !t._2.aromatic)
      s += contrib(a.elem, a.aromatic, m.totalH(i), doubleBonds)
    }
    math.rint(s * 10000) / 10000
  }

  /** (elem, aromatic, totalH, nDoubleBonds) -> contribution. */
  def defaultLogPContrib(
      elem: String, aromatic: Boolean, totalH: Int, nDouble: Int): Double =
    elem match {
      case "C" => if (aromatic) 0.29 else 0.14
      case "N" => if (aromatic) -0.49 else -0.87
      case "O" =>
        if (nDouble > 0) -0.12 // carbonyl-type O
        else if (totalH > 0) -0.64 // hydroxyl
        else -0.37 // ether/ester O
      case "S" => 0.59
      case "P" => -0.45
      case "F" => 0.44
      case "Cl" => 0.64
      case "Br" => 0.81
      case "I" => 1.05
      case _ => 0.0
    }

  def tanimoto(a: Array[Int], b: Array[Int]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def dice(a: Array[Int], b: Array[Int]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    if (sa.isEmpty && sb.isEmpty) 0.0
    else 2.0 * inter / (sa.size + sb.size)
  }
}
