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

  /** Hashed path-based fingerprint: every linear atom path up to
    * `maxLen` atoms sets one of `nBits` bits (analog of RDKitFP;
    * databases.py:544-548 stores the nonzero bit indexes).
    */
  /** Path-based bit fingerprint in RDKFingerprint's shape (2048 bits,
    * linear paths up to 7 atoms, canonical-direction hashing) — the
    * reference's similarity filters ride on RDKFingerprint
    * (filters/similarity.py:121,483). Bit-identical RDKit parity is
    * impossible (RDKit seeds an RNG per path hash), but matching the
    * size/depth keeps Tanimoto values in the same regime so cutoff
    * semantics behave comparably.
    */
  def fingerprint(m: Molecule, nBits: Int = 2048, maxLen: Int = 7): Array[Int] = {
    val bits = scala.collection.mutable.SortedSet.empty[Int]
    def invar(i: Int): String = {
      val a = m.atoms(i)
      s"${a.elem}${if (a.aromatic) "a" else ""}${a.charge}"
    }
    def walk(path: List[Int], desc: List[String]): Unit = {
      if (desc.nonEmpty) {
        // canonical direction: lexicographically smaller of fwd/rev
        val f = desc.mkString(">")
        val r = desc.reverse.mkString(">")
        val key = if (f <= r) f else r
        bits += math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key), nBits)
      }
      if (path.length < maxLen) {
        val u = path.head
        for ((v, bd) <- m.adj(u)
             if !path.contains(v) && m.atoms(v).elem != "H") {
          val bs = if (bd.aromatic) ":" else bd.order.toString
          walk(v :: path, (bs + invar(v)) :: desc)
        }
      }
    }
    for (i <- 0 until m.n if m.atoms(i).elem != "H")
      walk(List(i), List(invar(i)))
    bits.toArray
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
