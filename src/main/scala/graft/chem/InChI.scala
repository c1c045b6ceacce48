package graft.chem

/** InChI ingest (S2: the reference's `load_compound_set` accepts an
  * `inchi` structure column, pickaxe.py:463-470 — previously a documented
  * deviation here because InChI omits bond orders).
  *
  * Supported: standard single-component InChI (`InChI=1S/<formula>/c…/h…`)
  * with fixed and mobile hydrogen layers. Bond orders are reconstructed
  * by valence-deficiency matching (all bonds start single; adjacent
  * valence-deficient atoms are paired greedily, fewest-options-first,
  * until every default valence is satisfied — the same class of
  * assignment standard InChI-to-mol tools perform). Charged (`/q`,`/p`)
  * and multi-component InChIs return None, as does any string whose
  * deficiencies cannot be fully paired (would be a radical guess).
  * Mobile-H groups `(Hn,a,b,…)` assign deterministically to the first n
  * listed atoms; the aromatic-NH tautomer pick (`Chem.postsanitize`)
  * normalizes the result like every kernel product.
  */
object InChI {

  private val twoLetter = Seq("Cl", "Br", "Si", "Se", "As", "Na", "Ca",
    "Mg", "Fe", "Zn", "Cu", "Mn", "Co", "Ni")

  /** Formula -> heavy-atom element sequence in InChI numbering order
    * (Hill: C first, then everything else alphabetically; H excluded
    * from numbering).
    */
  private def heavyAtoms(formula: String): Option[Vector[String]] = {
    val token = "([A-Z][a-z]?)(\\d*)".r
    val matches = token.findAllMatchIn(formula).toVector
    if (matches.map(_.matched).mkString != formula) return None
    val parsed = matches.map { m =>
      m.group(1) -> (if (m.group(2).isEmpty) 1 else m.group(2).toInt)
    }
    val heavy = parsed.filter(_._1 != "H")
    // numbering order: C, then others alphabetically (Hill order)
    val (cs, rest) = heavy.partition(_._1 == "C")
    val ordered = cs ++ rest.sortBy(_._1)
    Some(ordered.flatMap { case (e, n) => Vector.fill(n)(e) })
  }

  /** c-layer walk -> bonds (1-based atom numbers). */
  private def parseConnections(c: String, nAtoms: Int): Option[Vector[(Int, Int)]] = {
    val bonds = Vector.newBuilder[(Int, Int)]
    val stack = scala.collection.mutable.Stack.empty[Int]
    var current = -1
    var i = 0
    def readNum(): Int = {
      val start = i
      while (i < c.length && c.charAt(i).isDigit) i += 1
      if (i == start) -1 else c.substring(start, i).toInt
    }
    while (i < c.length) {
      c.charAt(i) match {
        case '(' => stack.push(current); i += 1
        case ')' => if (stack.isEmpty) return None else current = stack.pop(); i += 1
        case ',' =>
          // sibling branch: restart from the branch anchor
          if (stack.isEmpty) return None
          current = stack.top; i += 1
        case '-' => i += 1
        case d if d.isDigit =>
          val n = readNum()
          if (n < 1 || n > nAtoms) return None
          if (current > 0) bonds += ((current, n))
          current = n
        case _ => return None
      }
    }
    Some(bonds.result())
  }

  /** h-layer -> fixed H per atom (1-based). Mobile groups `(Hn,a,b,…)`
    * give 1 H to each of the first n listed atoms.
    */
  private def parseHydrogens(h: String, nAtoms: Int): Option[Array[Int]] = {
    val out = Array.fill(nAtoms + 1)(0)
    // split top-level commas
    val parts = Vector.newBuilder[String]
    var depth = 0; val sb = new StringBuilder
    for (ch <- h) ch match {
      case '(' => depth += 1; sb += ch
      case ')' => depth -= 1; sb += ch
      case ',' if depth == 0 => parts += sb.toString; sb.clear()
      case _ => sb += ch
    }
    parts += sb.toString
    val fixed = "(\\d+)(?:-(\\d+))?".r
    for (p0 <- parts.result(); p = p0.trim if p.nonEmpty) {
      if (p.startsWith("(")) {
        // mobile: (H,11,12) or (H2,6,7,8)
        val inner = p.stripPrefix("(").stripSuffix(")")
        val items = inner.split(",")
        if (!items.head.startsWith("H")) return None
        val n = items.head.stripPrefix("H") match {
          case "" => 1
          case s => s.toIntOption.getOrElse(return None)
        }
        val targets = items.tail.flatMap(_.toIntOption)
        if (targets.length < n) return None
        targets.take(n).foreach { a =>
          if (a < 1 || a > nAtoms) return None
          out(a) += 1
        }
      } else {
        // fixed: "2-11H", "1H2", "13H"
        val hIdx = p.indexOf('H')
        if (hIdx < 0) return None
        val rangePart = p.substring(0, hIdx)
        val count = p.substring(hIdx + 1) match {
          case "" => 1
          case s => s.toIntOption.getOrElse(return None)
        }
        rangePart.split(",").foreach { r =>
          r match {
            case fixed(a, b) =>
              val lo = a.toInt
              val hi = if (b == null) lo else b.toInt
              if (lo < 1 || hi > nAtoms || hi < lo) return None
              (lo to hi).foreach(out(_) += count)
            case _ => return None
          }
        }
      }
    }
    Some(out)
  }

  /** Pair up valence-deficient adjacent atoms into higher bond orders.
    * Greedy fewest-options-first; None when any deficiency is left
    * unpaired (radical guess — reject).
    */
  private def assignBondOrders(
      elems: Vector[String],
      hs: Array[Int],
      bonds0: Vector[(Int, Int)]): Option[Vector[Bond]] = {
    val defaultValence = Map("C" -> 4, "N" -> 3, "O" -> 2, "P" -> 3,
      "S" -> 2, "B" -> 3, "F" -> 1, "Cl" -> 1, "Br" -> 1, "I" -> 1)
    val n = elems.length
    val order = scala.collection.mutable.Map.empty[(Int, Int), Int]
    bonds0.foreach { case (a, b) =>
      order((math.min(a, b), math.max(a, b))) = 1
    }
    val adj = Array.fill(n + 1)(Vector.newBuilder[Int])
    order.keys.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val neigh = adj.map(_.result())
    val deficit = Array.tabulate(n + 1) { i =>
      if (i == 0) 0
      else defaultValence.get(elems(i - 1)) match {
        case None => 0 // metals etc.: no deficiency model, all single
        case Some(v) => v - neigh(i).length - hs(i)
      }
    }
    // P/S valence expansion: a phosphate P (deg 4) computes deficit -1 —
    // treat negatives as zero (expanded shell, all-single + one double
    // handled below by the O-deficits pairing into P)
    (1 to n).foreach(i => if (deficit(i) < 0) deficit(i) = 0)
    // expanded-shell donors: P (3->5) and S (2->4->6) may absorb extra
    // pairings; model by allowing their deficit to grow on demand
    def expandable(i: Int) = elems(i - 1) == "P" || elems(i - 1) == "S"
    var remaining = (1 to n).count(deficit(_) > 0)
    var guard = 0
    while (remaining > 0 && guard < 4 * n) {
      guard += 1
      // the deficient atom with fewest deficient-or-expandable neighbors
      val cands = (1 to n).filter(deficit(_) > 0)
      val pick = cands.minBy(i =>
        neigh(i).count(j => deficit(j) > 0 || expandable(j)))
      val partners = neigh(pick).filter(j => deficit(j) > 0)
      val partner =
        if (partners.nonEmpty)
          // prefer the partner with fewest alternatives
          Some(partners.minBy(j => neigh(j).count(deficit(_) > 0)))
        else neigh(pick).find(expandable) // P=O / S=O
      partner match {
        case None => return None // stranded deficiency -> radical guess
        case Some(j) =>
          val k = (math.min(pick, j), math.max(pick, j))
          order(k) = order(k) + 1
          deficit(pick) -= 1
          if (deficit(j) > 0) deficit(j) -= 1
      }
      remaining = (1 to n).count(deficit(_) > 0)
    }
    if (remaining > 0) None
    else Some(order.toVector.sortBy(_._1).map { case ((a, b), o) =>
      Bond(a - 1, b - 1, math.min(o, 3), aromatic = false)
    })
  }

  /** Parse a standard InChI into a Molecule (Kekulé form; run
    * `Aromatize.perceive` / `Chem.standardize` downstream as with any
    * kernel molecule). None for unsupported layers or unassignable bond
    * orders.
    */
  def parse(inchi: String): Option[Molecule] = {
    if (!inchi.startsWith("InChI=")) return None
    val layers = inchi.stripPrefix("InChI=").split("/")
    if (layers.length < 2) return None
    // layers(0) is the version ("1S" / "1"); formula is layers(1)
    val formula = layers(1)
    if (formula.contains(".")) return None // multi-component
    if (layers.exists(l => l.startsWith("q") || l.startsWith("p")))
      return None // charged / proton layer unsupported
    val elems = heavyAtoms(formula).getOrElse(return None)
    if (elems.isEmpty) return None
    val cLayer = layers.find(_.startsWith("c")).map(_.stripPrefix("c"))
    val hLayer = layers.find(_.startsWith("h")).map(_.stripPrefix("h"))
    val bonds0 = cLayer match {
      case Some(c) if c.nonEmpty =>
        parseConnections(c, elems.length).getOrElse(return None)
      case _ if elems.length == 1 => Vector.empty[(Int, Int)]
      case _ => return None
    }
    val hs = hLayer match {
      case Some(h) => parseHydrogens(h, elems.length).getOrElse(return None)
      case None => Array.fill(elems.length + 1)(0)
    }
    val bonds = assignBondOrders(elems, hs, bonds0).getOrElse(return None)
    val atoms = elems.zipWithIndex.map { case (e, i) =>
      Atom(e, hCount = hs(i + 1))
    }
    Some(new Molecule(atoms, bonds))
  }

  /** InChI -> canonical SMILES through the standard pipeline (perceive
    * aromaticity, tautomer pick). None when unsupported.
    */
  def toCanonicalSmiles(inchi: String): Option[String] =
    parse(inchi).flatMap { m =>
      try Some(Chem.postsanitize(Smiles.write(Aromatize.perceive(m))))
      catch { case _: Exception => None }
    }
}
