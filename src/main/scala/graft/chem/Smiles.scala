package graft.chem

/** SMILES parser + canonical writer (pure Scala, zero-dependency).
  *
  * Supported: organic subset + bracket atoms (isotope, charge, H count,
  * wildcard `*`), aromatic lowercase atoms/bonds, branches, ring
  * closures (incl. %nn), dot-disconnected components, bond symbols
  * - = # : / \ (stereo bonds read as single; chirality marks dropped —
  * the reference strips stereo before hashing, pickaxe.py:307).
  *
  * Canonicalization: Morgan-style iterative partition refinement over
  * atom invariants, deterministic tie-breaking, then a DFS writer that
  * always visits lowest-rank neighbors first. Canonical SMILES is the
  * engine's compound identity (documented deviation from the
  * reference's InChIKey-block hash, utils.py:115-164).
  */
object Smiles {

  private val twoChar = Set("Cl", "Br")
  private val organic = Set("B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I")
  private val aromaticOrganic = Set("b", "c", "n", "o", "p", "s")

  final case class ParseException(msg: String) extends Exception(msg)

  def parse(s: String): Molecule = {
    val atoms = Vector.newBuilder[Atom]
    val bonds = Vector.newBuilder[Bond]
    var nAtoms = 0
    var prev = -1 // previous atom index (-1 = none, start of component)
    var pendingBond: Option[Char] = None
    val stack = scala.collection.mutable.Stack.empty[Int]
    val ringOpen = scala.collection.mutable.Map.empty[Int, (Int, Option[Char])]
    var i = 0

    val aromaticFlags = scala.collection.mutable.ArrayBuffer.empty[Boolean]

    def addAtom(a: Atom, aromaticAtom: Boolean): Unit = {
      val cur = nAtoms
      atoms += a
      nAtoms += 1
      if (prev >= 0) {
        val sym = pendingBond
        bonds += makeBond(prev, cur, sym, aromaticAtom && aromaticFlags(prev))
      }
      pendingBond = None
      prev = cur
    }

    def makeBond(a: Int, b: Int, sym: Option[Char], bothAromatic: Boolean): Bond =
      sym match {
        case Some('-') | Some('/') | Some('\\') => Bond(a, b, 1, aromatic = false)
        case Some('=') => Bond(a, b, 2, aromatic = false)
        case Some('#') => Bond(a, b, 3, aromatic = false)
        case Some(':') => Bond(a, b, 1, aromatic = true)
        case None => Bond(a, b, 1, aromatic = bothAromatic)
        case Some(c) => throw ParseException(s"bond '$c'")
      }

    def ringClosure(num: Int): Unit = ringOpen.remove(num) match {
      case None => ringOpen(num) = (prev, pendingBond); pendingBond = None
      case Some((other, sym0)) =>
        val sym = sym0.orElse(pendingBond)
        bonds += makeBond(other, prev, sym,
          aromaticFlags(other) && aromaticFlags(prev))
        pendingBond = None
    }

    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '(' => stack.push(prev); i += 1
        case ')' => prev = stack.pop(); i += 1
        case '.' => prev = -1; pendingBond = None; i += 1
        case '-' | '=' | '#' | ':' | '/' | '\\' =>
          pendingBond = Some(c); i += 1
        case '%' =>
          ringClosure(s.substring(i + 1, i + 3).toInt); i += 3
        case d if d.isDigit =>
          ringClosure(d - '0'); i += 1
        case '[' =>
          val close = s.indexOf(']', i)
          if (close < 0) throw ParseException(s"unclosed [ in $s")
          val (atom, arom) = parseBracket(s.substring(i + 1, close))
          aromaticFlags += arom
          addAtom(atom, arom)
          i = close + 1
        case _ =>
          val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
          if (twoChar(two)) {
            aromaticFlags += false
            addAtom(Atom(two), aromaticAtom = false); i += 2
          } else if (organic(c.toString)) {
            aromaticFlags += false
            addAtom(Atom(c.toString), aromaticAtom = false); i += 1
          } else if (aromaticOrganic(c.toString)) {
            aromaticFlags += true
            addAtom(Atom(c.toString.toUpperCase, aromatic = true),
              aromaticAtom = true)
            i += 1
          } else if (c == '*') {
            aromaticFlags += false
            addAtom(Atom("*"), aromaticAtom = false); i += 1
          } else throw ParseException(s"unexpected '$c' at $i in $s")
      }
    }
    if (ringOpen.nonEmpty)
      throw ParseException(s"unclosed ring bond(s) ${ringOpen.keys} in $s")
    new Molecule(atoms.result(), bonds.result())
  }

  /** Bracket atom body (without the []): isotope? symbol chiral? H? charge? map? */
  private def parseBracket(body: String): (Atom, Boolean) = {
    var i = 0
    var isotope = 0
    while (i < body.length && body.charAt(i).isDigit) {
      isotope = isotope * 10 + (body.charAt(i) - '0'); i += 1
    }
    var elem = ""
    var aromatic = false
    if (i < body.length && body.charAt(i) == '*') { elem = "*"; i += 1 }
    else {
      val rest = body.substring(i)
      val m = "^([A-Z][a-z]?|[a-z]{1,2})".r.findFirstIn(rest)
        .getOrElse(throw ParseException(s"bad bracket atom [$body]"))
      // two-letter lowercase aromatic (se, as) vs one-letter + trailing
      val sym =
        if (m.length == 2 && m.charAt(0).isLower && !Set("se", "as")(m)) m.substring(0, 1)
        else m
      aromatic = sym.charAt(0).isLower
      elem = if (aromatic) sym.capitalize else sym
      i += sym.length
    }
    // chirality (dropped)
    while (i < body.length && body.charAt(i) == '@') i += 1
    if (i < body.length && (body.substring(i).startsWith("TH") ||
        body.substring(i).startsWith("AL"))) i += 3 // @TH1 etc (rare)
    var h = 0
    if (i < body.length && body.charAt(i) == 'H') {
      i += 1; h = 1
      var d = 0
      while (i < body.length && body.charAt(i).isDigit) {
        d = d * 10 + (body.charAt(i) - '0'); i += 1
      }
      if (d > 0) h = d
    }
    var charge = 0
    while (i < body.length && (body.charAt(i) == '+' || body.charAt(i) == '-')) {
      val sign = if (body.charAt(i) == '+') 1 else -1
      i += 1
      var d = 0
      while (i < body.length && body.charAt(i).isDigit) {
        d = d * 10 + (body.charAt(i) - '0'); i += 1
      }
      charge += sign * (if (d > 0) d else 1)
    }
    // atom map (ignored in plain SMILES)
    if (i < body.length && body.charAt(i) == ':') i = body.length
    (Atom(elem, charge, aromatic, h, isotope), aromatic)
  }

  // ---------- canonical writer ----------

  /** Canonical ranks via iterative refinement; ties broken by doubling
    * ranks and bumping one atom of the first tied class (standard
    * canonical-labelling loop).
    */
  def canonicalRanks(m: Molecule): Array[Int] = {
    def refine(init: Array[Long]): Array[Int] = {
      var ranks = rankOf(init.zipWithIndex.map { case (v, i) => (Vector(v), i) })
      var changed = true
      while (changed) {
        val keys = Array.tabulate(m.n) { i =>
          (Vector(ranks(i).toLong) ++
            m.adj(i).map { case (j, bd) =>
              ranks(j).toLong * 8 + bd.order + (if (bd.aromatic) 4 else 0)
            }.sorted, i)
        }
        val next = rankOf(keys)
        changed = !next.sameElements(ranks)
        ranks = next
      }
      ranks
    }
    val invariant = Array.tabulate(m.n) { i =>
      val a = m.atoms(i)
      ((elemOrder(a.elem).toLong * 1000 + m.degree(i)) * 100 +
        (a.charge + 10)) * 100 + m.totalH(i) * 2 +
        (if (a.aromatic) 1 else 0)
    }
    var ranks = refine(invariant)
    // break remaining symmetry deterministically
    var distinct = ranks.distinct.length
    while (distinct < m.n) {
      val classes = ranks.zipWithIndex.groupBy(_._1)
      val (_, members) = classes.filter(_._2.length > 1)
        .minBy(_._1)
      val chosen = members.map(_._2).min
      val boosted = Array.tabulate(m.n) { i =>
        ranks(i).toLong * 2 + (if (i == chosen) 0 else 1)
      }
      ranks = refine(boosted)
      distinct = ranks.distinct.length
    }
    ranks
  }

  private def rankOf(keys: Array[(Vector[Long], Int)]): Array[Int] = {
    val sorted = keys.sortBy(_._1)(
      Ordering.Implicits.seqOrdering[Vector, Long])
    val out = Array.fill(keys.length)(0)
    var r = 0
    for (k <- sorted.indices) {
      if (k > 0 && sorted(k)._1 != sorted(k - 1)._1) r = k
      out(sorted(k)._2) = r
    }
    out
  }

  private val elemOrderSeq =
    Seq("C", "N", "O", "P", "S", "B", "F", "Cl", "Br", "I", "H", "*")
  private def elemOrder(e: String): Int = {
    val i = elemOrderSeq.indexOf(e)
    if (i >= 0) i else 50 + e.hashCode.abs % 40
  }

  /** Canonical SMILES of (all components of) the molecule; components
    * are sorted by their canonical strings and joined with '.'.
    */
  def write(m0: Molecule): String = {
    val m = m0.withoutExplicitH
    m.components
      .map(comp => writeComponent(m, comp))
      .sorted
      .mkString(".")
  }

  def canonical(smiles: String): String = write(parse(smiles))

  private def writeComponent(m: Molecule, comp: Vector[Int]): String = {
    val sub = m.induced(comp.sorted)
    val ranks = canonicalRanks(sub)
    val start = (0 until sub.n).minBy(ranks)
    val sb = new StringBuilder
    val visited = Array.fill(sub.n)(false)
    val ringNums = scala.collection.mutable.Map.empty[(Int, Int), Int]
    var nextRing = 1
    // pre-pass: find ring-closure bonds via DFS
    val treeBond = scala.collection.mutable.Set.empty[Bond]
    val closures = scala.collection.mutable.ArrayBuffer.empty[Bond]
    locally {
      val seen = Array.fill(sub.n)(false)
      def dfs(u: Int, from: Bond): Unit = {
        seen(u) = true
        for ((v, bd) <- sub.adj(u).sortBy(t => ranks(t._1)) if bd ne from) {
          if (!seen(v)) { treeBond += bd; dfs(v, bd) }
          else if (!treeBond(bd) && !closures.contains(bd)) closures += bd
        }
      }
      dfs(start, null)
    }
    val closureAt: Map[Int, Seq[Bond]] =
      (closures.flatMap(bd => Seq(bd.a -> bd, bd.b -> bd)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    def bondStr(bd: Bond, parentArom: Boolean, childArom: Boolean): String =
      if (bd.aromatic) ""
      else bd.order match {
        case 1 => if (parentArom && childArom) "-" else ""
        case 2 => "="
        case 3 => "#"
      }

    def atomStr(i: Int): String = {
      val a = sub.atoms(i)
      val h = if (a.hCount >= 0) a.hCount else -1
      val needBracket = a.elem == "*" || a.charge != 0 || a.isotope != 0 ||
        h >= 0 || !organic(a.elem)
      val sym = if (a.aromatic) a.elem.toLowerCase else a.elem
      if (!needBracket) sym
      else {
        val iso = if (a.isotope != 0) a.isotope.toString else ""
        val hs = if (h > 1) s"H$h" else if (h == 1) "H" else ""
        val ch =
          if (a.charge == 0) ""
          else if (a.charge == 1) "+"
          else if (a.charge == -1) "-"
          else if (a.charge > 1) s"+${a.charge}"
          else s"-${-a.charge}"
        s"[$iso$sym$hs$ch]"
      }
    }

    def emit(u: Int, parent: Int, parentBond: Bond): Unit = {
      visited(u) = true
      if (parentBond != null)
        sb ++= bondStr(parentBond, sub.atoms(parent).aromatic,
          sub.atoms(u).aromatic)
      sb ++= atomStr(u)
      // ring closure digits on this atom
      for (bd <- closureAt.getOrElse(u, Seq.empty)) {
        val key = (math.min(bd.a, bd.b), math.max(bd.a, bd.b))
        val num = ringNums.getOrElseUpdate(key, { val x = nextRing; nextRing += 1; x })
        val other = if (bd.a == u) bd.b else bd.a
        // bond symbol goes on the first (opening) occurrence only
        if (!visited(other))
          sb ++= bondStr(bd, sub.atoms(u).aromatic, sub.atoms(other).aromatic)
        sb ++= (if (num >= 10) s"%$num" else num.toString)
      }
      val children = sub.adj(u)
        .filter { case (v, bd) => treeBond(bd) && !visited(v) }
        .sortBy { case (v, _) => ranks(v) }
      for (((v, bd), k) <- children.zipWithIndex) {
        if (k < children.length - 1) {
          sb += '('; emit(v, u, bd); sb += ')'
        } else emit(v, u, bd)
      }
    }
    emit(start, -1, null)
    sb.toString
  }
}
