package graft.chem

/** SMARTS subset: parser + VF2-style subgraph matcher.
  *
  * Covers the primitives used by the reference's rule sets
  * (reference data: metacyc_rules TSVs and
  * tests/data/test_reaction_rules.tsv): `#n`, element symbols, `*`,
  * `A`/`a`, `Hn`, `Dn`, `Xn`, `Rn`, charge, `!`-negation, `,`-OR, `;`/`&`-AND
  * and juxtaposition, atom maps, bonds `- = # ~ :` and the default
  * single-or-aromatic bond, branches and ring-closure digits.
  */
object Smarts {

  sealed trait Prim
  final case class PElem(num: Int) extends Prim
  final case class PElemSym(sym: String, aromatic: Boolean) extends Prim
  case object PAny extends Prim
  case object PAliphatic extends Prim
  case object PAromatic extends Prim
  final case class PH(n: Int) extends Prim
  final case class PDegree(n: Int) extends Prim
  final case class PConn(n: Int) extends Prim
  final case class PRing(in: Boolean) extends Prim
  final case class PCharge(c: Int) extends Prim
  final case class PNot(p: Prim) extends Prim

  /** alts = OR of AND-groups. */
  final case class AtomPat(alts: Seq[Seq[Prim]], mapNum: Int)

  /** kind: 0 default (single-or-aromatic), 1 single, 2 double, 3 triple,
    * 4 aromatic, 5 any.
    */
  final case class BondPat(a: Int, b: Int, kind: Int)

  final class Pattern(val atoms: Vector[AtomPat], val bonds: Vector[BondPat]) {
    val adj: Vector[Vector[(Int, BondPat)]] = {
      val b = Vector.fill(atoms.length)(Vector.newBuilder[(Int, BondPat)])
      bonds.foreach { bd => b(bd.a) += ((bd.b, bd)); b(bd.b) += ((bd.a, bd)) }
      b.map(_.result())
    }
    def n: Int = atoms.length
  }

  val elemNum: Map[String, Int] = Map(
    "H" -> 1, "B" -> 5, "C" -> 6, "N" -> 7, "O" -> 8, "F" -> 9,
    "Na" -> 11, "Mg" -> 12, "Si" -> 14, "P" -> 15, "S" -> 16, "Cl" -> 17,
    "K" -> 19, "Ca" -> 20, "Mn" -> 25, "Fe" -> 26, "Co" -> 27, "Ni" -> 28,
    "Cu" -> 29, "Zn" -> 30, "As" -> 33, "Se" -> 34, "Br" -> 35, "I" -> 53)
  private val numElem = elemNum.map(_.swap)

  // ---------- parsing ----------

  /** Parse one SMARTS component (no '.'). */
  def parse(s: String): Pattern = {
    val atoms = Vector.newBuilder[AtomPat]
    val bonds = Vector.newBuilder[BondPat]
    var nAtoms = 0
    var prev = -1
    var pendingBond = -1 // -1 = unset
    val stack = scala.collection.mutable.Stack.empty[Int]
    val ringOpen = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var i = 0

    def addAtom(ap: AtomPat): Unit = {
      val cur = nAtoms
      atoms += ap; nAtoms += 1
      if (prev >= 0)
        bonds += BondPat(prev, cur, if (pendingBond < 0) 0 else pendingBond)
      pendingBond = -1
      prev = cur
    }
    def ringClosure(num: Int): Unit = ringOpen.remove(num) match {
      case None =>
        ringOpen(num) = (prev, pendingBond); pendingBond = -1
      case Some((other, k0)) =>
        val k = if (k0 >= 0) k0 else pendingBond
        bonds += BondPat(other, prev, if (k < 0) 0 else k)
        pendingBond = -1
    }

    while (i < s.length) {
      s.charAt(i) match {
        case '(' => stack.push(prev); i += 1
        case ')' => prev = stack.pop(); i += 1
        case '.' => prev = -1; pendingBond = -1; i += 1 // disconnected piece
        case '-' | '/' | '\\' => pendingBond = 1; i += 1
        case '=' => pendingBond = 2; i += 1
        case '#' => pendingBond = 3; i += 1
        case ':' => pendingBond = 4; i += 1
        case '~' => pendingBond = 5; i += 1
        case '%' => ringClosure(s.substring(i + 1, i + 3).toInt); i += 3
        case d if d.isDigit => ringClosure(d - '0'); i += 1
        case '[' =>
          val close = s.indexOf(']', i)
          require(close > 0, s"unclosed [ in $s")
          addAtom(parseAtomExpr(s.substring(i + 1, close)))
          i = close + 1
        case '*' => addAtom(AtomPat(Seq(Seq(PAny)), 0)); i += 1
        case 'A' => addAtom(AtomPat(Seq(Seq(PAliphatic)), 0)); i += 1
        case 'a' => addAtom(AtomPat(Seq(Seq(PAromatic)), 0)); i += 1
        case c =>
          val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
          if (two == "Cl" || two == "Br") {
            addAtom(AtomPat(Seq(Seq(PElemSym(two, aromatic = false))), 0)); i += 2
          } else if ("BCNOPSFI".contains(c)) {
            addAtom(AtomPat(Seq(Seq(PElemSym(c.toString, aromatic = false))), 0)); i += 1
          } else if ("bcnops".contains(c)) {
            addAtom(AtomPat(
              Seq(Seq(PElemSym(c.toString.toUpperCase, aromatic = true))), 0))
            i += 1
          } else sys.error(s"SMARTS: unexpected '$c' at $i in $s")
      }
    }
    new Pattern(atoms.result(), bonds.result())
  }

  /** `[...]` body: `;`-separated AND of `,`-separated OR of juxtaposed
    * primitive runs; trailing `:n` map.
    */
  def parseAtomExpr(body0: String): AtomPat = {
    val (body, mapNum) = body0.lastIndexOf(':') match {
      case k if k >= 0 && body0.substring(k + 1).forall(_.isDigit) &&
        body0.length > k + 1 =>
        (body0.substring(0, k), body0.substring(k + 1).toInt)
      case _ => (body0, 0)
    }
    // a;b,c;d  =>  AND(a, OR(b, c), d) — distribute into alternatives
    val andGroups: Seq[Seq[Seq[Prim]]] = body.split(';').toSeq
      .map(_.split(',').toSeq.map(parsePrimRun))
    // cartesian product of one alternative per AND group
    val alts = andGroups.foldLeft(Seq(Seq.empty[Prim])) { (acc, group) =>
      for (a <- acc; g <- group) yield a ++ g
    }
    AtomPat(alts, mapNum)
  }

  /** A juxtaposed primitive run like `#1D1AR0` or `H3D4` or `!H0`. */
  private def parsePrimRun(run0: String): Seq[Prim] = {
    val out = Seq.newBuilder[Prim]
    val run = run0.replace("&", "") // & is just high-precedence AND
    var i = 0
    def num(default: Int): Int = {
      var d = -1
      while (i < run.length && run.charAt(i).isDigit) {
        d = (if (d < 0) 0 else d) * 10 + (run.charAt(i) - '0'); i += 1
      }
      if (d < 0) default else d
    }
    while (i < run.length) {
      var negate = false
      while (i < run.length && run.charAt(i) == '!') { negate = true; i += 1 }
      val p: Prim = run.charAt(i) match {
        case '#' => i += 1; PElem(num(0))
        case '*' => i += 1; PAny
        case 'A' => i += 1; PAliphatic
        case 'a' => i += 1; PAromatic
        case 'H' => i += 1; PH(num(1))
        case 'D' => i += 1; PDegree(num(1))
        case 'R' => i += 1; val k = num(-1); PRing(k != 0)
        case 'X' => i += 1; PConn(num(1))
        case '+' => i += 1; PCharge(num(1))
        case '-' => i += 1; PCharge(-num(1))
        case c =>
          val two = if (i + 1 < run.length) run.substring(i, i + 2) else ""
          if (elemNum.contains(two)) { i += 2; PElemSym(two, aromatic = false) }
          else if (c.isUpper && elemNum.contains(c.toString)) {
            i += 1; PElemSym(c.toString, aromatic = false)
          } else if (c.isLower && elemNum.contains(c.toString.capitalize)) {
            i += 1; PElemSym(c.toString.capitalize, aromatic = true)
          } else sys.error(s"SMARTS primitive: '$c' in [$run0]")
      }
      out += (if (negate) PNot(p) else p)
    }
    out.result()
  }

  // ---------- matching ----------

  def atomMatches(m: Molecule, i: Int, ap: AtomPat): Boolean =
    ap.alts.exists(_.forall(p => primMatches(m, i, p)))

  private def primMatches(m: Molecule, i: Int, p: Prim): Boolean = {
    val a = m.atoms(i)
    p match {
      case PNot(q) => !primMatches(m, i, q)
      case PAny => true
      case PElem(num) => numElem.get(num).contains(a.elem)
      case PElemSym(sym, arom) => a.elem == sym && a.aromatic == arom
      case PAliphatic => !a.aromatic
      case PAromatic => a.aromatic
      case PH(nH) => m.totalH(i) == nH
      case PDegree(d) => m.degree(i) == d
      // total connectivity: explicit neighbors (incl. explicit-H atoms,
      // already in degree) + the atom's own bracket/implicit H
      case PConn(x) =>
        val ownH = if (m.atoms(i).hCount >= 0) m.atoms(i).hCount
          else m.implicitH(i)
        m.degree(i) + ownH == x
      case PRing(in) => m.inRing(i) == in
      case PCharge(c) => a.charge == c
    }
  }

  def bondMatches(bd: Bond, bp: BondPat): Boolean = bp.kind match {
    case 0 => (bd.order == 1 && !bd.aromatic) || bd.aromatic
    case 1 => bd.order == 1 && !bd.aromatic
    case 2 => bd.order == 2 && !bd.aromatic
    case 3 => bd.order == 3 && !bd.aromatic
    case 4 => bd.aromatic
    case 5 => true
  }

  /** All embeddings of `pat` in `m`: arrays mapping pattern atom index ->
    * molecule atom index (injective). Deterministic order.
    */
  def findAll(m: Molecule, pat: Pattern, limit: Int = 20000): Seq[Array[Int]] = {
    if (pat.n == 0) return Seq.empty
    val out = Seq.newBuilder[Array[Int]]
    var count = 0
    // match order: pattern atoms in a connectivity-first order
    val order = {
      val seen = Array.fill(pat.n)(false)
      val ord = Vector.newBuilder[Int]
      def visit(u: Int): Unit = {
        seen(u) = true; ord += u
        pat.adj(u).foreach { case (v, _) => if (!seen(v)) visit(v) }
      }
      (0 until pat.n).foreach(u => if (!seen(u)) visit(u))
      ord.result()
    }
    val assign = Array.fill(pat.n)(-1)
    val used = Array.fill(m.n)(false)

    def bt(k: Int): Unit = {
      if (count >= limit) return
      if (k == pat.n) { out += assign.clone(); count += 1; return }
      val pu = order(k)
      // candidates: constrained by any already-assigned pattern neighbor
      val anchored = pat.adj(pu).collectFirst {
        case (pv, bp) if assign(pv) >= 0 => (pv, bp)
      }
      val candidates: Seq[Int] = anchored match {
        case Some((pv, _)) => m.adj(assign(pv)).map(_._1)
        case None => 0 until m.n
      }
      for (mi <- candidates if !used(mi) && atomMatches(m, mi, pat.atoms(pu))) {
        // every pattern edge to assigned atoms must exist + match
        val ok = pat.adj(pu).forall { case (pv, bp) =>
          assign(pv) < 0 || m.adj(mi).exists { case (mj, bd) =>
            mj == assign(pv) && bondMatches(bd, bp)
          }
        }
        if (ok) {
          assign(pu) = mi; used(mi) = true
          bt(k + 1)
          assign(pu) = -1; used(mi) = false
        }
      }
    }
    bt(0)
    out.result()
  }
}
