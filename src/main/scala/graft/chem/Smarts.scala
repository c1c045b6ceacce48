package graft.chem

/** SMARTS subset: parser + VF2-style subgraph matcher.
  *
  * Covers the primitives used by the reference's rule sets
  * (reference data: metacyc_rules + original_rules/BNICE TSVs and
  * tests/data/test_reaction_rules.tsv): `#n`, element symbols, `*`,
  * `A`/`a`, `Hn`, `Dn`, `Xn`, `Rn`, `r<n>` (ring size), charge,
  * `h<n>` (own-H count), `v<n>` (valence), `!`-negation, `,`-OR,
  * `;`/`&`-AND and juxtaposition, atom maps, recursive SMARTS
  * `$(...)` (anchored sub-pattern), chirality primitives as no-ops
  * (stereo is stripped on parse, like the reference — pickaxe.py:307),
  * bond EXPRESSIONS over `- = # ~ :` plus `@`/`!@` ring membership
  * with the same `,`/`;` logic (`-;!@`, `=;@`, `-,:`), the default
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
  /** `h<n>`: the atom's OWN hydrogen count (bracket/implicit), not
    * counting explicit H-atom neighbors.
    */
  final case class PImplH(n: Int) extends Prim
  /** `v<n>`: total valence — bond order sum plus own hydrogens. */
  final case class PValence(n: Int) extends Prim
  final case class PDegree(n: Int) extends Prim
  final case class PConn(n: Int) extends Prim
  final case class PRing(in: Boolean) extends Prim
  final case class PRingSize(k: Int) extends Prim
  final case class PCharge(c: Int) extends Prim
  final case class PNot(p: Prim) extends Prim
  /** Recursive SMARTS `$(...)`: the atom matches iff it can be the
    * FIRST atom of an embedding of the sub-pattern (Daylight §4.2).
    */
  final case class PRecursive(pat: Pattern) extends Prim

  /** alts = OR of AND-groups. */
  final case class AtomPat(alts: Seq[Seq[Prim]], mapNum: Int)

  /** A bond pattern is an OR over (kind, ring) alternatives.
    *
    * kind: 0 default (single-or-aromatic), 1 single, 2 double,
    * 3 triple, 4 aromatic, 5 any. ring: 0 unconstrained, 1 must be a
    * ring bond (`@`), -1 must not be (`!@`). `kind` (the first
    * alternative's order) is what product-template writers read — an
    * OR-bond in a product template resolves to its first listed order,
    * and ring constraints are matcher-only.
    */
  final case class BondPat(a: Int, b: Int, alts: Seq[(Int, Int)]) {
    def kind: Int = alts.head._1
  }
  object BondPat {
    def apply(a: Int, b: Int, kind: Int): BondPat =
      BondPat(a, b, Seq((kind, 0)))
  }

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
    "Cu" -> 29, "Zn" -> 30, "As" -> 33, "Se" -> 34, "Br" -> 35, "I" -> 53,
    "He" -> 2, "Li" -> 3, "Al" -> 13, "Hf" -> 72, "Ho" -> 67, "Hg" -> 80)
  private val numElem = elemNum.map(_.swap)

  // ---------- parsing ----------

  /** Characters that can occur inside a bond expression between atoms. */
  private val bondChars = "-=#:~@!;,/\\".toSet

  /** Parse a bond-expression token (e.g. `-`, `=;@`, `-;!@`, `-,:`,
    * `!@`) into (kind, ring) alternatives: `;` = AND over constraint
    * groups, `,` = OR inside a group; order and ring constraints merge
    * across AND groups. A pure ring constraint (`@` / `!@` with no
    * order primitive) leaves the order unconstrained (kind 5).
    */
  private[chem] def parseBondExpr(tok: String): Seq[(Int, Int)] = {
    // Internal form during parsing: (allowed order set or None for
    // unconstrained, ring constraint). AND intersects the order sets —
    // so a negated primitive (!-, != — the complement set {2,3,4} /
    // {1,3,4}) composed with another order primitive keeps the
    // negation instead of being overwritten. !~ matches no bond and is
    // rejected at parse time with a clear message.
    type Alt = (Option[Set[Int]], Int)
    def prim(p: String): Alt = p match {
      case "-" | "/" | "\\" => (Some(Set(1)), 0)
      case "=" => (Some(Set(2)), 0)
      case "#" => (Some(Set(3)), 0)
      case ":" => (Some(Set(4)), 0)
      case "~" => (None, 0)
      case "@" => (None, 1)
      case "!@" => (None, -1)
      case "!-" | "!/" | "!\\" => (Some(Set(2, 3, 4)), 0)
      case "!=" => (Some(Set(1, 3, 4)), 0)
      case "!#" => (Some(Set(1, 2, 4)), 0)
      case "!:" => (Some(Set(1, 2, 3)), 0)
      case "!~" => sys.error(
        s"SMARTS bond '!~' matches no bond (in $tok) — rejected at parse")
      case other => sys.error(
        s"unsupported SMARTS bond primitive '$other' in '$tok'")
    }
    // AND of two constraints: intersect order sets; ring constraints
    // must agree (a @;!@ contradiction yields an empty alternative)
    def and(a: Alt, b: Alt): Option[Alt] = {
      val orders = (a._1, b._1) match {
        case (None, o) => o
        case (o, None) => o
        case (Some(x), Some(y)) => Some(x.intersect(y))
      }
      if (orders.exists(_.isEmpty)) None
      else if (a._2 != 0 && b._2 != 0 && a._2 != b._2) None
      else Some((orders, if (b._2 != 0) b._2 else a._2))
    }
    def splitPrims(group: String): Seq[Alt] = {
      // a ','-alternative may itself juxtapose primitives (rare); scan
      // one primitive at a time, ANDing as we go
      var acc: Option[Alt] = Some((None, 0))
      var j = 0
      while (j < group.length) {
        val len = if (group.charAt(j) == '!') 2 else 1
        val p = prim(group.substring(j, j + len))
        j += len
        acc = acc.flatMap(and(_, p))
      }
      acc.toSeq
    }
    val groups: Seq[Seq[Alt]] = tok.split(';').toSeq
      .filter(_.nonEmpty).map(_.split(',').toSeq.flatMap(splitPrims))
    // AND across groups: cartesian, one alternative per group
    val alts = groups.foldLeft(Seq[Alt]((None, 0))) { (acc, g) =>
      for (a <- acc; b <- g; m <- and(a, b)) yield m
    }
    // expand to the matcher's (kind, ring) alternatives: an
    // unconstrained order is kind 5 (any); a constrained set fans out
    alts.flatMap {
      case (None, r) => Seq((5, r))
      case (Some(os), r) => os.toSeq.sorted.map(o => (o, r))
    }.distinct
  }

  /** Parse one SMARTS component (no '.'). */
  def parse(s: String): Pattern = {
    val atoms = Vector.newBuilder[AtomPat]
    val bonds = Vector.newBuilder[BondPat]
    var nAtoms = 0
    var prev = -1
    var pendingBond: Seq[(Int, Int)] = null // null = unset
    val stack = scala.collection.mutable.Stack.empty[Int]
    val ringOpen =
      scala.collection.mutable.Map.empty[Int, (Int, Seq[(Int, Int)])]
    var i = 0

    def addAtom(ap: AtomPat): Unit = {
      val cur = nAtoms
      atoms += ap; nAtoms += 1
      if (prev >= 0)
        bonds += BondPat(prev, cur,
          if (pendingBond == null) Seq((0, 0)) else pendingBond)
      pendingBond = null
      prev = cur
    }
    def ringClosure(num: Int): Unit = ringOpen.remove(num) match {
      case None =>
        ringOpen(num) = (prev, pendingBond); pendingBond = null
      case Some((other, k0)) =>
        val k = if (k0 != null) k0 else pendingBond
        bonds += BondPat(other, prev, if (k == null) Seq((0, 0)) else k)
        pendingBond = null
    }

    while (i < s.length) {
      s.charAt(i) match {
        case '(' => stack.push(prev); i += 1
        case ')' => prev = stack.pop(); i += 1
        case '.' => prev = -1; pendingBond = null; i += 1 // disconnected
        case c if bondChars(c) =>
          var j = i
          while (j < s.length && bondChars(s.charAt(j))) j += 1
          pendingBond = parseBondExpr(s.substring(i, j))
          i = j
        case '%' => ringClosure(s.substring(i + 1, i + 3).toInt); i += 3
        case d if d.isDigit => ringClosure(d - '0'); i += 1
        case '[' =>
          // ']' search must respect nesting: recursive SMARTS $(...)
          // may contain bracket atoms of its own
          var depth = 1; var j = i + 1
          while (j < s.length && depth > 0) {
            s.charAt(j) match {
              case '[' => depth += 1
              case ']' => depth -= 1
              case _ =>
            }
            j += 1
          }
          require(depth == 0, s"unclosed [ in $s")
          addAtom(parseAtomExpr(s.substring(i + 1, j - 1)))
          i = j
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
  def parseAtomExpr(body00: String): AtomPat = {
    // extract recursive-SMARTS $(...) blocks FIRST (they may contain
    // ':' ';' ',' that would confuse the map-strip and logic splits),
    // replacing each with a \u0001<idx> placeholder
    val recs = Vector.newBuilder[Pattern]
    val sb = new StringBuilder
    var nRec = 0
    var p = 0
    while (p < body00.length) {
      if (body00.charAt(p) == '$' && p + 1 < body00.length &&
        body00.charAt(p + 1) == '(') {
        var depth = 1; var j = p + 2
        while (j < body00.length && depth > 0) {
          body00.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          j += 1
        }
        require(depth == 0, s"SMARTS: unbalanced '$$(' in [$body00]")
        recs += parse(body00.substring(p + 2, j - 1))
        sb.append('\u0001').append(nRec)
        nRec += 1
        p = j
      } else { sb.append(body00.charAt(p)); p += 1 }
    }
    val body0 = sb.toString
    val recPats = recs.result()

    val (body, mapNum) = body0.lastIndexOf(':') match {
      case k if k >= 0 && body0.substring(k + 1).forall(_.isDigit) &&
        body0.length > k + 1 =>
        (body0.substring(0, k), body0.substring(k + 1).toInt)
      case _ => (body0, 0)
    }
    // [H...] with H as the very first primitive is the hydrogen ATOM
    // (Daylight/RDKit special case — e.g. the BNICE explicit-H pattern
    // [H;D1R0:18]); everywhere else H<n> is the hydrogen-count query.
    // Bodies that start with a two-letter element symbol (He, Hg, Hf,
    // Ho) are element queries, not the H-atom special case.
    val body1 =
      if (body.startsWith("H") &&
        (body.length == 1 || !body.charAt(1).isDigit) &&
        !(body.length >= 2 && elemNum.contains(body.take(2)))) "#1" + body.tail
      else body
    // a;b,c;d  =>  AND(a, OR(b, c), d) — distribute into alternatives
    val andGroups: Seq[Seq[Seq[Prim]]] = body1.split(';').toSeq
      .map(_.split(',').toSeq.map(r => parsePrimRun(r, recPats)))
    // cartesian product of one alternative per AND group
    val alts = andGroups.foldLeft(Seq(Seq.empty[Prim])) { (acc, group) =>
      for (a <- acc; g <- group) yield a ++ g
    }
    AtomPat(alts, mapNum)
  }

  /** A juxtaposed primitive run like `#1D1AR0` or `H3D4` or `!H0`;
    * `recPats` resolves the `\u0001<idx>` placeholders parseAtomExpr
    * substituted for recursive-SMARTS blocks.
    */
  private def parsePrimRun(
      run0: String,
      recPats: Vector[Pattern] = Vector.empty): Seq[Prim] = {
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
      // two-letter element symbols (He, Hg, As, Co, ...) take
      // precedence over single-char primitive juxtapositions — the
      // Daylight bracket-atom rule; without this [He] would parse as
      // H-count + garbage and [As] as aliphatic + aromatic-S
      val two = if (i + 1 < run.length) run.substring(i, i + 2) else ""
      val p: Prim = if (two.length == 2 && two.charAt(0).isUpper &&
        two.charAt(1).isLower && elemNum.contains(two)) {
        i += 2; PElemSym(two, aromatic = false)
      } else run.charAt(i) match {
        case '#' => i += 1; PElem(num(0))
        case '*' => i += 1; PAny
        case 'A' => i += 1; PAliphatic
        case 'a' => i += 1; PAromatic
        case 'H' => i += 1; PH(num(1))
        case 'D' => i += 1; PDegree(num(1))
        case 'R' => i += 1; val k = num(-1); PRing(k != 0)
        case 'r' => i += 1; val k = num(-1)
          if (k < 0) PRing(true) else PRingSize(k)
        case '\u0001' => i += 1; PRecursive(recPats(num(0)))
        case 'h' => i += 1; PImplH(num(1))
        case 'v' => i += 1; PValence(num(1))
        case '@' =>
          // chirality primitive: the kernel strips stereo on parse
          // (like the reference, pickaxe.py:307), so @/@@ match any
          // atom — RDKit's own useChirality=false behavior
          i += 1
          if (i < run.length && run.charAt(i) == '@') i += 1
          if (i < run.length && run.charAt(i) == '?') i += 1
          PAny
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
      case PRingSize(k) => m.atomRingSizes(i).contains(k)
      case PCharge(c) => a.charge == c
      case PImplH(nH) =>
        (if (a.hCount >= 0) a.hCount else m.implicitH(i)) == nH
      case PValence(v) =>
        val ownH = if (a.hCount >= 0) a.hCount else m.implicitH(i)
        val hasArom = m.adj(i).exists(_._2.aromatic)
        val total =
          if (!hasArom) math.round(m.bondOrderSum(i)).toInt + ownH
          else {
            // kekulized valence without kekulizing: σ bonds (aromatic
            // = 1) + own H + the atom's π need (0 or 1 — whether the
            // kekulé structure puts a double bond on it). Benzene C:
            // 2+1+1=4; naphthalene fusion C: 3+0+1=4; pyrrole NH:
            // 2+1+0=3; furan O: 2+0+0=2 — all RDKit's numbers, which
            // the 1.5-per-aromatic-bond rounding got wrong.
            val sigma = m.adj(i).map { case (_, bd) =>
              if (bd.aromatic) 1 else bd.order
            }.sum
            val piNeed = Kekulize.allowedValence(a.elem, a.charge)
              .map(av => math.max(0, math.min(1, av - sigma - ownH)))
              .getOrElse(0)
            sigma + ownH + piNeed
          }
        total == v
      case PRecursive(sub) => findAll(m, sub, limit = 1, anchor = i).nonEmpty
    }
  }

  private def orderMatches(bd: Bond, kind: Int): Boolean = kind match {
    case 0 => (bd.order == 1 && !bd.aromatic) || bd.aromatic
    case 1 => bd.order == 1 && !bd.aromatic
    case 2 => bd.order == 2 && !bd.aromatic
    case 3 => bd.order == 3 && !bd.aromatic
    case 4 => bd.aromatic
    case 5 => true
  }

  def bondMatches(m: Molecule, bd: Bond, bp: BondPat): Boolean =
    bp.alts.exists { case (kind, ring) =>
      orderMatches(bd, kind) &&
        (ring == 0 || m.bondInRing(bd) == (ring > 0))
    }

  /** All embeddings of `pat` in `m`: arrays mapping pattern atom index ->
    * molecule atom index (injective). Deterministic order. `anchor`
    * (for recursive SMARTS) pins pattern atom 0 to that molecule atom.
    */
  def findAll(
      m: Molecule,
      pat: Pattern,
      limit: Int = 20000,
      anchor: Int = -1): Seq[Array[Int]] = {
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
      val candidates: Seq[Int] =
        if (k == 0 && anchor >= 0 && pu == 0) Seq(anchor)
        else anchored match {
          case Some((pv, _)) => m.adj(assign(pv)).map(_._1)
          case None => 0 until m.n
        }
      for (mi <- candidates if !used(mi) && atomMatches(m, mi, pat.atoms(pu))) {
        // every pattern edge to assigned atoms must exist + match
        val ok = pat.adj(pu).forall { case (pv, bp) =>
          assign(pv) < 0 || m.adj(mi).exists { case (mj, bd) =>
            mj == assign(pv) && bondMatches(m, bd, bp)
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
