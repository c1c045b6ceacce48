package graft.chem

/** Reaction-SMARTS application — the expansion kernel's chemistry
  * (reference: RunReactants at reactions.py:170, product construction
  * reactions.py:44-220).
  *
  * Semantics implemented (RDKit-compatible subset):
  *  - reactant template component i matches molecule i (role order);
  *  - all embeddings enumerated; each combination yields one product set;
  *  - product template: mapped atoms are copied from their matched source
  *    atoms; bonds BETWEEN two template atoms are exactly the product
  *    template's bonds; bonds from a template atom to unmatched source
  *    atoms (and among unmatched atoms) are preserved, i.e. every
  *    unmatched fragment travels with its mapped anchor;
  *  - matched atoms whose map number appears in no product are dropped.
  */
object ReactionRule {

  final case class Parsed(
      reactants: Vector[Smarts.Pattern],
      products: Vector[Smarts.Pattern])

  /** Split a SMARTS side into `.`-components (depth-0 only). A component
    * wrapped in component-grouping parens `(A.B)` stays ONE component
    * whose pieces must all match within the same molecule — the parens
    * are stripped and the inner dots handled by the pattern parser as a
    * disconnected pattern graph.
    */
  private def splitComponents(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    val sb = new StringBuilder
    for (c <- s) c match {
      case '(' => depth += 1; sb += c
      case ')' => depth -= 1; sb += c
      case '.' if depth == 0 => out += sb.toString; sb.clear()
      case _ => sb += c
    }
    out += sb.toString
    out.result().map { comp =>
      // strip grouping parens only when they wrap the whole component
      if (comp.startsWith("(") && comp.endsWith(")")) {
        var d = 0; var wraps = true
        for ((c, i) <- comp.zipWithIndex) {
          if (c == '(') d += 1
          else if (c == ')') { d -= 1; if (d == 0 && i < comp.length - 1) wraps = false }
        }
        if (wraps) comp.substring(1, comp.length - 1) else comp
      } else comp
    }
  }

  def parse(rxnSmarts: String): Parsed = {
    val Array(lhs, rhs) = rxnSmarts.split(">>", 2)
    Parsed(
      splitComponents(lhs).map(Smarts.parse),
      splitComponents(rhs).map(Smarts.parse))
  }

  /** One product set = the product molecules (implicit-H, canonical-ready)
    * for one combination of embeddings.
    */
  def run(
      rule: Parsed,
      mols: Seq[Molecule],
      maxProducts: Int = 10000): Seq[Seq[Molecule]] = {
    require(rule.reactants.length == mols.length,
      s"rule arity ${rule.reactants.length} != ${mols.length} molecules")
    // embeddings per component
    val embeddings: Seq[Seq[Array[Int]]] =
      rule.reactants.zip(mols).map { case (pat, mol) => Smarts.findAll(mol, pat) }
    if (embeddings.exists(_.isEmpty)) return Seq.empty

    // LAZY cartesian product of per-component embeddings: maxProducts
    // must bound the work, not just truncate an eagerly-built Seq
    // (two promiscuous templates could otherwise build millions of
    // combos before the cap applied)
    def combos(idx: Int): Iterator[Vector[Array[Int]]] =
      if (idx == embeddings.length) Iterator.single(Vector.empty)
      else embeddings(idx).iterator.flatMap(e => combos(idx + 1).map(e +: _))

    combos(0).take(maxProducts)
      .flatMap { combo => applyOnce(rule, mols, combo) }
      .toSeq
  }

  /** Apply one embedding combination; None if the rewrite is degenerate
    * (a product would be empty or grab a whole unmatched reactant).
    */
  private def applyOnce(
      rule: Parsed,
      mols: Seq[Molecule],
      combo: Vector[Array[Int]]): Option[Seq[Molecule]] = {
    // map number -> (molIdx, atomIdx); matched atom set per molecule
    val mapTo = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    val matched: Array[Set[Int]] = Array.fill(mols.length)(Set.empty)
    for (ci <- rule.reactants.indices) {
      val pat = rule.reactants(ci)
      val emb = combo(ci)
      for (pi <- 0 until pat.n) {
        matched(ci) += emb(pi)
        val mn = pat.atoms(pi).mapNum
        if (mn > 0) mapTo(mn) = (ci, emb(pi))
      }
    }
    val products = rule.products.map { ppat =>
      buildProduct(ppat, mols, mapTo.toMap, matched)
    }
    if (products.exists(_.isEmpty)) None else Some(products.map(_.get))
  }

  /** Template atom's positive H-count spec (single-alternative,
    * un-negated), if any — RDKit sets the product atom's H count from it.
    */
  private def hSpec(ap: Smarts.AtomPat): Option[Int] =
    ap.alts match {
      case Seq(conj) => conj.collectFirst { case Smarts.PH(h) => h }
      case _ => None
    }

  /** Template atom's positive charge spec, if any (e.g. `[#7+0:7]`). */
  private def chargeSpec(ap: Smarts.AtomPat): Option[Int] =
    ap.alts match {
      case Seq(conj) => conj.collectFirst { case Smarts.PCharge(c) => c }
      case _ => None
    }

  /** Max allowed total valence (bonds + H) per element/charge — the
    * RDKit SanitizeMol "Explicit valence greater than permitted" gate
    * (reactions.py:132-138: invalid products are thrown out).
    */
  private def maxValence(elem: String, charge: Int): Int = elem match {
    case "C" => 4 - math.abs(charge)
    case "N" => 3 + charge
    case "O" => 2 + charge
    case "P" => 5
    case "S" => 6
    case "B" => 3
    case "H" => 1
    case "F" | "Cl" | "Br" | "I" => if (charge == 0) 1 else 2
    case _ => Int.MaxValue // metals etc.: no organic valence model
  }

  /** RDKit-style validity: reject a product when any non-aromatic atom's
    * H + bond-order sum exceeds its allowed valence. Aromatic-bonded
    * atoms are skipped (their H was set by coordination preservation;
    * 1.5-order sums don't fit the integer valence model).
    */
  private def validValences(m: Molecule): Boolean =
    (0 until m.n).forall { i =>
      val a = m.atoms(i)
      m.adj(i).exists(_._2.aromatic) || {
        val bs = m.bondOrderSum(i)
        val own = if (a.hCount >= 0) a.hCount else m.implicitH(i)
        own + bs <= maxValence(a.elem, a.charge) + 1e-9
      }
    }

  private def buildProduct(
      ppat: Smarts.Pattern,
      mols: Seq[Molecule],
      mapTo: Map[Int, (Int, Int)],
      matched: Array[Set[Int]]): Option[Molecule] = {
    val newAtoms = Vector.newBuilder[Atom]
    val newBonds = Vector.newBuilder[Bond]
    // (molIdx, atomIdx) -> new index
    val newIdx = scala.collection.mutable.Map.empty[(Int, Int), Int]
    var n = 0
    def copyAtom(mi: Int, ai: Int): Int =
      newIdx.getOrElseUpdate((mi, ai), {
        // copy as-is: bracket atoms keep their fixed H; implicit atoms
        // stay derivable (-1) so H counts re-adjust to the NEW bonding,
        // exactly like RDKit implicit-H recomputation after RunReactants
        newAtoms += mols(mi).atoms(ai)
        n += 1
        n - 1
      })

    // 1. template atoms
    val templateSrc = ppat.atoms.map { ap =>
      mapTo.get(ap.mapNum) match {
        case Some((mi, ai)) => (mi, ai)
        case None => return None // unmapped product atom unsupported
      }
    }
    templateSrc.foreach { case (mi, ai) => copyAtom(mi, ai) }

    // 2. template bonds (exactly as written; default kind -> single)
    for (bp <- ppat.bonds) {
      val (ma, aa) = templateSrc(bp.a)
      val (mb, ab) = templateSrc(bp.b)
      val order = bp.kind match {
        case 2 => 2
        case 3 => 3
        case _ => 1
      }
      val aromatic = bp.kind == 4
      newBonds += Bond(newIdx((ma, aa)), newIdx((mb, ab)), order, aromatic)
    }

    // 3. carry unmatched fragments attached to this product's atoms
    val queue = scala.collection.mutable.Queue(templateSrc: _*)
    val inProduct = scala.collection.mutable.Set(templateSrc: _*)
    val addedBonds = scala.collection.mutable.Set.empty[(Int, Int, Int)]
    while (queue.nonEmpty) {
      val (mi, ai) = queue.dequeue()
      for ((nj, bd) <- mols(mi).adj(ai)) {
        val tgt = (mi, nj)
        if (!matched(mi)(nj)) {
          // unmatched neighbor: atom + bond travel with the anchor
          if (!inProduct(tgt)) { inProduct += tgt; queue += tgt }
          val key = (mi, math.min(ai, nj), math.max(ai, nj))
          if (!addedBonds(key)) {
            addedBonds += key
            newBonds += Bond(newIdx((mi, ai)), copyAtom(mi, nj),
              bd.order, bd.aromatic)
          }
        }
        // matched-matched bonds: controlled by the product template (2.)
      }
    }

    // 4. H/charge/aromaticity adjustment (RDKit product semantics):
    //    - template H / charge specs are applied verbatim;
    //    - bracket source atoms keep their fixed H (RDKit noImplicit);
    //    - implicit atoms that STILL sit in an aromatic system preserve
    //      their coordination number (a pyrrole-type N that lost its
    //      substituent regains an H — the reference reaches the same
    //      state via utils.postsanitize_smiles' pyrrole H flip);
    //    - other implicit atoms re-derive H from the new bonding;
    //    - atoms left without aromatic bonds lose the aromatic flag
    //      (a template that writes Kekule bonds de-aromatizes).
    val atomsArr = newAtoms.result().toArray
    val bondsV = newBonds.result()
    val newDeg = Array.fill(atomsArr.length)(0)
    val hasArom = Array.fill(atomsArr.length)(false)
    bondsV.foreach { bd =>
      newDeg(bd.a) += 1; newDeg(bd.b) += 1
      if (bd.aromatic) { hasArom(bd.a) = true; hasArom(bd.b) = true }
    }
    for (ti <- ppat.atoms.indices) {
      val (mi, ai) = templateSrc(ti)
      val ni = newIdx((mi, ai))
      val src = mols(mi).atoms(ai)
      var a = atomsArr(ni)
      chargeSpec(ppat.atoms(ti)).foreach(c => a = a.copy(charge = c))
      hSpec(ppat.atoms(ti)) match {
        case Some(h) => a = a.copy(hCount = h)
        case None if src.hCount >= 0 => // bracket: fixed count kept
        case None if src.aromatic && hasArom(ni) =>
          val keep = mols(mi).degree(ai) + mols(mi).implicitH(ai) - newDeg(ni)
          a = a.copy(hCount = math.max(0, keep))
        case None => a = a.copy(hCount = -1)
      }
      // a template atom's aromaticity follows its PRODUCT bonds: writing
      // `:` bonds aromatizes (NAD reduction reverse), writing Kekule
      // bonds de-aromatizes — matching RDKit's product sanitization
      atomsArr(ni) = a.copy(aromatic = hasArom(ni))
    }
    val mol = new Molecule(atomsArr.toVector, bondsV)
    // valence + kekulizability gates = RDKit SanitizeMol rejection
    if (mol.n == 0 || !validValences(mol) || !Kekulize.kekulizable(mol)) None
    else Some(mol)
  }
}
