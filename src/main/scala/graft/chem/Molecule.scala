package graft.chem

/** Minimal molecular graph for the pure-Scala chemistry kernel.
  *
  * The environment provides no JVM chemistry library (SURVEY.md §7), so
  * the engine's "chemistry UDF kernel" is this zero-dependency model:
  * enough SMILES/SMARTS semantics for the reference's rule fixtures
  * (/root/reference/tests/data/test_reaction_rules.tsv) and data files.
  * Stereochemistry is stripped on parse — the reference also strips
  * stereo before hashing (pickaxe.py:307).
  *
  * Hydrogen model: bracket atoms carry an explicit H count; organic-
  * subset atoms derive implicit H from default valence minus the bond
  * order sum (aromatic bonds count 1.5, as in the SMILES spec).
  */
final case class Atom(
    elem: String,
    charge: Int = 0,
    aromatic: Boolean = false,
    hCount: Int = -1, // -1 = derive implicit H; >= 0 = fixed (bracket)
    isotope: Int = 0)

/** order: 1, 2, 3; aromatic bonds have order 1 + aromatic=true. */
final case class Bond(a: Int, b: Int, order: Int, aromatic: Boolean)

final class Molecule(val atoms: Vector[Atom], val bonds: Vector[Bond])
    extends Serializable {

  val n: Int = atoms.length

  /** adjacency: atom index -> Vector of (neighbor index, bond). */
  val adj: Vector[Vector[(Int, Bond)]] = {
    val b = Vector.fill(n)(Vector.newBuilder[(Int, Bond)])
    bonds.foreach { bd => b(bd.a) += ((bd.b, bd)); b(bd.b) += ((bd.a, bd)) }
    b.map(_.result())
  }

  def degree(i: Int): Int = adj(i).length

  /** (min, max) endpoint keys of bridge edges (one DFS); every
    * non-bridge edge lies on a cycle. Parallel bonds between the same
    * atom pair cannot occur, so the key identifies the bond.
    */
  private lazy val bridgeKeys: Set[(Int, Int)] = {
    val disc = Array.fill(n)(-1); val low = Array.fill(n)(0)
    val out = scala.collection.mutable.Set.empty[(Int, Int)]
    var time = 0
    def dfs(u: Int, parentBond: Bond): Unit = {
      disc(u) = time; low(u) = time; time += 1
      for ((v, bd) <- adj(u) if bd ne parentBond) {
        if (disc(v) == -1) {
          dfs(v, bd)
          low(u) = math.min(low(u), low(v))
          if (low(v) > disc(u))
            out += ((math.min(bd.a, bd.b), math.max(bd.a, bd.b)))
        } else low(u) = math.min(low(u), disc(v))
      }
    }
    (0 until n).foreach(i => if (disc(i) == -1) dfs(i, null))
    out.toSet
  }

  /** Is this bond part of some ring? (SMARTS `@` / `!@` bond primitive.) */
  def bondInRing(bd: Bond): Boolean =
    !bridgeKeys((math.min(bd.a, bd.b), math.max(bd.a, bd.b)))

  /** Ring membership per atom: an atom is in a ring iff it has an
    * incident non-bridge edge.
    */
  lazy val inRing: Vector[Boolean] =
    Vector.tabulate(n)(i => adj(i).exists { case (_, bd) => bondInRing(bd) })

  /** Ring sizes present at each atom: for every ring bond, the
    * SMALLEST cycle through it (BFS between its endpoints avoiding the
    * bond itself) stamps that size on both endpoints — in a plain ring
    * every member atom is an endpoint of two such bonds, so all carry
    * the ring's size; in fused systems each atom carries the smallest
    * cycle of each incident ring bond (the SSSR sizes RDKit's
    * IsAtomInRingOfSize reports for the rule fixtures' patterns).
    * Backs the SMARTS `r<n>` primitive.
    */
  lazy val atomRingSizes: Vector[Set[Int]] = {
    val sizes = Array.fill(n)(Set.empty[Int])
    for (bd <- bonds if bondInRing(bd)) {
      val dist = Array.fill(n)(-1)
      dist(bd.a) = 0
      val q = scala.collection.mutable.Queue(bd.a)
      while (q.nonEmpty && dist(bd.b) < 0) {
        val u = q.dequeue()
        for ((v, e) <- adj(u) if dist(v) < 0 && (e ne bd)) {
          dist(v) = dist(u) + 1; q += v
        }
      }
      if (dist(bd.b) > 0) {
        val size = dist(bd.b) + 1
        sizes(bd.a) += size; sizes(bd.b) += size
      }
    }
    sizes.toVector
  }

  def bondOrderSum(i: Int): Double =
    adj(i).map { case (_, bd) => if (bd.aromatic) 1.5 else bd.order.toDouble }.sum

  /** Implicit H on atom i (0 for bracket atoms — their H is explicit in
    * hCount; 0 for elements outside the organic subset).
    */
  def implicitH(i: Int): Int = {
    val a = atoms(i)
    if (a.hCount >= 0) 0 else Molecule.derivedH(a, bondOrderSum(i))
  }

  /** Total H: bracket count or implicit count, plus explicit H neighbors. */
  def totalH(i: Int): Int = {
    val own = if (atoms(i).hCount >= 0) atoms(i).hCount else implicitH(i)
    own + adj(i).count { case (j, bd) =>
      atoms(j).elem == "H" && bd.order == 1 && !bd.aromatic
    }
  }

  def formalCharge: Int = atoms.map(_.charge).sum

  /** Connected components as lists of atom indices. */
  def components: Vector[Vector[Int]] = {
    val seen = Array.fill(n)(false)
    val out = Vector.newBuilder[Vector[Int]]
    for (s <- 0 until n if !seen(s)) {
      val comp = Vector.newBuilder[Int]
      val stack = scala.collection.mutable.Stack(s)
      seen(s) = true
      while (stack.nonEmpty) {
        val u = stack.pop(); comp += u
        for ((v, _) <- adj(u) if !seen(v)) { seen(v) = true; stack.push(v) }
      }
      out += comp.result()
    }
    out.result()
  }

  /** Sub-molecule induced by the given atom indices (order preserved). */
  def induced(keep: Vector[Int]): Molecule = {
    val idx = keep.zipWithIndex.toMap
    new Molecule(
      keep.map(atoms),
      bonds.collect {
        case bd if idx.contains(bd.a) && idx.contains(bd.b) =>
          Bond(idx(bd.a), idx(bd.b), bd.order, bd.aromatic)
      })
  }

  /** Convert every implicit/bracket H into an explicit H atom. */
  def withExplicitH: Molecule = {
    val newAtoms = Vector.newBuilder[Atom]
    val newBonds = Vector.newBuilder[Bond]
    newAtoms ++= atoms.map(a => if (a.hCount >= 0) a.copy(hCount = 0) else a)
    newBonds ++= bonds
    var next = n
    for (i <- 0 until n) {
      val own = if (atoms(i).hCount >= 0) atoms(i).hCount else implicitH(i)
      for (_ <- 0 until own) {
        newAtoms += Atom("H", hCount = 0)
        newBonds += Bond(i, next, 1, aromatic = false)
        next += 1
      }
    }
    new Molecule(newAtoms.result(), newBonds.result())
  }

  /** Collapse explicit H atoms back into their heavy atom's H count
    * (inverse of withExplicitH; lone H species like [H+] are kept).
    */
  def withoutExplicitH: Molecule = {
    val isCollapsible = Array.tabulate(n) { i =>
      atoms(i).elem == "H" && atoms(i).charge == 0 && atoms(i).isotope == 0 &&
        adj(i).length == 1 && {
          val (j, bd) = adj(i).head
          bd.order == 1 && !bd.aromatic && atoms(j).elem != "H"
        }
    }
    val keep = (0 until n).filter(i => !isCollapsible(i)).toVector
    val idx = keep.zipWithIndex.toMap
    val hAdd = Array.fill(n)(0)
    for (i <- 0 until n if isCollapsible(i)) hAdd(adj(i).head._1) += 1
    val newAtoms = keep.map { i =>
      val a = atoms(i)
      val base = if (a.hCount >= 0) a.hCount else implicitH(i)
      a.copy(hCount = base + hAdd(i))
    }
    val m = new Molecule(
      newAtoms,
      bonds.collect {
        case bd if idx.contains(bd.a) && idx.contains(bd.b) =>
          Bond(idx(bd.a), idx(bd.b), bd.order, bd.aromatic)
      })
    // Normalize: drop the fixed H count where it equals the derived
    // implicit count so canonical output needs no bracket.
    val norm = m.atoms.zipWithIndex.map { case (a, i) =>
      if (a.charge == 0 && a.isotope == 0 && a.elem != "*" &&
        a.hCount == Molecule.derivedH(a.copy(hCount = -1), m.bondOrderSum(i)))
        a.copy(hCount = -1)
      else a
    }
    new Molecule(norm, m.bonds)
  }
}

object Molecule {
  private val defaultValence: Map[String, Int] = Map(
    "B" -> 3, "C" -> 4, "N" -> 3, "O" -> 2, "P" -> 3, "S" -> 2,
    "F" -> 1, "Cl" -> 1, "Br" -> 1, "I" -> 1, "H" -> 1)

  /** SMILES-default implicit H for an organic-subset atom with the given
    * bond order sum. P/S expand valence (P5, S4/S6) when the bond sum
    * exceeds the base valence; charged N gains its charge in valence
    * ([NH4+], [NH-]).
    */
  def derivedH(a: Atom, bs: Double): Int =
    defaultValence.get(a.elem) match {
      case None => 0
      case Some(v0) =>
        val v = a.elem match {
          // aromatic atoms never valence-expand (aromatic s/p keep 2/3)
          case "P" if bs > 3 && !a.aromatic => 5
          case "S" if bs > 2 && bs <= 4 && !a.aromatic => 4
          case "S" if bs > 4 && !a.aromatic => 6
          case "N" => v0 + a.charge
          case "O" => v0 + a.charge
          case _ => v0
        }
        math.max(0, math.floor(v - bs + 1e-9).toInt)
    }
}
