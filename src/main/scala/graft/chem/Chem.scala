package graft.chem

import java.security.MessageDigest

/** Facade used by the Pickaxe engine's kernel UDFs: the compound-
  * processing pipeline of the reference (pickaxe.py:278-336) re-expressed
  * over the pure-Scala kernel.
  *
  * Identity deviation (documented in SURVEY.md §7): compound ids are
  * `C|X|T + sha1(canonical SMILES)` instead of the reference's
  * sha1(InChIKey block) (utils.py:115-164) — still content-addressed,
  * stable, and equality-joinable; the absolute id strings differ from
  * RDKit-derived ones.
  */
object Chem {

  private val hexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of a byte array (table-driven — `"%02x".format` costs
    * a Formatter allocation per byte, which dominates hot hash paths).
    */
  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  private val sha1Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-1")
  }
  private val sha256Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  def sha1hex(s: String): String = {
    val md = sha1Local.get(); md.reset()
    hex(md.digest(s.getBytes("UTF-8")))
  }

  def sha256hex(s: String): String = {
    val md = sha256Local.get(); md.reset()
    hex(md.digest(s.getBytes("UTF-8")))
  }

  /** Compound id: type prefix + content hash (P10). */
  def compoundHash(canonicalSmiles: String, cType: Char): String =
    cType.toString + sha1hex(canonicalSmiles)

  /** Aromatic-NH tautomer pick (utils.postsanitize_smiles:441-517): the
    * reference enumerates every single 1,3-H flip matching
    * `[#7H1X3&a:1]:[#6&a:2]:[#7H0X2&a:3]` and keeps the
    * lexicographically smallest SMILES of {variants + original}
    * (reactions.py:128-131 takes `[0][0]` of the sorted set). Without
    * this, an imidazole/purine product and its NH tautomer would count
    * as two distinct compounds.
    */
  def postsanitize(canonicalSmiles: String): String = {
    if (!canonicalSmiles.contains('n')) return canonicalSmiles
    val m = Smiles.parse(canonicalSmiles)
    def isAromN(i: Int) = m.atoms(i).elem == "N" && m.atoms(i).aromatic
    val variants = for {
      n1 <- 0 until m.n
      if isAromN(n1) && m.totalH(n1) == 1 && m.degree(n1) == 2 // H1 X3
      (c, b1) <- m.adj(n1)
      if b1.aromatic && m.atoms(c).elem == "C" && m.atoms(c).aromatic
      (n3, b2) <- m.adj(c)
      if n3 != n1 && b2.aromatic && isAromN(n3) &&
        m.totalH(n3) == 0 && m.degree(n3) == 2 // H0 X2
    } yield {
      val flipped = m.atoms
        .updated(n1, m.atoms(n1).copy(hCount = 0))
        .updated(n3, m.atoms(n3).copy(hCount = 1))
      Smiles.write(new Molecule(flipped, m.bonds))
    }
    (variants :+ canonicalSmiles).distinct.min
  }

  /** Charge neutralization (P7, utils.py:385-438): protonate negative
    * O/S/N, deprotonate positive N with an H — run to fixpoint like the
    * reference's 9-pattern loop.
    */
  def neutralize(m: Molecule): Molecule = {
    val atoms = m.atoms.toArray
    var changed = true
    while (changed) {
      changed = false
      // one Molecule per sweep (bond sums don't change inside a sweep;
      // the H-count reads below only depend on the atom being edited)
      val mm = new Molecule(atoms.toVector, m.bonds)
      for (i <- atoms.indices) {
        val a = atoms(i)
        if (a.charge < 0 && Set("O", "S", "N", "C")(a.elem)) {
          // add a proton: [O-] -> OH
          val h = if (a.hCount >= 0) a.hCount else mm.implicitH(i)
          atoms(i) = a.copy(charge = a.charge + 1, hCount = h + 1)
          changed = true
        } else if (a.charge > 0 && a.elem == "N" && mm.totalH(i) > 0 &&
          !a.aromatic) {
          // remove a proton: [NH3+] -> NH2 (aromatic n+ left alone, as the
          // reference's patterns only hit sp3-ish N-H)
          val h = if (a.hCount >= 0) a.hCount else mm.implicitH(i)
          if (h > 0) {
            atoms(i) = a.copy(charge = a.charge - 1, hCount = h - 1)
            changed = true
          }
        }
      }
    }
    new Molecule(atoms.toVector, m.bonds)
  }

  /** Full standardization: parse, optionally reject multi-fragment,
    * neutralize, canonical SMILES. Returns None on parse failure or
    * rejected structure. (S2 pipeline, pickaxe.py:278-336.)
    */
  def standardize(
      smiles: String,
      allowFragments: Boolean = false): Option[String] =
    try {
      val m = Smiles.parse(smiles)
      if (!allowFragments && m.components.length > 1) None
      else Some(Smiles.write(neutralize(Aromatize.perceive(m))))
    } catch { case _: Exception => None }

  /** Organic predicate (P2): contains carbon. */
  def isOrganic(smiles: String): Boolean =
    smiles.contains("C") || smiles.contains("c")

  /** Atom-balance check (reactions.py:106-118): element counts must
    * match across sides, allowing an H difference equal to the net
    * formal-charge difference.
    */
  def isBalanced(
      reactants: Seq[(Int, Molecule)],
      products: Seq[(Int, Molecule)]): Boolean = {
    def total(side: Seq[(Int, Molecule)]): (Map[String, Int], Int) = {
      val counts = scala.collection.mutable.Map.empty[String, Int]
      var charge = 0
      for ((st, m) <- side) {
        Formula.atomCounts(m).foreach { case (e, k) =>
          counts(e) = counts.getOrElse(e, 0) + st * k
        }
        charge += st * m.formalCharge
      }
      (counts.toMap, charge)
    }
    val (rc, rq) = total(reactants)
    val (pc, pq) = total(products)
    val elems = rc.keySet ++ pc.keySet
    elems.forall { e =>
      val d = rc.getOrElse(e, 0) - pc.getOrElse(e, 0)
      if (e == "H") d == rq - pq else d == 0
    }
  }
}
