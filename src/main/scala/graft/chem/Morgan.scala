package graft.chem

import scala.collection.immutable.BitSet

/** RDKit-compatible Morgan (ECFP) sparse bit ids — the hash space the
  * reference's NP-likeness model is keyed by
  * (`GetMorganFingerprint(mol, 2)`, npscorer.py:40).
  *
  * Reproduces the public RDKit algorithm (GraphMol/Fingerprints/
  * MorganFingerprints.cpp):
  *  - initial connectivity invariants per atom: boost-style hash_range
  *    over [atomicNum, totalDegree, totalNumHs, formalCharge, deltaMass,
  *    (1 if in ring)], truncated to uint32;
  *  - per layer, each atom's invariant becomes hash(layer, ownPrev,
  *    sorted (bondType, neighborPrev) pairs) with boost hash_combine in
  *    32-bit arithmetic;
  *  - an environment (the SET of bonds within the radius) contributes a
  *    bit only the first time that bond set appears; duplicate
  *    environments in the same layer keep the smallest invariant.
  *
  * The ambiguous micro-details (arithmetic width of the layer-0 range
  * hash, pair-wise vs element-wise neighbor combination, 0- vs 1-based
  * layer seed) are captured in `Variant` and were CALIBRATED against the
  * 26 NP_likeness values the reference ships in
  * tests/data/testing_db.json (see NPScoreParitySpec) — exactly one of
  * the 16 variant combinations reproduces ALL of them to 1e-9, and it
  * is the default: 32-bit range hash, boost pair-hash of
  * (bondType, neighborInvariant), 0-based layer seed, own previous
  * invariant included.
  */
object Morgan {

  final case class Variant(
      range64: Boolean = false, // layer-0 hash_range in 64-bit then truncate
      pairHash: Boolean = true, // neighbor (bt, inv) as boost pair-hash
      layerFrom1: Boolean = false, // seed layer index from 1
      includeSelf: Boolean = true) // fold own previous invariant in

  private val GOLD = 0x9e3779b9L

  /** boost hash_combine with a 32-bit seed (uint32 arithmetic). */
  private def combine32(seed: Long, value: Long): Long = {
    val s = seed & 0xffffffffL
    val add = ((value & 0xffffffffL) + GOLD + ((s << 6) & 0xffffffffL) +
      (s >>> 2)) & 0xffffffffL
    (s ^ add) & 0xffffffffL
  }

  /** boost hash_combine with a 64-bit (size_t) seed. */
  private def combine64(seed: Long, value: Long): Long =
    seed ^ (value + GOLD + (seed << 6) + (seed >>> 2))

  private def hashRange(values: Seq[Long], wide: Boolean): Long =
    if (wide) values.foldLeft(0L)(combine64) & 0xffffffffL
    else values.foldLeft(0L)(combine32)

  /** Atom ring membership: incident to at least one cycle bond (a bond
    * is on a cycle iff its endpoints stay connected without it).
    */
  private def ringAtoms(m: Molecule): Array[Boolean] = {
    val out = Array.fill(m.n)(false)
    for (bd <- m.bonds if !out(bd.a) || !out(bd.b)) {
      // BFS a -> b avoiding this bond
      val seen = Array.fill(m.n)(false)
      seen(bd.a) = true
      val q = scala.collection.mutable.Queue(bd.a)
      var found = false
      while (q.nonEmpty && !found) {
        val u = q.dequeue()
        for ((v, b2) <- m.adj(u) if b2 ne bd) {
          if (v == bd.b) found = true
          if (!seen(v)) { seen(v) = true; q += v }
        }
      }
      if (found) { out(bd.a) = true; out(bd.b) = true }
    }
    out
  }

  private def bondTypeInt(b: Bond): Long =
    if (b.aromatic) 12L // BondType::AROMATIC
    else b.order.toLong // SINGLE/DOUBLE/TRIPLE = 1/2/3

  /** Distinct Morgan bit ids (uint32 as Long) for radius `radius`. */
  def bits(m0: Molecule, radius: Int = 2,
      variant: Variant = Variant()): Set[Long] = {
    val m = m0.withoutExplicitH
    val n = m.n
    if (n == 0) return Set.empty
    val inRing = ringAtoms(m)
    val bondIdx: Map[Bond, Int] = m.bonds.zipWithIndex.toMap

    var invariants: Array[Long] = Array.tabulate(n) { i =>
      val a = m.atoms(i)
      val totalH = m.totalH(i).toLong
      val totalDegree = m.degree(i).toLong + totalH
      val base = Seq[Long](
        atomicNum(a.elem), totalDegree, totalH, a.charge.toLong, 0L) ++
        (if (inRing(i)) Seq(1L) else Seq.empty)
      hashRange(base, variant.range64)
    }

    val out = scala.collection.mutable.Set.empty[Long]
    invariants.foreach(out += _)

    var env: Array[BitSet] = Array.fill(n)(BitSet.empty)
    val seenEnvs = scala.collection.mutable.Set.empty[BitSet]
    for (layerIdx <- 0 until radius) {
      val layerSeed =
        if (variant.layerFrom1) layerIdx + 1L else layerIdx.toLong
      val nextEnv = new Array[BitSet](n)
      val nextInv = new Array[Long](n)
      val thisRound =
        scala.collection.mutable.ArrayBuffer.empty[(BitSet, Long)]
      for (i <- 0 until n) {
        if (m.adj(i).isEmpty) { nextEnv(i) = env(i); nextInv(i) = invariants(i) }
        else {
          var e = env(i)
          val nbrs = m.adj(i).map { case (j, bd) =>
            e = e + bondIdx(bd)
            e = e | env(j)
            (bondTypeInt(bd), invariants(j))
          }.sorted
          var inv = layerSeed
          if (variant.includeSelf) inv = combine32(inv, invariants(i))
          nbrs.foreach { case (bt, ninv) =>
            if (variant.pairHash) {
              var p = 0L
              p = combine32(p, bt); p = combine32(p, ninv)
              inv = combine32(inv, p)
            } else {
              inv = combine32(inv, bt)
              inv = combine32(inv, ninv)
            }
          }
          nextEnv(i) = e
          nextInv(i) = inv
          thisRound += ((e, inv))
        }
      }
      // each distinct unseen environment contributes its smallest invar
      thisRound.groupBy(_._1).foreach { case (e, grp) =>
        if (!seenEnvs(e)) {
          out += grp.map(_._2).min
          seenEnvs += e
        }
      }
      env = nextEnv
      invariants = nextInv
    }
    out.toSet
  }

  /** GetMorganFingerprintAsBitVect's folded form: raw sparse uint32 ids
    * mod `nBits` (feasibility.py:371,380 uses radius=2, nBits=1024 for
    * its reaction feature vectors).
    */
  def foldedBits(m: Molecule, radius: Int = 2, nBits: Int = 1024): Set[Int] =
    bits(m, radius).map(b => (b % nBits).toInt)

  private val atomicNums: Map[String, Long] = Map(
    "H" -> 1, "B" -> 5, "C" -> 6, "N" -> 7, "O" -> 8, "F" -> 9,
    "Na" -> 11, "Mg" -> 12, "Si" -> 14, "P" -> 15, "S" -> 16,
    "Cl" -> 17, "K" -> 19, "Ca" -> 20, "Fe" -> 26, "Se" -> 34,
    "Br" -> 35, "I" -> 53)

  private def atomicNum(elem: String): Long =
    atomicNums.getOrElse(elem, 0L)
}
