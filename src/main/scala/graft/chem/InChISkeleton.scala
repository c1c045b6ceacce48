package graft.chem

/** Structural-skeleton equivalence key mirroring the InChIKey FIRST
  * BLOCK, which is what the reference hashes into compound ids
  * (utils.py:115-164, `inchi_blocks=1`: sha1 over
  * `inchi_key.rsplit("-", 2)[0]`).
  *
  * The InChIKey first block digests the standard InChI *main* layer
  * only — formula, connectivity (`/c`, which carries NO bond orders)
  * and hydrogen placement (`/h`, with mobile-H groups) — after the
  * standard proton normalization. Everything else (stereo, charge,
  * isotopes) lives in later blocks. Consequently the reference's
  * compound identity merges:
  *
  *   - mobile-H tautomers (amide/imidate, acid, amidine, 1,5-shifted
  *     enol-of-carbonyl chains, phosphate O-H permutations);
  *   - protonation states reachable by (de)protonating heteroatoms;
  *   - double-bond placements with identical H placement.
  *
  * This object computes a canonical string with the same merging
  * semantics from the kernel's `Molecule` graph. It is NOT the IUPAC
  * InChI string (the exact canonical numbering of the official
  * algorithm is out of scope) — it is an equivalence key: two
  * molecules receive equal keys iff their InChI main layers agree,
  * up to the graph-canonicalization strength of iterated WL colour
  * refinement with an orbit tie-break.
  *
  * Mobile-H model (InChI technical manual, simplified to the
  * tautomeric patterns the MINE rule fixtures exercise):
  * endpoints are O/N/S/Se/Te with normalized charge 0 or -1; two
  * endpoints join a group when an alternating single/double path of
  * 2, 4 or 6 bonds connects them (single at the H-bearing end,
  * double into the acceptor) whose interior atoms are C or N — or a
  * 2-bond path through P/S (phosphate/sulfate O-H mobility). A
  * group's H (and -1 charges) pool onto the member SET; member atoms
  * then carry no fixed H of their own.
  */
object InChISkeleton {

  private val endpointElems = Set("O", "N", "S", "Se", "Te")

  /** The skeleton key; throws on atoms the model can't normalize. */
  def key(mol: Molecule): String = {
    val m = mol
    val n = m.n
    require(n > 0, "empty molecule")
    // treat explicit H atoms as counts on their heavy neighbor
    val isHeavy = (0 until n).map(i => m.atoms(i).elem != "H")
    val heavy = (0 until n).filter(isHeavy).toArray
    val hIdx = heavy.zipWithIndex.toMap
    val elem = heavy.map(i => m.atoms(i).elem)
    val charge = heavy.map(i => m.atoms(i).charge)
    val hyd = heavy.map(i => m.totalH(i))
    // heavy-atom bonds with orders (orders feed mobile-H detection
    // only; the key itself drops them, like the /c layer)
    val edges = m.bonds.toArray.collect {
      case b if isHeavy(b.a) && isHeavy(b.b) =>
        (hIdx(b.a), hIdx(b.b), if (b.aromatic) 15 else b.order * 10)
    }
    val nh = heavy.length
    val adj = Array.fill(nh)(List.empty[(Int, Int)])
    edges.foreach { case (a, b, o) =>
      adj(a) ::= ((b, o)); adj(b) ::= ((a, o))
    }

    // ---- proton normalization (InChI /p): block 1 digests the
    // PROTONATED PARENT — InChI adds/removes exactly |net charge|
    // protons to reach net 0 (acetate's block 1 is acetic acid's;
    // /p records the difference OUTSIDE the block), and leaves
    // net-neutral zwitterions (nitro written charge-separated,
    // N-oxides, betaines) untouched: CH3[N+](=O)[O-] and CN(=O)=O
    // share one block-1. Proton placement order is a local canonical
    // invariant (element, degree, neighbor elements), so equivalent
    // writings pick equivalent sites; true symmetry ties yield
    // isomorphic results and therefore equal keys.
    val localInv = (i: Int) =>
      s"${elem(i)}|${adj(i).length}|" +
        adj(i).map(t => elem(t._1)).sorted.mkString
    var net = charge.sum
    if (net < 0) {
      for (i <- (0 until nh).sortBy(localInv) if net < 0) {
        if (charge(i) < 0 && endpointElems(elem(i))) {
          val take = math.min(-charge(i), -net)
          hyd(i) += take; charge(i) += take; net += take
        }
      }
    } else if (net > 0) {
      for (i <- (0 until nh).sortBy(localInv) if net > 0) {
        if (charge(i) > 0 && endpointElems(elem(i)) && hyd(i) > 0) {
          val take = math.min(math.min(charge(i), hyd(i)), net)
          hyd(i) -= take; charge(i) -= take; net -= take
        }
      }
    }

    // ---- mobile-H groups ----
    def isEndpoint(i: Int): Boolean =
      endpointElems(elem(i)) && charge(i) <= 0
    // alternating path search: from endpoint s over a SINGLE bond,
    // then alternating double/single through interior C/N, ending on
    // a DOUBLE bond into another endpoint. Depth ≤ 6 bonds. A 2-bond
    // path may route through P/S as well (phosphate-style O mobility).
    def reach(s: Int): Set[Int] = {
      val found = scala.collection.mutable.Set.empty[Int]
      def step(at: Int, wantDouble: Boolean, depth: Int,
          visited: Set[Int]): Unit = {
        if (depth > 6) return
        for ((nb, o) <- adj(at) if !visited(nb)) {
          // aromatic bonds (15) satisfy EITHER parity: the kekulé
          // structure behind an aromatic ring realizes both
          val single = o == 10 || o == 15
          val dbl = o == 20 || o == 15
          if (wantDouble && dbl && isEndpoint(nb)) found += nb
          // interior atoms past the first bond are C/N only (the
          // first-bond P/S case lives in reach()'s seed loop)
          val interiorOk = Set("C", "N")(elem(nb)) && !isEndpoint(nb)
          if (interiorOk && ((wantDouble && dbl) || (!wantDouble && single)))
            step(nb, !wantDouble, depth + 1, visited + nb)
        }
      }
      // first bond from the endpoint must be single (H-bearing end)
      for ((nb, o) <- adj(s) if o == 10 || o == 15) {
        val interiorOk = Set("C", "N", "P", "S")(elem(nb)) && !isEndpoint(nb)
        if (interiorOk) step(nb, wantDouble = true, depth = 2, Set(s, nb))
      }
      found.toSet
    }
    // union endpoints: an edge s->t exists when s has H (donor) and t
    // is reachable; groups grow transitively (pooled H migrates).
    val parent = Array.tabulate(nh)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    def union(a: Int, b: Int): Unit = { parent(find(a)) = find(b) }
    val endpoints = (0 until nh).filter(isEndpoint)
    val reachOf = endpoints.map(e => e -> reach(e)).toMap
    // iterate: a donor is an endpoint whose GROUP currently holds H
    var changed = true
    while (changed) {
      changed = false
      val groupH = endpoints.groupBy(find).map { case (r, es) =>
        r -> es.map(hyd).sum
      }
      for (e <- endpoints if groupH(find(e)) > 0; t <- reachOf(e)) {
        if (find(e) != find(t)) { union(e, t); changed = true }
      }
    }
    val groups = endpoints.groupBy(find).values
      .filter(g => g.size > 1 && g.map(hyd).sum > 0)
      .toSeq
    val inGroup = groups.flatten.toSet
    val groupOf = groups.zipWithIndex.flatMap { case (g, gi) =>
      g.map(_ -> gi)
    }.toMap
    val groupH = groups.map(_.map(hyd).sum).toArray
    val groupNeg = groups.map(_.map(i =>
      math.max(0, -charge(i))).sum).toArray

    // ---- canonical colouring (WL over the order-free graph) ----
    // node label: element + fixed H (mobile members: H pooled, so 0)
    // + normalized charge for non-/p-normalizable atoms folded OUT of
    // the first block — InChI puts /q outside block 1, so exclude it.
    val fixedH = (0 until nh).map(i => if (inGroup(i)) 0 else hyd(i))
    val color0: Array[String] =
      (0 until nh).map(i => s"${elem(i)}H${fixedH(i)}").toArray
    val simpleAdj = adj.map(_.map(_._1))
    // WL refinement with early exit: the distinct-colour count is
    // non-decreasing round over round, and a round that splits no cell
    // leaves the partition stable forever — so stop at the plateau
    // instead of a fixed 12 rounds (typical molecules stabilize in
    // 3-5; long chains with diameter > 12 now also refine fully)
    def refine(c0: Array[String]): Array[String] = {
      var c = c0
      var prevDistinct = -1
      var round = 0
      val maxRounds = math.max(12, nh)
      while (round < maxRounds && {
        val d = c.distinct.length
        val go = d != prevDistinct && d < nh
        prevDistinct = d; go
      }) {
        c = (0 until nh).map { i =>
          val nb = simpleAdj(i).map(c).sorted.mkString(",")
          Integer.toHexString((c(i) + "|" + nb).hashCode)
        }.toArray
        round += 1
      }
      c
    }
    // assemble the key tail for a discrete (or budget-truncated)
    // colouring — ranks by colour, ties by index
    def assemble(color: Array[String]): String = {
      val rank = color.zipWithIndex.map { case (c, i) => (c, i) }
        .sortBy(identity).map(_._2)
        .zipWithIndex.map { case (i, r) => i -> r }.toMap
      val nodeStr = (0 until nh).sortBy(rank)
        .map(i => s"${elem(i)}${fixedH(i)}").mkString(",")
      val edgeStr = edges.map { case (a, b, _) =>
        val (x, y) = (rank(a), rank(b))
        if (x < y) s"$x-$y" else s"$y-$x"
      }.sorted.mkString(",")
      val mobStr = groups.indices.map { gi =>
        val members = groups(gi).map(rank).sorted.mkString("+")
        s"(H${groupH(gi)}${if (groupNeg(gi) > 0) s"-${groupNeg(gi)}" else ""},$members)"
      }.sorted.mkString
      s"$nodeStr/$edgeStr/$mobStr"
    }
    // orbit tie-break: when colours are not discrete, individualize
    // EVERY node of the smallest ambiguous cell in turn, recurse, and
    // keep the lexicographically smallest assembled key — this makes
    // the key independent of atom input order (two SMILES writings of
    // the same molecule canonicalize identically), unlike picking the
    // minimum INDEX, which falsely split WL-equivalent non-automorphic
    // atoms. A branch budget bounds pathological symmetry; past it we
    // fall back to first-candidate (deterministic but order-sensitive
    // — never hit by the catalogs, guarded by q_pickaxe_skeleton).
    var budget = 4096
    def solve(c0: Array[String]): String = {
      val c = refine(c0)
      if (c.distinct.length == nh) assemble(c)
      else {
        val dup = c.zipWithIndex.groupBy(_._1).filter(_._2.length > 1)
        val pick = dup.keys.min
        val cands0 = dup(pick).map(_._2).sorted.toSeq
        // sibling-automorphism prune: same-cell atoms with IDENTICAL
        // neighbor index sets (plus the same mobile group, charge and
        // H count — everything assemble can see) are swapped by an
        // automorphism, so individualizing either yields the same
        // assembled string — branch one representative per class.
        // This covers the common chemistry (terminal phosphate/carboxy
        // oxygens, gem-dimethyl, ring-symmetric pairs of leaves).
        val reps = cands0.groupBy { i =>
          (simpleAdj(i).sorted.toSeq,
            groupOf.getOrElse(i, -1), charge(i), hyd(i))
        }.values.map(_.min).toSeq.sorted
        val cands = if (budget <= 0) reps.take(1) else reps
        budget -= cands.length
        cands.map { i0 =>
          val c2 = c.clone(); c2(i0) = c2(i0) + "*"
          solve(c2)
        }.min
      }
    }

    // ---- assemble the key ----
    val formula = {
      val counts = scala.collection.mutable.Map.empty[String, Int]
      for (i <- 0 until nh)
        counts(elem(i)) = counts.getOrElse(elem(i), 0) + 1
      val hTot = hyd.sum
      if (hTot > 0) counts("H") = counts.getOrElse("H", 0) + hTot
      counts.toSeq.sorted.map { case (e, k) => s"$e$k" }.mkString
    }
    s"$formula/${solve(color0)}"
  }

  /** Key for a canonical SMILES; falls back to the SMILES itself when
    * the graph model can't produce a key (mirrors the reference's
    * `'*' in smi` fallback to hashing the raw SMILES).
    */
  def keyOrSmiles(canonicalSmiles: String): String =
    try key(Smiles.parse(canonicalSmiles))
    catch { case _: Exception => canonicalSmiles }
}
