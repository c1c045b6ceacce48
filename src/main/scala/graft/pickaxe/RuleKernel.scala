package graft.pickaxe

import scala.collection.concurrent.TrieMap

import graft.chem._

/** Executor-side expansion kernel: ONE frontier compound × ALL rules
  * (reference: _transform_ind_compound_with_full, reactions.py:224-298).
  *
  * Rules and coreactants are broadcast as plain strings; SMARTS are
  * compiled lazily once per JVM (TrieMap cache — the reference compiles
  * once per process too, pickaxe.py:417).
  */
object RuleKernel {

  /** One predicted reaction emitted by the kernel. */
  final case class Predicted(
      rxnId: String,
      smilesRxn: String,
      operator: String,
      reactants: Seq[Stoich],
      products: Seq[Stoich],
      productSmiles: Seq[(String, String)]) // (c_id, canonical SMILES)

  private val compiledRules = TrieMap.empty[String, ReactionRule.Parsed]
  private val parsedMols = TrieMap.empty[String, Molecule]
  // bounded: the hot entries are the coreactant molecules (catalog-sized);
  // frontier compounds are one-shot and must not accumulate on long-lived
  // executors
  private val maxCachedMols = 4096

  private def compiled(smarts: String): ReactionRule.Parsed =
    compiledRules.getOrElseUpdate(smarts, ReactionRule.parse(smarts))

  /** Molecule for a canonical SMILES (explicit-H when the engine runs in
    * explicit mode), cached per JVM with a hard size cap (cleared
    * wholesale when full — coreactants re-enter immediately, transient
    * compounds don't).
    */
  private def molFor(smiles: String, explicitH: Boolean): Molecule = {
    if (parsedMols.size > maxCachedMols) parsedMols.clear()
    val key = (if (explicitH) "E|" else "I|") + smiles
    parsedMols.getOrElseUpdate(key, {
      val m = Smiles.parse(smiles)
      if (explicitH) m.withExplicitH else m
    })
  }

  /** Reaction content hash (P11, utils.py:324-379): sha256 over the
    * sorted stoich-id text of both sides.
    */
  def reactionHash(reactants: Seq[Stoich], products: Seq[Stoich]): String = {
    def side(s: Seq[Stoich]) = s.sortBy(_.c_id)
      .map(t => s"(${t.stoich}) ${t.c_id}").mkString(" + ")
    "R" + Chem.sha256hex(side(reactants) + " => " + side(products))
  }

  /** Count stoichiometry by compound id, order-stable (E5). */
  private def toStoich(ids: Seq[String]): Seq[Stoich] =
    ids.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (id, xs) => Stoich(xs.length, id) }

  /** Apply every rule to one compound (id, canonical SMILES).
    * Coreactants: name -> (canonical SMILES, X-id).
    */
  def applyAll(
      cId: String,
      cSmiles: String,
      rules: Seq[RuleRow],
      coreactants: Map[String, (String, String)],
      maxProducts: Int = 10000,
      explicitH: Boolean = false): Seq[Predicted] = {
    val out = Seq.newBuilder[Predicted]
    val compound = try molFor(cSmiles, explicitH)
      catch { case _: Exception => return Seq.empty }
    // canonical SMILES -> X-id, for cofactor-redundancy rewrite at birth
    // (the reference repairs this post-hoc in _remove_cofactor_redundancy,
    // pickaxe.py:793-940; rewriting as products are emitted reaches the
    // same fixpoint in one pass). Built once per compound, not per rule.
    val cofactorBySmiles = coreactants.values.map(t => t._1 -> t._2).toMap
    for (rule <- rules) {
      try {
        val parsed = compiled(rule.smarts)
        // reactant tuple by role (reactions.py:276-278)
        val mols = rule.reactantRoles.map {
          case "Any" => compound
          case role => molFor(coreactants(role)._1, explicitH)
        }
        val reactantIds = rule.reactantRoles.map {
          case "Any" => cId
          case role => coreactants(role)._2
        }
        val reactantStoich = toStoich(reactantIds)
        val seen = scala.collection.mutable.Set.empty[String]
        for (productSet <- ReactionRule.run(parsed, mols, maxProducts)) {
          // aromaticity perception (RDKit sanitizes every product) +
          // tautomer pick for n-containing ones (reactions.py:128-131)
          val canonProducts = productSet
            .map(p => Chem.postsanitize(Smiles.write(Aromatize.perceive(p))))
          // reject fragments (reactions.py:142-143)
          if (!canonProducts.exists(_.contains("."))) {
            // POSITIONAL role mapping (reactions.py:96-104): a non-Any
            // product slot is DECLARED to be its role's coreactant
            // whatever the template actually produced; the atom-balance
            // gate below then rejects embeddings that split the cofactor
            // at the wrong bond (e.g. ATP cleaved at the alpha- instead
            // of gamma-phosphate). Any-slot products that equal a
            // cofactor are still rewritten to the X-id
            // (_remove_cofactor_redundancy, pickaxe.py:793-940).
            val prodIdSmiles = canonProducts.zip(rule.productRoles)
              .map { case (smi, role) =>
                if (role == "Any")
                  cofactorBySmiles.get(smi) match {
                    case Some(xid) => (xid, smi)
                    case None => (Chem.compoundHash(smi, 'C'), smi)
                  }
                else (coreactants(role)._2, coreactants(role)._1)
              }
            val productStoich = toStoich(prodIdSmiles.map(_._1))
            val reactantIdSet = reactantIds.toSet
            // skip no-op transforms (reactions.py:189-192) and
            // all-cofactor product sets (pickaxe.py:854-884 case 2)
            val isNoOp = prodIdSmiles.exists { case (pid, _) =>
              reactantIdSet.contains(pid)
            } || prodIdSmiles.forall(_._1.startsWith("X"))
            // atom balance over the DECLARED molecules
            // (reactions.py:106-118,194-198 — counts come from the
            // declared compound documents, which is what prunes
            // wrong-position cofactor splits)
            val balanced = Chem.isBalanced(
              reactantStoich.map(st =>
                st.stoich -> molForId(st.c_id, cId, cSmiles, coreactants,
                  explicitH)),
              prodIdSmiles.map { case (_, smi) =>
                1 -> molFor(smi, explicitH) })
            val rid = reactionHash(reactantStoich, productStoich)
            if (!isNoOp && balanced && seen.add(rid)) {
              val eq = reactantStoich.map(s => idToSmiles(s, cId, cSmiles,
                coreactants)).mkString(" + ") + " => " +
                prodIdSmiles.map(_._2).sorted.mkString(" + ")
              out += Predicted(rid, eq, rule.name, reactantStoich,
                productStoich,
                prodIdSmiles.filter(_._1.startsWith("C")))
            }
          }
        }
      } catch { case _: Exception => () } // a failing rule skips, not kills
    }
    out.result()
  }

  private def molForId(
      id: String, cId: String, cSmiles: String,
      coreactants: Map[String, (String, String)],
      explicitH: Boolean): Molecule =
    if (id == cId) molFor(cSmiles, explicitH)
    else molFor(coreactants.values.find(_._2 == id).get._1, explicitH)

  private def idToSmiles(
      s: Stoich, cId: String, cSmiles: String,
      coreactants: Map[String, (String, String)]): String = {
    val smi =
      if (s.c_id == cId) cSmiles
      else coreactants.values.find(_._2 == s.c_id).map(_._1).getOrElse(s.c_id)
    if (s.stoich == 1) smi else s"(${s.stoich}) $smi"
  }
}
