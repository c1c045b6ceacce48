package graft.pickaxe

/** Core entity rows (SURVEY.md §1.1) as Spark-encodable case classes. */

final case class Stoich(stoich: Int, c_id: String)

/** Compound document (pickaxe.py:538-551). Adjacency arrays are derived
  * from the reactions table on demand (A13) rather than mutated in place.
  */
final case class CompoundRow(
    _id: String,
    ID: String,
    SMILES: String,
    Type: String, // Coreactant | Starting Compound | Predicted | Target Compound
    Generation: Int,
    Formula: String,
    Charge: Int,
    Mass: Double,
    Expand: Boolean)

/** Reaction document (reactions.py:204-213). */
final case class ReactionRow(
    _id: String,
    ID: String,
    Reactants: Seq[Stoich],
    Products: Seq[Stoich],
    Operators: Seq[String],
    SMILES_rxn: String)

/** Operator (reaction rule) — TSV row (pickaxe.py:396-439). */
final case class RuleRow(
    name: String,
    reactantRoles: Seq[String],
    smarts: String,
    productRoles: Seq[String])

/** Coreactant — TSV row (pickaxe.py:338-377). */
final case class CoreactantRow(name: String, smiles: String, _id: String)

/** Metabolomics peak (metabolomics.py:548-570). */
final case class PeakRow(
    name: String,
    r_time: Double,
    mz: Double,
    charge: String, // "+" | "-"
    ms2: Seq[(Double, Double)])

/** Adduct = (name, mass multiplier, ion mass) (metabolomics.py:118-142). */
final case class AdductRow(name: String, mult: Double, ionMass: Double)
