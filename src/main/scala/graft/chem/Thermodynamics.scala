package graft.chem

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Component-contribution-style biochemical thermodynamics — the physics
  * behind the reference's eQuilibrator calls (thermodynamics.py:81-170:
  * standard ∆Gf, standard/physiological/adjusted ∆G′r under pH, ionic
  * strength and pMg).
  *
  * What is EXACT here (published physical chemistry, Alberty 2003,
  * "Thermodynamics of Biochemical Reactions"; the same Legendre
  * transform eQuilibrator applies):
  *   - the pH term  N_H · RT·ln(10) · pH,
  *   - the pMg term N_Mg · (RT·ln(10)·pMg − ∆Gf°(Mg²⁺)),
  *   - the extended Debye–Hückel ionic-strength correction
  *     −α(T)·√I/(1+B√I) · (z² − N_H − 4·N_Mg) with Alberty's α(T)
  *     polynomial (α(298.15 K) = 2.91482 kJ·mol⁻¹·M^−1/2, B = 1.6),
  *   - pseudoisomer (protonation-state) group averaging
  *     ∆G′f = −RT·ln Σᵢ exp(−∆G′f(i)/RT),
  *   - the Alberty reference-table species values in `speciesTable`.
  *
  * What is an ESTIMATE: `groupFormationEnergy`, an atom-centered
  * group-contribution ∆Gf° for arbitrary predicted molecules in the
  * functional form of Mavrovouniotis (1990/1991). The published
  * regression constants are not reproducible offline, so the table
  * below is calibration-grade: deterministic, qualitatively ordered
  * (oxidized carbon below reduced, charged phosphates strongly
  * negative), and clearly NOT literature-accurate per compound. The
  * reference has the same caveat shape — without its eQuilibrator
  * sqlite cache it cannot compute real ∆G either.
  *
  * "Calibration-grade" as a MEASURED number (ThermodynamicsSpec's
  * held-out audit vs the Alberty table, which never fed the group
  * constants): max |∆Gf° error| = 547 kJ/mol, rms = 278 kJ/mol over
  * 17 species, with a systematic negative bias on oxygenated
  * carbons. The ordering contract the ThermoFilter gate consumes
  * holds on the same held-out set; absolute ∆G values from this
  * model must not be quoted as physical.
  *
  * Scalar functions pair with Column twins (`legendreCol`,
  * `isomerGroupCol` composition) sharing the same constants, so
  * distributed grids and the driver-side filter path provably agree.
  */
object Thermodynamics {

  /** Gas constant, kJ/(mol·K) (CODATA). */
  val R = 8.314462618e-3

  /** Default temperature, K (eQuilibrator's default_physiological). */
  val T0 = 298.15

  def rt(t: Double = T0): Double = R * t
  def rtLn10(t: Double = T0): Double = rt(t) * math.log(10.0)

  /** Alberty's Debye–Hückel coefficient α(T) in kJ·mol⁻¹·M^−1/2
    * (Alberty 2003 eq 3.6-3); 2.91482 at 298.15 K.
    */
  def dhAlpha(t: Double = T0): Double =
    9.20483e-3 * t - 1.284668e-5 * t * t + 4.95199e-8 * t * t * t

  /** Extended Debye–Hückel factor α√I/(1+B√I), B = 1.6 M^−1/2. */
  def debyeHuckel(ionicStrength: Double, t: Double = T0): Double = {
    val s = math.sqrt(math.max(ionicStrength, 0.0))
    dhAlpha(t) * s / (1.0 + 1.6 * s)
  }

  /** ∆Gf°(Mg²⁺), kJ/mol (Alberty 2003 tables). */
  val dGfMg = -455.3

  /** One microspecies: ∆Gf° at I=0 (kJ/mol), H-atom count, net charge,
    * bound Mg count.
    */
  final case class Species(dGf0: Double, nH: Int, charge: Int, nMg: Int = 0)

  /** Legendre-transformed formation energy ∆G′f of one species at
    * (pH, I, pMg, T) — Alberty 2003 eq 4.4-9/10 extended with Mg
    * binding exactly as eQuilibrator's legendre_transform.
    */
  def legendre(
      sp: Species,
      pH: Double,
      ionicStrength: Double,
      pMg: Double = 14.0,
      t: Double = T0): Double =
    sp.dGf0 +
      sp.nH * rtLn10(t) * pH +
      sp.nMg * (rtLn10(t) * pMg - dGfMg) -
      debyeHuckel(ionicStrength, t) *
        (sp.charge * sp.charge - sp.nH - 4 * sp.nMg)

  /** Column twin of `legendre` (t fixed at T0): same constants, same
    * expression shape, whole-stage-codegen arithmetic.
    */
  def legendreCol(
      dGf0: Column,
      nH: Column,
      charge: Column,
      nMg: Column,
      pH: Column,
      ionicStrength: Column,
      pMg: Column): Column = {
    val s = sqrt(greatest(ionicStrength, lit(0.0)))
    val dh = lit(dhAlpha()) * s / (lit(1.0) + lit(1.6) * s)
    dGf0 +
      nH * lit(rtLn10()) * pH +
      nMg * (lit(rtLn10()) * pMg - lit(dGfMg)) -
      dh * (charge * charge - nH - lit(4) * nMg)
  }

  /** Pseudoisomer group average −RT·ln Σ exp(−g/RT) (Alberty eq 4.5-1),
    * log-sum-exp stabilized.
    */
  def isomerGroup(gs: Seq[Double], t: Double = T0): Double = {
    require(gs.nonEmpty, "isomerGroup of no species")
    val m = gs.min
    m - rt(t) * math.log(gs.map(g => math.exp(-(g - m) / rt(t))).sum)
  }

  /** Alberty 2003 reference species (I=0, kJ/mol, 298.15 K) — the
    * published BasicBiochemData table values, each compound with its
    * pH-relevant protonation microspecies. Internal consistency is
    * spec-pinned through the pKa values the adjacent microspecies
    * imply (ΔdGf0 / RT·ln10): acetate 4.75, NH4+ 9.25, carbonate
    * 6.37/10.33, succinate 5.64, citrate 6.39, AMP 6.73, G6P 6.42 —
    * all the published constants (ThermodynamicsSpec).
    *
    * NAD(H) follows Alberty's convention ΔGf°(NADox⁻) := 0 — the pair
    * is only meaningful inside reactions that conserve the NAD moiety
    * (as in the lactate-dehydrogenase pin).
    */
  val speciesTable: Map[String, Seq[Species]] = Map(
    "water" -> Seq(Species(-237.19, 2, 0)),
    "atp" -> Seq(Species(-2768.10, 12, -4), Species(-2811.48, 13, -3)),
    "adp" -> Seq(Species(-1906.13, 12, -3), Species(-1947.10, 13, -2)),
    "pi" -> Seq(Species(-1096.10, 1, -2), Species(-1137.30, 2, -1)),
    "amp" -> Seq(Species(-1040.45, 12, -2), Species(-1078.86, 13, -1)),
    "glucose" -> Seq(Species(-915.90, 12, 0)),
    "glucose6phos" -> Seq(
      Species(-1763.94, 11, -2), Species(-1800.59, 12, -1)),
    "acetate" -> Seq(Species(-369.31, 3, -1), Species(-396.45, 4, 0)),
    "acetaldehyde" -> Seq(Species(-139.00, 4, 0)),
    "ethanol" -> Seq(Species(-181.64, 6, 0)),
    "formate" -> Seq(Species(-351.04, 1, -1)),
    "lactate" -> Seq(Species(-516.72, 5, -1)),
    "pyruvate" -> Seq(Species(-472.27, 3, -1)),
    "succinate" -> Seq(Species(-690.44, 4, -2), Species(-722.62, 5, -1)),
    "fumarate" -> Seq(Species(-601.87, 2, -2)),
    "malate" -> Seq(Species(-842.66, 4, -2)),
    "citrate" -> Seq(
      Species(-1162.69, 5, -3), Species(-1199.18, 6, -2)),
    "co2tot" -> Seq(
      Species(-527.81, 0, -2), Species(-586.77, 1, -1),
      Species(-623.11, 2, 0)),
    "ammonia" -> Seq(Species(-26.50, 3, 0), Species(-79.31, 4, 1)),
    "glycerol" -> Seq(Species(-497.48, 8, 0)),
    "nadox" -> Seq(Species(0.0, 26, -1)),
    "nadred" -> Seq(Species(22.65, 27, -2)))

  /** Isomer-group ∆G′f of a table compound. */
  def dgfPrime(
      name: String,
      pH: Double,
      ionicStrength: Double,
      pMg: Double = 14.0,
      t: Double = T0): Double =
    isomerGroup(
      speciesTable(name).map(legendre(_, pH, ionicStrength, pMg, t)), t)

  /** Transformed reaction energy Σν·∆G′f(products) − Σν·∆G′f(reactants)
    * over table compounds (e.g. ATP hydrolysis:
    * atp + water -> adp + pi).
    */
  def dgrPrime(
      reactants: Seq[(Int, String)],
      products: Seq[(Int, String)],
      pH: Double,
      ionicStrength: Double,
      pMg: Double = 14.0,
      t: Double = T0): Double =
    products.map { case (k, c) => k * dgfPrime(c, pH, ionicStrength, pMg, t) }.sum -
      reactants.map { case (k, c) => k * dgfPrime(c, pH, ionicStrength, pMg, t) }.sum

  // --------------------------------------------------------------------
  // Group contribution for arbitrary molecules (calibration-grade).
  // --------------------------------------------------------------------

  /** Atom-centered contribution (kJ/mol) keyed on element, aromaticity,
    * H count and sorted heavy-neighbor elements; specific keys win over
    * per-element fallbacks. Values are calibration-grade (see object
    * doc), chosen so that oxidation states order correctly: each C–H →
    * C–O substitution and each C=O lowers ∆Gf°, phosphate/carboxylate
    * anions are strongly negative, and unstrained hydrocarbons sit near
    * zero — the orderings the ThermoFilter gate actually consumes.
    */
  private val groupTable: Map[String, Double] = Map(
    // carbon ladder (kJ/mol per atom-centered group)
    "C|H3|C" -> -40.0, // methyl
    "C|H2|C,C" -> -20.0, // methylene
    "C|H1|C,C,C" -> -5.0, // methine
    "C|H0|C,C,C,C" -> 10.0, // quaternary
    "C|H2|C,O" -> -65.0, // carbinol CH2
    "C|H1|C,C,O" -> -50.0, // carbinol CH
    "C|H0|C,O,O" -> -180.0, // carboxyl carbon
    "C|H1|C,O,O" -> -140.0, // hemiacetal / gem-diol CH
    "C|H0|C,C,O" -> -90.0, // ketone carbon (with =O neighbor)
    "C|H1|C,O" -> -95.0, // aldehyde carbon
    "C|arom" -> 15.0, // aromatic carbon
    "C|H4|" -> -50.0, // methane
    // heteroatoms
    "O|H1|C" -> -160.0, // hydroxyl
    "O|H0|C,C" -> -120.0, // ether
    "O|H0|C" -> -130.0, // carbonyl / carboxylate O
    "O|H0|C,P" -> -140.0, // phosphoester O
    "O|H0|P" -> -155.0, // phosphate terminal O
    "O|H1|P" -> -165.0, // phosphate OH
    "O|H0|P,P" -> -125.0, // pyrophosphate bridge
    "O|H2|" -> -237.19, // free water
    "N|H2|C" -> -30.0, // primary amine
    "N|H1|C,C" -> -15.0, // secondary amine
    "N|H0|C,C,C" -> 0.0, // tertiary amine
    "N|arom" -> 25.0, // aromatic nitrogen
    "P|H0|O,O,O,O" -> -260.0, // phosphate P
    "S|H1|C" -> 5.0, // thiol
    "S|H0|C,C" -> 15.0) // thioether

  private val elementFallback: Map[String, Double] = Map(
    "C" -> -10.0, "O" -> -130.0, "N" -> -10.0, "P" -> -200.0,
    "S" -> 10.0, "H" -> 0.0, "F" -> -200.0, "Cl" -> -60.0,
    "Br" -> -40.0, "I" -> -10.0)

  /** Per-ion electrostatic self-energy knob: each unit of formal charge
    * contributes −60 kJ/mol (anions in water are stabilized; the
    * Legendre z² term handles the I-dependence separately).
    */
  private val chargeTerm = -60.0

  /** Group-contribution ∆Gf° (I=0) for an arbitrary molecule:
    * origin + Σ atom-centered groups + charge terms. Deterministic pure
    * function of the molecular graph.
    */
  def groupFormationEnergy(m: Molecule): Double = {
    var sum = 0.0
    for (i <- 0 until m.n if m.atoms(i).elem != "H") {
      val a = m.atoms(i)
      val heavy = m.adj(i).map(t => m.atoms(t._1).elem)
        .filter(_ != "H").sorted.mkString(",")
      val key = s"${a.elem}|H${m.totalH(i)}|$heavy"
      sum += (if (a.aromatic) {
        groupTable.getOrElse(s"${a.elem}|arom",
          elementFallback.getOrElse(a.elem, 0.0))
      } else {
        groupTable.getOrElse(key,
          elementFallback.getOrElse(a.elem, 0.0))
      })
      sum += chargeTerm * math.abs(a.charge)
    }
    sum
  }

  /** Species view of an arbitrary molecule under the group model. */
  def speciesOf(m: Molecule): Species =
    Species(
      groupFormationEnergy(m),
      (0 until m.n).map(i =>
        if (m.atoms(i).elem == "H") 0 else m.totalH(i)).sum +
        m.atoms.count(_.elem == "H"),
      m.formalCharge)

  /** Per-molecule transformed formation energy under the group model —
    * the pluggable unit for ThermoFilter's component-contribution mode.
    * Reaction ∆G′r decomposes as Σν·f(products) − Σν·f(reactants).
    */
  def transformedFormation(
      pH: Double = 7.0,
      ionicStrength: Double = 0.25,
      pMg: Double = 14.0,
      t: Double = T0): Molecule => Double =
    m => legendre(speciesOf(m), pH, ionicStrength, pMg, t)
}
