package graft.chem

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins for the component-contribution thermodynamics physics
  * (reference: minedatabase/thermodynamics.py:81-360 via eQuilibrator).
  * Everything pinned here is PUBLISHED physical chemistry (Alberty
  * 2003), not calibration: the Debye–Hückel coefficient, the species
  * table's implied pKa values, the exact pH slope of the transform, and
  * Alberty's Mg-free ATP-hydrolysis value at pH 7, I = 0.25.
  */
class ThermodynamicsSpec extends SparkSuite {

  import Thermodynamics._

  test("constants: RT·ln10 = 5.708 kJ/mol, α(298.15 K) = 2.91482") {
    assert(math.abs(rtLn10() - 5.708) < 0.001)
    assert(math.abs(dhAlpha() - 2.91482) < 0.002)
    // extended DH factor at physiological I = 0.25 M
    assert(math.abs(debyeHuckel(0.25) - 0.80969) < 0.001)
    assert(debyeHuckel(0.0) === 0.0)
  }

  test("species table reproduces published pKa values (I = 0)") {
    // pKa = ΔG°(deprotonation) / RT·ln10, from adjacent microspecies
    def pka(name: String): Double = {
      val Seq(base, acid) = speciesTable(name).sortBy(_.nH)
      // HA -> A- + H+: ΔG° = G(base) − G(acid); pKa = ΔG°/RT·ln10
      (base.dGf0 - acid.dGf0) / rtLn10()
    }
    assert(math.abs(pka("atp") - 7.60) < 0.02) // ATP4- / HATP3-
    assert(math.abs(pka("adp") - 7.18) < 0.02) // ADP3- / HADP2-
    assert(math.abs(pka("pi") - 7.22) < 0.02) // HPO4 2- / H2PO4-
    assert(math.abs(pka("amp") - 6.73) < 0.02) // AMP2- / HAMP-
    assert(math.abs(pka("acetate") - 4.75) < 0.02) // textbook 4.756
    assert(math.abs(pka("ammonia") - 9.25) < 0.02) // NH4+ 9.25
    assert(math.abs(pka("succinate") - 5.64) < 0.02) // pKa2
    assert(math.abs(pka("citrate") - 6.39) < 0.02) // pKa3
    assert(math.abs(pka("glucose6phos") - 6.42) < 0.02)
    // carbonate: both steps from the 3-species ladder
    val Seq(co3, hco3, h2co3) = speciesTable("co2tot").sortBy(_.nH)
    assert(math.abs((hco3.dGf0 - h2co3.dGf0) / rtLn10() - 6.37) < 0.02)
    assert(math.abs((co3.dGf0 - hco3.dGf0) / rtLn10() - 10.33) < 0.02)
  }

  test("published reaction dG' values from the extended table") {
    // hexokinase: glucose + ATP -> G6P + ADP, pH 7, I = 0.25, in the
    // same Mg-FREE frame as the pinned -36.04 ATP hydrolysis (the
    // textbook -17 is the Mg-physiological number; Mg-free sits ~7
    // lower, exactly like ATP hydrolysis -36.04 vs textbook -30.5)
    val hex = dgrPrime(
      Seq(1 -> "glucose", 1 -> "atp"),
      Seq(1 -> "glucose6phos", 1 -> "adp"),
      pH = 7.0, ionicStrength = 0.25)
    assert(hex > -27.0 && hex < -22.0, s"hexokinase dG'=$hex")
    // cross-check: hexokinase − (G6P hydrolysis) = ATP hydrolysis,
    // and G6P + H2O -> glucose + Pi is the textbook ~ -11..-14
    val g6pHyd = dgrPrime(
      Seq(1 -> "glucose6phos", 1 -> "water"),
      Seq(1 -> "glucose", 1 -> "pi"),
      pH = 7.0, ionicStrength = 0.25)
    assert(g6pHyd > -14.5 && g6pHyd < -10.0, s"G6P hydrolysis=$g6pHyd")
    val atpHyd = dgrPrime(
      Seq(1 -> "atp", 1 -> "water"), Seq(1 -> "adp", 1 -> "pi"),
      pH = 7.0, ionicStrength = 0.25)
    assert(math.abs(hex + g6pHyd - atpHyd) < 1e-9,
      "phosphoryl-transfer thermodynamic cycle must close exactly")
    // lactate dehydrogenase: pyruvate + NADH -> lactate + NAD+
    // (NAD convention pair conserves the moiety), pH 7, I = 0.25 —
    // published ~ -25 kJ/mol
    val ldh = dgrPrime(
      Seq(1 -> "pyruvate", 1 -> "nadred"),
      Seq(1 -> "lactate", 1 -> "nadox"),
      pH = 7.0, ionicStrength = 0.25)
    assert(ldh > -28.0 && ldh < -22.0, s"LDH dG'=$ldh")
    // adenylate kinase: ATP + AMP -> 2 ADP is near-equilibrium
    val adk = dgrPrime(
      Seq(1 -> "atp", 1 -> "amp"), Seq(2 -> "adp"),
      pH = 7.0, ionicStrength = 0.25)
    assert(math.abs(adk) < 5.0, s"adenylate kinase dG'=$adk")
  }

  test("Legendre pH slope is exactly N_H·RT·ln10 per pH unit") {
    val sp = Species(-1000.0, 5, -2)
    val d = legendre(sp, 8.0, 0.1) - legendre(sp, 7.0, 0.1)
    assert(math.abs(d - 5 * rtLn10()) < 1e-9)
    // ionic strength affects (z² − nH): raising I STABILIZES a z=-2,
    // nH=1 species (z² − nH = 3 > 0 → transformed G drops)
    val pi = speciesTable("pi").head
    assert(legendre(pi, 7.0, 0.25) < legendre(pi, 7.0, 0.0))
    // and DEstabilizes when nH > z² (water: 0 − 2 < 0)
    val w = speciesTable("water").head
    assert(legendre(w, 7.0, 0.25) > legendre(w, 7.0, 0.0))
  }

  test("pMg term: bound Mg adds nMg·(RT·ln10·pMg − ΔGf(Mg²⁺))") {
    val sp = Species(-2000.0, 10, -2, nMg = 1)
    val d = legendre(sp, 7.0, 0.0, pMg = 4.0) -
      legendre(sp, 7.0, 0.0, pMg = 3.0)
    assert(math.abs(d - rtLn10()) < 1e-9)
    val noMg = sp.copy(nMg = 0)
    // at I=0 the Mg contribution is exactly nMg(RTln10·pMg − dGfMg)
    assert(math.abs(
      legendre(sp, 7.0, 0.0, pMg = 3.0) - legendre(noMg, 7.0, 0.0) -
        (rtLn10() * 3.0 - dGfMg)) < 1e-9)
  }

  test("ATP hydrolysis: Alberty's Mg-free −36.04 kJ/mol at pH 7, " +
    "I = 0.25; more favorable at higher pH") {
    val dg = dgrPrime(
      Seq(1 -> "atp", 1 -> "water"), Seq(1 -> "adp", 1 -> "pi"),
      pH = 7.0, ionicStrength = 0.25)
    assert(math.abs(dg - (-36.04)) < 0.15, s"dG'=$dg vs published -36.04")
    // monotone in pH over 5..9 (the reference's test_dgr_prime shape:
    // low-pH vs high-pH dg' differ, high pH more negative)
    val grid = Seq(5.0, 6.0, 7.0, 8.0, 9.0).map(p =>
      dgrPrime(Seq(1 -> "atp", 1 -> "water"), Seq(1 -> "adp", 1 -> "pi"),
        p, 0.25))
    assert(grid.zip(grid.tail).forall { case (a, b) => b < a })
  }

  test("isomerGroup: log-sum-exp below the min, reduces to identity " +
    "for one species, and is stable at biological magnitudes") {
    assert(isomerGroup(Seq(-2300.0)) === -2300.0)
    val g = isomerGroup(Seq(-2300.0, -2300.0))
    // two equal isomers: G' = g − RT·ln2
    assert(math.abs(g - (-2300.0 - rt() * math.log(2.0))) < 1e-9)
    assert(g < -2300.0)
    // a 50 kJ/mol higher isomer is irrelevant (no overflow either)
    assert(math.abs(isomerGroup(Seq(-2300.0, -2250.0)) - -2300.0) < 1e-6)
  }

  test("legendreCol matches the scalar legendre bit-for-bit on a grid") {
    import spark.implicits._
    val sps = speciesTable.toSeq.flatMap { case (n, ss) => ss.map(n -> _) }
    val rows = for {
      (name, sp) <- sps
      ph <- Seq(5.0, 7.0, 9.0); i <- Seq(0.0, 0.1, 0.25); pmg <- Seq(3.0, 14.0)
    } yield (name, sp.dGf0, sp.nH.toDouble, sp.charge.toDouble,
      sp.nMg.toDouble, ph, i, pmg,
      legendre(sp, ph, i, pmg))
    val df = rows.toDF("c", "dgf0", "nh", "z", "nmg", "ph", "i", "pmg", "want")
      .withColumn("got", Thermodynamics.legendreCol(
        col("dgf0"), col("nh"), col("z"), col("nmg"),
        col("ph"), col("i"), col("pmg")))
    val bad = df.where(abs(col("got") - col("want")) > lit(1e-9)).count()
    assert(bad === 0)
  }

  test("group model: oxidation ordering and determinism for the filter") {
    def g(smi: String) = groupFormationEnergy(Smiles.parse(smi))
    // each C–H → C–OH substitution lowers ΔGf (alcohols below alkanes)
    assert(g("CCO") < g("CC"))
    // carboxylate is far below the alcohol
    assert(g("CC(=O)[O-]") < g("CCO"))
    // determinism across parse order / atom labeling
    assert(g("OCC") === g("CCO"))
    val sp = speciesOf(Smiles.parse("CCO"))
    assert(sp.nH === 6 && sp.charge === 0)
    // transformedFormation is finite and pH-monotone (nH > 0)
    val f7 = transformedFormation(7.0, 0.25)(Smiles.parse("CCO"))
    val f8 = transformedFormation(8.0, 0.25)(Smiles.parse("CCO"))
    assert(math.abs((f8 - f7) - 6 * rtLn10()) < 1e-9)
  }

  test("group model: MEASURED |ΔGf°| error bound vs the Alberty table " +
    "(held-out — the table never fed the group constants)") {
    // The 'calibration-grade' label as a number: for every Alberty
    // table compound whose dominant species has a drawable structure,
    // compare the group-contribution ΔGf° (I=0) against the published
    // species value matched by (nH, charge). The group constants were
    // chosen for oxidation-state ORDERING (the ThermoFilter gate's
    // contract), never fitted to these absolutes, so this is a
    // held-out error audit.
    val cases: Seq[(String, String)] = Seq(
      "water" -> "O",
      "acetate" -> "CC(=O)[O-]",
      "ethanol" -> "CCO",
      "acetaldehyde" -> "CC=O",
      "formate" -> "C(=O)[O-]",
      "lactate" -> "CC(O)C(=O)[O-]",
      "pyruvate" -> "CC(=O)C(=O)[O-]",
      "succinate" -> "[O-]C(=O)CCC(=O)[O-]",
      "fumarate" -> "[O-]C(=O)C=CC(=O)[O-]",
      "malate" -> "[O-]C(=O)CC(O)C(=O)[O-]",
      "citrate" -> "[O-]C(=O)CC(O)(CC(=O)[O-])C(=O)[O-]",
      "glucose" -> "OCC1OC(O)C(O)C(O)C1O",
      "glycerol" -> "OCC(O)CO",
      "ammonia" -> "N",
      "glucose6phos" -> "OC1OC(COP(=O)([O-])[O-])C(O)C(O)C1O",
      "pi" -> "OP(=O)([O-])[O-]",
      "co2tot" -> "OC(=O)O")
    val errs = cases.map { case (name, smi) =>
      val m = Smiles.parse(smi)
      val sp = speciesOf(m)
      val ref = Thermodynamics.speciesTable(name)
        .find(s => s.charge == sp.charge)
        .getOrElse(fail(s"$name: no table species at charge ${sp.charge}"))
      // the structure must carry the species' hydrogen count — a
      // mismatch would compare different protonation states
      assert(sp.nH === ref.nH, s"$name: nH ${sp.nH} vs table ${ref.nH}")
      val err = groupFormationEnergy(m) - ref.dGf0
      info(f"$name%-14s group=${groupFormationEnergy(m)}%9.1f " +
        f"table=${ref.dGf0}%9.1f err=$err%8.1f kJ/mol")
      name -> err
    }
    val maxAbs = errs.map { case (_, e) => math.abs(e) }.max
    val rms = math.sqrt(
      errs.map { case (_, e) => e * e }.sum / errs.size)
    info(f"max |err| = $maxAbs%.1f kJ/mol, rms = $rms%.1f kJ/mol " +
      f"over ${errs.size} held-out species")
    // the measured bound, pinned (round 15: max 547.3, rms 277.9 —
    // a systematic negative bias on oxygenated carbons): the
    // estimator is calibration-grade, NOT quantitative — regressed
    // component-contribution constants would be needed for that
    // (eQuilibrator's artifact, unavailable offline; the reference
    // has the same caveat without its cache)
    assert(maxAbs <= 560.0,
      f"held-out |err| grew past the documented bound: $maxAbs%.1f")
    assert(rms <= 290.0,
      f"held-out rms error grew past the documented bound: $rms%.1f")
    // and the gate's actual contract survives on the same held-out
    // set: oxidation ordering (carboxylate below carbonyl below
    // alkane; alcohols below alkanes)
    val g = (s: String) => groupFormationEnergy(Smiles.parse(s))
    assert(g("CC(=O)[O-]") < g("CC=O") && g("CC=O") < g("CC"))
    assert(g("CCO") < g("CC"))
  }

  test("ThermoFilter.componentContribution keeps the formation-energy " +
    "sign convention: dG'r = Σ products − Σ reactants") {
    // Thermo.deltaG sums model(reactants) − model(products) with the
    // negated formation model, which equals formation products−reactants
    val f = Thermodynamics.transformedFormation(7.0, 0.25)
    val filt = graft.pickaxe.ThermoFilter.componentContribution(
      dgMax = 0.0, pH = 7.0, ionicStrength = 0.25)
    val r = Smiles.parse("CCO")
    val p = Smiles.parse("CC=O")
    val viaFilter = graft.pickaxe.Thermo.deltaG(
      Seq(1 -> r), Seq(1 -> p), filt.model)
    assert(math.abs(viaFilter - (f(p) - f(r))) < 1e-9)
  }
}
