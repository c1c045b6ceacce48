package graft.pickaxe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.chem.{Formula, Smiles}
import graft.operators.Sampling

/** Per-generation frontier filters (reference `filters` package, SURVEY §2.9).
  * Each returns the `_id`s whose Expand flag is cleared — pure
  * DataFrame -> DataFrame combinators, applied in declaration order.
  */

/** MW window filter (filters/property.py MWFilter): block frontier
  * compounds outside [minMass, maxMass] Da.
  */
final case class MolWeightFilter(
    minMass: Double = 0.0,
    maxMass: Double = Double.MaxValue) extends NetworkFilter {
  override def name = s"MW [$minMass,$maxMass]"
  override def blocked(state: NetworkState): DataFrame =
    state.compounds
      .where(col("Generation") === state.generation && col("Expand"))
      .where(col("Mass") < minMass || col("Mass") > maxMass)
      .select("_id")
}

/** Atomic-composition filter (filters/property.py AtomicCompositionFilter):
  * per-element allowed count ranges, computed from the Formula column.
  */
final case class AtomCompositionFilter(
    ranges: Map[String, (Int, Int)]) extends NetworkFilter {
  override def name = s"AtomComposition $ranges"
  override def blocked(state: NetworkState): DataFrame = {
    val okUdf = udf { formula: String =>
      val counts = Formula.parseFormula(formula)
      ranges.forall { case (e, (lo, hi)) =>
        val k = counts.getOrElse(e, 0); k >= lo && k <= hi
      }
    }
    state.compounds
      .where(col("Generation") === state.generation && col("Expand"))
      .where(!okUdf(col("Formula")))
      .select("_id")
  }
}

/** Tanimoto similarity-cutoff filter (filters/similarity.py
  * SimilarityFilter): block compounds whose max fingerprint similarity
  * to ANY target is below the per-generation threshold
  * (crit[min(gen, len-1)], similarity.py:610-616 — W7).
  */
final case class TanimotoCutoffFilter(
    targetSmiles: Seq[String],
    thresholds: Seq[Double]) extends NetworkFilter {
  override def name = s"TanimotoCutoff $thresholds"
  override def blocked(state: NetworkState): DataFrame = {
    import graft.expressions.BitTanimoto
    // packed-bitset fingerprints: popcount AND/OR beats set intersection
    val targetFps = targetSmiles
      .map(s => BitTanimoto.pack(Formula.fingerprint(Smiles.parse(s))))
    val crit = thresholds(math.min(state.generation, thresholds.length - 1))
    val simUdf = udf { smiles: String =>
      val fp = BitTanimoto.pack(Formula.fingerprint(Smiles.parse(smiles)))
      // short-circuits at the threshold like similarity.py:761-763
      targetFps.exists(t => BitTanimoto.tanimoto(fp, t) >= crit)
    }
    state.compounds
      .where(col("Generation") === state.generation && col("Expand") &&
        !col("Type").isin("Coreactant", "Target Compound"))
      .where(!simUdf(col("SMILES")))
      .select("_id")
  }
}

/** MCS filter (filters/mcs.py): block frontier compounds whose best
  * MCS score vs any target — (atoms+bonds)_mcs / (atoms+bonds)_target,
  * similarity.py:959-974 — is below the per-generation threshold.
  * Bounded-search MCS kernel (chem.MCS); exact on small molecules.
  */
final case class MCSFilter(
    targetSmiles: Seq[String],
    thresholds: Seq[Double],
    budget: Int = 20000) extends NetworkFilter {
  override def name = s"MCS $thresholds"
  override def blocked(state: NetworkState): DataFrame = {
    val targets = targetSmiles.map(Smiles.parse)
    val crit = thresholds(math.min(state.generation, thresholds.length - 1))
    val okUdf = udf { smiles: String =>
      val m = Smiles.parse(smiles)
      targets.exists(t => graft.chem.MCS.mcsScore(m, t, budget) >= crit)
    }
    state.compounds
      .where(col("Generation") === state.generation && col("Expand") &&
        !col("Type").isin("Coreactant", "Target Compound"))
      .where(!okUdf(col("SMILES")))
      .select("_id")
  }
}

/** Weighted similarity sampling filter (filters/similarity.py
  * SimilaritySamplingFilter, D8): keep a weighted sample of N frontier
  * compounds, weight = maxSim^4, via the deterministic exponential-clocks
  * top-k (Sampling.weightedSample) instead of the reference's
  * nondeterministic inverse-CDF loop.
  */
final case class TanimotoSamplingFilter(
    targetSmiles: Seq[String],
    sampleSize: Int,
    minSim: Double = 0.15) extends NetworkFilter {
  override def name = s"TanimotoSampling n=$sampleSize"
  override def blocked(state: NetworkState): DataFrame = {
    import graft.expressions.BitTanimoto
    val targetFps = targetSmiles
      .map(s => BitTanimoto.pack(Formula.fingerprint(Smiles.parse(s))))
    val simUdf = udf { smiles: String =>
      val fp = BitTanimoto.pack(Formula.fingerprint(Smiles.parse(smiles)))
      targetFps.map(t => BitTanimoto.tanimoto(fp, t)).maxOption.getOrElse(0.0)
    }
    val frontier = state.compounds
      .where(col("Generation") === state.generation && col("Expand") &&
        !col("Type").isin("Coreactant", "Target Compound"))
      .withColumn("maxsim", simUdf(col("SMILES")))
    val eligible = frontier.where(col("maxsim") > minSim)
    val kept = Sampling.weightedSample(
      eligible, pow(col("maxsim"), 4.0), col("_id"), sampleSize)
    frontier.select("_id")
      .join(kept.select("_id"), Seq("_id"), "left_anti")
  }
}
