package graft.pickaxe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.chem.{Chem, Formula, Smiles}

/** The network state: the two core tables + generation counter. */
final case class NetworkState(
    compounds: DataFrame,
    reactions: DataFrame,
    generation: Int)

/** A per-generation frontier filter (reference Filter ABC,
  * filters/base_filter.py:17-86): returns the `_id`s whose Expand flag
  * must be cleared before the generation expands.
  */
trait NetworkFilter {
  def name: String
  def blocked(state: NetworkState): DataFrame // single `_id` column
  /** When true (the default — the reference's `_apply_filter_results`
    * runs after EVERY filter, base_filter.py:163-286), blocked compounds
    * are REMOVED from the network with the cascade semantics (a compound
    * survives while a surviving reaction references it; Starting
    * Compounds and Coreactants are never removed — a documented deviation:
    * the reference can delete a generation-0 start that no reaction
    * protects). Override to false for flag-only filtering.
    */
  def removes: Boolean = true

  /** Reaction `_id`s to DELETE outright (the thermodynamics/feasibility
    * filters return reaction sets — thermodynamics.py:159,
    * feasibility.py:102); deletion cascades to orphaned compounds
    * (base_filter.py:216-238). Default: none. Override
    * `deletesReactions` to true alongside this — the engine skips the
    * whole reaction-deletion pass (one Spark action per filter per
    * generation) for filters that never return one.
    */
  def blockedReactions(state: NetworkState): DataFrame =
    state.reactions.select("_id").limit(0)

  /** Static hint: does this filter ever return blocked reactions? */
  def deletesReactions: Boolean = false

  /** Content ids of the filter's target compounds, if it has any —
    * the prune-between-generations whitelist keeps compounds identical
    * to a target even when they are not marked for expansion
    * (pickaxe.py:630-637: `f"T{cpd_id[1:]}" in self.targets`).
    */
  def targetIds: Seq[String] = Nil
}

/** Spark-native Pickaxe: iterative rule-driven network expansion
  * (reference driver loop transform_all, pickaxe.py:610-685).
  *
  * Dataflow per generation (SURVEY.md §2.3):
  *   frontier select (P1) -> flatMap over broadcast rules (E2/E3/J1/J2)
  *   -> reaction groupBy-merge with operator set-union (A1/D2)
  *   -> compound anti-join dedup, first-generation-wins (D1/E6)
  * with persist + localCheckpoint per generation for flat lineage.
  *
  * Scale design: the only shuffles are the two groupBy/anti-join merges
  * per generation, both hash-partitioned on content ids; rules and
  * coreactants are broadcast (they are small dimension tables); the
  * chemistry runs inside one flatMap (per-partition imperative kernel,
  * the documented exception to expression-only plans).
  */
final class PickaxeEngine(
    spark: SparkSession,
    val rules: Seq[RuleRow],
    val coreactants: Seq[CoreactantRow],
    /** Run the rule kernel on explicit-H molecules (the reference's
      * `explicit_h` flag, default False — pickaxe.py:147). Rules whose
      * SMARTS bind hydrogen atoms (`[#1...]`) need true; implicit mode
      * lets H counts re-derive after rewiring, like RDKit.
      */
    val explicitH: Boolean = false) extends Serializable {

  import spark.implicits._

  private val coreactantMap: Map[String, (String, String)] =
    coreactants.map(c => c.name -> (c.smiles, c._id)).toMap

  import PickaxeEngine.mkCompound

  /** S2: standardize + hash + dedup starting compounds. */
  def loadStarting(smiles: Seq[String]): Seq[CompoundRow] =
    smiles.flatMap(Chem.standardize(_))
      .filter(Chem.isOrganic)
      .distinct
      .map(s => mkCompound(Chem.compoundHash(s, 'C'), s,
        "Starting Compound", 0, expand = true))

  def initialState(startingSmiles: Seq[String]): NetworkState = {
    val start = loadStarting(startingSmiles)
    val core = coreactants.map(c =>
      mkCompound(c._id, c.smiles, "Coreactant", 0, expand = false))
    val compounds = (start ++ core).toDF()
      .dropDuplicates("_id")
    NetworkState(compounds, spark.emptyDataset[ReactionRow].toDF(), 0)
  }

  /** DataFrame-seed initial state: `starting` carries compound rows in
    * the [[CompoundRow]] schema — already standardized, organic-
    * filtered, and content-hashed (the shape
    * [[PickaxeEngine.loadCompoundFile]] emits). Nothing crosses the
    * driver and no chemistry re-runs: the Seq overload is for
    * template-scale seed lists; a MetaNetX-scale (~1M compound) seed
    * must load gen 0 distributed.
    */
  def initialState(starting: DataFrame): NetworkState = {
    val core = coreactants.map(c =>
      mkCompound(c._id, c.smiles, "Coreactant", 0, expand = false)).toDF()
    NetworkState(
      starting.unionByName(core).dropDuplicates("_id"),
      spark.emptyDataset[ReactionRow].toDF(), 0)
  }

  /** One generation: filters -> frontier -> kernel -> merge (E1/E2/E6). */
  /** Apply the filter chain to the current frontier: clear Expand
    * flags, cascade-delete removed compounds/reactions. This is the
    * per-iteration filter pass of transform_all (pickaxe.py:628-629);
    * `run` also invokes it once more after the last expansion when
    * `filterAfterFinalGen` is set (pickaxe.py:624-626).
    */
  def applyFilters(
      state: NetworkState,
      filters: Seq[NetworkFilter]): NetworkState =
    // filters run in declaration order (pickaxe.py:628-629); a filter
    // with `removes` additionally cascade-deletes its blocked set
    filters.foldLeft(state) { (st, f) =>
      // materialize the (small) blocked id-set ONCE when it has TWO
      // consumers (Expand-flag join + removal cascade) — without the
      // checkpoint the scoring chain re-runs per consumer. A
      // non-removing filter has a single consumer, so the checkpoint
      // would only add a sequential driver job (guide §7.3: these
      // fixture-scale runs are job-latency-bound, ~40-100 ms each)
      val blockedPlan = f.blocked(st)
        .select(col("_id").as("__blocked_id")).distinct()
      val blocked =
        if (f.removes) blockedPlan.localCheckpoint() else blockedPlan
      val cpds = st.compounds.join(broadcast(blocked),
          st.compounds("_id") === col("__blocked_id"), "left")
        .withColumn("Expand",
          col("Expand") && col("__blocked_id").isNull)
        .drop("__blocked_id")
      val withFlags = st.copy(compounds = cpds)
      val afterCpds =
        if (f.removes)
          Cascade.cascadeDelete(withFlags,
            blocked.select(col("__blocked_id").as("_id")))
        else withFlags
      if (!f.deletesReactions) afterCpds
      else {
        // same one-shot materialization: the thermo/feasibility scoring
        // chain (explode + regroup + per-member parse) feeds both the
        // isEmpty gate and deleteReactions
        val badRxns = f.blockedReactions(afterCpds).select("_id").distinct()
          .localCheckpoint()
        if (badRxns.isEmpty) afterCpds
        else Cascade.deleteReactions(afterCpds, badRxns)
      }
    }

  def expandOnce(
      state: NetworkState,
      filters: Seq[NetworkFilter] = Nil,
      pruneBetweenGens: Boolean = false): NetworkState = {
    val g = state.generation
    val filteredState0 = applyFilters(state, filters)
    // prune_between_gens (pickaxe.py:631-645): after the filter pass
    // and before expanding, restrict the network to everything needed
    // to produce the whitelist — expanding compounds, coreactants, and
    // compounds identical to a filter target
    val filteredState =
      if (pruneBetweenGens && filters.nonEmpty) {
        val tgt = filters.flatMap(_.targetIds).distinct
        val white = filteredState0.compounds
          .where(col("Expand") || col("Type") === "Coreactant" ||
            (if (tgt.isEmpty) lit(false) else col("_id").isin(tgt: _*)))
          .select("_id")
        pruneNetwork(filteredState0, white)
      } else filteredState0
    val afterFilters = filteredState.compounds
    // P1 frontier predicate (pickaxe.py:658-664)
    val frontier = afterFilters
      .where(col("Generation") === g && col("Expand") &&
        !col("Type").isin("Coreactant", "Target Compound"))
      .select("_id", "SMILES").as[(String, String)]

    val rulesB = spark.sparkContext.broadcast(rules)
    val coreB = spark.sparkContext.broadcast(coreactantMap)
    val eh = explicitH
    // LAZY localCheckpoint, not persist: a persisted kernel output opts
    // every shuffle above it out of AQE re-partitioning, so the
    // reaction-merge groupBy materialized 32-wide for a handful of rows
    // (profiled 1.2-1.6 s task time on every pickaxe query's first
    // generation). The lazy form keeps persist's schedule (the kernel
    // materializes inside the first consumer job, overlapped with the
    // two concurrent state checkpoints, BlockManager partition locks
    // guaranteeing single compute) while caching the AQE-final RDD —
    // the eager form was measured to add one sequential job per
    // generation (q_pickaxe_skeleton +0.4 s).
    val predicted = frontier.flatMap { case (id, smi) =>
      RuleKernel.applyAll(id, smi, rulesB.value, coreB.value, explicitH = eh)
    }.toDF().localCheckpoint(eager = false)

    // D2/A1: reaction merge with operator set-union
    val newRxns = predicted
      .groupBy(col("rxnId").as("_id"))
      .agg(
        first("smilesRxn").as("SMILES_rxn"),
        first("reactants").as("Reactants"),
        first("products").as("Products"),
        array_sort(collect_set("operator")).as("Operators"))
    val mergedRxns =
      // generation 0 starts with a typed empty reactions table; the
      // full_outer merge also handles an empty old side correctly, so
      // this branch is a plan-size optimization, not a correctness one —
      // and the generation check costs no Spark action
      if (state.generation == 0) newRxns
        .select(col("_id"), lit("").as("ID"), col("Reactants"),
          col("Products"), col("Operators"), col("SMILES_rxn"))
      else filteredState.reactions.as("old")
        .join(newRxns.as("new"), Seq("_id"), "full_outer")
        .select(
          col("_id"),
          coalesce(col("old.ID"), lit("")).as("ID"),
          coalesce(col("old.Reactants"), col("new.Reactants")).as("Reactants"),
          coalesce(col("old.Products"), col("new.Products")).as("Products"),
          array_sort(array_distinct(concat(
            coalesce(col("old.Operators"), array()),
            coalesce(col("new.Operators"), array())))).as("Operators"),
          coalesce(col("old.SMILES_rxn"), col("new.SMILES_rxn"))
            .as("SMILES_rxn"))

    // D1/E6: compound dedup, first-generation-wins via anti-join
    val newCpds = predicted
      .select(explode(col("productSmiles")).as("p"))
      .select(col("p._1").as("_id"), col("p._2").as("SMILES"))
      .dropDuplicates("_id")
      .join(afterFilters.select("_id"), Seq("_id"), "left_anti")
      .as[(String, String)]
      .map { t => PickaxeEngine.mkCompound(t._1, t._2, "Predicted", g + 1,
        expand = true) }
      .toDF()

    val mergedCpds = afterFilters
      // expanded frontier is done (Expand=false), like the reference's
      // post-gen flag clear
      .withColumn("Expand",
        when(col("Generation") === g, lit(false)).otherwise(col("Expand")))
      .unionByName(newCpds)

    // localCheckpoint alone (NO Dataset-level persist): it is eager and
    // self-caching, while a .persist() wrapper pinned every shuffle
    // under it to the static spark.sql.shuffle.partitions width (cached
    // plans opt out of AQE re-partitioning), materializing 32-wide
    // states of a handful of rows — and leaked one InMemoryRelation per
    // generation. Without it AQE coalesces the state width to the DATA
    // (1 partition at fixture scale, advisory-sized at MINE scale) —
    // the scale-adaptive partitioning the optimization brief asks for.
    // The two materializations are independent jobs; run them from two
    // driver threads so their (driver-latency-dominated) schedules
    // overlap instead of queueing (guide §2.6 "overlap independent
    // jobs") — the shared `predicted` checkpoint above already holds
    // the kernel output, so both jobs read cached blocks.
    val (outC, outR) = PickaxeEngine.concurrently(
      mergedCpds.localCheckpoint(),
      mergedRxns.localCheckpoint())
    NetworkState(outC, outR, g + 1)
  }

  /** transform_all (pickaxe.py:610-685). `filterAfterFinalGen` runs the
    * filter chain once more on the final generation (pickaxe.py:624-626
    * — the ctor's `filter_after_final_gen`, default True there; kept
    * false here for continuity with the count pins, which the
    * reference's own filter tests set explicitly). `pruneBetweenGens`
    * restricts the network to the expansion whitelist between
    * generations (pickaxe.py:631-645).
    */
  def run(
      startingSmiles: Seq[String],
      generations: Int,
      filters: Seq[NetworkFilter] = Nil,
      filterAfterFinalGen: Boolean = false,
      pruneBetweenGens: Boolean = false): NetworkState =
    runFrom(initialState(startingSmiles), generations, filters,
      filterAfterFinalGen, pruneBetweenGens)

  /** transform_all from a prebuilt initial state — the entry point for
    * DataFrame seeds (`runFrom(initialState(seedDf), ...)`), so a
    * large seed set never collects to the driver.
    */
  def runFrom(
      initial: NetworkState,
      generations: Int,
      filters: Seq[NetworkFilter] = Nil,
      filterAfterFinalGen: Boolean = false,
      pruneBetweenGens: Boolean = false): NetworkState = {
    val expanded =
      (0 until generations).foldLeft(initial) {
        (st, _) => expandOnce(st, filters, pruneBetweenGens)
      }
    if (filterAfterFinalGen) applyFilters(expanded, filters) else expanded
  }

  /** A13: derived adjacency (Reactant_in / Product_of arrays). */
  def adjacency(state: NetworkState): DataFrame = {
    val rIn = state.reactions
      .select(col("_id").as("rxn"), explode(col("Reactants")).as("m"))
      .groupBy(col("m.c_id").as("_id"))
      .agg(array_sort(collect_set("rxn")).as("Reactant_in"))
    val pOf = state.reactions
      .select(col("_id").as("rxn"), explode(col("Products")).as("m"))
      .groupBy(col("m.c_id").as("_id"))
      .agg(array_sort(collect_set("rxn")).as("Product_of"))
    state.compounds.select("_id")
      .join(rIn, Seq("_id"), "left")
      .join(pOf, Seq("_id"), "left")
      .select(col("_id"),
        coalesce(col("Reactant_in"), array()).as("Reactant_in"),
        coalesce(col("Product_of"), array()).as("Product_of"))
  }

  /** D4/D5: prune to targets — reverse BFS over the bipartite graph
    * (find_minimal_set, pickaxe.py:995-1044), as iterative semi-joins.
    *
    * SIZE-GATED HYBRID: the multi-round distributed BFS pays dozens of
    * Spark jobs of fixed overhead; on small networks (the common
    * interactive case — a few generations of expansion) that overhead
    * dominates. Below `localRxnThreshold` reactions the membership pairs
    * are collected once and the identical reverse BFS runs driver-side;
    * past the gate the iterative semi-join path runs unchanged, so
    * cluster-scale networks never collect.
    */
  def pruneToTargets(
      state: NetworkState,
      targetSmiles: Seq[String],
      localRxnThreshold: Long = 200_000L): NetworkState = {
    val targetIds = targetSmiles.flatMap(Chem.standardize(_))
      .map(s => Chem.compoundHash(s, 'C'))
    if (targetIds.isEmpty)
      return NetworkState(state.compounds.limit(0), state.reactions.limit(0),
        state.generation)
    pruneNetwork(state,
      state.compounds.where(col("_id").isin(targetIds: _*)).select("_id"),
      localRxnThreshold, localSeedIds = Some(targetIds))
  }

  /** D4/D5 prune with a DISTRIBUTED target set: `targetIds` is a
    * 1-column `_id` DataFrame (the shape
    * [[PickaxeRun.loadTargetIds]] emits). Identical keep-set semantics
    * to the Seq overload — absent target ids contribute nothing to the
    * reverse BFS on either path — but the target list never crosses
    * the driver above `pruneNetwork`'s local gate, which only ever
    * collects ids PRESENT in the network.
    */
  def pruneToTargetsDf(
      state: NetworkState,
      targetIds: DataFrame,
      localRxnThreshold: Long = 200_000L): NetworkState = {
    if (targetIds.isEmpty)
      return NetworkState(state.compounds.limit(0),
        state.reactions.limit(0), state.generation)
    val present = state.compounds
      .join(targetIds.select("_id").distinct(), Seq("_id"), "left_semi")
      .select("_id")
    pruneNetwork(state, present, localRxnThreshold)
  }

  /** General whitelist prune (prune_network / find_minimal_set,
    * pickaxe.py:995-1044): keep everything on a production path to a
    * whitelist member, plus coreactants. `pruneToTargets` and the
    * between-generations prune (pickaxe.py:631-645) both land here.
    * Same size-gated hybrid as documented above; `localSeedIds` lets a
    * caller that already holds the seed ids skip the collect on the
    * local path.
    */
  def pruneNetwork(
      state: NetworkState,
      whitelist: DataFrame,
      localRxnThreshold: Long = 200_000L,
      localSeedIds: Option[Seq[String]] = None): NetworkState = {
    if (state.reactions.count() <= localRxnThreshold) {
      val seedIds = localSeedIds.getOrElse(
        whitelist.select("_id").as[String].collect().toSeq)
      return pruneToTargetsLocal(state, seedIds)
    }
    val seeds = whitelist
      .select(col("_id").as("c_id")).distinct()
    val prodM = state.reactions
      .select(col("_id").as("rxn"), explode(col("Products")).as("m"))
      .select(col("rxn"), col("m.c_id").as("c_id")).localCheckpoint()
    val reacM = state.reactions
      .select(col("_id").as("rxn"), explode(col("Reactants")).as("m"))
      .select(col("rxn"), col("m.c_id").as("c_id")).localCheckpoint()

    // loop on the compound side only (producing reactions -> their
    // reactant compounds per round); the kept-reaction set equals
    // "reactions producing a kept compound", derived once at the end
    var keepC = seeds.localCheckpoint()
    var frontier = keepC
    var done = false
    while (!done) {
      val reached = prodM.join(frontier, Seq("c_id"), "left_semi")
        .select("rxn").distinct()
      val newC = reacM.join(reached, Seq("rxn"), "left_semi")
        .where(col("c_id").startsWith("C"))
        .select("c_id").distinct()
        .join(keepC, Seq("c_id"), "left_anti").localCheckpoint()
      if (newC.isEmpty) done = true
      else {
        keepC = keepC.union(newC).localCheckpoint() // disjoint by anti-join
        frontier = newC
      }
    }
    val keepR = prodM.join(keepC, Seq("c_id"), "left_semi")
      .select("rxn").distinct().localCheckpoint()
    // keep every C member (both sides) of kept reactions, plus seeds
    val memberC = prodM.union(reacM)
      .join(keepR, Seq("rxn"), "left_semi")
      .where(col("c_id").startsWith("C"))
      .select("c_id").union(keepC.select("c_id")).distinct()
    val prunedC = state.compounds.join(
      memberC.withColumnRenamed("c_id", "_id"), Seq("_id"), "left_semi")
    val keepAll = state.compounds
      .where(col("Type") === "Coreactant").select("_id")
      .union(prunedC.select("_id"))
    val outC = state.compounds.join(keepAll.distinct(), Seq("_id"), "left_semi")
    val outR = state.reactions.join(keepR.withColumnRenamed("rxn", "_id"),
      Seq("_id"), "left_semi")
    NetworkState(outC, outR, state.generation)
  }

  /** Driver-side twin of the distributed reverse BFS above — identical
    * keep-set semantics, one collect of the (rxn, member) pairs.
    */
  private def pruneToTargetsLocal(
      state: NetworkState,
      targetIds: Seq[String]): NetworkState = {
    import scala.collection.mutable
    val members = state.reactions
      .select(col("_id").as("rxn"), col("Reactants"), col("Products"))
      .as[(String, Seq[Stoich], Seq[Stoich])]
      .collect()
    // producedBy: c_id -> reactions with it as a product
    val producedBy = mutable.HashMap.empty[String, mutable.ArrayBuffer[String]]
    val reactantsOf = mutable.HashMap.empty[String, Seq[String]]
    val prodIds = mutable.HashMap.empty[String, Seq[String]]
    members.foreach { case (rxn, reac, prod) =>
      prod.foreach(m =>
        producedBy.getOrElseUpdate(m.c_id, mutable.ArrayBuffer.empty) += rxn)
      reactantsOf(rxn) = reac.map(_.c_id).filter(_.startsWith("C"))
      prodIds(rxn) = prod.map(_.c_id)
    }
    val keepC = mutable.HashSet[String](targetIds: _*)
    val queue = mutable.Queue[String](targetIds: _*)
    val keepR = mutable.HashSet.empty[String]
    while (queue.nonEmpty) {
      val c = queue.dequeue()
      producedBy.getOrElse(c, Nil).foreach { rxn =>
        if (keepR.add(rxn))
          reactantsOf(rxn).foreach { r =>
            if (keepC.add(r)) queue.enqueue(r)
          }
      }
    }
    // keep every C member (both sides) of kept reactions, plus seeds
    val memberC = keepC ++ keepR.iterator.flatMap(r =>
      (reactantsOf(r) ++ prodIds(r)).filter(_.startsWith("C")))
    val memberDf = memberC.toSeq.toDF("_id")
    val outC = state.compounds.where(col("Type") === "Coreactant")
      .unionByName(state.compounds.join(broadcast(memberDf), Seq("_id"),
        "left_semi").where(col("Type") =!= "Coreactant"))
    val outR = state.reactions.join(
      broadcast(keepR.toSeq.toDF("_id")), Seq("_id"), "left_semi")
    NetworkState(outC, outR, state.generation)
  }

  /** W1: dense export ids (assign_ids, pickaxe.py:1046-1102) — via the
    * distributed two-pass rank (operators.DenseIds), not a global
    * `row_number() over (order by ...)` window: the window form moves
    * every row through one task, which is fine for a golden-file
    * export and a straggler on a 100 TB network table. Result is
    * bit-identical (the (Generation, _id) / (_id) orders are total).
    */
  def assignIds(state: NetworkState): NetworkState = {
    import graft.operators.DenseIds
    val cpds = DenseIds.withDenseRank(state.compounds,
        Seq(col("Generation"), col("_id")))
      .withColumn("ID", format_string("pkc%07d", col("__rank")))
      .drop("__rank")
    val rxns = DenseIds.withDenseRank(state.reactions, Seq(col("_id")))
      .withColumn("ID", format_string("pkr%07d", col("__rank")))
      .drop("__rank")
    NetworkState(cpds, rxns, state.generation)
  }

  /** TSV export (pickaxe.py:1104-1163): deterministic order by ID. */
  def writeTsv(state: NetworkState, outDir: String): Unit = {
    val st = assignIds(state)
    st.compounds
      .select("ID", "Type", "Generation", "Formula", "SMILES")
      .orderBy("ID")
      .coalesce(1)
      .write.mode("overwrite").option("sep", "\t").option("header", "true")
      .csv(s"$outDir/compounds")
    st.reactions
      .withColumn("Rxn_hash", col("_id"))
      .select("ID", "Rxn_hash", "SMILES_rxn")
      .orderBy("ID")
      .coalesce(1)
      .write.mode("overwrite").option("sep", "\t").option("header", "true")
      .csv(s"$outDir/reactions")
  }
}

object PickaxeEngine {

  /** Evaluate two independent Spark actions from two driver threads
    * (guide §2.6): local-mode jobs are driver-latency-dominated at
    * fixture scale, so overlapping their schedules halves the
    * per-generation materialization latency. Daemon threads; FIFO
    * scheduling lets the second job back-fill the first one's tail.
    */
  private[pickaxe] def concurrently[A, B](a: => A, b: => B): (A, B) =
    // delegate to the shared helper: fresh daemon threads per call (no
    // fixed pool a nested use could deadlock), caller-thread Spark
    // local properties captured per call, and the ORIGINAL exception
    // rethrown instead of ExecutionException (round-18 ADVICE)
    graft.operators.Par.concurrently(a, b)

  /** S2: compound-file ingest (load_compound_set, pickaxe.py:445-495):
    * CSV/TSV/JSON dispatched on extension (file_to_dict_list,
    * utils.py:71-94 — `.tsv` tab, `.csv` comma, `.json` a JSON array of
    * records, anything else is an error), structure column detected by
    * name (`smiles` / `inchi` / `structure`, case-insensitive —
    * pickaxe.py:463-470), standardize -> organic filter -> content-hash
    * dedup. InChI values are reconstructed by `graft.chem.InChI` (bond
    * orders via valence-deficiency matching; unsupported layers are
    * skipped).
    */
  def loadCompoundFile(
      spark: SparkSession,
      path: String): DataFrame = {
    import spark.implicits._
    val raw =
      if (path.contains(".tsv"))
        spark.read.option("header", "true").option("sep", "\t").csv(path)
      else if (path.contains(".csv"))
        spark.read.option("header", "true").csv(path)
      else if (path.contains(".json"))
        // the reference json.loads a whole array of records; multiLine
        // reads exactly that shape (and still accepts JSON-lines files)
        spark.read.option("multiLine", "true").json(path)
      else sys.error("Unrecognized input file type")
    val structureField = raw.columns
      .find(c => Set("smiles", "inchi", "structure")(c.toLowerCase))
      .getOrElse(sys.error("Structure field not found in input."))
    raw.select(col(structureField).as("structure"))
      .where(col("structure").isNotNull)
      .as[String]
      .flatMap { s =>
        val smiles =
          if (s.startsWith("InChI=")) graft.chem.InChI.toCanonicalSmiles(s)
          else Some(s)
        smiles.flatMap(graft.chem.Chem.standardize(_))
      }
      .filter((s: String) => graft.chem.Chem.isOrganic(s))
      .distinct()
      .map(s => mkCompound(graft.chem.Chem.compoundHash(s, 'C'), s,
        "Starting Compound", 0, expand = true))
      .toDF()
  }

  /** Compound row with kernel-computed properties (static: safe to use
    * inside task closures without capturing the engine).
    */
  def mkCompound(
      id: String, smiles: String, cType: String, gen: Int,
      expand: Boolean): CompoundRow = {
    val m = Smiles.parse(smiles)
    CompoundRow(id, "", smiles, cType, gen,
      Formula.hillFormula(m), m.formalCharge, Formula.exactMass(m), expand)
  }

  /** S4: coreactant TSV (`#`-comments; columns #ID, Name, SMILES). */
  def parseCoreactants(lines: Seq[String]): Seq[CoreactantRow] =
    lines.filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .flatMap { l =>
        val p = l.split("\t")
        if (p.length < 2) None
        else {
          val name = p(0).trim
          val smi = p.last.trim
          Chem.standardize(smi, allowFragments = true).map { canon =>
            CoreactantRow(name, canon, Chem.compoundHash(canon, 'X'))
          }
        }
      }

  /** S5: rule TSV (header Name/Reactants/SMARTS/Products; `#` comments;
    * `;`-separated role lists; referential check vs coreactants).
    */
  def parseRules(
      lines: Seq[String],
      coreactants: Seq[CoreactantRow]): Seq[RuleRow] = {
    val names = coreactants.map(_.name).toSet
    val rows = lines
      .filterNot(l => l.startsWith("Name\t") || l.startsWith("#") ||
        l.trim.isEmpty)
    rows.flatMap { l =>
      val p = l.split("\t")
      if (p.length < 4) None
      else {
        val roles = p(1).split(";").map(_.trim).toSeq
        val prodRoles = p(3).split(";").map(_.trim).toSeq
        require(roles.forall(r => r == "Any" || names.contains(r)),
          s"rule ${p(0)}: unknown coreactant in $roles")
        Some(RuleRow(p(0).trim, roles, p(2).trim, prodRoles))
      }
    }
  }
}
