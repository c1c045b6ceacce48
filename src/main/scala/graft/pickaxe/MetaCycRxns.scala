package graft.pickaxe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MetaCyc curated-reaction ingest — the `add_metacyc_rxns.py` analog
  * (reference: Scripts/add_metacyc_rxns.py:27-90). The script walks a
  * reactions TSV row by row, resolves each ` // `-joined compound list
  * against an SDF's FRAME-ID molecules, rejects reactions that are
  * atom-unbalanced, reference an undefined compound, or change nothing,
  * and inserts the survivors with stoichiometric compound-hash tuples
  * plus their MetaCyc citation trail.
  *
  * Spark-first shape: the SDF (a curated local artifact, thousands of
  * molecules) is parsed once on the driver and broadcast; the reactions
  * table is a DataFrame pipeline — explode the compound lists, count
  * per-compound stoichiometry with a groupBy (the script's
  * `collections.Counter`), broadcast-join the compound dictionary, and
  * aggregate both half-reactions back per reaction with their summed
  * element vectors. Balance and no-change checks are column
  * expressions over the aggregated rows, so a 100M-row curated dump
  * would stream through two hash shuffles; nothing but the SDF
  * dictionary ever sits on the driver.
  */
object MetaCycRxns {

  /** FRAME-ID -> (canonical SMILES, compound hash, element counts);
    * chemistry runs here once per SDF molecule (sanctioned driver-side
    * parse of a local curated file, as with the engine's rule TSVs).
    * The hash follows the engine's standardize path (neutralize +
    * canonical — utils.get_compound_hash); the element vector comes
    * from the molecule as drawn in the SDF, matching the script's
    * CalcMolFormula on the raw supplier mol (add_metacyc_rxns.py:36-41).
    */
  def compoundDict(sdfContent: String): Map[String, CompoundEntry] =
    graft.chem.MolFile.parseSdf(sdfContent).flatMap {
      case (smiles, props) => // parseSdf yields (canonical SMILES, fields)
        for {
          fid <- props.get("FRAME-ID")
          can <- graft.chem.Chem.standardize(smiles, allowFragments = true)
        } yield fid -> CompoundEntry(
          can,
          graft.chem.Chem.compoundHash(can, 'C'),
          graft.chem.Formula.atomCounts(graft.chem.Smiles.parse(smiles)))
    }.toMap

  /** Reactions TSV (tab-delimited with a header row) -> raw columns.
    * The script reads `MetaCyc ID`, `Citations`,
    * `Reactants of reaction`, `Products of reaction` (csv.DictReader,
    * add_metacyc_rxns.py:50-57).
    */
  def readReactionsTsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .csv(path)
      .select(
        col("MetaCyc ID").as("metacyc_id"),
        col("Citations").as("citations"),
        col("Reactants of reaction").as("reactants_raw"),
        col("Products of reaction").as("products_raw"))

  /** The full ingest: returns (reactions, rejected).
    *
    * `reactions`: metacyc_id, references (citations stripped of
    * `"[]"` quoting + the `MetaCyc: <id>` trailer, script :53-57),
    * reactants/products as sorted (stoich, c_id) structs.
    * `rejected`: metacyc_id + reason — the script's printed-and-skipped
    * ValueErrors (`Undefined Compound`, `Unbalanced Reaction`,
    * `No Change`), kept as data instead of stdout.
    */
  def ingest(raw: DataFrame, dict: Map[String, CompoundEntry])
      : (DataFrame, DataFrame) = {
    val spark = raw.sparkSession
    import spark.implicits._

    val dictDf = broadcast(dict.toSeq.map { case (fid, e) =>
      (fid, e.cId, e.atoms.toSeq.map(t => (t._1, t._2)))
    }.toDF("frame_id", "c_id", "atoms"))

    // one exploded relation for both sides: (metacyc_id, side, frame_id)
    def side(colName: String, label: String) =
      raw.select(col("metacyc_id"),
          explode(split(col(colName), " // ")).as("frame_id"))
        .withColumn("side", lit(label))
    val members = side("reactants_raw", "r")
      .unionByName(side("products_raw", "p"))
      .groupBy("metacyc_id", "side", "frame_id")
      .agg(count(lit(1)).cast("int").as("stoich"))

    val resolved = members.join(dictDf, Seq("frame_id"), "left")

    // per (reaction, side): stoich tuples + element sums + unresolved?
    val halves = resolved
      .select(col("metacyc_id"), col("side"),
        col("frame_id"), col("stoich"), col("c_id"),
        // per-member element vector scaled by stoichiometry
        when(col("atoms").isNotNull,
          expr("transform(atoms, a -> struct(a._1 as elem, " +
            "a._2 * stoich as n))"))
          .as("satoms"))
      .groupBy("metacyc_id", "side")
      .agg(
        max(when(col("c_id").isNull, 1).otherwise(0)).as("undefined"),
        sort_array(collect_list(struct(col("stoich"), col("c_id"))))
          .as("tuples"),
        collect_list(col("satoms")).as("avecs"))
      // element multiset of the half-reaction: flatten then re-sum
      .withColumn("elems", expr(
        "aggregate(flatten(avecs), cast(map() as map<string,int>), " +
          "(acc, x) -> map_concat(map_filter(acc, (k, v) -> k != x.elem), " +
          "map(x.elem, coalesce(acc[x.elem], 0) + x.n)))"))
      .drop("avecs")

    val r = halves.where(col("side") === "r")
      .select(col("metacyc_id"), col("undefined").as("r_undef"),
        col("tuples").as("reactants"), col("elems").as("r_elems"))
    val p = halves.where(col("side") === "p")
      .select(col("metacyc_id"), col("undefined").as("p_undef"),
        col("tuples").as("products"), col("elems").as("p_elems"))
    val joined = raw.select("metacyc_id", "citations")
      .join(r, Seq("metacyc_id"), "left")
      .join(p, Seq("metacyc_id"), "left")
      .withColumn("reason",
        when(col("r_undef") === 1 || col("p_undef") === 1,
          lit("Undefined Compound"))
          // Counter equality: same element -> same total on both sides
          .when(!mapEq(col("r_elems"), col("p_elems")),
            lit("Unbalanced Reaction"))
          .when(col("reactants") === col("products"), lit("No Change")))

    val reactions = joined.where(col("reason").isNull)
      .select(
        col("metacyc_id"),
        concat(
          // Citations split on ' // ' with '"[]"' stripping (script :53-55)
          when(col("citations").isNotNull && col("citations") =!= "",
            expr("transform(split(citations, ' // '), " +
              """x -> regexp_replace(x, '^["\\[\\]]+|["\\[\\]]+$', ''))"""))
            .otherwise(array(coalesce(col("citations"), lit("None")))),
          array(concat(lit("MetaCyc: "), col("metacyc_id"))))
          .as("references"),
        col("reactants"), col("products"))

    val rejected = joined.where(col("reason").isNotNull)
      .select("metacyc_id", "reason")
    (reactions, rejected)
  }

  /** Gen-0 compound rows for every compound referenced by a kept
    * reaction (the script's `inserted` set + `add_metacyc_comps`):
    * distinct c_ids joined back to the broadcast dictionary.
    */
  def compoundsToInsert(
      reactions: DataFrame, dict: Map[String, CompoundEntry]): DataFrame = {
    val spark = reactions.sparkSession
    import spark.implicits._
    val dictDf = broadcast(dict.values.toSeq.distinct
      .map(e => (e.cId, e.smiles)).toDF("c_id", "smiles"))
    reactions
      .select(explode(concat(col("reactants"), col("products"))).as("t"))
      .select(col("t.c_id").as("c_id")).distinct()
      .join(dictDf, Seq("c_id"))
      .withColumn("Generation", lit(0))
  }

  /** Element-map equality that treats missing and zero alike on BOTH
    * maps (Counter subtraction semantics, script :62).
    */
  private def mapEq(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    expr(s"""forall(map_keys(map_concat(
        map_filter(${b.toString}, (k, v) -> not array_contains(
          map_keys(${a.toString}), k)), ${a.toString})),
      k -> coalesce(${a.toString}[k], 0) = coalesce(${b.toString}[k], 0))""")
}

final case class CompoundEntry(
    smiles: String, cId: String, atoms: Map[String, Int])
