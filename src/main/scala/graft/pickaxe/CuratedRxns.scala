package graft.pickaxe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curated-reaction sheet ingest + rule-preprocessing one-offs — the
  * analogs of the reference's last three uncovered Scripts.
  *
  * 1. `add_rxns_from_excel.py` (Scripts/add_rxns_from_excel.py:11-49):
  *    a two-sheet workbook — compounds (Abbreviation, SMILES) and
  *    reactions (text equations over those abbreviations plus curation
  *    metadata) — inserted into a MINE. The Excel container format is
  *    not readable in this environment, so the ingest takes the two
  *    sheets as DataFrames (CSV/TSV or any tabular source); the
  *    SEMANTICS — abbreviation resolution with the built-in
  *    `hn -> [*]` wildcard, ` = `/` + ` text-equation parsing with
  *    integer stoichiometric prefixes, per-reaction reference-list
  *    splitting on `'; '`, and the engine's reaction content hash —
  *    are what this module implements.
  *
  * 2. `RxnRuleProcessing.py` (Scripts/RxnRuleProcessing.py:22-53):
  *    operator-file maintenance — extract the rule names an engine
  *    error log flagged as unbalanced, rotate those rules'
  *    ';'-separated Products list right by one (deque.rotate(1)), and
  *    translate coreactant display names to compound ids against the
  *    coreactant TSV.
  *
  * 3. `print_top_30_rxns.py` (Scripts/print_top_30_rxns.py:63-77) /
  *    `compound_io.export_inchi_rxns` (compound_io.py:349-406): given
  *    seed external-database links, collect every reaction consuming a
  *    linked compound and render the `(stoich) name[inchi]` equation
  *    rows of the reactions TSV export.
  *
  * Spark-first shape: the sheets are driver-side curated artifacts
  * (like the engine's rule TSVs), so chemistry runs once per sheet row
  * and the resolved tables are DataFrames; the top-reactions export is
  * a pure DataFrame pipeline (semi-join on the exploded link array,
  * explode-join-reaggregate for the equation strings) that would run
  * unchanged against a billion-row reaction table.
  */
object CuratedRxns {

  /** One resolved curated compound: abbreviation -> id + gen-0 row. */
  final case class CuratedCompound(
      abbreviation: String, smiles: String, cId: String)

  /** Compound sheet -> (abbreviation -> c_id map, gen-0 rows, failures).
    * Mirrors the script's insert loop (add_rxns_from_excel.py:17-31):
    * parse the SMILES, insert at Generation 0, remember the id under
    * the TRIMMED abbreviation; a missing or unparseable SMILES is
    * reported, not fatal. The `hn` wildcard pre-seeds the map with
    * `[*]` exactly as the script's `abrv` initializer does.
    */
  def compoundSheet(rows: Seq[(String, String)])
      : (Map[String, String], Seq[CuratedCompound], Seq[String]) = {
    val resolved = Seq.newBuilder[CuratedCompound]
    val failed = Seq.newBuilder[String]
    for ((abbr0, smi) <- rows) {
      val abbr = abbr0.trim
      if (smi == null || smi.trim.isEmpty) failed += s"SMILES missing: $abbr"
      else graft.chem.Chem.standardize(smi.trim) match {
        case Some(can) =>
          resolved += CuratedCompound(
            abbr, can, graft.chem.Chem.compoundHash(can, 'C'))
        case None => failed += s"Failed to parse $smi"
      }
    }
    val cs = resolved.result()
    val abrv = Map("hn" -> "[*]") ++ cs.map(c => c.abbreviation -> c.cId)
    (abrv, cs, failed.result())
  }

  /** Parse a text equation `"2 A + B = C"` into (reactants, products)
    * stoich tuples under the abbreviation map — the older
    * `utils.parse_text_rxn(rxn, ' = ', ' + ', abrv)` contract the
    * script calls (removed from the reference as of v2.2.0; semantics
    * reconstructed from the call site and format). Each ` + `-separated
    * term is an optional integer coefficient plus an abbreviation;
    * repeated compounds merge by summing (the engine's E5 stoich
    * normal form). Unknown abbreviations yield Left (the script's
    * KeyError path).
    */
  def parseTextRxn(
      equation: String,
      abrv: Map[String, String]): Either[String, (Seq[Stoich], Seq[Stoich])] = {
    def half(s: String): Either[String, Seq[Stoich]] = {
      val terms = s.split(" \\+ ").map(_.trim).filter(_.nonEmpty)
      val parsed = terms.map { t =>
        val (k, name) = t.split(" ", 2) match {
          case Array(n, rest) if n.forall(_.isDigit) => (n.toInt, rest.trim)
          case _ => (1, t)
        }
        abrv.get(name).toRight(s"Could not parse $name").map(id => (k, id))
      }
      parsed.collectFirst { case Left(e) => Left(e) }.getOrElse {
        val merged = parsed.collect { case Right(t) => t }
          .groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (id, ks) => Stoich(ks.map(_._1).sum, id) }
        Right(merged)
      }
    }
    equation.split(" = ", 2) match {
      case Array(l, r) =>
        for (lhs <- half(l); rhs <- half(r)) yield (lhs, rhs)
      case _ => Left(s"No ' = ' separator in: $equation")
    }
  }

  /** One reactions-sheet row (the script's column subset). */
  final case class RxnSheetRow(
      metabolite: String,
      equationAbbrev: String,
      equationFull: String,
      pmidOrDoi: String, // empty when the sheet cell was blank
      typeOfReaction: String,
      comments: String)

  /** Reactions sheet -> (reactions, rejected). References split on
    * `'; '` (add_rxns_from_excel.py:38-41); a blank/whitespace PMID
    * cell yields an EMPTY reference list (the script's single-element
    * fallback only fires for non-string cells, which a text sheet
    * never produces — an empty cell must not fabricate a `""`
    * reference in the MINE table). The reaction hash is
    * the engine's P11 content hash over the resolved stoich tuples.
    * Rows with an empty equation are skipped like the script's
    * "RXN missing" branch; unknown abbreviations are rejected rows.
    */
  def ingest(
      spark: SparkSession,
      rows: Seq[RxnSheetRow],
      abrv: Map[String, String]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = rows.filter(_.equationAbbrev.trim.nonEmpty).map { r =>
      parseTextRxn(r.equationAbbrev, abrv) match {
        case Right((re, pr)) =>
          val refs =
            if (r.pmidOrDoi.trim.isEmpty) Seq.empty[String]
            else r.pmidOrDoi.trim.split("; ").toSeq
          Right((RuleKernel.reactionHash(re, pr), r.metabolite,
            r.equationFull, refs, r.typeOfReaction.trim, r.comments.trim,
            re, pr))
        case Left(e) => Left((r.metabolite, e))
      }
    }
    val reactions = parsed.collect { case Right(t) => t }
      .toDF("InChI_hash", "Metabolite", "Equation_full", "References",
        "Type", "Notes", "Reactants", "Products")
    val rejected = parsed.collect { case Left(t) => t }
      .toDF("Metabolite", "reason")
    (reactions, rejected)
  }

  // ------------------------------------------------------------------
  // RxnRuleProcessing.py
  // ------------------------------------------------------------------

  private val UnbalancedRe =
    """Warning: Unbalanced Reaction produced by (\d\.\d+\.-?\d+\.\w)""".r

  /** Rule names flagged unbalanced in an engine error log
    * (RxnRuleProcessing.py:45-47's findall over the same pattern).
    */
  def unbalancedOps(errorLog: String): Set[String] =
    UnbalancedRe.findAllMatchIn(errorLog).map(_.group(1)).toSet

  /** Rotate the ';'-separated Products list right by one
    * (deque.rotate(1): last element moves to front) for every rule
    * whose Name is in `ops` — the script's fix for product-order-
    * sensitive unbalanced rules. Pure column expressions, no UDF.
    */
  def rotateProducts(
      rules: DataFrame, ops: Set[String],
      nameCol: String = "Name",
      productsCol: String = "Products"): DataFrame = {
    val parts = split(col(productsCol), ";")
    val rotated = concat_ws(";",
      concat(slice(parts, -1, 1), expr(
        s"slice(split($productsCol, ';'), 1, " +
          s"size(split($productsCol, ';')) - 1)")))
    rules.withColumn(productsCol,
      when(col(nameCol).isin(ops.toSeq: _*) && size(parts) > 1, rotated)
        .otherwise(col(productsCol)))
  }

  /** Translate a ';'-joined coreactant NAME list to compound ids
    * against the coreactant table (RxnRuleProcessing.py:8-19's
    * `name_to_cid`; `Any` passes through). Unknown names -> null,
    * the script's printed-and-None path.
    */
  def nameToCid(names: String, core: Map[String, String]): Option[String] = {
    val full = core + ("Any" -> "Any")
    val parts = names.split(";").map(_.trim)
    if (parts.forall(full.contains)) Some(parts.map(full).mkString(";"))
    else None
  }

  // ------------------------------------------------------------------
  // print_top_30_rxns.py / export_inchi_rxns
  // ------------------------------------------------------------------

  /** Reactions consuming any compound whose external-link array
    * intersects `seedLinks` — the script's Model-SEED walk
    * (print_top_30_rxns.py:66-74): compounds carry a `DB_links`
    * map-like column (here `db_links: array<string>`), reactions are
    * collected through the derived Reactant_in adjacency. A semi-join
    * on the exploded link array; no driver loop over seed ids.
    */
  def reactionsForLinkedCompounds(
      compounds: DataFrame, // _id, db_links: array<string>
      reactions: DataFrame, // _id, Reactants, Products, ...
      seedLinks: Seq[String]): DataFrame = {
    val spark = compounds.sparkSession
    import spark.implicits._
    val seeds = broadcast(seedLinks.toDF("link"))
    val hitCompounds = compounds
      .select(col("_id"), explode(col("db_links")).as("link"))
      .join(seeds, Seq("link"))
      .select("_id").distinct()
    val consuming = reactions
      .select(col("_id").as("r_id"), explode(col("Reactants")).as("m"))
      .select(col("r_id"), col("m.c_id").as("_id"))
      .join(hitCompounds, Seq("_id"), "left_semi")
      .select("r_id").distinct()
    reactions.join(consuming.withColumnRenamed("r_id", "_id"),
      Seq("_id"), "left_semi")
  }

  /** The reactions-TSV export rows (export_inchi_rxns,
    * compound_io.py:349-406): `Reaction Rule` = Operators joined
    * ", ", `ID` = _id, `Equation` = both sides rendered as
    * `(stoich) name[inchi]` joined " + " around " => ". Names/InChIs
    * come from the compound table (first name, the script's
    * `Names[0]`-or-MINE_id fallback); the explode-join-reaggregate
    * keeps per-side member ORDER by re-sorting on the original array
    * position, so the rendered equation is deterministic.
    */
  def exportInchiRxns(
      compounds: DataFrame, // _id, name, inchi
      reactions: DataFrame): DataFrame = {
    val dim = compounds.select(col("_id").as("c_id"),
      col("name"), col("inchi"))
    def side(colName: String, label: String) = reactions
      .select(col("_id"), posexplode(col(colName)).as(Seq("pos", "m")))
      .select(col("_id"), lit(label).as("side"), col("pos"),
        col("m.stoich").as("stoich"), col("m.c_id").as("c_id"))
    val rendered = side("Reactants", "r")
      .unionByName(side("Products", "p"))
      .join(dim, Seq("c_id"), "left")
      .withColumn("term", concat(
        lit("("), col("stoich"), lit(") "),
        coalesce(col("name"), col("c_id")),
        lit("["), coalesce(col("inchi"), lit("")), lit("]")))
      .groupBy("_id", "side")
      .agg(concat_ws(" + ",
        array_sort(collect_list(struct(col("pos"), col("term"))))
          .getField("term")).as("half"))
      .groupBy("_id")
      .pivot("side", Seq("r", "p"))
      .agg(first("half"))
    reactions
      .select(col("_id"),
        concat_ws(", ", col("Operators")).as("Reaction Rule"))
      .join(rendered, Seq("_id"))
      .select(col("Reaction Rule"), col("_id").as("ID"),
        concat(col("r"), lit(" => "), col("p")).as("Equation"))
  }
}
