package graft.pickaxe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MetaNetX/MNXref ingest — the compound-reference database builder
  * (reference: Scripts/generate_metanetx_database.py:1-85). The script
  * reads the public MNXref `chem_prop.tsv` / `chem_xref.tsv` dumps,
  * keeps chem_prop rows that carry BOTH an InChIKey and a formula,
  * groups each compound's cross-references, and lands
  * `{mnxm_id, inchikey, primary_reference, cross_references[]}`
  * documents indexed by InChIKey.
  *
  * Spark-first shape: both dumps are line-oriented TSV with a large
  * `#`-prefixed comment preamble (347 lines in MNXref 4.1) — they are
  * read as text, comment lines dropped by predicate (no driver-side
  * skiprows counting, so the preamble may grow or shrink), and split
  * positionally against the published column layout. The xref grouping
  * is one hash-shuffle groupBy on the MNXM id; the final stitch is a
  * single equi-join that AQE broadcasts when the xref side is small.
  * At the real dump's scale (~1M compounds, ~10M xrefs) every stage is
  * a narrow scan + one shuffle each — no driver materialization.
  */
object MetaNetX {

  /** MNXref 4.1 chem_prop column layout (mnxref docs):
    * #ID name reference formula charge mass InChI InChIKey SMILES
    */
  def readChemProp(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, 9)
      .select(
        col("c")(0).as("mnxm_id"),
        col("c")(1).as("name"),
        col("c")(2).as("reference"),
        col("c")(3).as("formula"),
        col("c")(4).as("charge"),
        col("c")(5).as("mass"),
        col("c")(6).as("inchi"),
        col("c")(7).as("inchikey"),
        col("c")(8).as("smiles"))

  /** MNXref 4.1 chem_xref column layout: #source ID description. */
  def readChemXref(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, 3)
      .select(
        col("c")(0).as("source_raw"),
        col("c")(1).as("mnxm_id"),
        col("c")(2).as("description"))

  /** The script's per-row transform (generate_metanetx_database.py:32-45):
    * a `prefix:id` source splits into (source, source_id); a bare source
    * uses itself for both. Mirrors the script's `.split(":")[1]` exactly
    * (second colon-delimited token, not the remainder).
    */
  def splitXref(xref: DataFrame): DataFrame =
    xref.withColumn("parts", split(col("source_raw"), ":"))
      .select(
        col("mnxm_id"),
        when(size(col("parts")) > 1, col("parts")(0))
          .otherwise(col("source_raw")).as("source"),
        when(size(col("parts")) > 1, col("parts")(1))
          .otherwise(col("source_raw")).as("source_id"),
        // pandas NaN description -> None (script line 41-44)
        when(col("description") === "" ||
          col("description").isNull, lit(null: String))
          .otherwise(col("description")).as("description"))

  /** The full build (script lines 57-85): chem_prop rows with InChIKey
    * AND formula, each carrying its grouped cross-reference list. The
    * reference preserves file order inside `cross_references`; here the
    * list is sorted by (source, source_id) so the output is
    * deterministic under any partitioning — documented divergence, the
    * set of references is identical.
    */
  def compoundReferences(chemProp: DataFrame, chemXref: DataFrame)
      : DataFrame = {
    val refs = splitXref(chemXref)
      .groupBy("mnxm_id")
      .agg(sort_array(collect_list(
        struct(col("source"), col("source_id"), col("description"))))
        .as("cross_references"))
    chemProp
      .where(col("inchikey").isNotNull && col("inchikey") =!= "" &&
        col("formula").isNotNull && col("formula") =!= "")
      .select(col("mnxm_id"), col("inchikey"),
        col("reference").as("primary_reference"))
      // chem_prop's #ID is unique in the dump; the script's dict keyed
      // by #ID would silently collapse duplicates, so mirror that
      .dropDuplicates("mnxm_id")
      .join(refs, Seq("mnxm_id"), "left")
      .withColumn("cross_references",
        coalesce(col("cross_references"),
          array().cast("array<struct<source:string,source_id:string," +
            "description:string>>")))
  }

  /** The website's lookup path (the script's `create_index("Inchikey")`
    * analog): a broadcast semi-probe of the reference table by InChIKey.
    * For a persistent deployment, land `compoundReferences` bucketed by
    * `inchikey` (MineSink.saveBucketed) so probes are exchange-free.
    */
  def lookupByInchiKey(refs: DataFrame, keys: DataFrame): DataFrame =
    refs.join(broadcast(keys.select(col("inchikey")).distinct()),
      Seq("inchikey"))

  /** Comment-preamble-tolerant TSV reader: keeps any line with at least
    * `minCols` tab-separated fields that is not a `#` comment. The
    * header itself starts with `#` (`#ID`, `#source`), so it is dropped
    * by the same predicate — positional layout comes from the docs.
    */
  private def tsv(spark: SparkSession, path: String, minCols: Int)
      : DataFrame =
    spark.read.textFile(path).toDF("line")
      .where(!col("line").startsWith("#") && col("line") =!= "")
      .select(split(col("line"), "\t", -1).as("c"))
      .where(size(col("c")) >= minCols)
}
