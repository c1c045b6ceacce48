package graft.pickaxe

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** MetaNetX ingest parity with Scripts/generate_metanetx_database.py:
  * preamble-tolerant TSV read, InChIKey+formula gate, xref source
  * split, grouped cross-reference lists, InChIKey lookup.
  */
class MetaNetXSpec extends SparkSuite {

  private lazy val dir = {
    val d = Files.createTempDirectory("mnx").toFile
    d.deleteOnExit()
    val prop =
      """#Comment preamble line 1
        |#RESOURCE:  MetaNetX/MNXref
        |#ID	name	reference	formula	charge	mass	InChI	InChIKey	SMILES
        |MNXM1	H(+)	mnx:PROTON	H	1	1.008	InChI=1S/p+1	GPRLSGONYQIRFK-UHFFFAOYSA-N	[H+]
        |MNXM2	water	chebi:15377	H2O	0	18.015	InChI=1S/H2O/h1H2	XLYOFNOQVPJJNP-UHFFFAOYSA-N	O
        |MNXM3	noformula	chebi:99999		0	0.0	InChI=1S/X	AAAAAAAAAAAAAA-UHFFFAOYSA-N	X
        |MNXM4	nokey	chebi:88888	C6H12O6	0	180.06	!TRAILING!""".stripMargin
        .replace("!TRAILING!", "\t\t") + "\n"
    val xref =
      """#source	ID	description
        |chebi:15377	MNXM2	water
        |hmdb:HMDB02111	MNXM2	Water
        |kegg.compound:C00001	MNXM2	H2O
        |chebi:24636	MNXM1	proton
        |MNXM1	MNXM1	!EMPTY!
        |""".stripMargin.replace("\t!EMPTY!", "\t")
    Files.write(d.toPath.resolve("chem_prop.tsv"), prop.getBytes)
    Files.write(d.toPath.resolve("chem_xref.tsv"), xref.getBytes)
    d.getAbsolutePath
  }

  test("chem_prop read drops the # preamble and keeps the column layout") {
    val prop = MetaNetX.readChemProp(spark, s"$dir/chem_prop.tsv")
    assert(prop.count() === 4)
    val water = prop.where(col("mnxm_id") === "MNXM2").collect().head
    assert(water.getAs[String]("name") === "water")
    assert(water.getAs[String]("inchikey") ===
      "XLYOFNOQVPJJNP-UHFFFAOYSA-N")
    assert(water.getAs[String]("smiles") === "O")
  }

  test("xref source split mirrors the script's .split(':')[1]") {
    val x = MetaNetX.splitXref(
      MetaNetX.readChemXref(spark, s"$dir/chem_xref.tsv"))
    val rows = x.collect().map(r => (r.getAs[String]("mnxm_id"),
      r.getAs[String]("source"), r.getAs[String]("source_id"),
      r.getAs[String]("description"))).toSet
    assert(rows.contains(("MNXM2", "kegg.compound", "C00001", "H2O")))
    // bare source (no colon): source == source_id == raw (script :36-40)
    assert(rows.contains(("MNXM1", "MNXM1", "MNXM1", null)))
  }

  test("compoundReferences gates on InChIKey+formula and groups xrefs") {
    val refs = MetaNetX.compoundReferences(
      MetaNetX.readChemProp(spark, s"$dir/chem_prop.tsv"),
      MetaNetX.readChemXref(spark, s"$dir/chem_xref.tsv"))
    // MNXM3 (empty formula) and MNXM4 (no InChIKey) are dropped
    assert(refs.select("mnxm_id").as[String](stringEnc).collect().sorted
      .toSeq === Seq("MNXM1", "MNXM2"))
    val water = refs.where(col("mnxm_id") === "MNXM2").collect().head
    assert(water.getAs[String]("primary_reference") === "chebi:15377")
    val sources = water.getSeq[org.apache.spark.sql.Row](3)
      .map(_.getAs[String]("source"))
    // sorted by (source, source_id) — deterministic under partitioning
    assert(sources === Seq("chebi", "hmdb", "kegg.compound"))
    // lookup by InChIKey (the index analog)
    import spark.implicits._
    val hit = MetaNetX.lookupByInchiKey(refs,
      Seq("XLYOFNOQVPJJNP-UHFFFAOYSA-N").toDF("inchikey"))
    assert(hit.count() === 1)
  }

  private def stringEnc = org.apache.spark.sql.Encoders.STRING
}
