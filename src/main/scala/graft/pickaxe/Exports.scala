package graft.pickaxe

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.chem.{Molecule, Smiles}

/** Interchange exports (reference save_to_SBML pickaxe.py:1244-1476 and
  * compound_io.py:16-151,243-346): SBML, SDF, per-compound MOL files,
  * SMILES TSV, and KBase/ModelSEED TSVs.
  *
  * These are single-document interchange files, written driver-side from
  * a sorted `toLocalIterator` stream (constant driver memory); the
  * parquet-scale sink for cluster-sized networks is MineSink. All output
  * is deterministically ordered by export ID.
  */
object Exports {

  private def sortedCompounds(st: NetworkState) =
    st.compounds.orderBy("Generation", "_id")

  private def sortedReactions(st: NetworkState) =
    st.reactions.orderBy("_id")

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** SBML Level 3 Version 1 export (save_to_SBML, pickaxe.py:1244-1476):
    * one cytosol compartment, every compound as a species annotated with
    * its SMILES + Type, every reaction with stoichiometric
    * reactant/product references and its operator list annotation. Plain
    * XML — a conformant document needs no libsbml.
    */
  def writeSbml(state: NetworkState, file: String): Unit = {
    val st = new PickaxeEngine(state.compounds.sparkSession, Nil, Nil)
      .assignIds(state)
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8"?>""" + "\n"
    sb ++= """<sbml xmlns="http://www.sbml.org/sbml/level3/version1/core" level="3" version="1">""" + "\n"
    sb ++= """  <model substanceUnits="mole" timeUnits="second" extentUnits="mole">""" + "\n"
    sb ++= """    <listOfCompartments>""" + "\n"
    sb ++= """      <compartment id="c" spatialDimensions="3" size="1" units="litre" constant="true"/>""" + "\n"
    sb ++= """    </listOfCompartments>""" + "\n"
    sb ++= """    <listOfSpecies>""" + "\n"
    val cIt = sortedCompounds(st).select("_id", "ID", "SMILES", "Type")
      .toLocalIterator()
    while (cIt.hasNext) {
      val r = cIt.next()
      val (id, metaId, smi, typ) =
        (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
      sb ++= s"""      <species metaid="$metaId" id="$id" compartment="c" initialAmount="1" substanceUnits="mole" hasOnlySubstanceUnits="false" boundaryCondition="false" constant="false">""" + "\n"
      sb ++= s"""        <annotation>""" + "\n"
      sb ++= s"""          <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">""" + "\n"
      sb ++= s"""            <rdf:pickaxe rdf:about="#$metaId">""" + "\n"
      sb ++= s"""              <pickaxe:pickaxe xmlns:pickaxe="http://minedatabase.ci.nu/pickaxe">""" + "\n"
      sb ++= s"""                <pickaxe:smiles>${xmlEscape(smi)}</pickaxe:smiles>""" + "\n"
      sb ++= s"""                <pickaxe:type>${xmlEscape(typ)}</pickaxe:type>""" + "\n"
      sb ++= s"""              </pickaxe:pickaxe>""" + "\n"
      sb ++= s"""            </rdf:pickaxe>""" + "\n"
      sb ++= s"""          </rdf:RDF>""" + "\n"
      sb ++= s"""        </annotation>""" + "\n"
      sb ++= s"""      </species>""" + "\n"
    }
    sb ++= """    </listOfSpecies>""" + "\n"
    sb ++= """    <listOfReactions>""" + "\n"
    val rIt = sortedReactions(st)
      .select("_id", "ID", "Reactants", "Products", "Operators")
      .toLocalIterator()
    while (rIt.hasNext) {
      val r = rIt.next()
      val (id, metaId) = (r.getString(0), r.getString(1))
      val reac = r.getSeq[org.apache.spark.sql.Row](2)
      val prod = r.getSeq[org.apache.spark.sql.Row](3)
      val ops = r.getSeq[String](4)
      sb ++= s"""      <reaction metaid="$metaId" id="$id" name="$metaId" reversible="false" fast="false" compartment="c">""" + "\n"
      sb ++= s"""        <annotation>""" + "\n"
      sb ++= s"""          <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">""" + "\n"
      sb ++= s"""            <rdf:pickaxe rdf:about="#$metaId">""" + "\n"
      sb ++= s"""              <pickaxe:pickaxe xmlns:pickaxe="http://minedatabase.ci.nu/pickaxe">""" + "\n"
      sb ++= s"""                <pickaxe:operator>${xmlEscape(ops.mkString(";"))}</pickaxe:operator>""" + "\n"
      sb ++= s"""              </pickaxe:pickaxe>""" + "\n"
      sb ++= s"""            </rdf:pickaxe>""" + "\n"
      sb ++= s"""          </rdf:RDF>""" + "\n"
      sb ++= s"""        </annotation>""" + "\n"
      def refs(tag: String, side: Seq[org.apache.spark.sql.Row]): Unit = {
        sb ++= s"""        <listOf$tag>""" + "\n"
        side.foreach { m =>
          sb ++= s"""          <speciesReference species="${m.getString(1)}" stoichiometry="${math.abs(m.getInt(0))}" constant="true"/>""" + "\n"
        }
        sb ++= s"""        </listOf$tag>""" + "\n"
      }
      refs("Reactants", reac)
      refs("Products", prod)
      sb ++= s"""      </reaction>""" + "\n"
    }
    sb ++= """    </listOfReactions>""" + "\n"
    sb ++= """  </model>""" + "\n"
    sb ++= """</sbml>""" + "\n"
    Files.writeString(Paths.get(file), sb.toString)
  }

  /** MDL molfile (V2000) text for one molecule. Explicit-H form with
    * zeroed coordinates; aromatic bonds use MDL type 4; charges in
    * `M  CHG` lines (round-trips through graft.chem.MolFile).
    */
  def molBlock(m0: Molecule, title: String): String = {
    val m = m0.withExplicitH
    val sb = new StringBuilder
    sb ++= title + "\n  graft \n\n"
    sb ++= f"${m.n}%3d${m.bonds.length}%3d  0  0  0  0  0  0  0  0999 V2000\n"
    m.atoms.foreach { a =>
      sb ++= f"    0.0000    0.0000    0.0000 ${a.elem}%-3s 0  0  0  0  0  0  0  0  0  0  0  0\n"
    }
    m.bonds.foreach { b =>
      val t = if (b.aromatic) 4 else b.order
      sb ++= f"${b.a + 1}%3d${b.b + 1}%3d$t%3d  0\n"
    }
    val charged = m.atoms.zipWithIndex.filter(_._1.charge != 0)
    charged.grouped(8).foreach { grp =>
      sb ++= f"M  CHG${grp.length}%3d"
      grp.foreach { case (a, i) => sb ++= f"${i + 1}%4d${a.charge}%4d" }
      sb ++= "\n"
    }
    sb ++= "M  END\n"
    sb.toString
  }

  /** SDF export (export_sdf, compound_io.py:16-63): every compound as a
    * molblock + `_id` / `Generation` / `Reactant_in` / `Product_of` data
    * fields, `$$$$`-separated, deterministic order.
    */
  def writeSdf(engine: PickaxeEngine, state: NetworkState, file: String): Unit = {
    val adj = engine.adjacency(state)
    val rows = sortedCompounds(state)
      .join(adj, Seq("_id"))
      .select("_id", "SMILES", "Generation", "Reactant_in", "Product_of")
      .orderBy("Generation", "_id")
      .toLocalIterator()
    val sb = new StringBuilder
    while (rows.hasNext) {
      val r = rows.next()
      sb ++= molBlock(Smiles.parse(r.getString(1)), r.getString(0))
      sb ++= s"> <_id>\n${r.getString(0)}\n\n"
      sb ++= s"> <Generation>\n${r.getInt(2)}\n\n"
      sb ++= s"> <Reactant_in>\n${r.getSeq[String](3).mkString(",")}\n\n"
      sb ++= s"> <Product_of>\n${r.getSeq[String](4).mkString(",")}\n\n"
      sb ++= "$$$$\n"
    }
    Files.writeString(Paths.get(file), sb.toString)
  }

  /** Per-compound MOL files (export_mol, compound_io.py:113-151):
    * C-compounds only, named by `_id`.
    */
  def writeMolDir(state: NetworkState, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val rows = sortedCompounds(state)
      .where(col("_id").startsWith("C"))
      .select("_id", "SMILES").toLocalIterator()
    while (rows.hasNext) {
      val r = rows.next()
      Files.writeString(Paths.get(s"$dir/${r.getString(0)}.mol"),
        molBlock(Smiles.parse(r.getString(1)), r.getString(0)))
    }
  }

  /** SMILES TSV export (export_smiles, compound_io.py:65-110):
    * columns SMILES, _id, Generation, Reactant_in, Product_of.
    */
  def writeSmilesTsv(engine: PickaxeEngine, state: NetworkState, file: String): Unit = {
    val adj = engine.adjacency(state)
    val rows = sortedCompounds(state)
      .join(adj, Seq("_id"))
      .select("SMILES", "_id", "Generation", "Reactant_in", "Product_of")
      .orderBy("Generation", "_id")
      .toLocalIterator()
    val sb = new StringBuilder
    sb ++= "SMILES\t_id\tGeneration\tReactant_in\tProduct_of\n"
    while (rows.hasNext) {
      val r = rows.next()
      sb ++= s"${r.getString(0)}\t${r.getString(1)}\t${r.getInt(2)}\t" +
        s"${r.getSeq[String](3).mkString(",")}\t" +
        s"${r.getSeq[String](4).mkString(",")}\n"
    }
    Files.writeString(Paths.get(file), sb.toString)
  }

  /** KBase/ModelSEED TSV export (export_kbase, compound_io.py:243-346):
    * `<name>_compounds.tsv` (id, name, formula, charge, aliases;
    * X-compounds skipped) and `<name>_reactions.tsv` (id, direction,
    * compartment, gpr, name, enzyme, pathway, reference, equation) with
    * the reference's `(stoich) C-id` equation text and X→C rewrite.
    */
  def writeKbase(state: NetworkState, dir: String, name: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val csb = new StringBuilder
    csb ++= "id\tname\tformula\tcharge\taliases\n"
    val cIt = sortedCompounds(state)
      .where(!col("_id").startsWith("X"))
      .select("_id", "Formula", "Charge").toLocalIterator()
    while (cIt.hasNext) {
      val r = cIt.next()
      csb ++= s"${r.getString(0)}\t\t${r.getString(1)}\t${r.getInt(2)}\t\n"
    }
    Files.writeString(Paths.get(s"$dir/${name}_compounds.tsv"), csb.toString)

    val rsb = new StringBuilder
    rsb ++= "id\tdirection\tcompartment\tgpr\tname\tenzyme\tpathway\treference\tequation\n"
    val rIt = sortedReactions(state)
      .select("_id", "Reactants", "Products").toLocalIterator()
    while (rIt.hasNext) {
      val r = rIt.next()
      def side(i: Int) = r.getSeq[org.apache.spark.sql.Row](i)
        .map(m => s"(${m.getInt(0)}) ${m.getString(1).replace("X", "C")}")
        .mkString(" + ")
      rsb ++= s"${r.getString(0)}\t>\tc0\t\t\t\t\t\t${side(1)} => ${side(2)}\n"
    }
    Files.writeString(Paths.get(s"$dir/${name}_reactions.tsv"), rsb.toString)
  }
}
