package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.chem.{InChISkeleton, Smiles}

/** Diagnostic (test scope): how many of the 2-gen filter-fixture
  * compounds merge under the full InChI-block-1 mimic
  * (InChISkeleton.key — mobile-H pooling + net-charge proton folding),
  * which is what the REFERENCE's compound ids hash
  * (utils.get_compound_hash:146-151: sha1 of the InChIKey first
  * block)? Our engine ids hash the canonical SMILES instead, so every
  * mobile-H tautomer pair or protonation variant the fixture's rules
  * emit counts twice here and once in the reference — a direct
  * over-generation mechanism against the 1740 pin.
  */
object SkeletonKeyDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dataDir = "/root/reference/tests/data/test_filters"
    def lines(p: String) = Files.readAllLines(Paths.get(p)).asScala.toSeq
    val core = PickaxeEngine.parseCoreactants(
      lines(s"$dataDir/metacyc_coreactants.tsv"))
    val rules = PickaxeEngine.parseRules(
      lines(s"$dataDir/test_filter_rules.tsv"), core)
    val engine = new PickaxeEngine(spark, rules, core)
    val starts = lines(s"$dataDir/test_filter_compounds.csv")
      .tail.filter(_.trim.nonEmpty).map(_.split(",")(1).trim)
    val st = engine.run(starts, generations = 2)
    import spark.implicits._
    val cpds = st.compounds
      .select("SMILES", "Type", "Generation")
      .as[(String, String, Int)].collect()
    println(s"[diag] total=${cpds.length} (reference 1740)")

    val predicted = cpds.filter(_._2 == "Predicted")
    val byKey = predicted.groupBy(t => InChISkeleton.keyOrSmiles(t._1))
    val coll = byKey.filter(_._2.length > 1).toSeq
      .sortBy(-_._2.length)
    val extra = coll.map(_._2.length - 1).sum
    println(s"[diag] predicted=${predicted.length} " +
      s"keyClasses=${byKey.size} collidingGroups=${coll.size} " +
      s"extraFromKeyMerge=$extra " +
      s"=> total-under-key=${cpds.length - extra} (reference 1740)")
    // show the biggest classes with their members
    coll.take(15).foreach { case (k, members) =>
      println(s"[diag] class(${members.length}) key=${k.take(60)}")
      members.take(6).foreach(m =>
        println(s"[diag]    gen=${m._3} ${m._1}"))
    }
    // how do the collisions split by generation?
    val byGen = coll.flatMap(_._2.drop(1)).groupBy(_._3)
      .map { case (g, xs) => s"gen$g=${xs.length}" }.toSeq.sorted
    println(s"[diag] extra-by-generation: ${byGen.mkString(", ")}")

    // RDKit-strict sanitize audit: which network compounds would the
    // reference have REJECTED at birth (kekulize + full valence, no
    // aromatic exemption)?
    val bad = predicted.filter { t =>
      try !graft.chem.RdkitValence.sanitizeOk(Smiles.parse(t._1))
      catch { case _: Exception => true }
    }
    println(s"[diag] strict-sanitize rejects=${bad.length} " +
      s"=> total-under-strict=${cpds.length - bad.length} (ref 1740)")
    bad.groupBy(_._3).toSeq.sortBy(_._1).foreach { case (g, xs) =>
      println(s"[diag] strict-rejects gen$g=${xs.length}")
    }
    bad.take(20).foreach(t => println(s"[diag] reject gen=${t._3} ${t._1}"))

    // proxy for the reference's fragile pyrrole-repair path: products
    // carrying [nH] (the reference reaches these via its single-flip
    // kekulize repair, which can silently DROP multi-adjustment cases)
    val nh = predicted.filter(_._1.contains("[nH]"))
    val nAny = predicted.filter(t => t._1.contains("n"))
    println(s"[diag] aromatic-n products=${nAny.length} " +
      s"with-[nH]=${nh.length}")
    nh.take(10).foreach(t => println(s"[diag] nH gen=${t._3} ${t._1}"))

    // THE reference no-op check runs on InChI-block-1 ids
    // (reactions.py:190-192 intersects _gen_compound ids, which hash
    // the InChIKey first block): a product that is a mobile-H tautomer
    // or protonation variant OF ITS OWN REACTANT is a no-op there but
    // a new compound under our SMILES-hash ids. Count those products
    // and their descendants.
    val smilesById = st.compounds.select("_id", "SMILES")
      .as[(String, String)].collect().toMap
    val keyById = smilesById.map { case (id, smi) =>
      id -> InChISkeleton.keyOrSmiles(smi) }
    val rxRows = st.reactions
      .select("Reactants", "Products")
      .collect()
    var noopProducts = Set.empty[String]
    rxRows.foreach { r =>
      val re = r.getSeq[org.apache.spark.sql.Row](0)
        .map(_.getString(1)).flatMap(keyById.get).toSet
      r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1))
        .filter(_.startsWith("C")).foreach { pid =>
          keyById.get(pid).foreach { k =>
            if (re.contains(k)) noopProducts += pid
          }
        }
    }
    val genOf = st.compounds.select("_id", "Generation")
      .as[(String, Int)].collect().toMap
    println(s"[diag] inchi-noop products=${noopProducts.size} " +
      s"byGen=${noopProducts.groupBy(genOf).map { case (g, xs) =>
        s"gen$g=${xs.size}" }.toSeq.sorted.mkString(",")}")
    noopProducts.take(8).foreach(id =>
      println(s"[diag] noop gen=${genOf(id)} ${smilesById(id)}"))

    // gen-1 provenance dump: every gen-1 compound with the rules and
    // reactant SMILES that produced it (the amplification audit —
    // a single wrong gen-1 keeper becomes ~16 wrong gen-2 children)
    if (args.contains("--gen1")) {
      val gen1Ids = st.compounds.where(
        org.apache.spark.sql.functions.col("Generation") === 1)
        .select("_id").as[String].collect().toSet
      val prov = scala.collection.mutable.Map.empty[String, Set[String]]
      st.reactions.select("Operators", "SMILES_rxn", "Products")
        .collect().foreach { r =>
          val ops = r.getSeq[String](0).mkString("+")
          val rxn = r.getString(1)
          r.getSeq[org.apache.spark.sql.Row](2).map(_.getString(1))
            .filter(gen1Ids.contains).foreach { pid =>
              prov(pid) = prov.getOrElse(pid, Set.empty) +
                s"$ops: ${rxn.take(120)}"
            }
        }
      prov.toSeq.sortBy(_._1).foreach { case (pid, srcs) =>
        println(s"[gen1] ${smilesById(pid)}")
        srcs.take(2).foreach(s => println(s"[gen1]    <- $s"))
      }
    }

    // per-generation compound totals
    cpds.groupBy(t => (t._3, t._2)).toSeq.sortBy(_._1)
      .foreach { case ((g, t), xs) =>
        println(s"[diag] gen=$g type=$t n=${xs.length}") }

    // per-rule NEW-product counts: how many distinct compound ids does
    // each operator introduce (first-gen-wins attribution)?
    val perRule = st.reactions
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("Operators")).as("op"),
        org.apache.spark.sql.functions.col("Products"))
      .select(org.apache.spark.sql.functions.col("op"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col("Products")).as("m"))
      .select(org.apache.spark.sql.functions.col("op"),
        org.apache.spark.sql.functions.col("m.c_id").as("c_id"))
      .where(org.apache.spark.sql.functions.col("c_id").startsWith("C"))
      .distinct()
      .groupBy("op").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc)
      .as[(String, Long)].collect()
    perRule.foreach { case (op, n) => println(s"[diag] rule $op -> $n") }

    // gen-1 product dump for manual RDKit-validity audit (args(0) = a
    // rule name -> print that rule's gen-1 products)
    if (args.nonEmpty) {
      val want = args(0)
      val g1 = st.compounds.where(
        org.apache.spark.sql.functions.col("Generation") === 1)
        .select("_id", "SMILES").as[(String, String)].collect().toMap
      val rx = st.reactions
        .select(org.apache.spark.sql.functions.col("Operators"),
          org.apache.spark.sql.functions.col("SMILES_rxn"),
          org.apache.spark.sql.functions.col("Products"))
        .collect()
        .filter(_.getSeq[String](0).contains(want))
      rx.take(40).foreach { r =>
        println(s"[diag] rxn: ${r.getString(1)}")
      }
    }
    spark.stop()
  }
}
