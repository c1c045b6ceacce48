package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.chem.{InChISkeleton, Molecule, Smiles}

/** Diagnostic (test scope): how many tautomer-closure classes do the
  * 2-gen filter-fixture compounds collapse into? If the answer is ~1740
  * (the reference count, test_filters.py:122), the residual 1860-vs-1740
  * gap is exactly the single-step-vs-closure tautomer pick.
  */
object TautomerDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
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
      .select("SMILES", "Type").as[(String, String)].collect()
    println(s"[diag] total=${cpds.length}")

    // closure over single 1,3 flips
    def flips(s: String): Seq[String] =
      try {
        val m = Smiles.parse(s)
        def isAromN(i: Int) =
          m.atoms(i).elem == "N" && m.atoms(i).aromatic
        (for {
          n1 <- 0 until m.n
          if isAromN(n1) && m.totalH(n1) == 1 && m.degree(n1) == 2
          (c, b1) <- m.adj(n1)
          if b1.aromatic && m.atoms(c).elem == "C" && m.atoms(c).aromatic
          (n3, b2) <- m.adj(c)
          if n3 != n1 && b2.aromatic && isAromN(n3) &&
            m.totalH(n3) == 0 && m.degree(n3) == 2
        } yield {
          val flipped = m.atoms
            .updated(n1, m.atoms(n1).copy(hCount = 0))
            .updated(n3, m.atoms(n3).copy(hCount = 1))
          Smiles.write(new Molecule(flipped, m.bonds))
        }).distinct
      } catch { case _: Exception => Nil }

    def classRep(s: String): String = {
      if (!s.contains('n')) return s
      val seen = scala.collection.mutable.Set(s)
      val q = scala.collection.mutable.Queue(s)
      var guard = 0
      while (q.nonEmpty && guard < 10000) {
        guard += 1
        flips(q.dequeue()).foreach { v =>
          if (seen.add(v)) q.enqueue(v)
        }
      }
      seen.min
    }

    val predicted = cpds.filter(_._2 == "Predicted").map(_._1)
    val others = cpds.filter(_._2 != "Predicted")
    val classes = predicted.map(classRep).distinct
    println(s"[diag] predicted=${predicted.length} " +
      s"closureClasses=${classes.length} " +
      s"nonPredicted=${others.length} " +
      s"=> total-under-closure=${classes.length + others.length} " +
      "(reference 1740)")

    // skeleton key: formula + WL hash of the heavy-atom graph with
    // element+charge labels only (bond orders, aromatic flags, H
    // placement all ignored). Collisions = same-skeleton same-formula
    // molecules our canonicalization keeps distinct.
    def skeleton(s: String): String =
      try {
        val m = Smiles.parse(s)
        val heavy = (0 until m.n).filter(i => m.atoms(i).elem != "H")
        var lab = heavy.map(i =>
          s"${m.atoms(i).elem}:${m.atoms(i).charge}").toArray
        val idx = heavy.zipWithIndex.toMap
        for (_ <- 0 until 6) {
          lab = heavy.map { i =>
            val nb = m.adj(i).collect {
              case (j, _) if idx.contains(j) => lab(idx(j))
            }.sorted.mkString(",")
            s"${lab(idx(i))}|$nb".hashCode.toString
          }.toArray
        }
        val formula = graft.chem.Formula.atomCounts(m).toSeq.sorted
          .map { case (e, k) => s"$e$k" }.mkString
        val totH = (0 until m.n).map(m.totalH).sum +
          (0 until m.n).count(i => m.atoms(i).elem == "H")
        s"$formula/H$totH/" + lab.sorted.mkString("-")
      } catch { case _: Exception => "ERR:" + s }

    val byS = predicted.groupBy(skeleton)
    val coll = byS.filter(_._2.length > 1)
    println(s"[diag] skeleton groups=${byS.size} " +
      s"collidingGroups=${coll.size} " +
      s"extraFromCollisions=${coll.values.map(_.length - 1).sum}")
    // CANONICALITY CHECK: for every predicted compound, relabel atoms
    // with several permutations, re-parse + re-write; a truly canonical
    // writer returns the identical string. Failures = phantom-duplicate
    // risk on symmetric substrates.
    val rng = new scala.util.Random(42)
    var nonCanonical = 0
    val badExamples = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    predicted.foreach { s =>
      try {
        val m = Smiles.parse(s)
        val base = Smiles.write(m)
        var bad = false
        for (_ <- 0 until 3 if !bad) {
          val perm = rng.shuffle((0 until m.n).toVector)
          val inv = Array.ofDim[Int](m.n)
          perm.zipWithIndex.foreach { case (p, i) => inv(p) = i }
          val atoms2 = perm.map(m.atoms)
          val bonds2 = m.bonds.map(b =>
            b.copy(a = inv(b.a), b = inv(b.b)))
          val w2 = Smiles.write(new Molecule(atoms2, bonds2))
          if (w2 != base) { bad = true; badExamples += ((base, w2)) }
        }
        if (bad) nonCanonical += 1
      } catch { case _: Exception => }
    }
    println(s"[diag] nonCanonicalUnderRelabel=$nonCanonical of " +
      s"${predicted.length}")
    badExamples.take(5).foreach { case (a, b) =>
      println(s"[diag] WRITER-SPLIT:\n[diag]   $a\n[diag]   $b")
    }

    // INCHI-SKELETON KEY (get_compound_hash, utils.py:115-164): the
    // reference ids compounds by sha1 of the InChIKey FIRST BLOCK —
    // formula + connectivity (NO bond orders) + H layer with InChI
    // mobile-H groups, after proton normalization. Distinct canonical
    // SMILES that share this skeleton merge in the reference but stay
    // separate under our SMILES-hash ids. Measure the class count.
    def inchiKey(s: String): String =
      try InChISkeleton.key(Smiles.parse(s))
      catch { case _: Exception => "ERR:" + s }
    val byKey = predicted.groupBy(inchiKey)
    val kColl = byKey.filter(_._2.length > 1)
    println(s"[diag] inchiSkeleton classes=${byKey.size} " +
      s"collidingGroups=${kColl.size} " +
      s"mergedAway=${kColl.values.map(_.length - 1).sum} " +
      s"=> total-under-inchi=${byKey.size + others.length} (reference 1740)")
    kColl.toSeq.sortBy(-_._2.length).take(10).foreach { case (_, ss) =>
      println(s"[diag] INCHI-MERGE(${ss.length}):")
      ss.foreach(x => println(s"[diag]   $x"))
    }
    // predicted products that are skeleton-equivalent to a coreactant
    // or starting compound: current-reference ids (InChI-block1) merge
    // these into the existing doc; SMILES-hash ids keep them separate.
    val npKeys = others.map(t => inchiKey(t._1)).toSet
    val xMerged = predicted.filter(s => npKeys(inchiKey(s)))
    println(s"[diag] predictedMatchingNonPredictedSkeleton=" +
      s"${xMerged.length}")
    xMerged.take(10).foreach(x => println(s"[diag]   XMERGE $x"))
    val withMobile = predicted.count(s => inchiKey(s).split("/", -1)
      .lastOption.exists(_.nonEmpty))
    println(s"[diag] predictedWithMobileHGroup=$withMobile of " +
      s"${predicted.length}")

    // provenance for colliding members: producing operator + reaction
    val smi2id = st.compounds
      .select("SMILES", "_id").as[(String, String)].collect().toMap
    val prodRxns = st.reactions
      .select(col("_id"), col("SMILES_rxn"), col("Operators"),
        explode(col("Products")).as("m"))
      .select(col("m.c_id").as("cid"), col("Operators"),
        col("SMILES_rxn"))
      .as[(String, Seq[String], String)].collect()
      .groupBy(_._1)
    coll.toSeq.sortBy(-_._2.length).take(8).foreach { case (_, ss) =>
      println(s"[diag] GROUP(${ss.length}):")
      ss.foreach { x =>
        println(s"[diag]   $x")
        prodRxns.getOrElse(smi2id(x), Array.empty).take(2).foreach {
          case (_, ops, rxn) =>
            println(s"[diag]     via ${ops.mkString("/")}: " +
              rxn.take(150))
        }
      }
    }
    spark.stop()
  }
}
