package graft.chem

/** MOL (V2000) / SDF readers — compound_io.py:423-538 (S10).
  * Parses the counts line, atom block (symbol + charge field) and bond
  * block; ignores coordinates. SDF = MOL records joined by `$$$$` with
  * `> <tag>` data fields.
  */
object MolFile {

  /** Charge field in V2000 atom lines: 0=none 1=+3 2=+2 3=+1 5=-1 6=-2 7=-3. */
  private def chargeOf(code: Int): Int = code match {
    case 1 => 3; case 2 => 2; case 3 => 1
    case 5 => -1; case 6 => -2; case 7 => -3
    case _ => 0
  }

  def parseMol(lines0: Seq[String]): Molecule = {
    // anchor on the V2000 counts line (header is nominally 3 lines, but
    // SDF splitting / leading blank lines can shift it)
    val ci = lines0.indexWhere(_.contains("V2000"))
    require(ci >= 0, "MOL: no V2000 counts line")
    val lines = lines0
    val counts = lines(ci)
    val nAtoms = counts.substring(0, 3).trim.toInt
    val nBonds = counts.substring(3, 6).trim.toInt
    val atoms = (0 until nAtoms).map { i =>
      val l = lines(ci + 1 + i)
      val sym = l.substring(31, 34).trim
      val cc = if (l.length >= 39) l.substring(36, 39).trim.toIntOption.getOrElse(0) else 0
      Atom(sym, charge = chargeOf(cc))
    }.toVector
    val bonds = (0 until nBonds).map { i =>
      val l = lines(ci + 1 + nAtoms + i)
      val a = l.substring(0, 3).trim.toInt - 1
      val b = l.substring(3, 6).trim.toInt - 1
      val t = l.substring(6, 9).trim.toInt
      // type 4 = aromatic
      if (t == 4) Bond(a, b, 1, aromatic = true)
      else Bond(a, b, t, aromatic = false)
    }.toVector
    // atoms on an aromatic (type 4) bond are aromatic — keeps the graph
    // self-consistent when the block came from an aromatic-form writer
    val aromAtoms = bonds.filter(_.aromatic)
      .flatMap(b => Seq(b.a, b.b)).toSet
    val atomsArom = atoms.zipWithIndex.map { case (a, i) =>
      if (aromAtoms(i)) a.copy(aromatic = true) else a
    }
    // M  CHG: per V2000, the presence of ANY charge property block
    // supersedes ALL atom-block charge columns (unlisted atoms -> 0)
    val chgLines = lines.filter(_.startsWith("M  CHG"))
    val withChg =
      if (chgLines.isEmpty) atomsArom
      else {
        val chg = chgLines.flatMap { l =>
          val p = l.trim.split("\\s+").drop(2)
          p.drop(1).grouped(2).collect { case Array(idx, q) =>
            (idx.toInt - 1, q.toInt)
          }
        }.toMap
        atomsArom.zipWithIndex.map { case (a, i) =>
          a.copy(charge = chg.getOrElse(i, 0))
        }
      }
    new Molecule(withChg, bonds)
  }

  /** Canonical SMILES of a MOL block (MOL files are Kekulé — perceive
    * aromaticity so identity matches SMILES-loaded structures).
    */
  def molToSmiles(molBlock: String): String =
    Smiles.write(Aromatize.perceive(parseMol(molBlock.linesIterator.toSeq)))

  /** SDF: sequence of (canonical SMILES, data fields). */
  def parseSdf(content: String): Seq[(String, Map[String, String])] =
    content.split("\\$\\$\\$\\$").toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap { record =>
        val lines = record.linesIterator.toSeq
        val endIdx = lines.indexWhere(_.startsWith("M  END"))
        if (endIdx < 0) None
        else {
          val smiles = Smiles.write(
            Aromatize.perceive(parseMol(lines.take(endIdx + 1))))
          val fields = scala.collection.mutable.Map.empty[String, String]
          var i = endIdx + 1
          while (i < lines.length) {
            val l = lines(i)
            if (l.startsWith("> ")) {
              val tag = "<([^>]+)>".r.findFirstMatchIn(l).map(_.group(1))
              // SDF data values run until the next BLANK line (multi-line)
              val value = Seq.newBuilder[String]
              i += 1
              while (i < lines.length && lines(i).trim.nonEmpty &&
                !lines(i).startsWith("> ")) {
                value += lines(i); i += 1
              }
              tag.foreach(t => fields(t) = value.result().mkString("\n"))
            } else i += 1
          }
          Some((smiles, fields.toMap))
        }
      }
}
