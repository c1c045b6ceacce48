package graft.pickaxe

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spectra text-format readers (S8: read_mgf / read_msp,
  * metabolomics.py:738-824) as pure record parsers + Spark wrappers.
  *
  * Records span lines, so the Spark path reads whole files
  * (`wholeTextFiles` — spectra files are per-sample small) and flatMaps
  * the pure parser over them; the parsers themselves are
  * partition-friendly (Iterator -> Iterator).
  */
object SpectraIO {

  /** MGF: BEGIN IONS / key=value / mz intensity pairs / END IONS. */
  def parseMgf(lines: Iterator[String], chargeSign: String = "+"): Iterator[PeakRow] = {
    val out = Seq.newBuilder[PeakRow]
    var name = ""; var mz = 0.0; var rt = 0.0
    var ms2 = Vector.empty[(Double, Double)]
    var inRecord = false
    for (raw <- lines) {
      val l = raw.trim
      if (l == "BEGIN IONS") {
        inRecord = true; name = ""; mz = 0.0; rt = 0.0; ms2 = Vector.empty
      } else if (l == "END IONS") {
        if (inRecord) out += PeakRow(name, rt, mz, chargeSign, ms2)
        inRecord = false
      } else if (inRecord && l.contains("=")) {
        val Array(k, v) = l.split("=", 2)
        k.toUpperCase match {
          case "TITLE" => name = v
          case "PEPMASS" => mz = v.split("\\s+").head.toDouble
          case "RTINSECONDS" => rt = v.toDouble
          case _ => ()
        }
      } else if (inRecord && l.nonEmpty && l.charAt(0).isDigit) {
        val p = l.split("\\s+")
        if (p.length >= 2) ms2 :+= ((p(0).toDouble, p(1).toDouble))
      }
    }
    out.result().iterator
  }

  /** MSP: `Name:` / `PrecursorMZ:` headers, `Num Peaks:` then pairs. */
  def parseMsp(lines: Iterator[String], chargeSign: String = "+"): Iterator[PeakRow] = {
    val out = Seq.newBuilder[PeakRow]
    var name = ""; var mz = 0.0
    var ms2 = Vector.empty[(Double, Double)]
    var started = false
    def flush(): Unit = {
      if (started && name.nonEmpty) out += PeakRow(name, 0.0, mz, chargeSign, ms2)
      name = ""; mz = 0.0; ms2 = Vector.empty; started = false
    }
    for (raw <- lines) {
      val l = raw.trim
      val lower = l.toLowerCase
      if (lower.startsWith("name:")) { flush(); started = true; name = l.substring(5).trim }
      else if (lower.startsWith("precursormz:")) mz = l.substring(12).trim.toDouble
      else if (lower.startsWith("num peaks:")) ()
      else if (l.nonEmpty && (l.charAt(0).isDigit || l.charAt(0) == '.')) {
        // one or more "mz intensity" pairs per line, ';'-separated
        ms2 ++= l.split("[\\s;]+").toSeq.grouped(2).collect {
          case Seq(m, in) => (m.toDouble, in.toDouble)
        }
      } else if (l.isEmpty) flush()
    }
    flush()
    out.result().iterator
  }

  /** mzXML (read_mzxml, metabolomics.py:827-857): every msLevel=2 scan
    * yields one peak — m/z from its precursorMz element, retention time
    * from the scan's `retentionTime="PT…S"` attribute (the reference
    * strips the PT/S wrapper with `[2:-1]`), polarity from the scan,
    * name `"mz @ rt"`. Implemented with scala.xml (JDK-bundled parser,
    * namespace-agnostic like the reference's prefix handling).
    */
  def parseMzxml(content: String, chargeSign: String = "+"): Seq[PeakRow] = {
    val root = scala.xml.XML.loadString(content)
    (root \\ "scan").toSeq
      .filter(s => (s \@ "msLevel") == "2")
      .map { scan =>
        val mzText = (scan \ "precursorMz").text.trim
        val rtRaw = scan \@ "retentionTime"
        val rt = rtRaw.stripPrefix("PT").stripSuffix("S")
        val polarity = scan \@ "polarity" match {
          case "" => chargeSign
          case p => p
        }
        PeakRow(s"$mzText @ $rt",
          if (rt.isEmpty) 0.0 else rt.toDouble,
          mzText.toDouble, polarity, Nil)
      }
  }

  /** Spark wrapper: read spectra files into a Peak DataFrame. */
  def readSpectra(
      spark: SparkSession,
      path: String,
      format: String,
      chargeSign: String = "+"): DataFrame = {
    import spark.implicits._
    val parse: String => Iterator[PeakRow] = format match {
      case "mgf" => c => parseMgf(c.linesIterator, chargeSign)
      case "msp" => c => parseMsp(c.linesIterator, chargeSign)
      case "mzxml" => c => parseMzxml(c, chargeSign).iterator
      case f => sys.error(s"unsupported spectra format $f")
    }
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => parse(content) }
      .toDF()
  }
}
