package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Tar: ustar archive walking + WebDataset sample grouping. */
class TarSpec extends AnyFunSuite {

  private def recs: Seq[Tar.TarEntry] = Seq(
    Tar.TarEntry("000001.png", Array.tabulate[Byte](700)(i => i.toByte)),
    Tar.TarEntry("000001.txt", "a caption".getBytes("UTF-8")),
    Tar.TarEntry("000002.png", Array.tabulate[Byte](513)(i => (i * 3).toByte)),
    Tar.TarEntry("000002.txt", "another".getBytes("UTF-8")),
    Tar.TarEntry("sub/dir/000003.cls", "7".getBytes("UTF-8")))

  test("plain and gzipped tars roundtrip: names, exact bytes, 512 " +
    "padding, checksums verified") {
    for (blob <- Seq(Tar.synthesizeTar(recs), Tar.synthesizeTarGz(recs))) {
      val got = Tar.entries(blob)
      assert(got.map(_.name) === recs.map(_.name))
      got.zip(recs).foreach { case (g, r) =>
        assert(g.data.toSeq === r.data.toSeq, r.name)
      }
    }
    // a corrupted checksum ends the walk at that entry
    val plain = Tar.synthesizeTar(recs)
    val dmg = plain.clone()
    // second header starts at 512 + ceil(700/512)*512 = 1536
    dmg(1536 + 148) = '9'
    assert(Tar.entries(dmg).map(_.name) === Seq("000001.png"))
    // truncation keeps whole entries before it; garbage/null are empty
    (0 until plain.length by 97).foreach { n =>
      Tar.entries(plain.take(n)) // never throws
    }
    assert(Tar.entries("not a tar at all".getBytes) === Seq.empty)
    assert(Tar.entries(null) === Seq.empty)
    val rnd = new scala.util.Random(47)
    (1 to 200).foreach { _ =>
      val m = plain.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      Tar.entries(m) // never throws
    }
  }

  test("webdatasetSamples groups members by basename stem across " +
    "directories, interleaved order tolerated") {
    val spark = graft.SparkSuite.session
    import spark.implicits._
    // interleave members of different samples (real writers do)
    val shuffled = Seq(recs(0), recs(2), recs(1), recs(4), recs(3))
    val df = Seq((1, Tar.synthesizeTarGz(shuffled))).toDF("id", "shard")
    val got = Tar.webdatasetSamples(df, "shard")
      .select("stem", "members").collect()
      .map(r => r.getString(0) ->
        r.getMap[String, Array[Byte]](1).keys.toSet).toMap
    assert(got === Map(
      "000001" -> Set("png", "txt"),
      "000002" -> Set("png", "txt"),
      "000003" -> Set("cls")))
  }
}
