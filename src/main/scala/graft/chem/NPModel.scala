package graft.chem

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream, InputStream}
import java.util.zip.GZIPInputStream

/** Loader for the reference's shipped NP-likeness model
  * (`NP_Score/publicnp.model.gz`, npscorer.py:30-34): a gzip'd Python
  * pickle (protocol 2) of a flat `dict` mapping Morgan-fingerprint bit
  * ids (uint32) to trained float scores — 266 104 entries.
  *
  * Only the opcode subset that file actually uses is implemented
  * (PROTO, EMPTY_DICT, BINPUT, MARK, BININT, BININT2, INT, BINFLOAT,
  * SETITEMS, STOP); anything else fails loudly. No Python runtime
  * involved — the pickle wire format is public and stable.
  */
object NPModel {

  def load(path: String): Map[Long, Double] = {
    val in = new DataInputStream(new BufferedInputStream(
      new GZIPInputStream(new FileInputStream(path)), 1 << 16))
    try parse(in) finally in.close()
  }

  private def parse(in: DataInputStream): Map[Long, Double] = {
    val out = scala.collection.mutable.HashMap.empty[Long, Double]
    // the value stack holds Long (ints) and Double (floats); MARK is a
    // sentinel; the single EMPTY_DICT is the target dict itself
    val Mark = new Object
    val Dict = new Object
    val stack = scala.collection.mutable.ArrayBuffer.empty[Any]
    def readLineAscii(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\n' && c != -1) { sb.append(c.toChar); c = in.read() }
      sb.toString
    }
    def readIntLE(n: Int): Long = {
      var v = 0L
      for (k <- 0 until n) v |= (in.read().toLong & 0xff) << (8 * k)
      v
    }
    while (true) {
      val op = in.read()
      if (op == -1) throw new EOFException("pickle truncated")
      (op: @annotation.switch) match {
        case 0x80 => in.read() // PROTO n
        case '}' => stack += Dict // EMPTY_DICT
        case 'q' => in.read() // BINPUT idx (memo write, ignored)
        case '(' => stack += Mark // MARK
        case 'J' => // BININT: signed 4-byte LE
          val v = readIntLE(4)
          stack += (if (v > Int.MaxValue) v - (1L << 32) else v)
        case 'M' => stack += readIntLE(2) // BININT2: unsigned 2-byte LE
        case 'I' => // INT: decimal text line
          stack += readLineAscii().trim.toLong
        case 'G' => // BINFLOAT: 8-byte big-endian double
          stack += java.lang.Double.longBitsToDouble(in.readLong())
        case 'u' => // SETITEMS: pairs back to MARK into the dict below it
          val mark = stack.lastIndexWhere(_.asInstanceOf[AnyRef] eq Mark)
          require(mark > 0 &&
            (stack(mark - 1).asInstanceOf[AnyRef] eq Dict),
            "SETITEMS without dict+mark")
          require((stack.length - mark - 1) % 2 == 0,
            "SETITEMS with odd-length key/value batch")
          var i = mark + 1
          while (i + 1 < stack.length) {
            out(stack(i).asInstanceOf[Long]) =
              stack(i + 1) match {
                case d: Double => d
                case l: Long => l.toDouble
              }
            i += 2
          }
          stack.remove(mark, stack.length - mark)
        case '.' => // STOP
          return out.toMap
        case other =>
          throw new IllegalArgumentException(
            f"unsupported pickle opcode 0x$other%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
