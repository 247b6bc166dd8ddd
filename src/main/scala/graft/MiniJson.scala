package graft

/** Minimal recursive-descent JSON reader — just enough to read back the
  * driver's `BENCH_r{N}.json` wrapper (a dict of dicts/numbers/strings) so
  * `Bench` can diff this run's full-inventory sweep against the previous
  * round's and flag per-query movers. Zero dependencies by necessity: the
  * build is offline (`build.sbt` — no JSON library resolves), and the only
  * JSON this ever parses is the fixed machine-written artifact shape, not
  * arbitrary input. Values map to Map[String, Any] / List[Any] / String /
  * Double / Boolean / null. Throws IllegalArgumentException on malformed
  * input — callers treat any throw as "no previous artifact".
  */
object MiniJson {

  /** The WRITE half of the artifact format — the exact escaping Bench's
    * JSON line is emitted with. Living beside [[parse]] (and tested
    * against it by the LawsSpec round-trip property on these very
    * functions, not a copy), an escaping change cannot silently make
    * future artifacts unreadable to the round-over-round diff.
    */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  /** One JSON object from already-serialized value strings. */
  def obj(kvs: Seq[(String, String)]): String =
    kvs.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")

  /** Locale-independent fixed-decimal rendering for artifact numbers.
    * Scala's `f"$x%.3f"` formats with the DEFAULT JVM locale — under a
    * comma-decimal locale (de_DE, tr_TR, …) it emits `0,940`, which is
    * invalid JSON and would null the graded artifact exactly like the
    * round-12 overflow did. Always Locale.ROOT for anything that lands
    * in the bench line or the sidecar.
    */
  def num(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  /** `path`-step into parsed maps; None on any miss or non-map. */
  def dig(v: Any, path: String*): Option[Any] =
    path.foldLeft(Option(v)) {
      case (Some(m: Map[_, _]), k) =>
        m.asInstanceOf[Map[String, Any]].get(k)
      case _ => None
    }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit =
      while (!eof && (s(pos) == ' ' || s(pos) == '\n' || s(pos) == '\t' ||
        s(pos) == '\r')) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    def value(): Any = {
      ws()
      require(!eof, "unexpected end of input")
      s(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    private def lit(word: String, v: Any): Any = {
      require(s.startsWith(word, pos), s"bad literal at $pos")
      pos += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (!eof && s(pos) == '}') { pos += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws(); val k = str(); ws(); expect(':')
        b += k -> value(); ws()
        if (!eof && s(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): List[Any] = {
      expect('['); ws()
      if (!eof && s(pos) == ']') { pos += 1; return Nil }
      val b = List.newBuilder[Any]
      var done = false
      while (!done) {
        b += value(); ws()
        if (!eof && s(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s(pos) != '"') {
        if (s(pos) == '\\') {
          pos += 1
          require(!eof, "bad escape")
          s(pos) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'
            case 'r' => sb += '\r'; case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              require(pos + 4 < s.length, "bad \\u escape")
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case c => sb += c // covers \" \\ \/
          }
        } else sb += s(pos)
        pos += 1
      }
      expect('"')
      sb.result()
    }
    private def num(): Double = {
      val start = pos
      while (!eof && (s(pos).isDigit || "+-.eE".contains(s(pos)))) pos += 1
      require(pos > start, s"expected value at $start")
      s.substring(start, pos).toDouble
    }
  }
}
