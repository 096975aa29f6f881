package graft.core

/** Tiny JSON AST + serializer with stable (insertion) key order, so
  * metadata goldens are byte-stable across runs (reference serializes
  * with python dict insertion order, `utils/utils.py:311-348`).
  */
object Json {
  sealed trait JValue {
    def render: String = Json.render(this)
  }
  final case class JObj(fields: Seq[(String, JValue)]) extends JValue
  final case class JArr(items: Seq[JValue]) extends JValue
  final case class JStr(s: String) extends JValue
  /** `integral` controls rendering: 3 vs 3.0 (python json keeps the
    * distinction and the reference metadata mixes both).
    */
  final case class JNum(n: BigDecimal, integral: Boolean) extends JValue
  final case class JBool(b: Boolean) extends JValue
  case object JNull extends JValue

  def obj(fields: (String, JValue)*): JObj = JObj(fields)
  def arr(items: JValue*): JArr = JArr(items)
  def str(s: String): JStr = JStr(s)
  def num(n: Long): JNum = JNum(BigDecimal(n), integral = true)
  def num(n: Int): JNum = JNum(BigDecimal(n), integral = true)
  def num(n: Double): JNum = JNum(BigDecimal(n), integral = false)
  def bool(b: Boolean): JBool = JBool(b)

  private def esc(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def render(v: JValue): String = v match {
    case JObj(fs)  => fs.map { case (k, x) => esc(k) + ":" + render(x) }.mkString("{", ",", "}")
    case JArr(xs)  => xs.map(render).mkString("[", ",", "]")
    case JStr(s)   => esc(s)
    case JNum(n, integral) =>
      if (integral) n.toLong.toString
      else {
        val d = n.toDouble
        if (d == d.floor && d.abs < 1e15) s"${d.toLong}.0" else d.toString
      }
    case JBool(b)  => b.toString
    case JNull     => "null"
  }
}
