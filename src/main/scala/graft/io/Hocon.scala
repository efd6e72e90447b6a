package graft.io

import scala.collection.mutable

/** S6: HOCON config scan — a minimal, dependency-free HOCON-subset
  * parser (the runtime image ships no Typesafe Config jar, and the
  * build adds no dependencies by contract). Covers the dialect the
  * reference's configs actually use (generic_tools/config_parser.py:29-43
  * parses with pyhocon; full schema examples/.../configs/solution.conf):
  *
  *  - nested objects `a { b = v }` and dotted keys `a.b = v`
  *  - `=` and `:` separators, `#` and `//` comments
  *  - lists `[1, 2, 3]`, numbers, booleans, `null`
  *  - quoted and unquoted strings
  *  - whole-value substitutions `${a.b.c}` (solution.conf:71,616-619),
  *    resolved to fixpoint after parse
  *
  * Parse results are memoized per path like the reference's LRU cache
  * (config_parser.py:29-31).
  */
object Hocon {

  sealed trait Value
  final case class Obj(fields: Map[String, Value]) extends Value
  final case class Arr(items: List[Value]) extends Value
  final case class Str(s: String) extends Value
  final case class Num(d: Double, isInt: Boolean) extends Value
  final case class Bool(b: Boolean) extends Value
  case object Null extends Value
  /** Unresolved `${path}` placeholder (internal; gone after resolve). */
  final case class Sub(path: String) extends Value

  final class ConfigException(msg: String) extends RuntimeException(msg)

  /** A parsed config with typed path getters (ConfigTree analogue). */
  final case class Config(root: Obj) {
    private def lookup(path: String): Option[Value] =
      path.split('.').foldLeft(Option[Value](root)) {
        case (Some(Obj(f)), k) => f.get(k)
        case _ => None
      }
    def has(path: String): Boolean = lookup(path).exists(_ != Null)
    def getString(path: String): String = lookup(path) match {
      case Some(Str(s)) => s
      case Some(Num(d, true)) => d.toLong.toString
      case Some(Num(d, false)) => d.toString
      case Some(Bool(b)) => b.toString
      case other => fail(path, "string", other)
    }
    def getBool(path: String): Boolean = lookup(path) match {
      case Some(Bool(b)) => b
      case other => fail(path, "boolean", other)
    }
    def getInt(path: String): Int = lookup(path) match {
      case Some(Num(d, _)) => d.toInt
      case other => fail(path, "int", other)
    }
    def getLong(path: String): Long = lookup(path) match {
      case Some(Num(d, _)) => d.toLong
      case other => fail(path, "long", other)
    }
    def getDouble(path: String): Double = lookup(path) match {
      case Some(Num(d, _)) => d
      case other => fail(path, "double", other)
    }
    def getStringOrNull(path: String): Option[String] = lookup(path) match {
      case Some(Null) | None => None
      case _ => Some(getString(path))
    }
    def getList(path: String): List[Value] = lookup(path) match {
      case Some(Arr(xs)) => xs
      case other => fail(path, "list", other)
    }
    def getStringList(path: String): List[String] = getList(path).map {
      case Str(s) => s
      case Num(d, true) => d.toLong.toString
      case Num(d, false) => d.toString
      case v => throw new ConfigException(s"$path: non-scalar list item $v")
    }
    def getLongList(path: String): List[Long] = getList(path).map {
      case Num(d, _) => d.toLong
      case v => throw new ConfigException(s"$path: non-numeric list item $v")
    }
    def getConfig(path: String): Config = lookup(path) match {
      case Some(o: Obj) => Config(o)
      case other => fail(path, "object", other)
    }
    def keys(path: String = ""): Seq[String] =
      (if (path.isEmpty) Some(root) else lookup(path)) match {
        case Some(Obj(f)) => f.keys.toSeq.sorted
        case _ => Seq.empty
      }
    private def fail(path: String, want: String, got: Option[Value]): Nothing =
      throw new ConfigException(s"config path '$path': wanted $want, got ${got.getOrElse("<missing>")}")
  }

  private val fileCache = mutable.Map.empty[String, Config]

  def parseFile(path: String): Config = fileCache.synchronized {
    fileCache.getOrElseUpdate(path, {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p))
        throw new ConfigException(s"No config file found in: $path")
      parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    })
  }

  def parse(text: String): Config = {
    val p = new Parser(text)
    val rootFields = p.parseMembers(atRoot = true)
    val resolved = resolve(Obj(rootFields))
    Config(resolved.asInstanceOf[Obj])
  }

  // ----------------------------------------------------------------- //

  private def resolve(root: Value): Value = {
    def res(v: Value, top: Obj): Value = v match {
      case Obj(f) => Obj(f.map { case (k, x) => k -> res(x, top) })
      case Arr(xs) => Arr(xs.map(res(_, top)))
      case Sub(path) =>
        path.split('.').foldLeft(Option[Value](top)) {
          case (Some(Obj(f)), k) => f.get(k)
          case _ => None
        }.getOrElse(throw new ConfigException(s"unresolved substitution: $${$path}"))
      case other => other
    }
    // fixpoint: substitutions may reference other substitutions
    var cur = root
    var i = 0
    while (i < 10) {
      val next = res(cur, cur.asInstanceOf[Obj])
      if (next == cur) return next
      cur = next; i += 1
    }
    throw new ConfigException("substitution cycle")
  }

  private final class Parser(s: String) {
    private var i = 0
    private def eof: Boolean = i >= s.length
    private def ch: Char = s.charAt(i)

    private def skipWsAndComments(skipNewlines: Boolean): Unit = {
      var go = true
      while (go && !eof) {
        if (ch == '#' || (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '/')) {
          while (!eof && ch != '\n') i += 1
        } else if (ch == '\n') {
          if (skipNewlines) i += 1 else go = false
        } else if (ch.isWhitespace) i += 1
        else go = false
      }
    }

    def parseMembers(atRoot: Boolean): Map[String, Value] = {
      var fields = Map.empty[String, Value]
      skipWsAndComments(skipNewlines = true)
      while (!eof && ch != '}') {
        val key = parseKey()
        skipWsAndComments(skipNewlines = false)
        val value =
          if (!eof && ch == '{') parseObject()
          else {
            if (!eof && (ch == '=' || ch == ':')) { i += 1; skipWsAndComments(skipNewlines = false) }
            parseValue()
          }
        fields = mergeKeyPath(fields, key.split('.').toList, value)
        skipWsAndComments(skipNewlines = false)
        if (!eof && (ch == ',' || ch == '\n')) i += 1
        skipWsAndComments(skipNewlines = true)
      }
      if (!atRoot) { require(!eof && ch == '}', "expected '}'"); i += 1 }
      fields
    }

    /** `a.b.c = v` creates nested objects; same-key objects merge. */
    private def mergeKeyPath(fields: Map[String, Value], path: List[String], v: Value): Map[String, Value] =
      path match {
        case k :: Nil =>
          val merged = (fields.get(k), v) match {
            case (Some(Obj(a)), Obj(b)) => Obj(a ++ b)
            case _ => v
          }
          fields + (k -> merged)
        case k :: rest =>
          val inner = fields.get(k) match {
            case Some(Obj(f)) => f
            case _ => Map.empty[String, Value]
          }
          fields + (k -> Obj(mergeKeyPath(inner, rest, v)))
        case Nil => fields
      }

    private def parseKey(): String = {
      skipWsAndComments(skipNewlines = true)
      if (ch == '"') parseQuoted()
      else {
        val start = i
        while (!eof && !ch.isWhitespace && ch != '=' && ch != ':' && ch != '{') i += 1
        s.substring(start, i)
      }
    }

    private def parseObject(): Value = {
      require(ch == '{'); i += 1
      Obj(parseMembers(atRoot = false))
    }

    private def parseArray(): Value = {
      require(ch == '['); i += 1
      var items = List.empty[Value]
      skipWsAndComments(skipNewlines = true)
      while (!eof && ch != ']') {
        items ::= parseValue(inArray = true)
        skipWsAndComments(skipNewlines = true)
        if (!eof && ch == ',') { i += 1; skipWsAndComments(skipNewlines = true) }
      }
      require(!eof && ch == ']', "expected ']'"); i += 1
      Arr(items.reverse)
    }

    private def parseQuoted(): String = {
      require(ch == '"'); i += 1
      val sb = new StringBuilder
      while (!eof && ch != '"') {
        if (ch == '\\' && i + 1 < s.length) {
          i += 1
          sb.append(ch match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case c => c
          })
        } else sb.append(ch)
        i += 1
      }
      require(!eof, "unterminated string"); i += 1
      sb.toString
    }

    private def parseValue(inArray: Boolean = false): Value = {
      skipWsAndComments(skipNewlines = inArray)
      if (eof) return Null
      ch match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => Str(parseQuoted())
        case '$' if i + 1 < s.length && s.charAt(i + 1) == '{' =>
          i += 2
          val start = i
          while (!eof && ch != '}') i += 1
          val path = s.substring(start, i); i += 1
          Sub(path)
        case _ =>
          val start = i
          val stops = if (inArray) Set(',', ']', '\n', '#', '}') else Set(',', '\n', '#', '}')
          while (!eof && !stops.contains(ch) &&
            !(ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '/')) i += 1
          val raw = s.substring(start, i).trim
          // pyhocon accepts Python-style True/False capitalization — the
          // reference configs rely on it (solution.conf:225,278).
          raw.toLowerCase match {
            case "" => Null
            case "true" | "yes" | "on" => Bool(true)
            case "false" | "no" | "off" => Bool(false)
            case "null" | "none" => Null
            case _ =>
              // integer first (preserves int-ness), then double, else string
              try Num(java.lang.Long.parseLong(raw).toDouble, isInt = true)
              catch { case _: NumberFormatException =>
                try Num(java.lang.Double.parseDouble(raw), isInt = false)
                catch { case _: NumberFormatException => Str(raw) }
              }
          }
      }
    }
  }
}
