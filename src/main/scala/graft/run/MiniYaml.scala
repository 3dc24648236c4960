package graft.run

/** Minimal YAML-subset parser for dbt project files (`dbt_project.yml`,
  * `schema.yml`/`sources.yml`, `packages.yml`, `selectors.yml`).
  *
  * Deliberately NOT a YAML implementation — it parses the block-style
  * subset those files actually use (reference: the .yml files at the
  * repo root of `/root/reference` and under its `models` dir):
  *   - `key: value` scalars (plain, single- or double-quoted; quotes may
  *     wrap Jinja like `"{{ env_var('X') }}"`),
  *   - `key:` opening a nested mapping or sequence at deeper indent,
  *   - `- item` sequence entries: scalar items, or mapping items whose
  *     first field rides the dash line (`- name: x`) and whose remaining
  *     fields align under it,
  *   - `[a, b]` / `['a', 'b']` flow sequences as scalar-list values,
  *   - `{}` / `[]` empties, `#` comments, blank lines.
  * Anchors, aliases, multi-line scalars, multi-doc streams and tabs are
  * out of scope and fail loudly — a dbt project using them deserves a
  * clear error, not silent misparsing.
  */
object MiniYaml {

  sealed trait Node
  final case class Scalar(value: String) extends Node
  final case class Arr(items: Seq[Node]) extends Node
  final case class Obj(entries: Seq[(String, Node)]) extends Node {
    def get(key: String): Option[Node] = entries.find(_._1 == key).map(_._2)
    def scalar(key: String): Option[String] = get(key).collect {
      case Scalar(v) => v
    }
    def obj(key: String): Option[Obj] = get(key).collect { case o: Obj => o }
    def arr(key: String): Seq[Node] = get(key) match {
      case Some(Arr(items)) => items
      case _ => Nil
    }
  }

  /** Items of an `Arr` value that are scalars (flow or block lists). */
  def scalars(n: Node): Seq[String] = n match {
    case Scalar(v) => Seq(v)
    case Arr(items) => items.collect { case Scalar(v) => v }
    case _ => Nil
  }

  private final case class Line(indent: Int, text: String, lineNo: Int)

  def parse(text: String): Obj = {
    val lines = text.split("\n", -1).iterator.zipWithIndex.flatMap {
      case (raw, i) =>
        require(!raw.contains("\t"),
          s"yaml line ${i + 1}: tabs are not supported, use spaces")
        val noComment = stripComment(raw)
        val t = noComment.trim
        if (t.isEmpty || t == "---") None
        else Some(Line(noComment.takeWhile(_ == ' ').length, t, i + 1))
    }.toIndexedSeq
    if (lines.isEmpty) return Obj(Nil)
    val (node, next) = parseBlock(lines, 0, lines.head.indent)
    require(next == lines.length,
      s"yaml line ${lines(next).lineNo}: unexpected indentation " +
        s"('${lines(next).text}')")
    node match {
      case o: Obj => o
      case other => throw new IllegalArgumentException(
        s"yaml: expected a top-level mapping, got $other")
    }
  }

  /** Strip a trailing comment, respecting quoted spans. */
  private def stripComment(l: String): String = {
    var q: Char = 0
    var i = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '\'' || c == '"') q = c
      else if (c == '#' && (i == 0 || l.charAt(i - 1).isWhitespace))
        return l.substring(0, i)
      i += 1
    }
    l
  }

  private def unq(v0: String): String = {
    val v = v0.trim
    if (v.length >= 2 && ((v.startsWith("'") && v.endsWith("'")) ||
        (v.startsWith("\"") && v.endsWith("\""))))
      v.substring(1, v.length - 1)
    else v
  }

  /** A scalar value, a `[a, b]` flow list, or `{}`/`[]` empties. */
  private def parseValue(v0: String, lineNo: Int): Node = {
    val v = v0.trim
    if (v == "[]") Arr(Nil)
    else if (v == "{}") Obj(Nil)
    else if (v.startsWith("[") && v.endsWith("]")) {
      val inner = v.substring(1, v.length - 1).trim
      if (inner.isEmpty) Arr(Nil)
      else Arr(splitFlow(inner).map(x => Scalar(unq(x))))
    }
    else if (v.startsWith("{") && v.endsWith("}")) {
      // tiny flow mapping: {col: type, col2: type2}
      val inner = v.substring(1, v.length - 1).trim
      if (inner.isEmpty) Obj(Nil)
      else Obj(splitFlow(inner).map { kv =>
        val i = kv.indexOf(':')
        require(i > 0, s"yaml line $lineNo: bad flow-mapping entry '$kv'")
        unq(kv.substring(0, i)) -> Scalar(unq(kv.substring(i + 1)))
      })
    }
    else Scalar(unq(v))
  }

  /** Split flow-list content at top-level commas (quotes protect). */
  private def splitFlow(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var q: Char = 0
    s.foreach {
      case c @ ('\'' | '"') =>
        if (q == 0) q = c else if (q == c) q = 0
        sb.append(c)
      case ',' if q == 0 => out += sb.result().trim; sb.clear()
      case c => sb.append(c)
    }
    val last = sb.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** `key` / `key: value` split at the first un-quoted colon followed by
    * a space or end-of-line (URLs like `https://…` stay whole values).
    */
  private def keyValue(t: String, lineNo: Int): Option[(String, String)] = {
    var q: Char = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '\'' || c == '"') q = c
      else if (c == ':' && (i == t.length - 1 || t.charAt(i + 1) == ' '))
        return Some((unq(t.substring(0, i)), t.substring(i + 1).trim))
      i += 1
    }
    None
  }

  private def parseBlock(lines: IndexedSeq[Line], start: Int,
                         indent: Int): (Node, Int) =
    if (lines(start).text.startsWith("- ") || lines(start).text == "-")
      parseSeq(lines, start, indent)
    else parseMap(lines, start, indent)

  private def parseMap(lines: IndexedSeq[Line], start: Int,
                       indent: Int): (Node, Int) = {
    val entries = Seq.newBuilder[(String, Node)]
    var i = start
    while (i < lines.length && lines(i).indent == indent &&
        !lines(i).text.startsWith("- ")) {
      val l = lines(i)
      keyValue(l.text, l.lineNo) match {
        case Some((k, v)) if v.nonEmpty =>
          entries += k -> parseValue(v, l.lineNo)
          i += 1
        case Some((k, _)) => // `key:` — nested block or empty
          if (i + 1 < lines.length && lines(i + 1).indent > indent) {
            val (child, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
            entries += k -> child
            i = next
          } else if (i + 1 < lines.length &&
              lines(i + 1).indent == indent &&
              lines(i + 1).text.startsWith("- ")) {
            // sequence items aligned AT the key's own indent (valid yaml)
            val (child, next) = parseSeq(lines, i + 1, indent)
            entries += k -> child
            i = next
          } else {
            entries += k -> Scalar("")
            i += 1
          }
        case None => throw new IllegalArgumentException(
          s"yaml line ${l.lineNo}: expected 'key:' or 'key: value', " +
            s"got '${l.text}'")
      }
    }
    (Obj(entries.result()), i)
  }

  private def parseSeq(lines: IndexedSeq[Line], start: Int,
                       indent: Int): (Node, Int) = {
    val items = Seq.newBuilder[Node]
    var i = start
    while (i < lines.length && lines(i).indent == indent &&
        (lines(i).text.startsWith("- ") || lines(i).text == "-")) {
      val l = lines(i)
      val rest = l.text.drop(1).trim
      if (rest.isEmpty) {
        // `-` alone: nested node on the following deeper lines
        require(i + 1 < lines.length && lines(i + 1).indent > indent,
          s"yaml line ${l.lineNo}: empty sequence item")
        val (child, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
        items += child
        i = next
      } else keyValue(rest, l.lineNo) match {
        case Some((k, v)) =>
          // mapping item: first field on the dash line, the rest under
          // it at the FIRST field's actual column (usually dash + 2,
          // but any number of spaces after the dash is valid yaml)
          val fieldIndent =
            indent + 1 + l.text.drop(1).takeWhile(_ == ' ').length
          val head: (String, Node) =
            if (v.nonEmpty) k -> parseValue(v, l.lineNo)
            else if (i + 1 < lines.length &&
                lines(i + 1).indent > fieldIndent) {
              val (child, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
              i = next - 1 // consumed; adjusted below
              k -> child
            } else if (i + 1 < lines.length &&
                lines(i + 1).indent == fieldIndent &&
                (lines(i + 1).text.startsWith("- ") ||
                  lines(i + 1).text == "-")) {
              // `key:` with its sequence items AT the field indent —
              // valid yaml, same shape parseMap accepts at map level
              val (child, next) = parseSeq(lines, i + 1, fieldIndent)
              i = next - 1
              k -> child
            } else k -> Scalar("")
          var entries = Seq(head)
          i += 1
          if (lines.isDefinedAt(i) && lines(i).indent == fieldIndent &&
              !lines(i).text.startsWith("- ")) {
            val (Obj(more), next) = parseMap(lines, i, fieldIndent): @unchecked
            entries ++= more
            i = next
          }
          items += Obj(entries)
        case None =>
          items += parseValue(rest, l.lineNo)
          i += 1
      }
    }
    (Arr(items.result()), i)
  }
}
