package graft.config

import org.json4s._

/** Minimal YAML-subset parser covering the reference's `configs YAML files`
  * (the reference loads them with PyYAML safe_load —
  * etl/yaml_config_loader.py:36): block mappings and sequences by
  * indentation (including the common zero-indent form `key:` followed by
  * `- item` at the KEY's indent), flow sequences `[a, b]` and mappings
  * `{k: v}`, single/double-quoted and plain scalars with the safe_load
  * typing rules (null/bool/int/float — exponent floats require a dot,
  * matching PyYAML's resolver: `1e3` is a STRING under safe_load), `#`
  * comments. Not covered (the reference configs use none of them):
  * anchors/aliases, multi-doc streams, block scalars (`|`/`>`), tags,
  * tab indentation. Known typing divergences from safe_load, likewise
  * unused by the reference configs: ISO dates resolve to strings here
  * (safe_load: datetime.date), and escape sequences inside
  * double-quoted scalars (`\n`, `\"`) are kept verbatim, not unescaped.
  * Produces a json4s JValue so [[ConfigLoader]]'s JSON extraction
  * applies unchanged — YAML and JSON configs are one code path from the
  * parse boundary on.
  */
private[graft] object Yaml {

  private case class Line(indent: Int, text: String, no: Int)

  def parse(text: String): JValue = {
    val lines = text.linesIterator.toVector
      .map(stripComment)
      .zipWithIndex
      .collect { case (l, i) if l.trim.nonEmpty =>
        require(!l.takeWhile(c => c == ' ' || c == '\t').contains('\t'),
          s"yaml: tab indentation at line ${i + 1}")
        Line(l.takeWhile(_ == ' ').length, l.trim, i + 1)
      }
    if (lines.isEmpty) JNothing
    else {
      val (v, rest) = parseBlock(lines)
      require(rest.isEmpty,
        s"yaml: unexpected dedented content at line ${rest.head.no}")
      v
    }
  }

  /** Remove a trailing comment: `#` outside quotes, at line start or
    * preceded by whitespace (the YAML rule — `a#b` is a plain scalar).
    */
  private def stripComment(l: String): String = {
    var i = 0; var q: Char = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '\'' || c == '"') q = c
      else if (c == '#' && (i == 0 || l.charAt(i - 1) == ' ' ||
          l.charAt(i - 1) == '\t'))
        return l.substring(0, i)
      i += 1
    }
    l
  }

  /** Parse one block node starting at `lines.head`'s indent; returns the
    * node plus the lines after it (strictly less indented).
    */
  private def parseBlock(lines: Vector[Line]): (JValue, Vector[Line]) = {
    val at = lines.head.indent
    val (body, rest) = lines.span(_.indent >= at)
    val v =
      if (body.head.text == "-" || body.head.text.startsWith("- "))
        parseSeq(body, at)
      else parseMap(body, at)
    (v, rest)
  }

  private def parseSeq(body: Vector[Line], at: Int): JArray = {
    val items = Vector.newBuilder[JValue]
    var ls = body
    while (ls.nonEmpty) {
      val l = ls.head
      require(l.indent == at && (l.text == "-" || l.text.startsWith("- ")),
        s"yaml: expected sequence item at line ${l.no}")
      val inline = if (l.text == "-") "" else l.text.drop(2).trim
      val (nested, after) = ls.tail.span(_.indent > at)
      if (inline.isEmpty) {
        items += (if (nested.isEmpty) JNull else parsedWhole(nested))
        ls = after
      } else if (isMapStart(inline)) {
        // `- key: v` compact mapping: the dash line's remainder is the
        // mapping's first entry, two columns in.
        items += parsedWhole(Line(at + 2, inline, l.no) +: nested)
        ls = after
      } else {
        require(nested.isEmpty,
          s"yaml: scalar item with nested block at line ${l.no}")
        items += scalarOrFlow(inline, l.no)
        ls = after
      }
    }
    JArray(items.result().toList)
  }

  private def parseMap(body: Vector[Line], at: Int): JObject = {
    val fields = Vector.newBuilder[JField]
    var ls = body
    while (ls.nonEmpty) {
      val l = ls.head
      require(l.indent == at, s"yaml: bad indentation at line ${l.no}")
      require(!isDashLine(l.text),
        s"yaml: sequence item at mapping indent at line ${l.no} — a block " +
          "sequence may only follow a key with no inline value")
      val (key, after) = splitKey(l.text, l.no)
      val (nested, restLines) = ls.tail.span(_.indent > at)
      if (after.nonEmpty) {
        require(nested.isEmpty,
          s"yaml: inline value with nested block at line ${l.no}")
        fields += JField(key, scalarOrFlow(after, l.no))
        ls = restLines
      } else if (nested.isEmpty && restLines.nonEmpty &&
          restLines.head.indent == at && isDashLine(restLines.head.text)) {
        // Zero-indent block sequence (`key:` then `- item` at the KEY's
        // indent) — PyYAML-valid and common; the dash run (plus any
        // deeper continuations of its items) is the key's value.
        val (seqBody, rest2) = restLines.span(x =>
          x.indent > at || (x.indent == at && isDashLine(x.text)))
        fields += JField(key, parseSeq(seqBody, at))
        ls = rest2
      } else {
        fields += JField(key,
          if (nested.isEmpty) JNull else parsedWhole(nested))
        ls = restLines
      }
    }
    JObject(fields.result().toList)
  }

  private def isDashLine(t: String): Boolean = t == "-" || t.startsWith("- ")

  /** Parse `lines` as ONE complete block node: a nested block's later
    * lines dedenting below its first line but not below the parent
    * (e.g. `key:` then `    a: 1` then `  b: 2`) are malformed — PyYAML
    * rejects them, and silently dropping them would vanish config
    * entries from a loader that otherwise fails loudly.
    */
  private def parsedWhole(lines: Vector[Line]): JValue = {
    val (v, rest) = parseBlock(lines)
    require(rest.isEmpty,
      s"yaml: misaligned indentation at line ${rest.head.no} — line is " +
        s"dedented below its block's first entry (indent ${lines.head.indent})")
    v
  }

  /** Does a dash line's remainder start a compact mapping (`key: v`)? */
  private def isMapStart(s: String): Boolean =
    !s.startsWith("[") && !s.startsWith("{") && !s.startsWith("\"") &&
      !s.startsWith("'") &&
      (s.endsWith(":") || s.contains(": "))

  /** Split `key: value` / `key:`; the key may be quoted. Returns
    * (key, trimmed value or "").
    */
  private def splitKey(s: String, no: Int): (String, String) = {
    if (s.startsWith("\"") || s.startsWith("'")) {
      val q = s.charAt(0)
      val end = s.indexOf(q, 1)
      require(end > 0 && end + 1 < s.length && s.charAt(end + 1) == ':',
        s"yaml: malformed quoted key at line $no")
      (s.substring(1, end), s.substring(end + 2).trim)
    } else {
      val i =
        if (s.endsWith(":")) s.length - 1
        else s.indexOf(": ")
      require(i > 0, s"yaml: expected 'key:' at line $no")
      (s.substring(0, i).trim, s.substring(i + 1).trim)
    }
  }

  private def scalarOrFlow(s: String, no: Int): JValue = {
    if (s.startsWith("[") || s.startsWith("{")) {
      val (v, end) = parseFlow(s, 0, no)
      require(s.substring(end).trim.isEmpty,
        s"yaml: trailing content after flow value at line $no")
      v
    } else scalar(s)
  }

  /** Flow-style value at `s(i)`; returns (node, index just past it). */
  private def parseFlow(s: String, i0: Int, no: Int): (JValue, Int) = {
    var i = skipWs(s, i0)
    s.charAt(i) match {
      case '[' =>
        i = skipWs(s, i + 1)
        val items = List.newBuilder[JValue]
        while (s.charAt(i) != ']') {
          val (v, j) = parseFlow(s, i, no)
          items += v
          i = skipWs(s, j)
          if (s.charAt(i) == ',') i = skipWs(s, i + 1)
          else require(s.charAt(i) == ']', s"yaml: bad flow seq at line $no")
        }
        (JArray(items.result()), i + 1)
      case '{' =>
        i = skipWs(s, i + 1)
        val fields = List.newBuilder[JField]
        while (s.charAt(i) != '}') {
          val (k, j) = parseFlowScalarRaw(s, i, no, stopColon = true)
          i = skipWs(s, j)
          require(s.charAt(i) == ':', s"yaml: bad flow map at line $no")
          val (v, j2) = parseFlow(s, i + 1, no)
          fields += JField(keyString(k), v)
          i = skipWs(s, j2)
          if (s.charAt(i) == ',') i = skipWs(s, i + 1)
          else require(s.charAt(i) == '}', s"yaml: bad flow map at line $no")
        }
        (JObject(fields.result()), i + 1)
      case _ =>
        val (v, j) = parseFlowScalarRaw(s, i, no, stopColon = false)
        (v, j)
    }
  }

  private def keyString(v: JValue): String = v match {
    case JString(s) => s
    case JInt(n) => n.toString
    case JBool(b) => b.toString
    case other => other.toString
  }

  /** A scalar inside flow context: quoted, or plain up to , ] } (and
    * optionally :).
    */
  private def parseFlowScalarRaw(s: String, i0: Int, no: Int,
      stopColon: Boolean): (JValue, Int) = {
    var i = skipWs(s, i0)
    val c = s.charAt(i)
    if (c == '"' || c == '\'') {
      val end = s.indexOf(c, i + 1)
      require(end > 0, s"yaml: unterminated quote at line $no")
      (JString(s.substring(i + 1, end)), end + 1)
    } else {
      var j = i
      while (j < s.length && !",]}".contains(s.charAt(j)) &&
          !(stopColon && s.charAt(j) == ':')) j += 1
      (scalar(s.substring(i, j).trim), j)
    }
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s.charAt(i) == ' ') i += 1
    i
  }

  private val IntRe = "^[-+]?[0-9]+$".r
  // A dot is REQUIRED before an exponent form may resolve as float:
  // PyYAML's safe_load resolver rejects `1e3` (string), accepts `1.0e3`.
  private val FloatRe = "^[-+]?(\\.[0-9]+|[0-9]+\\.[0-9]*)([eE][-+]?[0-9]+)?$".r

  /** Plain-scalar typing (PyYAML safe_load resolution subset). */
  private def scalar(raw: String): JValue = {
    val s = raw.trim
    if (s.startsWith("\"") || s.startsWith("'")) {
      val q = s.charAt(0)
      require(s.length >= 2 && s.last == q, s"yaml: unterminated quote: $s")
      JString(s.substring(1, s.length - 1))
    } else s match {
      case "" | "~" | "null" | "Null" | "NULL" => JNull
      case "true" | "True" | "TRUE" => JBool(true)
      case "false" | "False" | "FALSE" => JBool(false)
      case IntRe() => JInt(BigInt(s))
      case FloatRe(_*) => JDouble(s.toDouble)
      case _ => JString(s)
    }
  }
}
