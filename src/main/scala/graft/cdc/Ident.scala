package graft.cdc

/** Possibly-quoted, dot-qualified SQL identifier parsing.
  *
  * Reference: `internal/util/ident/parse.go:34` (ParseIdent /
  * parseQuotedIdent / parseDottedIdent): a name part is either unquoted
  * (runs to the next `.`) or double-quoted with `""` escaping a literal
  * quote; parts join with `.`. An unmatched quote, a leading separator,
  * or a non-separator after a closing quote is an error; a trailing
  * separator is tolerated (as the reference tolerates it).
  *
  * Matching semantics: unquoted parts compare case-insensitively (the
  * canonical-fold the reference applies to every ident), QUOTED parts
  * compare exactly — so a feed or config naming `"User"."Order ID"`
  * binds only to that exact spelling, while `USER_ID` still finds
  * `user_id`. Qualified names resolve suffix-wise, like SQL column
  * references: config `t.id` matches a bare source column `id`.
  */
object Ident {

  /** One name part; `quoted` parts demand exact-case matching. */
  final case class Part(name: String, quoted: Boolean) {
    def rendered: String =
      if (quoted) "\"" + name.replace("\"", "\"\"") + "\"" else name
  }

  /** Parse ONE part from the head of `s`; returns (part, rest). */
  def parseOne(s: String): (Part, String) = {
    if (s.isEmpty)
      throw new IllegalArgumentException("ident: cannot parse empty string")
    s.charAt(0) match {
      case '.' =>
        throw new IllegalArgumentException(
          s"ident: cannot start with separator: '$s'")
      case '"' =>
        val out = new StringBuilder
        var i = 1
        var closed = false
        while (i < s.length && !closed) {
          val c = s.charAt(i)
          if (c == '"') {
            if (i + 1 < s.length && s.charAt(i + 1) == '"') {
              out.append('"'); i += 2 // escaped quote
            } else { closed = true; i += 1 }
          } else { out.append(c); i += 1 }
        }
        if (!closed)
          throw new IllegalArgumentException(
            s"ident: did not find trailing quote: '$s'")
        (Part(out.toString, quoted = true), s.substring(i))
      case _ =>
        val dot = s.indexOf('.')
        if (dot < 0) (Part(s, quoted = false), "")
        else (Part(s.substring(0, dot), quoted = false), s.substring(dot))
    }
  }

  /** Parse a full dotted name (reference `parseDottedIdent`): after each
    * part the rest must be empty or a `.` introducing the next part.
    */
  def parse(s: String): Seq[Part] = {
    val parts = Seq.newBuilder[Part]
    var rest = s
    while (rest.nonEmpty) {
      val (p, r) = parseOne(rest)
      parts += p
      if (r.nonEmpty && r.charAt(0) != '.')
        throw new IllegalArgumentException(s"ident: expecting separator at '$r'")
      rest = if (r.nonEmpty) r.substring(1) else r
    }
    parts.result()
  }

  /** Lenient parse for DATA-derived names (feed keys, parquet columns).
    * A name is only treated as quoted/qualified when it CONTAINS a
    * quote character (`"User"."Order ID"` wire keys); a plain name —
    * even one with dots, like a flattened nested column `address.city`
    * — stays ONE verbatim part. SQL convention agrees: to qualify you
    * quote, and an unquoted literal-dot column name can only come from
    * data, never from parsed SQL. Malformed quoting falls back to the
    * verbatim part instead of throwing — data shapes must never crash
    * the mapping plan.
    */
  def parseLenient(s: String): Seq[Part] = {
    if (!s.contains('"')) return Seq(Part(s, quoted = false))
    val p = try parse(s) catch {
      case _: IllegalArgumentException => Seq(Part(s, quoted = false))
    }
    if (p.isEmpty) Seq(Part(s, quoted = false)) else p
  }

  private def partMatches(a: Part, b: Part, caseSensitive: Boolean): Boolean =
    if (a.quoted || b.quoted || caseSensitive) a.name == b.name
    else a.name.equalsIgnoreCase(b.name)

  /** SQL-reference-style resolution: names match when their parts agree
    * pairwise from the END (so a more-qualified side tolerates a
    * less-qualified one: `t.id` ~ `id`, but `x.id` !~ `a.id`).
    */
  def suffixMatches(a: Seq[Part], b: Seq[Part], caseSensitive: Boolean): Boolean =
    a.nonEmpty && b.nonEmpty &&
      a.reverse.zip(b.reverse).forall { case (x, y) => partMatches(x, y, caseSensitive) }

  /** The bare column a name denotes: its last part's unescaped text. */
  def lastName(parts: Seq[Part]): String = parts.last.name
}
