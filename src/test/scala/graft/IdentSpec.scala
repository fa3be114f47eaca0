package graft

import graft.cdc.{Apply, Ident, SchemaWatch}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Quoted/qualified identifier parsing (reference
  * internal/util/ident/parse.go) and its wiring into schemaMap/align.
  */
class IdentSpec extends SparkSpec {
  import spark.implicits._

  test("parse: unquoted, quoted, escaped, dotted, errors") {
    assert(Ident.parse("abc").map(_.name) == Seq("abc"))
    assert(Ident.parse("a.b.c").map(_.name) == Seq("a", "b", "c"))
    val q = Ident.parse("\"User\".\"Order ID\"")
    assert(q.map(_.name) == Seq("User", "Order ID"))
    assert(q.forall(_.quoted))
    assert(Ident.parse("\"a\"\"b\"").map(_.name) == Seq("a\"b")) // "" escapes
    assert(Ident.parse("\"a.b\"").map(_.name) == Seq("a.b")) // quoted dot literal
    assert(Ident.parse("mixed.\"Quoted Part\"").map(_.name) ==
      Seq("mixed", "Quoted Part"))
    assert(Ident.parse("a.").map(_.name) == Seq("a")) // trailing dot tolerated
    intercept[IllegalArgumentException](Ident.parse(".a")) // leading separator
    intercept[IllegalArgumentException](Ident.parse("\"a")) // unmatched quote
    intercept[IllegalArgumentException](Ident.parse("\"a\"b")) // junk after quote
    intercept[IllegalArgumentException](Ident.parse("a..b")) // empty part
    // rendered round-trips through parse
    val p = Ident.parse("\"We\"\"ird\".tail")
    assert(Ident.parse(p.map(_.rendered).mkString(".")) == p)
  }

  test("suffix matching: qualification and quoting semantics") {
    // data side (parseLenient) vs config side (parse): config may
    // qualify with unquoted dots; DATA names with dots stay verbatim
    def m(data: String, config: String, cs: Boolean = false) =
      Ident.suffixMatches(Ident.parseLenient(data), Ident.parse(config), cs)
    assert(m("id", "t.id")) // less-qualified data side tolerated
    assert(!m("x.id", "a.id")) // data dotted name is verbatim, no match
    assert(m("USER_ID", "user_id")) // unquoted folds case
    assert(!m("USER_ID", "user_id", cs = true))
    assert(!m("ID", "\"id\"")) // quoted config is case-exact
    // flattened nested column `address.city` is ONE verbatim data part:
    // config `city` must NOT silently hit it...
    assert(!m("address.city", "city"))
    assert(!m("address.city", "address.city")) // unquoted dots qualify
    assert(m("address.city", "\"address.city\"")) // quote to name it
    // ...while an explicitly-quoted qualified WIRE key still resolves
    assert(Ident.suffixMatches(Ident.parseLenient("\"User\".\"Order ID\""),
      Ident.parseLenient("Order ID"), caseSensitive = false))
  }

  test("schemaMap accepts quoted and qualified configured names") {
    val both = Seq((1L, 2L, "x")).toDF("id", "ID", "v")
    // quoted names bind exactly — id/ID fold together, but no ambiguity
    val out = Apply.schemaMap(both, renames = Seq("\"ID\"" -> "big_id"),
      exprs = Nil, ignore = Seq("\"id\""), extrasJson = None)
    assert(out.columns.toSeq == Seq("v", "big_id"))
    assert(out.collect()(0).getLong(out.columns.indexOf("big_id")) == 2L)

    // qualified rename resolves suffix-wise onto the bare column
    val plain = Seq((1L, "a")).toDF("user_id", "name")
    val q = Apply.schemaMap(plain, renames = Seq("\"t\".\"user_id\"" -> "uid"),
      exprs = Nil, ignore = Nil, extrasJson = None)
    assert(q.columns.toSeq == Seq("name", "uid"))

    // unquoted config still case-folds (pre-Ident behavior retained)
    val f = Apply.schemaMap(plain, renames = Seq("USER_ID" -> "uid"),
      exprs = Nil, ignore = Nil, extrasJson = None)
    assert(f.columns.toSeq == Seq("name", "uid"))

    // malformed config name errors loudly, naming the bad string
    val e = intercept[IllegalArgumentException](Apply.schemaMap(plain,
      renames = Seq("\"oops" -> "x"), exprs = Nil, ignore = Nil,
      extrasJson = None))
    assert(e.getMessage.contains("oops"))
  }

  test("align binds quoted/qualified feed keys to target columns") {
    val feed = Seq((7L, "n")).toDF("\"User\".\"Order ID\"", "name")
    val target = StructType(Seq(StructField("Order ID", LongType),
      StructField("name", StringType)))
    val out = SchemaWatch.align(feed, target).collect()(0)
    assert(out.getLong(0) == 7L) // quoted qualified key found its column
    assert(out.getString(1) == "n")

    // quoted parts stay case-exact even in case-insensitive mode:
    // "ORDER ID" (quoted) must NOT bind to target `Order ID` → null-pad
    val wrongCase = Seq((7L, "n")).toDF("\"ORDER ID\"", "name")
    val padded = SchemaWatch.align(wrongCase, target).collect()(0)
    assert(padded.isNullAt(0))
    assert(padded.getString(1) == "n")
  }
}
