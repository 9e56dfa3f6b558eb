package graft.cdc

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip property: render arbitrary change rows into test_decoding's
  * textual format, parse with [[WalText]], and recover identical structure —
  * the generative analogue of the reference's regression corpus
  * (`tests/test_bug_regressions.py`).
  */
class WalTextPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p0 = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(p0, org.scalacheck.rng.Seed(1234L + i)))
  }

  private val plainIdent = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))
  private val weirdIdent = Gen
    .nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '"', '-', 'Ü')))
    .map(_.mkString.take(12))
    .suchThat(_.exists(!_.isWhitespace))
  private val ident = Gen.oneOf(plainIdent, weirdIdent)

  private val strValue = Gen.listOf(
    Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\'', ':', '[', ']', ',', '{', '}'))
  ).map(_.mkString.take(20))

  private case class Col(name: String, tpe: String, value: Either[String, Long])

  private val column: Gen[Col] = for {
    name <- ident
    isNum <- Gen.oneOf(true, false)
    c <-
      if (isNum) Gen.choose(-1000000L, 1000000L).map(v => Col(name, "bigint", Right(v)))
      else strValue.map(v => Col(name, "text", Left(v)))
  } yield c

  private def needsQuote(s: String): Boolean =
    !s.forall(ch => ch.isLetterOrDigit && ch <= 0x7f || ch == '_' || ch == '-')

  private def renderIdent(s: String): String =
    if (needsQuote(s)) "\"" + s.replace("\"", "\"\"") + "\"" else s

  private def renderCol(c: Col): String = {
    val name = renderIdent(c.name)
    c.value match {
      case Right(n) => s"$name[${c.tpe}]:$n"
      case Left(s)  => s"$name[${c.tpe}]:'${s.replace("'", "''")}'"
    }
  }

  private val change = for {
    schema <- ident
    table <- ident
    cols <- Gen.nonEmptyListOf(column).map(_.take(5))
    // dedupe column names — a JSON object can't hold duplicates
    uniq = cols.groupBy(_.name).values.map(_.head).toList
  } yield (schema, table, uniq)

  test("render → parse round-trips schema, table, op, and typed values") {
    samples(Gen.listOfN(4, change), 40).foreach { changes =>
      val lines = Iterator("BEGIN 99") ++ changes.iterator.map { case (schema, table, cols) =>
        s"table ${renderIdent(schema)}.${renderIdent(table)}: INSERT: ${cols.map(renderCol).mkString(" ")}"
      } ++ Iterator("COMMIT 99")
      val parsed = WalText.parse(lines, onUnparsed = l => fail(s"unparsed: $l")).toSeq
      assert(parsed.length == changes.length)
      parsed.zip(changes).foreach { case (got, (schema, table, cols)) =>
        assert(got.schema == schema, s"schema for $schema.$table")
        assert(got.table == table)
        assert(got.tgOp == "INSERT" && got.txid == 99L)
        val json = new com.fasterxml.jackson.databind.ObjectMapper().readTree(got.newTuple.get)
        cols.foreach { c =>
          val node = json.get(c.name)
          assert(node != null, s"missing key '${c.name}' in ${got.newTuple.get}")
          c.value match {
            case Right(n) => assert(node.asLong() == n)
            case Left(s)  => assert(node.asText() == s)
          }
        }
      }
    }
  }
}
