package graft.functions

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Pure-kernel properties for the round-6 session-3 utilities — no Spark
  * session, every sample is a direct JVM call.
  */
class Session3PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  private def u(s: String) = UTF8String.fromString(s)

  test("property: codepoints round-trip any unicode string") {
    check(Prop.forAll(Arbitrary.arbitrary[String]) { s =>
      // Arbitrary[String] may emit lone surrogates — not valid scalar
      // value sequences; normalize through codePoints like real text
      val clean = new String(s.codePoints().toArray, 0,
        s.codePoints().toArray.length)
      val cps = TextCodecsUtil.codePoints(u(clean))
      TextCodecsUtil.fromCodePoints(cps).toString == clean
    })
  }

  test("property: base64 byte arrays round-trip any byte content") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0, 255))) { bytes =>
      val arr = new GenericArrayData(bytes.map(_.toLong: Any).toArray)
      val b64 = TextCodecsUtil.arrayToBase64(arr)
      val back = TextCodecsUtil.base64ToArray(b64)
      (0 until back.numElements()).map(back.getLong).toList ==
        bytes.map(_.toLong)
    })
  }

  test("property: canon JSON is idempotent and parseable") {
    val jsonGen: Gen[String] = {
      def value(depth: Int): Gen[String] =
        if (depth <= 0) Gen.oneOf(Gen.chooseNum(-99, 99).map(_.toString),
          Gen.alphaStr.map(s => "\"" + s.take(6) + "\""), Gen.const("null"))
        else Gen.oneOf(
          Gen.chooseNum(-99, 99).map(_.toString),
          Gen.alphaStr.map(s => "\"" + s.take(6) + "\""),
          Gen.listOfN(2, value(depth - 1)).map(_.mkString("[", ",", "]")),
          Gen.listOfN(2, Gen.zip(Gen.identifier.map(_.take(4)),
            value(depth - 1))).map(kvs =>
            kvs.map { case (k, v) => "\"" + k + "\":" + v }
              .mkString("{", ",", "}")))
      value(3)
    }
    check(Prop.forAll(jsonGen) { j =>
      val once = BagOpsUtil.canon(u(j))
      once != null && BagOpsUtil.canon(once).toString == once.toString
    })
  }

  test("property: buildschema merge is commutative and idempotent") {
    val shapeGen: Gen[String] = Gen.oneOf(
      "\"long\"", "\"real\"", "\"string\"", "\"bool\"", "\"null\"",
      """{"a":"long"}""", """{"a":"string","b":"long"}""",
      """{"`indexer`":"long"}""", """{"`indexer`":"string"}""")
    check(Prop.forAll(shapeGen, shapeGen) { (a, b) =>
      def merge(xs: Seq[String]): String =
        BuildSchemaUtil.merge(new GenericArrayData(
          xs.map(x => u(x): Any).toArray)).toString
      merge(Seq(a, b)) == merge(Seq(b, a)) &&
        merge(Seq(a, a)) == merge(Seq(a)) &&
        merge(Seq(merge(Seq(a, b)), b)) == merge(Seq(a, b))
    })
  }

  test("property: parse_xml never throws and round-trips simple elements") {
    check(Prop.forAll(Gen.identifier.map(_.take(6)),
      Gen.alphaNumStr.map(_.take(10))) { (tag, text) =>
      val t = if (tag.isEmpty) "t" else tag
      val out = ParseXmlUtil.parse(u(s"<$t>$text</$t>"))
      out != null && out.toString.contains(t)
    })
    check(Prop.forAll(Arbitrary.arbitrary[String]) { junk =>
      ParseXmlUtil.parse(u(junk)) // null or value — never a throw
      true
    })
  }

  test("property: treepath of canon JSON is sorted and distinct") {
    check(Prop.forAll(Gen.listOfN(3,
      Gen.zip(Gen.identifier.map(_.take(4)), Gen.chooseNum(0, 9)))) { kvs =>
      val j = kvs.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val arr = TreePathUtil.paths(u(j))
      val ps = (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString)
      ps == ps.sorted && ps.distinct == ps
    })
  }
}
