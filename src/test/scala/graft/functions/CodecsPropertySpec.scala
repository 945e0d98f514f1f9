package graft.functions

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Pure-kernel properties for the codec and bag utilities — no Spark
  * session, every sample is a direct JVM call.
  */
class CodecsPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  private def u(s: String) = UTF8String.fromString(s)

  test("property: gzip and zlib round-trip any unicode string") {
    check(Prop.forAll(Arbitrary.arbitrary[String]) { s =>
      CodecsUtil.gzipDecompress(CodecsUtil.gzipCompress(u(s))).toString == s &&
      CodecsUtil.zlibDecompress(CodecsUtil.zlibCompress(u(s))).toString == s
    })
  }

  test("property: decompress never throws on arbitrary input") {
    check(Prop.forAll(Arbitrary.arbitrary[String]) { s =>
      CodecsUtil.gzipDecompress(u(s)) // null or a value — never a throw
      CodecsUtil.zlibDecompress(u(s))
      true
    })
  }

  test("property: bag_remove_keys output only ever loses keys") {
    val bagGen = for {
      n <- Gen.chooseNum(0, 6)
      keys <- Gen.listOfN(n, Gen.alphaStr.map(_.take(5)))
      vals <- Gen.listOfN(n, Gen.chooseNum(-1000, 1000))
    } yield keys.zip(vals).toMap
    val gen = for {
      bag <- bagGen
      drop <- Gen.someOf(bag.keys.toSeq)
      extra <- Gen.listOf(Gen.alphaStr.map(_.take(5)))
    } yield (bag, drop.toSeq ++ extra)
    check(Prop.forAll(gen) { case (bag, drop) =>
      val json = bag.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val keysArr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(drop.map(u).toArray[Any])
      val out = BagKeysUtil.remove(u(json), keysArr)
      val expected = (bag -- drop).toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      out != null && out.toString == expected
    })
  }
}
