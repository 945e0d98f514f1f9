package graft.kql

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `externaldata` — ad-hoc file source with a declared schema. */
class ExternalDataSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val cat = new Catalog(spark)

  private def tmp(suffix: String, content: String): String = {
    val f = Files.createTempFile("graft_ext", suffix)
    Files.writeString(f, content)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("csv with header and declared schema") {
    val p = tmp(".csv", "id,name\n1,alpha\n2,beta\n3,gamma\n")
    val rows = Kql.run(spark, cat,
      s"""externaldata (id: long, name: string) ['$p']
         |  with(format='csv', ignorefirstrecord=true)
         | | sort by id asc""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
  }

  test("csv without header keeps the first record") {
    val p = tmp(".csv", "5,x\n6,y\n")
    val n = Kql.run(spark, cat,
      s"externaldata (id: long, v: string) ['$p'] with(format='csv') | count")
      .collect()(0).getLong(0)
    assert(n == 2L)
  }

  test("json lines with dynamic column re-typing to variant") {
    val p = tmp(".json",
      """{"id": 1, "props": "{\"k\": 7}"}
        |{"id": 2, "props": "{\"k\": 9}"}
        |""".stripMargin)
    val rows = Kql.run(spark, cat,
      s"""externaldata (id: long, props: dynamic) ['$p']
         |  with(format='json')
         | | extend k = toint(props.k)
         | | project id, k | sort by id asc""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 7L), (2L, 9L)))
  }

  test("txt: one string column per line") {
    val p = tmp(".txt", "first line\nsecond line\n")
    val rows = Kql.run(spark, cat,
      s"externaldata (line: string) ['$p'] with(format='txt') | sort by line asc")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("first line", "second line"))
  }

  test("multiple uris union, format inferred from extension") {
    val p1 = tmp(".csv", "1\n2\n")
    val p2 = tmp(".csv", "3\n")
    val n = Kql.run(spark, cat,
      s"externaldata (id: long) ['$p1', '$p2'] | count")
      .collect()(0).getLong(0)
    assert(n == 3L)
  }

  test("unknown format is a parse-time error") {
    val p = tmp(".bin", "x")
    val e = intercept[KqlParseException](Kql.run(spark, cat,
      s"externaldata (a: string) ['$p'] with(format='avro') | count"))
    assert(e.getMessage.contains("not supported"))
  }
}
