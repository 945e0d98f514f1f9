package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ipv4_lookup (longest-prefix CIDR join) + series_fit_2lines_dynamic. */
class Ipv4Fit2Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("ips", Seq(
      (1L, "10.1.2.3"), (2L, "10.1.9.9"), (3L, "192.168.1.5"),
      (4L, "8.8.8.8"), (5L, "not an ip")).toDF("rid", "ip"))
    c.register("nets", Seq(
      ("10.0.0.0/8", "corp"), ("10.1.2.0/24", "lab"),
      ("192.168.0.0/16", "home"), ("8.8.8.8", "dns")).toDF("net", "tag"))
    c
  }
  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("ipv4_lookup: longest prefix wins, inner drops unmatched") {
    val r = run(
      """ips | evaluate ipv4_lookup(nets, ip, net)
        | | project rid, tag | sort by rid asc""".stripMargin).collect()
    // rid1 matches /8 and /24 → lab; rid2 → corp; rid3 → home;
    // rid4 → dns (/32); rid5 unparseable → dropped
    assert(r.map(x => (x.getLong(0), x.getString(1))).toSeq ==
      Seq((1L, "lab"), (2L, "corp"), (3L, "home"), (4L, "dns")))
  }

  test("ipv4_lookup: return_unmatched keeps non-matching rows") {
    val r = run(
      """ips | evaluate ipv4_lookup(nets, ip, net, return_unmatched)
        | | project rid, tag | sort by rid asc""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.filter(_.getLong(0) == 5L).forall(_.isNullAt(1)))
  }

  test("ipv4_lookup: colliding columns error") {
    val c2 = new Catalog(spark)
    c2.register("t", Seq((1L, "1.2.3.4")).toDF("rid", "ip"))
    c2.register("bad", Seq(("0.0.0.0/0", 9L)).toDF("net", "rid"))
    val e = intercept[KqlParseException] {
      Kql.run(spark, c2, "t | evaluate ipv4_lookup(bad, ip, net) | count")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("series_fit_2lines_dynamic finds the changepoint exactly") {
    // y = [0,1,2,3, 10,8,6,4]: perfect two lines with split at 4
    val r = run(
      """print f = series_fit_2lines_dynamic(
        |    pack_array(0, 1, 2, 3, 10, 8, 6, 4))
        | | project k = tolong(f.split_idx), rs = toreal(f.rsquare),
        |     ls = toreal(f.left.slope), rsl = toreal(f.right.slope),
        |     rv = toreal(f.rvariance)""".stripMargin).collect().head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(3) + 2.0) < 1e-12)
    assert(r.getDouble(4) < 1e-12)
  }

  test("series_fit_2lines_dynamic null contract") {
    val r = run(
      """print f = series_fit_2lines_dynamic(todynamic('[1, null, 3, 4, 5]'))
        | | project ok = isnull(f)""".stripMargin).collect().head
    assert(r.getBoolean(0))
  }
}
