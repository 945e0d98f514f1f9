package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The round-5 array/set/bag scalar batch: array_sort_asc/desc (nulls
  * last both ways, the Kusto rule), array_reverse/concat/slice/index_of/
  * sum, set_union/intersect/difference (sorted = deterministic, same
  * choice as make_set), pack_array, bag_keys, bag_pack, pack_all.
  */
class ArrayBagFnSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (1L, "b,a,c,a", 7L),
      (2L, "z", 9L)
    ).toDF("id", "csv", "v"))
    c
  }

  private def one(kql: String): org.apache.spark.sql.Row =
    Kql.run(spark, cat, kql).collect().head

  private def seq(r: org.apache.spark.sql.Row, i: Int): Seq[Any] =
    r.getSeq[Any](i)

  test("array_sort_asc / desc put nulls last in BOTH directions") {
    val r = one(
      """t | where id == 1
        | | extend a = split('b,,a', ',')
        | | project up = array_sort_asc(a), down = array_sort_desc(a)""".stripMargin)
    // split keeps the empty segment as "", not null — build a null via
    // out-of-range element instead
    assert(seq(r, 0) == Seq("", "a", "b"))
    assert(seq(r, 1) == Seq("b", "a", ""))
    val rn = one(
      """t | where id == 1
        | | extend a = pack_array(split(csv, ',', 9), 'b', 'a')
        | | project up = array_sort_asc(a), down = array_sort_desc(a)""".stripMargin)
    assert(seq(rn, 0) == Seq("a", "b", null), "asc: nulls last")
    assert(seq(rn, 1) == Seq("b", "a", null), "desc: nulls last")
  }

  test("array_reverse, array_concat, array_length interplay") {
    val r = one(
      """t | where id == 1
        | | extend a = split(csv, ',')
        | | project r = array_reverse(a),
        |           c = array_concat(a, pack_array('z')),
        |           n = array_length(array_concat(a, a))""".stripMargin)
    assert(seq(r, 0) == Seq("a", "c", "a", "b"))
    assert(seq(r, 1) == Seq("b", "a", "c", "a", "z"))
    assert(r.getLong(2) == 8L)
  }

  test("array_slice: zero-based inclusive, negatives from end, clamping") {
    def slice(s: String, e: String): Seq[Any] =
      seq(one(s"t | where id == 1 | extend a = split(csv, ',')" +
        s" | project s = array_slice(a, $s, $e)"), 0)
    assert(slice("1", "2") == Seq("a", "c"))
    assert(slice("0", "0") == Seq("b"))
    assert(slice("-2", "-1") == Seq("c", "a"), "negative indexes from end")
    assert(slice("2", "100") == Seq("c", "a"), "end clamps to last")
    assert(slice("3", "1") == Seq(), "start past end is empty")
    assert(slice("-100", "0") == Seq("b"), "start clamps to 0")
  }

  test("array_index_of: 0-based, -1 absent") {
    val r = one(
      """t | where id == 1 | extend a = split(csv, ',')
        | | project i = array_index_of(a, 'c'), j = array_index_of(a, 'q')""".stripMargin)
    assert(r.getLong(0) == 2L && r.getLong(1) == -1L)
  }

  test("array_sum folds sequentially to a double") {
    val r = one(
      "t | where id == 1 | project s = array_sum(pack_array(1, 2, v, 0.5))")
    assert(r.getDouble(0) == 10.5)
  }

  test("set_union / set_intersect / set_difference are sorted and distinct") {
    val r = one(
      """t | where id == 1
        | | extend a = split(csv, ','), b = pack_array('a', 'q')
        | | project u = set_union(a, b), i = set_intersect(a, b),
        |           d = set_difference(a, b)""".stripMargin)
    assert(seq(r, 0) == Seq("a", "b", "c", "q"))
    assert(seq(r, 1) == Seq("a"))
    assert(seq(r, 2) == Seq("b", "c"))
  }

  test("bag_keys: sorted keys of a dynamic object; null on non-object") {
    val r = one(
      """t | where id == 1
        | | extend d = todynamic('{"z":1,"a":{"n":2}}')
        | | project k = bag_keys(d), nk = bag_keys(todynamic('[1,2]'))""".stripMargin)
    assert(seq(r, 0) == Seq("a", "z"))
    assert(r.isNullAt(1))
  }

  test("bag_pack builds a variant reachable by field paths and re-unpack") {
    val r = one(
      """t | where id == 2
        | | extend b = bag_pack('n', v, 's', csv)
        | | project x = tolong(b.n), y = tostring(b.s)""".stripMargin)
    assert(r.getLong(0) == 9L && r.getString(1) == "z")
    // bag_unpack works on the packed result
    val u = one(
      """t | where id == 2
        | | extend b = bag_pack('n', v, 's', csv)
        | | project b | evaluate bag_unpack(b)""".stripMargin)
    assert(u.schema.fieldNames.toSeq == Seq("n", "s"))
    assert(u.getLong(0) == 9L && u.getString(1) == "z")
  }

  test("pack_all captures every current column by name") {
    val r = one(
      """t | where id == 2 | project id, v
        | | extend all = pack_all()
        | | project k = bag_keys(all), n = tolong(all.v)""".stripMargin)
    assert(seq(r, 0) == Seq("id", "v"))
    assert(r.getLong(1) == 9L)
  }
}
