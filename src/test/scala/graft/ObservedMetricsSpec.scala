package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the deterministic observe-harvest drain (VERDICT r16 #2 /
  * ADVICE r16): the work-unit denominators the sweep adjudication
  * trusts must be readable with NO fixed sleep in the read path, and a
  * warmup-scale value must be structurally unable to survive into the
  * measured harvest. */
class ObservedMetricsSpec extends AnyFunSuite with SparkTestSession {

  test("a quadratic-family query's observed counter is present after drain — no sleep in the read path") {
    val om = new ObservedMetrics(spark)
    // x03 self-reports its banded dup-pair count in-job via observe
    SparkEntry.queries("x03_dedup_simhash")(spark, sf)
      .write.format("noop").mode("overwrite").save()
    assert(om.drain("omspec_drain_1"),
      "the sentinel barrier must arrive (FIFO delivery)")
    val j = om.json
    assert(j.contains("\"x03_dup_pairs\""),
      s"the in-job counter must be harvested deterministically, got $j")
    assert("\"rows\":\\d+".r.findFirstIn(j).isDefined, j)
    // the sentinel itself never leaks into the harvest
    assert(!j.contains("omspec_drain_1"))
  }

  test("the warmup phase boundary drops earlier-phase values; the next phase re-harvests") {
    val om = new ObservedMetrics(spark)
    SparkEntry.queries("x03_dedup_simhash")(spark, sf)
      .write.format("noop").mode("overwrite").save()
    assert(om.drain("omspec_drain_2a"))
    om.clear()
    assert(om.json === "{}",
      "after the phase boundary no warmup-scale value may remain")
    SparkEntry.queries("x03_dedup_simhash")(spark, sf)
      .write.format("noop").mode("overwrite").save()
    assert(om.drain("omspec_drain_2b"))
    assert(om.json.contains("\"x03_dup_pairs\""))
  }

  test("Json renders metric values parse-safely (strings quoted, non-finite null, escapes)") {
    assert(Json.value(null) === "null")
    assert(Json.value(Double.NaN) === "null")
    assert(Json.value(Double.PositiveInfinity) === "null")
    assert(Json.value(java.lang.Long.valueOf(42L)) === "42")
    assert(Json.value(java.lang.Double.valueOf(1.5)) === "1.5")
    assert(Json.value(java.lang.Boolean.TRUE) === "true")
    assert(Json.value("a\"b\\c\nd") === "\"a\\\"b\\\\c\\nd\"")
    assert(Json.str("""dir/with"quote""") === "\"dir/with\\\"quote\"")
    // a struct-ish / unexpected value degrades to a quoted string,
    // never to invalid JSON
    assert(Json.value(Seq(1, 2)).startsWith("\""))
  }
}
