package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity — no Spark session needed. */
class RegistrySpec extends AnyFunSuite {

  test("no two registrations share a name (a duplicate silently " +
      "shadows a green query in the driver's Map — the r14 " +
      "q_dsir_weights incident)") {
    // the guard lives in SparkEntry.registry; touching `queries`
    // forces it, so a duplicate fails HERE, loudly, instead of
    // shrinking the correctness gate by one query
    assert(SparkEntry.queries.nonEmpty)
  }

  test("every oracle belongs to a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("registry is large and mostly oracled (the coverage floor " +
      "cannot silently regress)") {
    val n = SparkEntry.queries.size
    val oracled = SparkEntry.oracleSql.size
    assert(n >= 375, s"registry shrank to $n")
    assert(oracled >= 364, s"oracled count shrank to $oracled")
  }
}
