package graft

/** Driver-contract smoke: `SparkEntry.entry` is the first thing the driver
  * calls (flagship query on sf0.001, rows > 0 expected) — pin it so a
  * registry or session-config regression fails here before the driver run.
  */
class EntrySpec extends SparkSpec {

  test("entry returns a non-empty flagship result on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has distinct, well-formed names and every oracle refers to a query") {
    val names = SparkEntry.queries.keySet
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), names.mkString(", "))
    val orphans = SparkEntry.oracleSql.keySet -- names
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
