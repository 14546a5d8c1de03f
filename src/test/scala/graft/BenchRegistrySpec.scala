package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-consistency nets for the bench harness: the exclude set
  * must reference live registry names (a rename would silently
  * un-exclude a documented-quadratic oracle twin and melt the 10x
  * sweep), every excluded name must have a registered scale-path twin
  * still measured, and the compact-stdout prefix scheme the driver
  * parses must stay collision-aware (two queries sharing a prefix is
  * legal only because the full name is emitted for both).
  */
class BenchRegistrySpec extends AnyFunSuite {

  test("bench exclude set carries no stale names") {
    val dead = Bench.exclude -- SparkEntry.queries.keySet
    assert(dead.isEmpty, s"excluded names not in the registry: $dead")
  }

  test("every registered query is measured or documented-excluded") {
    // the three excluded names are the test-SF-only oracle twins; the
    // bench must measure everything else
    val measured = SparkEntry.queries.keySet -- Bench.exclude
    assert(measured.size == SparkEntry.queries.size - Bench.exclude.size)
    assert(measured.nonEmpty)
  }
}
