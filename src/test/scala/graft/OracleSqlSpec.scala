package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the oracle-SQL strings themselves. A single bad escape inside an
  * interpolated oracle string once broke `sbt compile` for two rounds; that
  * class of error is now a compile error again, but this spec catches the
  * adjacent failure modes that still compile: an empty string, a leftover
  * raw control character from a botched interpolation, or a queries/oracle
  * key drift that would silently weaken the correctness gate.
  */
class OracleSqlSpec extends AnyFunSuite {

  test("every oracle SQL string is non-empty and printable") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle SQL")
      val bad = sql.filter(c => c.isControl && c != '\n')
      assert(bad.isEmpty,
        s"$name: oracle SQL contains raw control chars ${bad.map(_.toInt).mkString(",")}")
    }
  }

  test("every oracle key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("every query has an oracle — the gate has no rows-only entries left") {
    // Historical exceptions, both since closed: q33 (recursive chunker)
    // gained a round-trip-invariant oracle in round 10, and q47
    // (trained IVF) became cross-engine bit-exact via integer micro-unit
    // Lloyd means in round 9. A new query landing without an oracle
    // silently downgrades the driver's check to rows-only — fail here
    // instead.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without an oracle (driver downgrades to rows-only): $rowsOnly")
  }
}
