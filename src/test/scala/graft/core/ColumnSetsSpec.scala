package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ColumnSetsSpec extends AnyFunSuite {
  private val files = Seq(
    Seq("ts", "a", "b"),
    Seq("ts", "a", "c"),
    Seq("ts", "a"))

  test("union / intersection / appearsInExactlyOne (reference utils.py)") {
    assert(ColumnSets.union(files) == Set("ts", "a", "b", "c"))
    assert(ColumnSets.intersection(files) == Set("ts", "a"))
    assert(ColumnSets.appearsInExactlyOne(files) == Set("b", "c"))
    assert(ColumnSets.intersection(Nil) == Set.empty)
  }

  test("missingByFile diagnoses drift against the union") {
    val m = ColumnSets.missingByFile(Map("f1" -> files(0), "f3" -> files(2)))
    assert(m("f1") == Set.empty) // f1 has the full union {ts, a, b}
    assert(m("f3") == Set("b"))
  }
}
