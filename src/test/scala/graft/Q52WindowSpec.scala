package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Relational

/** Pins the q52 bench-only demotion (r9/r10 verdict item 4): the
  * approx-quantile hash gate is exact only while every (returnflag,
  * linestatus) group is at or under [[Relational.ApproxQuantileAccuracy]]
  * — Verify withholds q52's oracle entry (driver then records the
  * rows-only check) the moment the measured max group crosses the knob,
  * and the boundary itself is pinned so a knob change can't silently
  * move the window. */
class Q52WindowSpec extends AnyFunSuite {

  test("window boundary sits exactly at ApproxQuantileAccuracy") {
    assert(Relational.q52WindowOpen(Relational.ApproxQuantileAccuracy))
    assert(!Relational.q52WindowOpen(Relational.ApproxQuantileAccuracy + 1L))
    assert(Relational.q52WindowOpen(1L))
  }

  test("window is open at the test SFs (largest sf0.1 group ~306k)") {
    assert(Relational.q52WindowOpen(TestSpark.spark, "/root/testdata/sf0.001"))
  }
}
