package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Truth table ported verbatim from the reference
  * (core/src/executor/iceberg_writer/rolling_iceberg_writer.rs:134-180). */
class RollingPolicySpec extends AnyFunSuite {
  private val target = 1000L
  private def roll(cur: Long, in: Long) =
    RollingPolicy.needBuildNewFile(cur, in, target)

  test("exceeds 1.5x target -> roll") {
    assert(roll(800, 800))
    assert(roll(1000, 600))
  }
  test("exceeds target and current past 70% -> roll") {
    assert(roll(800, 300))
    assert(roll(701, 400))
  }
  test("under target -> no roll") {
    assert(!roll(800, 100))
  }
  test("exceeds target but current under 70% -> no roll") {
    assert(!roll(600, 500))
    assert(!roll(700, 400)) // 700 is NOT > 700 (strict)
  }
  test("current under 10% of target -> never roll") {
    assert(!roll(0, 2000))
    assert(!roll(0, 1500))
    assert(!roll(1, 1501))
  }
}
