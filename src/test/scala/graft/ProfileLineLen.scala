package graft

/** Measurement twin of BenchLineSpec's fixed-part headroom test: prints
  * the production-shaped fixed-part (render(Nil)) length, the line
  * itself, and the live-line length, so the headroom bound is re-derived
  * from a number instead of guessed (VERDICT r19 #3 — measured 743/1795
  * on the r20 tree). Inputs come from [[BenchLineFixture]], the SAME
  * object the spec renders (review r20) — edit the fixture there and
  * both the measurement and the enforced bound move together.
  * `sbt "Test/runMain graft.ProfileLineLen"`. */
object ProfileLineLen {
  def main(args: Array[String]): Unit = {
    val fixed = BenchLineFixture.render(0)
    println(s"FIXED=${fixed.length}")
    println(fixed)
    val live = BenchLineFixture.render(1800)
    println(s"LIVE=${live.length}")
  }
}
