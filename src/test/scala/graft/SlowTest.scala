package graft

import org.scalatest.Tag

/** Tag for the slow simulation specs (multi-restart streaming replays,
  * large closed-form sweeps): excluded from a plain `sbt test` by
  * build.sbt so the inner loop stays fast; the round-close gate runs
  * them with `GRAFT_FULL_SUITE=1 sbt test`.
  */
object SlowTest extends Tag("graft.SlowTest")
