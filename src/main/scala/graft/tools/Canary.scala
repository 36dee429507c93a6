package graft.tools

/** Prints the host-speed canary reading ([[graft.Bench.canarySec]]) —
  * used to check whether the sandbox host is in a throttle wave before
  * starting a measurement session (BASELINE.md methodology), and to
  * calibrate [[graft.Bench.CanaryRefSec]].
  */
object Canary {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    (1 to reps).foreach { i =>
      println(f"[canary] rep $i: ${graft.Bench.canarySec()}%.3f s " +
        f"(ref ${graft.Bench.CanaryRefSec}%.3f)")
    }
  }
}
