package graft.tools

/** Calibration main for [[graft.Bench.CanaryRefSec]]: runs the load-canary
  * spin N times (default 8) on an otherwise-idle machine and prints each
  * sample plus the min — the min is the value to commit as the clean-machine
  * reference. Re-run after any hardware / container change. args: [n]
  */
object CanaryCalibrate {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val samples = (1 to n).map { i =>
      val s = graft.Bench.canarySeconds()
      println(f"canary[$i]: $s%.3f s  (loadavg ${graft.Bench.loadavg()})")
      s
    }
    println(f"min: ${samples.min}%.3f s  <- commit as Bench.CanaryRefSec")
    println(f"committed ref: ${graft.Bench.CanaryRefSec}%.3f s; this machine now reads load_factor ${samples.min / graft.Bench.CanaryRefSec}%.2f")
  }
}
