package graft.models

/** Diagnostic main: per-point parity of the netlib-port STL against the
  * reference notebook's stored statsmodels decomposition of NYC-Taxi
  * (robust=True, period=48). Calibrates the (inner, outer) budget.
  *
  *   sbt "Test/runMain graft.models.StlCalibProbe"
  */
object StlCalibProbe {
  def main(args: Array[String]): Unit = {
    val path = "/root/reference/notebooks/results/stl/" +
      "realKnownCause__nyc_taxi.csv/stl_results.csv"
    val src = scala.io.Source.fromFile(path)
    val rows = try src.getLines().drop(1).map(_.split(",")).toArray
               finally src.close()
    val ys = rows.map(_(1).toDouble)
    val refTrend = rows.map(_(3).toDouble)
    val refSeason = rows.map(_(4).toDouble)
    println(s"n=${ys.length}")
    for ((ni, no) <- Seq((1, 15), (2, 15), (2, 10), (5, 0), (2, 0), (1, 10))) {
      val t0 = System.nanoTime()
      val (tr, se) = StlExact.stl(ys, 48, innerIters = ni, outerIters = no)
      val dT = ys.indices.map(i => math.abs(tr(i) - refTrend(i))).max
      val dS = ys.indices.map(i => math.abs(se(i) - refSeason(i))).max
      println(f"ni=$ni no=$no: maxdT=$dT%.3e maxdS=$dS%.3e (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
  }
}
