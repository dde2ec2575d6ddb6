package graft.porter

/** Export progress / ETA reporting, mirroring the reference's cadence
  * (`/root/reference/src/Porter.php:210-225`): percent done plus a
  * linear-extrapolation time-remaining estimate, printed at most once per
  * ≥10 seconds AND ≥1% step. The reference reports per row; the engine
  * reports per written table (row-level reporting would serialize the
  * distributed write).
  */
final class Progress(total: Long, clock: () => Long = System.currentTimeMillis) {
  private val startTime = clock()
  private var lastPercent = 0L
  private var lastTime = startTime

  /** Record `done` units complete; prints if the cadence gates allow.
    * Returns the rendered line when printed (for tests). */
  def report(done: Long): Option[String] = {
    val now = clock()
    val fraction = done.toDouble / math.max(total, 1L)
    val percent = math.round(fraction * 100)
    if (percent > lastPercent && now - lastTime >= 10000) {
      val elapsed = (now - startTime) / 1000.0
      val estimate = if (fraction > 0) elapsed / fraction else 0.0
      val left = math.max(estimate - elapsed, 0.0)
      lastPercent = percent
      lastTime = now
      val line = f"  $percent%d%% ($done/$total, ${left}%.0fs left)"
      System.err.println(s"[porter]$line")
      Some(line)
    } else None
  }

  def doneLine(done: Long): String = {
    val elapsed = (clock() - startTime) / 1000.0
    f"  Done. ($done rows in ${elapsed}%.1fs)"
  }
}
