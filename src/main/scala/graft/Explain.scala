package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted physical plan of the named
  * queries (all of them by default) against a scale-factor directory.
  * Used to audit pushdown (PushedFilters / ReadSchema), join strategies
  * (broadcast vs sort-merge), and WholeStageCodegen coverage. With
  * SPARK_GRAFT_TIME=n set, also executes each named query n times and
  * prints per-run wall times (profiling bench outliers: run 1 isolates
  * codegen/JIT first-use cost from steady-state).
  *
  * Usage: graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val timeRuns = sys.env.get("SPARK_GRAFT_TIME").map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
        (1 to timeRuns).foreach { i =>
          val (sec, err) = Bench.timeOne(spark, sfDir, fn)
          println(f"[time] $name run $i: $sec%.3f s${err.fold("")(" ERROR " + _)}")
        }
      }
    }
    spark.stop()
  }
}
