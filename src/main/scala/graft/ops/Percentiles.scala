package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Exact interpolated percentiles (DuckDB `quantile_cont` semantics) per
  * group, computed WITHOUT funneling each group's values into a single
  * reducer.
  *
  * Spark's built-in exact `percentile` aggregate buffers every value of a
  * group in one final-merge task, so a 5-group query over a 100 TB table
  * concentrates the whole column into 5 tasks — the partial aggregation
  * shrinks nothing when values are mostly distinct. This operator keeps the
  * data distributed end-to-end:
  *
  *   1. one cheap aggregation computes per-group value counts, fixing the
  *      two target ranks (floor/ceil of q·(n−1)) per group and quantile;
  *   2. a range repartition + within-partition sort on (group, value)
  *      yields a total order, PARALLEL across partitions (Spark's standard
  *      distributed sort — no single-task group windows);
  *   3. per-partition per-group counts (a partitions×groups-sized side
  *      collect) give each partition its groups' starting ranks;
  *   4. a second pass over the sorted (persisted) data emits ONLY the rows
  *      sitting at target ranks — at most 2·|quantiles| rows per group —
  *      and the driver interpolates.
  *
  * Driver-side state is bounded by groups × (partitions + quantiles), NOT
  * by data size — the same bounded-metadata pattern as the porter's
  * `_num` assignment. Intended for low-cardinality groupers (the q47 shape:
  * 5 priorities); for high-cardinality groups use `approx_percentile`,
  * whose t-digest sketches merge map-side.
  */
object Percentiles {

  /** One output row per group: the group column followed by one DOUBLE
    * column per `(name, q)` target holding the exact interpolated
    * q-quantile of `valCol` (nulls in `valCol` ignored, like DuckDB). */
  def exactPercentiles(
      spark: SparkSession,
      df: DataFrame,
      grpCol: String,
      valCol: String,
      targets: Seq[(String, Double)]): DataFrame = {
    val d = df.select(col(grpCol), col(valCol).cast(DoubleType).as(valCol))
      .filter(col(valCol).isNotNull)

    // (1) per-group counts → target ranks. Driver state is bounded by
    //     groups × partitions (the step-3 collect), so the group-count
    //     guard is deliberately tight: 10k groups × 1k partitions is
    //     already 10M driver-side tuples. Past this, use
    //     approx_percentile — its sketches merge map-side.
    val counts: Map[Any, Long] = d.groupBy(col(grpCol)).count()
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    require(counts.size <= 10000,
      s"exactPercentiles is for low-cardinality groups, got ${counts.size}")
    val wantedRanks: Map[Any, Set[Long]] = counts.map { case (g, n) =>
      g -> targets.flatMap { case (_, q) =>
        val pos = q * (n - 1)
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.toSet
    }

    // (2) distributed total order on (group, value)
    val sorted = d
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col(grpCol), col(valCol))
      .sortWithinPartitions(col(grpCol), col(valCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // (3) per-partition per-group counts → starting rank of each
      //     (partition, group) run. Collect is partitions × groups.
      val runCounts: Array[((Int, Any), Long)] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          val m = mutable.LinkedHashMap.empty[Any, Long]
          it.foreach { row =>
            val g = row.get(0)
            m(g) = m.getOrElse(g, 0L) + 1L
          }
          m.iterator.map { case (g, n) => ((pid, g), n) }
        }.collect()
      val startRank: Map[(Int, Any), Long] = {
        val byGroup = runCounts.groupBy(_._1._2)
        byGroup.iterator.flatMap { case (g, runs) =>
          var acc = 0L
          runs.sortBy(_._1._1).map { case ((pid, _), n) =>
            val o = acc; acc += n; (pid, g) -> o
          }
        }.toMap
      }
      val bcStart = spark.sparkContext.broadcast(startRank)
      val bcWanted = spark.sparkContext.broadcast(wantedRanks)

      // (4) emit only rows at target ranks; ≤ 2·|targets| rows per group
      val hits: Map[(Any, Long), Double] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          var cur: Any = null
          var started = false
          var rank = 0L
          it.flatMap { row =>
            val g = row.get(0)
            if (!started || g != cur) {
              rank = bcStart.value((pid, g)); cur = g; started = true
            }
            val r = rank
            rank += 1
            if (bcWanted.value.getOrElse(g, Set.empty).contains(r))
              Iterator.single(((g, r), row.getDouble(1)))
            else Iterator.empty
          }
        }.collect().toMap

      // driver-side interpolation over the handful of extracted values:
      // DuckDB's quantile_cont formula lower + frac·(upper − lower)
      val outRows = counts.keys.toSeq.map { g =>
        val n = counts(g)
        val vals = targets.map { case (_, q) =>
          val pos = q * (n - 1)
          val lo = math.floor(pos).toLong
          val hi = math.ceil(pos).toLong
          val lower = hits((g, lo))
          if (lo == hi) lower
          else lower + (pos - lo) * (hits((g, hi)) - lower)
        }
        Row.fromSeq(g +: vals)
      }
      val schema = targets.foldLeft(
        new StructType().add(df.schema(grpCol))) { case (st, (name, _)) =>
        st.add(name, DoubleType, nullable = false)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(outRows, 1), schema)
    } finally sorted.unpersist()
  }
}
