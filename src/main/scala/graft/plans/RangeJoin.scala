package graft.plans

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Interval (range) join as a first-class operator (SURVEY §2.6 (c)):
  * inner-join every left "point" row to every right interval row with
  * `lo <= point < hi` — the join OSS Spark can only plan as a nested
  * loop (see join_range_price_bands, where a bounded band table makes
  * that acceptable, and join_range_binned_intervals, the composable
  * bin-explode workaround that needs a width-matched bin parameter).
  *
  * This operator is the whole-operator form a native engine uses
  * (reference: DuckDB/engine range-join optimizations — DuckDB's IEJoin
  * plays the same role for its BETWEEN joins):
  *
  *   1. sample the point column (bounded, seeded — the same sketch an
  *      Exchange rangepartitioning performs) → P range boundaries;
  *   2. shuffle points to their range bucket; REPLICATE each interval to
  *      every bucket its [lo, hi) span overlaps — fan-out is
  *      width/bucket-width, the precise cost the binned variant pays in
  *      its explode, but derived from the data instead of hand-tuned;
  *   3. per partition, sort points by p and intervals by lo; one sweep
  *      with a min-heap on hi maintains the active interval set — each
  *      (point, interval) pair is touched exactly once, O((n+m)log m)
  *      per partition, no quadratic probe.
  *
  * Partition sort state is the points/intervals of ONE range bucket —
  * the same working set an external-sort SMJ partition holds; partition
  * count follows spark.sql.shuffle.partitions, so sizing follows the
  * deployment's shuffle sizing. Point/lo/hi must evaluate to LONG-backed
  * types (BIGINT or TIMESTAMP — internal micros), which covers the time
  * and id domains interval joins run on.
  */
case class RangeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    point: Expression, lo: Expression, hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

private class BucketPartitioner(n: Int) extends Partitioner {
  override def numPartitions: Int = n
  override def getPartition(key: Any): Int = key.asInstanceOf[Int]
}

case class RangeJoinExec(
    point: Expression, lo: Expression, hi: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  protected override def doExecute(): RDD[InternalRow] = {
    import RangeJoinExec.{longEval, nullableLongEval}
    val lOut = left.output
    val rOut = right.output
    val out = output
    val (p, l, h) = (point, lo, hi)
    for (e <- Seq(p, l, h))
      require(e.dataType == LongType || e.dataType == TimestampType,
        s"range join bound must be long-backed, got ${e.dataType.sql}")
    val parts = math.max(1, conf.numShufflePartitions)

    val lRdd = left.execute().mapPartitions { it =>
      val ev = nullableLongEval(p, lOut)
      val toUnsafe = UnsafeProjection.create(lOut, lOut)
      // NULL point matches no interval (SQL inner-join semantics) —
      // without the filter the unsafe getLong would read 0 and the row
      // would spuriously join any interval containing 0.
      it.flatMap { r =>
        val v = ev(r)
        if (v == null) Iterator.empty
        else Iterator.single((v.longValue(), toUnsafe(r).copy()))
      }
    }
    // the boundary sketch and the shuffle both consume lRdd; persist it
    // so the left child plan runs once, not twice (spill-safe level —
    // the ContextCleaner unpersists it once the join RDD is unreferenced)
    lRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded seeded sketch of the point distribution — what an Exchange
    // rangepartitioning samples; ~20 samples per target partition
    val sample = lRdd.map(_._1)
      .takeSample(withReplacement = false, num = parts * 20, seed = 42L)
      .sorted
    val bounds: Array[Long] =
      if (sample.isEmpty) Array.empty
      else (1 until parts).map { i =>
        sample(math.min(sample.length - 1, i * sample.length / parts))
      }.distinct.toArray
    val nPart = bounds.length + 1
    def bucket(v: Long): Int = {
      var b = java.util.Arrays.binarySearch(bounds, v)
      if (b < 0) b = -b - 1 else b = b + 1 // upper bound: v == bound → right
      b
    }

    val partitioner = new BucketPartitioner(nPart)
    val lKeyed = lRdd.map { case (v, r) => (bucket(v), r) }
      .partitionBy(partitioner)
    val rKeyed = right.execute().mapPartitions { it =>
      val loEv = nullableLongEval(l, rOut)
      val hiEv = nullableLongEval(h, rOut)
      val toUnsafe = UnsafeProjection.create(rOut, rOut)
      it.flatMap { r =>
        val (lvB, hvB) = (loEv(r), hiEv(r))
        // NULL bound → interval matches nothing (not a [lo,0)/[0,hi) span)
        if (lvB == null || hvB == null) Iterator.empty
        else {
          val (lv, hv) = (lvB.longValue(), hvB.longValue())
          if (hv <= lv) Iterator.empty
          else {
            val row = toUnsafe(r).copy()
            // hi is exclusive but bucket(hi) may still hold points < hi
            (bucket(lv) to bucket(hv)).iterator.map(b => (b, row))
          }
        }
      }
    }.partitionBy(partitioner)

    lKeyed.zipPartitions(rKeyed) { (lIt, rIt) =>
      val pts = lIt.map(_._2).toArray
      val ivs = rIt.map(_._2).toArray
      if (pts.isEmpty || ivs.isEmpty) Iterator.empty
      else {
        val pEv = longEval(p, lOut)
        val loEv = longEval(l, rOut)
        val hiEv = longEval(h, rOut)
        java.util.Arrays.sort(pts, Ordering.by[UnsafeRow, Long](pEv(_)))
        java.util.Arrays.sort(ivs, Ordering.by[UnsafeRow, Long](loEv(_)))
        val joiner = UnsafeProjection.create(out, lOut ++ rOut)
        val joined = new JoinedRow
        // active set: intervals with lo <= current point, ordered by hi
        // for O(log m) eviction of the expired ones
        val active = new java.util.PriorityQueue[UnsafeRow](
          11, Ordering.by[UnsafeRow, Long](hiEv(_)))
        var next = 0
        pts.iterator.flatMap { pt =>
          val pv = pEv(pt)
          while (next < ivs.length && loEv(ivs(next)) <= pv) {
            active.add(ivs(next)); next += 1
          }
          while (!active.isEmpty && hiEv(active.peek()) <= pv) active.poll()
          // every remaining active interval has lo <= pv < hi
          val matches = active.iterator()
          new Iterator[InternalRow] {
            override def hasNext: Boolean = matches.hasNext
            override def next(): InternalRow =
              joiner(joined(pt, matches.next()))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeJoinExec {
  /** Static evaluator factory — kept off the exec node so task closures
    * never capture the SparkPlan itself. */
  private def longEval(e: Expression,
      attrs: Seq[Attribute]): InternalRow => Long = {
    val proj = UnsafeProjection.create(Seq(e), attrs)
    row => proj(row).getLong(0)
  }

  /** Null-aware variant for the keying map side: returns null instead of
    * silently reading 0 from the unsafe row's zeroed slot. Rows with a
    * null key are dropped BEFORE bucketing, so the sweep phase (which
    * uses the primitive evaluator) only ever sees non-null keys. */
  private def nullableLongEval(e: Expression,
      attrs: Seq[Attribute]): InternalRow => java.lang.Long = {
    val proj = UnsafeProjection.create(Seq(e), attrs)
    row => {
      val r = proj(row)
      if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
    }
  }
}

object RangeJoin {

  /** Inner range join: every `left` row paired with each `right` row whose
    * [lo, hi) interval contains the left `point` (half-open). Column names
    * of the two sides must be disjoint; bounds must be BIGINT/TIMESTAMP. */
  def pointInInterval(left: DataFrame, right: DataFrame,
      point: String, lo: String, hi: String): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "range join sides must have disjoint column names")
    val r2 = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(",")}"))
    Shim.ofRows(left.sparkSession, RangeJoinPlan(lPlan, rPlan,
      attr(lPlan, point), attr(rPlan, lo), attr(rPlan, hi)))
  }
}
