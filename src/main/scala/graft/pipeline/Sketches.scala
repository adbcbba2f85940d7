package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import java.util.Arrays

/** Distributed sketch aggregators for the data-pipeline surface. */
object Sketches {

  /** Final state of a KMV sketch: how many distinct hashes it holds
    * (< k means the input had fewer than k distinct values — the count is
    * exact) and the k-th smallest hash (the estimator's pivot). */
  final case class KmvResult(sketch_size: Long, kth: Long)

  /** KMV (k-minimum-values) distinct-count sketch as a typed
    * [[Aggregator]] — the 100 TB shape: every task folds its partition
    * into a BOUNDED sorted array of the k smallest DISTINCT hashes, and
    * only those k values per partition cross the wire in the merge
    * (associative, order-independent). Nothing ever shuffles the full
    * distinct hash set, unlike a `.distinct().orderBy().limit(k)`
    * formulation whose first exchange is as wide as the distinct count.
    *
    * The buffer is a sorted primitive `Array[Long]` (its length IS the
    * current sketch size): kryo round-trips primitive arrays exactly, and
    * once the buffer saturates, the common case (`h >= max`) is a single
    * comparison — inserts happen at most k times per partition plus once
    * per new global minimum.
    *
    * Estimate (computed by the caller from [[KmvResult]]):
    * `(k-1) * 2^60 / kth` — deterministic, engine-replayable (the reason
    * this exists next to approx_count_distinct's HLL++, which cannot be
    * reproduced by another engine).
    */
  final class KmvDistinctSketch(k: Int)
      extends Aggregator[Long, Array[Long], KmvResult] {
    require(k > 0, "k must be positive")

    override def zero: Array[Long] = Array.emptyLongArray

    /** Insert `h` into the sorted bounded buffer, skipping duplicates. */
    private def add(b: Array[Long], h: Long): Array[Long] = {
      if (b.length == k && h >= b(k - 1)) return b // saturated, too large
      val pos = Arrays.binarySearch(b, h)
      if (pos >= 0) return b // already present
      val ip = -(pos + 1)
      val n = math.min(b.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(b, 0, out, 0, ip)
      out(ip) = h
      System.arraycopy(b, ip, out, ip + 1, n - ip - 1)
      out
    }

    override def reduce(b: Array[Long], h: Long): Array[Long] = add(b, h)

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(add)

    override def finish(b: Array[Long]): KmvResult =
      KmvResult(b.length.toLong, if (b.isEmpty) 0L else b(b.length - 1))

    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
  }

  /** EXACT heavy hitters via SpaceSaving candidates + recount — the
    * vocabulary/domain-frequency shape a 100 TB pipeline needs without
    * ever shuffling the full value cardinality:
    *
    *  1. each partition keeps a SpaceSaving summary of `capacityFactor
    *     * denom` counters — by the summary's guarantee, any value with
    *     local count > n_p/cap is tracked, and by averaging, a value
    *     with GLOBAL count >= N/denom must exceed n_p/(factor*denom)
    *     locally in at least one partition, so the union of summaries
    *     is a PROVEN SUPERSET of the true heavy hitters (eviction
    *     tie-breaking may add noise candidates, never lose a true one);
    *  2. the bounded candidate set (<= cap * partitions values)
    *     broadcast-semi-joins the input and ONE aggregation recounts
    *     exactly — shuffle width is the candidate count, not the
    *     vocabulary.
    *
    * Output: values whose exact count * denom >= N, with their exact
    * counts — deterministic and engine-replayable (the candidate
    * phase's nondeterministic tie-breaks cannot reach the output). */
  /** COUNT-MIN sketch (Cormode & Muthukrishnan 2005): the fixed-size
    * mergeable frequency summary — `depth × width` counters; a value's
    * estimate is the MIN over its `depth` hashed cells, an overestimate
    * by at most the collision mass. Built as plain DataFrame ops so the
    * scale shape is free: one ×depth explode, then a groupBy on at most
    * depth·width keys — map-side partial combine means each task ships
    * ≤ depth·width counters regardless of input size, and two sketches
    * merge by cell-wise addition (the groupBy IS the merge). The hash
    * is the engine's cross-engine h64 (seed "cms<r>"), so any engine
    * rebuilds the identical sketch. */
  def countMin(df: org.apache.spark.sql.DataFrame, valueCol: String,
      depth: Int, width: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(depth > 0 && width > 0, s"bad sketch dims $depth x $width")
    df.select(
        explode(sequence(lit(0), lit(depth - 1))).as("r"),
        col(valueCol).cast("string").as("t"))
      .select(col("r"),
        pmod(TextFunctions.hash64(
          concat(lit("cms"), col("r")), col("t")), lit(width.toLong)).as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[countMin]] sketch for a probe set:
    * est(t) = min over rows of cell(r, h(r, t)), where a cell ABSENT
    * from the sketch counts 0 (the groupBy form only materializes
    * touched cells) — so a never-seen probe estimates 0 instead of
    * vanishing or over-estimating from collision cells. The probe side
    * is serving-sized; the join touches depth·|probes| sketch cells. */
  def countMinEstimate(sketch: org.apache.spark.sql.DataFrame,
      probes: org.apache.spark.sql.DataFrame, probeCol: String,
      depth: Int, width: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val keyed = probes
      .select(col("*"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("c", pmod(TextFunctions.hash64(
        concat(lit("cms"), col("r")), col(probeCol).cast("string")),
        lit(width.toLong)))
    keyed.join(sketch, Seq("r", "c"), "left")
      .groupBy(probes.columns.map(col).toIndexedSeq: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  def heavyHitters(
      df: org.apache.spark.sql.DataFrame,
      valueCol: String,
      /** Frequency threshold as 1/denom of the total row count. */
      denom: Int,
      /** Summary over-capacity. MUST be >= 2: at exactly 1, a value
        * sitting precisely AT the threshold (which the final filter
        * includes) could evade every partition summary — the superset
        * proof needs strict inequality headroom. */
      capacityFactor: Int = 2
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(denom > 0, "denom must be positive")
    require(capacityFactor >= 2,
      "capacityFactor must be >= 2 to preserve the candidate superset " +
        "guarantee at the threshold boundary")
    val cap = math.toIntExact(denom.toLong * capacityFactor)
    val spark = df.sparkSession
    import spark.implicits._
    // three passes share one materialization (count, candidates,
    // recount) — on a 100 TB exploded-token input, re-deriving the
    // values each pass would triple the dominant scan cost
    val vals = df.select(col(valueCol).cast("string").as("v")).persist()
    try {
      val total = vals.count()
      val cands = vals.as[String].mapPartitions { it =>
        // SpaceSaving with count-bucketed eviction: counts only grow by
        // 1, so buckets form a non-decreasing ladder and evicting from
        // the lowest bucket is O(1) amortized — a minBy scan per miss
        // would cost O(cap) per row on unique-heavy noise
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        val buckets = scala.collection.mutable
          .TreeMap.empty[Long, scala.collection.mutable.Set[String]]
        def bucketAdd(v: String, c: Long): Unit =
          buckets.getOrElseUpdate(c, scala.collection.mutable.Set.empty) += v
        def bucketRemove(v: String, c: Long): Unit = {
          val b = buckets(c)
          b -= v
          if (b.isEmpty) buckets.remove(c)
        }
        it.foreach { v =>
          counts.get(v) match {
            case Some(c) =>
              counts(v) = c + 1
              bucketRemove(v, c); bucketAdd(v, c + 1)
            case None =>
              if (counts.size < cap) { counts(v) = 1L; bucketAdd(v, 1L) }
              else {
                // classic SpaceSaving: the new value inherits the
                // minimum counter + 1 (overestimates, never loses)
                val (mc, keys) = buckets.head
                val mk = keys.head
                bucketRemove(mk, mc)
                counts.remove(mk)
                counts(v) = mc + 1
                bucketAdd(v, mc + 1)
              }
          }
        }
        counts.keysIterator
      }.toDF("v").distinct()
      vals
        .join(broadcast(cands), Seq("v"), "left_semi")
        .groupBy("v")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * denom >= total)
        .select(col("v").as(valueCol), col("cnt"))
        // materialize before unpersist drops the shared input
        .localCheckpoint(eager = true)
    } finally vals.unpersist()
  }
}
