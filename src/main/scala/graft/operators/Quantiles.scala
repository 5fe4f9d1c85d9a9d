package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._

/** Distributed EXACT interpolated quantiles (r4 verdict item 2).
  *
  * Spark's built-in `percentile` aggregate buffers every value of a
  * group in one in-memory `OpenHashMap` — unlike sort-based windows,
  * that buffer does not spill, so a whole-table (or whole-group)
  * percentile is the one aggregation in the engine that is NOT
  * bounded-memory at 100 TB. This helper computes the identical
  * linear-interpolation quantile (`quantile_cont` semantics, the same
  * lower*(hi−pos) + higher*(pos−lo) formula as Spark's Percentile)
  * through shuffles and windows only, each of which spills:
  *
  *  1. `groupBy(value)` → per-distinct-value counts (the only
  *     full-data shuffle; output is |distinct| rows, not |rows|).
  *  2. Value-range shards from the group's (min, max): shard id is
  *     monotone in value, so per-shard cumulative counts + per-shard
  *     base offsets reproduce the GLOBAL rank — the same two-pass
  *     sharded prefix-sum as `llm_pack_sequences`, no single-task
  *     global window anywhere.
  *  3. The target rank positions (floor/ceil of (n−1)·q) are joined
  *     back broadcast (|groups|·|qs| rows) and only the two covering
  *     values per quantile survive to the final tiny aggregation.
  *
  * Driver state: none (no collect; everything stays declarative).
  * Largest broadcast: |groups| × nShards offset rows.
  */
object Quantiles {

  /** Per-group exact quantiles of `valueCol` ∈ df at fractions `qs`.
    * Returns one row per (group, q): `groupCols..., q, exact_q, n`
    * (`n` = non-null value count of the group). `groupCols` may be
    * empty for a global quantile. NULL values are ignored, matching
    * `percentile` / `quantile_cont`. */
  def exactQuantiles(s: SparkSession, df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[Double], nShards: Int = 64): DataFrame = {
    // a constant pseudo-group makes the global case the grouped case
    val (base, gcols) =
      if (groupCols.nonEmpty) (df, groupCols)
      else (df.withColumn("_g", lit(0)), Seq("_g"))
    val g = gcols.map(col)

    val vals = base.filter(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).cast("double").as("value"): _*)

    // 1. distinct-value counts — the only |rows|-sized shuffle
    val vc = vals.groupBy(gcols.map(col) :+ col("value"): _*)
      .agg(count(lit(1)).as("cnt"))

    // per-group min/max/n: one row per group, broadcast back
    val stats = vals.groupBy(g: _*)
      .agg(min("value").as("vmin"), max("value").as("vmax"),
        count(lit(1)).as("n"))

    // 2. monotone value-range shards + sharded global prefix-sum
    val width = (col("vmax") - col("vmin")) / nShards
    val sharded = vc.join(broadcast(stats), gcols)
      .withColumn("shard",
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(floor((col("value") - col("vmin")) / width),
            lit(nShards - 1L))))
      // stats columns served only the shard computation; `n` must not
      // collide with posns' `n` in the rank join below
      .drop("vmin", "vmax", "n")
    val wIn = Window.partitionBy(gcols.map(col) :+ col("shard"): _*)
      .orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inShard = sharded.withColumn("cum_in", sum("cnt").over(wIn))
    val wShard = Window.partitionBy(g: _*).orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(gcols.map(col) :+ col("shard"): _*)
      .agg(sum("cnt").as("shard_cnt"))
      .withColumn("off", coalesce(sum("shard_cnt").over(wShard), lit(0L)))
      .select(gcols.map(col) :+ col("shard") :+ col("off"): _*)
    // cum = #values <= this value, globally within the group
    val cum = inShard.join(broadcast(offsets), gcols :+ "shard")
      .withColumn("cum", col("off") + col("cum_in"))

    // 3. target positions (0-indexed ranks) per group and quantile
    val posns = stats
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("rp", (col("n") - 1).cast("double") * col("q"))
      .withColumn("klo", floor(col("rp")).cast("long"))
      .withColumn("khi", ceil(col("rp")).cast("long"))
      .select(gcols.map(col) :+ col("q") :+ col("rp") :+
        col("klo") :+ col("khi") :+ col("n"): _*)
    // a value's run covers rank k iff cum − cnt <= k < cum
    cum.join(broadcast(posns), gcols)
      .withColumn("lo_val", when(
        col("cum") - col("cnt") <= col("klo") && col("klo") < col("cum"),
        col("value")))
      .withColumn("hi_val", when(
        col("cum") - col("cnt") <= col("khi") && col("khi") < col("cum"),
        col("value")))
      .filter(col("lo_val").isNotNull || col("hi_val").isNotNull)
      .groupBy(gcols.map(col) :+ col("q"): _*)
      .agg(max("lo_val").as("lv"), max("hi_val").as("hv"),
        max("rp").as("rp"), max("klo").as("klo"), max("khi").as("khi"),
        max("n").as("n"))
      // Spark Percentile's interpolation: (hi−pos)·lower + (pos−lo)·higher
      .withColumn("exact_q",
        when(col("klo") === col("khi"), col("lv"))
          .otherwise(col("lv") * (col("khi") - col("rp")) +
            col("hv") * (col("rp") - col("klo"))))
      .select((groupCols.map(col) :+ col("q") :+ col("exact_q") :+
        col("n")): _*)
  }
}
