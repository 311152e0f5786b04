package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral analytics over the events stream: ordered-step funnels
  * and cohort retention — the windowFunnel/retention product-analytics
  * surface a user of the reference pipeline (kafka+clickhouse.md:
  * 453-470 positions `events` for exactly this) reaches for next,
  * re-expressed as shuffle-minimal relational plans.
  */
object Funnel {

  /** Earliest-anchor ordered funnel: per user, how many funnel steps
    * completed IN ORDER, where the chain anchors at the user's earliest
    * step-1 event, each later step is strictly after the previous
    * step's event, and every step lands within `windowUs` of the
    * anchor. Greedy semantics: the earliest qualifying event is taken
    * at every step (a later anchor that would complete more steps is
    * not considered) — deterministic, and matched exactly by the
    * oracle SQL.
    *
    * Plan shape (the 100 TB consideration): one min-aggregate of the
    * step-filtered events per step, each joined and re-grouped on the
    * SAME user key — every stage reuses the hash-partitioning on
    * `user`, so an n-step funnel costs n filtered-shuffle passes,
    * never a pairwise self-join and never a per-user collect_list.
    */
  def userLevels(events: DataFrame, user: Column, tsUs: Column,
      steps: Seq[Column], windowUs: Long): DataFrame = {
    // The reached sets are nested (a user at step i passed step i-1),
    // so the level is simply the count of non-null step times.
    val lvl = steps.indices
      .map(i => when(col(s"t${i + 1}_us").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val times = stepTimes(events, user, tsUs, steps, windowUs)
      .select(col("user_id").as("u"), lvl.as("lvl"))
    events.select(user.as("u")).distinct()
      .join(times, Seq("u"), "left")
      .select(col("u").as("user_id"),
        coalesce(col("lvl"), lit(0)).as("funnel_level"))
  }

  /** Per-user greedy-chain step timestamps — the time-to-convert view
    * of [[userLevels]] (same earliest-anchor greedy semantics, same
    * per-step plan shape): one row per user who completed step 1, with
    * `t1_us .. tN_us` the microsecond timestamp of each completed step
    * (null once the chain stopped). `tK_us - t(K-1)_us` is the user's
    * step-K conversion latency; downstream aggregates of those
    * integer-valued differences are FP-exact (micros within a day
    * window sum far below 2^53).
    */
  def stepTimes(events: DataFrame, user: Column, tsUs: Column,
      steps: Seq[Column], windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val cols = user.as("u") +: tsUs.as("ts_us") +:
      steps.zipWithIndex.map { case (p, i) => p.as(s"p$i") }
    val base = events.select(cols: _*)
    val first = base.filter(col("p0")).groupBy("u")
      .agg(min("ts_us").as("t"))
      .withColumn("anchor", col("t"))
    val reached = steps.indices.tail.scanLeft(first) { (prev, i) =>
      base.filter(col(s"p$i"))
        .join(prev.select(col("u"), col("t").as("t_prev"), col("anchor")),
          "u")
        .filter(col("ts_us") > col("t_prev") &&
          col("ts_us") <= col("anchor") + lit(windowUs))
        // anchor is constant per user within the group; min() keeps the
        // aggregate deterministic (first() is not)
        .groupBy("u").agg(min("ts_us").as("t"), min("anchor").as("anchor"))
    }
    reached.zipWithIndex
      .map { case (df, i) => df.select(col("u"), col("t").as(s"t${i + 1}_us")) }
      // left joins on the same user key: each frame is a subset of the
      // previous, so the chain preserves step-1 users and nulls out
      // unreached steps — and every join reuses the `u` partitioning.
      .reduceLeft((a, b) => a.join(b, Seq("u"), "left"))
      .withColumnRenamed("u", "user_id")
  }

  /** The same earliest-anchor greedy funnel as [[userLevels]], but as
    * an IN-PLAN FOLD — ClickHouse's windowFunnel is literally this
    * shape: per user, the time-sorted event list is folded once
    * through a (level, anchor, t_prev, dead) state machine. One
    * shuffle on the user key, no joins at all; per-user state is
    * bounded by events-per-user (the same boundedness argument as
    * `sequence_match_users`' code strings). The fold runs inside the
    * `aggregate` higher-order function — codegen'd, no UDF.
    *
    * `strictOrder = true` adds windowFunnel's 'strict_order' mode: once
    * the chain has started, ANY event that does not advance it kills
    * it — including events matching no funnel condition at all
    * (ClickHouse's own A→B→D→C example stops at level 2 because D
    * intervenes, and plain noise events interrupt the same way).
    * Default mode is pinned equivalent to [[userLevels]] (FunnelProps
    * folds both over random streams).
    */
  def userLevelsFold(events: DataFrame, user: Column, tsUs: Column,
      steps: Seq[Column], windowUs: Long,
      strictOrder: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val n = steps.length
    val matchArr = array(steps: _*)
    val anyMatch = steps.reduce(_ || _)
    // 'any' no longer drives interruption (strict_order kills on any
    // non-advancing event) but stays in the struct: array_sort orders
    // struct fields lexicographically, so it is part of the
    // deterministic tie-break among same-timestamp events.
    val evs = events
      .select(user.as("u"),
        struct(tsUs.as("ts"), coalesce(anyMatch, lit(false)).as("any"),
          matchArr.as("ms")).as("ev"))
      .groupBy("u")
      .agg(array_sort(collect_list(col("ev"))).as("evs"))
    def state(lvl: Column, anchor: Column, tprev: Column,
        dead: Column) = struct(lvl.as("lvl"), anchor.as("anchor"),
      tprev.as("tprev"), dead.as("dead"))
    val init = state(lit(0), lit(0L), lit(0L), lit(false))
    val folded = aggregate(col("evs"), init, (st, e) => {
      val lvl = st.getField("lvl")
      val anchor = st.getField("anchor")
      val tprev = st.getField("tprev")
      val dead = st.getField("dead")
      val ts = e.getField("ts")
      // element_at is 1-based; lvl is the 0-based index of the NEXT
      // step. coalesce: a null predicate result never advances.
      val matchesNext = lvl < n &&
        coalesce(element_at(e.getField("ms"), lvl + 1), lit(false))
      val inWindow = lvl === 0 ||
        (ts > tprev && ts <= anchor + lit(windowUs))
      val advance = !dead && matchesNext && inWindow
      // strict_order: any non-advancing event after the chain starts
      // interrupts — matching a funnel condition or not
      val interrupt =
        if (strictOrder) !dead && lvl > 0 && !advance
        else lit(false)
      when(advance,
        state(lvl + 1, when(lvl === 0, ts).otherwise(anchor), ts, dead))
        .when(interrupt, state(lvl, anchor, tprev, lit(true)))
        .otherwise(st)
    })
    evs.select(col("u").as("user_id"),
      folded.getField("lvl").as("funnel_level"))
  }

  /** Cohort retention: users grouped by first-seen day; for each
    * cohort day, how many distinct users are active again EXACTLY
    * `offsets` days later. Output: (c_day, n_users, d<o1>, d<o2>, …).
    *
    * Two aggregations and one equi-join, all keyed on the user column:
    * the per-user cohort map is one row per user and re-shuffles on the
    * same key, so on a cluster this is two passes over the deduped
    * (user, day) activity set — no per-day self-joins.
    */
  def retention(events: DataFrame, user: Column, ts: Column,
      offsets: Seq[Int]): DataFrame = {
    val act = events.select(user.as("u"), to_date(ts).as("day")).distinct()
    val cohort = act.groupBy("u").agg(min("day").as("c_day"))
    val offs = act.join(cohort, "u")
      .select(col("u"), col("c_day"),
        datediff(col("day"), col("c_day")).as("off"))
    val aggs = countDistinct(col("u")).as("n_users") +:
      offsets.map(o =>
        countDistinct(when(col("off") === o, col("u"))).as(s"d$o"))
    offs.groupBy("c_day").agg(aggs.head, aggs.tail: _*)
  }
}
