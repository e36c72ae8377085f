package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Generic relational layer.
  *
  * The reference (tomwhite/disq-original) supplies NO relational operators —
  * `README.md:139-141` ("This library does not do any sorting") and SURVEY.md
  * §2.5: joins/aggs/windows are delegated to Spark itself. These queries
  * demonstrate that delegation over the driver's TPC-H-ish tables, in the
  * shapes a genomics user actually runs on top of a disq-style source
  * (coverage-per-interval range joins, per-contig depth aggregations), plus
  * standard OLAP shapes.
  *
  * Scale notes (100 TB discipline):
  *  - money sums use integer cents (exact, order-independent, no
  *    decimal-vs-double drift at any parallelism);
  *  - small dimensions are `broadcast()` so the big fact table never
  *    shuffles for them;
  *  - every query is a single declarative plan — Catalyst pushes filters
  *    and prunes columns into the parquet scan.
  */
object Relational {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- TPC-H Q1 shape: per-flag pricing summary; map-side partial agg,
    //    one shuffle on a tiny key space.
    "q1_pricing_summary" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(cents($"l_quantity")).as("sum_qty_c"),
          sum(cents($"l_extendedprice")).as("sum_base_c"),
          sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_c"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // -- TPC-H Q3 shape: fact-fact join + top-k. Join keys are the natural
    //    shuffle keys; AQE coalesces post-shuffle partitions.
    "q3_shipping_priority" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val o = Tables.orders(s, d).filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d).filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"))
        .select($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
          $"o_orderpriority", $"revenue_c")
        .orderBy($"revenue_c".desc, $"l_orderkey")
        .limit(10)
    },

    // -- TPC-H Q5 shape: 5-way join; region/nation broadcast (tiny dims),
    //    customer/orders/lineitem co-shuffle on their keys.
    "q5_local_supplier" -> { (s, d) =>
      import s.implicits._
      val r = Tables.region(s, d).filter($"r_name" === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(su, $"l_suppkey" === $"s_suppkey")
        .join(c, $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"))
        .orderBy($"revenue_c".desc, $"n_name")
    },

    // -- Window: top-3 orders per customer (rank with deterministic ties).
    "q_top_orders_per_customer" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_custkey", $"rk", $"o_orderkey", cents($"o_totalprice").as("totalprice_c"))
        .orderBy($"o_custkey", $"rk")
    },

    // -- Anti join: customers with no 1995 orders (NOT EXISTS with a
    //    correlated predicate — non-empty at every scale factor).
    "q_customers_without_orders" -> { (s, d) =>
      import s.implicits._
      val o95 = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      Tables.customer(s, d)
        .join(o95, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    // -- Semi join: suppliers that shipped at least one late-1990s line.
    "q_active_suppliers" -> { (s, d) =>
      import s.implicits._
      val late = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("2001-01-01").cast("timestamp"))
      Tables.supplier(s, d)
        .join(late, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name")
        .orderBy($"s_suppkey")
    },

    // -- Rollup: order counts and value at (priority, status), (priority), ().
    "q_priority_rollup" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .rollup($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), sum(cents($"o_totalprice")).as("total_c"))
        .select(coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          $"n_orders", $"total_c")
        .orderBy($"priority", $"status")
    },

    // -- Distinct aggregation: distinct parts handled per supplier.
    "q_distinct_parts_per_supplier" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_suppkey")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          count(lit(1)).as("n_lines"))
        .orderBy($"l_suppkey")
    },

    // -- Set operation: customers active in both 1995 and 1996 (INTERSECT).
    "q_repeat_customers" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
      def in(y: Int) = o
        .filter($"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
          $"o_orderdate" < lit(s"${y + 1}-01-01").cast("timestamp"))
        .select($"o_custkey")
      in(1995).intersect(in(1996)).orderBy($"o_custkey")
    },

    // -- Genomic-style coverage: range join of synthetic "reads" (from
    //    lineitem) against 25 interval bins (from nation), counted per bin.
    //    This is SURVEY.md §2.5's coverage-per-interval query; the bin table
    //    is broadcast — the disq-style pattern of a broadcast interval list.
    "q_interval_coverage" -> { (s, d) =>
      import s.implicits._
      val reads = Tables.lineitem(s, d).select(
        concat(lit("chr"), ($"l_orderkey" % 3).cast("string")).as("contig"),
        (($"l_partkey" * 37) % 100000).as("rstart"))
        .withColumn("rend", $"rstart" + 150)
      val bins = Tables.nation(s, d).select(
        concat(lit("chr"), ($"n_nationkey" % 3).cast("string")).as("icontig"),
        ($"n_nationkey".cast("long") * 4000).as("istart"))
        .withColumn("iend", $"istart" + 3999)
      reads.join(broadcast(bins),
        $"contig" === $"icontig" && $"rstart" <= $"iend" && $"rend" >= $"istart")
        .groupBy($"icontig", $"istart", $"iend")
        .agg(count(lit(1)).as("depth"))
        .orderBy($"icontig", $"istart")
    },

    // Big-big interval join: NEITHER side broadcastable at scale (reads ×
    // variants are both corpus-sized at 100 TB), so the overlap join runs
    // as an EQUI-join on (contig, coordinate bin): both sides explode to
    // the fixed-width bins their interval touches (≤2 for these lengths),
    // shuffle linearly by (contig, bin), and pair generation is local per
    // bin. Each overlapping pair is counted exactly once — only in the bin
    // holding max(rstart, vstart) — so no distinct/dedup shuffle exists.
    // This is the plan a naive `JOIN ON overlap` can't give you (Spark
    // plans that as BroadcastNestedLoop when nothing is broadcastable);
    // Catalyst/AQE still broadcast the small side at test SF, which is the
    // right call there and irrelevant at scale.
    //
    // The CONTIG COUNT scales with the corpus (one per ~20k reads, the
    // memoized catalog-count stand-in; 3 at oracle SF): a fixed coordinate
    // space would make overlap density — and the true pair count — grow
    // with SF, turning the join quadratic at scale. More samples means
    // more genomes, not denser ones; per-contig density is a constant of
    // the data, so the pair space stays corpus-LINEAR.
    // BIN WIDTH is a pure throughput knob (the result is bin-independent:
    // each pair still counts exactly once, in the bin of max(rstart,
    // vstart)). 250 ≈ interval length: candidate pairs per bin scale with
    // per-bin density², so quartering the width quarters the false-
    // candidate work while the explode factor only grows to ≤(len/250)+1
    // ≈ 1.6 for reads, ≈1.1 for variants. Width ≪ length would invert the
    // trade (explode dominates); width ≫ length wastes overlap checks.
    "q_interval_join_binned" -> { (s, d) =>
      import s.implicits._
      val nc = math.max(3L, Pipeline.countOnce(s"$d/lineitem", Tables.lineitem(s, d)) / 20000L)
      // single-split inputs leave the contig/bin construction, the explode
      // and BOTH join-shuffle map sides on one scan task (cpu_s ≈ wall in
      // the bench); spreadSmall moves that below-the-join work onto every
      // core and is a no-op once the input exceeds one scan split
      val reads = Tables.spreadSmall(Tables.lineitem(s, d).select(
        concat(lit("chr"), ($"l_orderkey" % nc).cast("string")).as("contig"),
        (($"l_partkey" * 37) % 100000).cast("int").as("rstart")))
        .withColumn("rend", $"rstart" + 150)
        .withColumn("bin", explode(expr("sequence(rstart div 250, rend div 250)")))
      val vars = Tables.spreadSmall(Tables.orders(s, d).select(
        concat(lit("chr"), ($"o_orderkey" % nc).cast("string")).as("vcontig"),
        (($"o_custkey" * 53) % 100000).cast("int").as("vstart")))
        .withColumn("vend", $"vstart" + 30)
        .withColumn("vbin", explode(expr("sequence(vstart div 250, vend div 250)")))
      reads.join(vars,
        $"contig" === $"vcontig" && $"bin" === $"vbin" &&
          $"rstart" <= $"vend" && $"rend" >= $"vstart" &&
          $"bin" === expr("greatest(rstart, vstart) div 250"))
        .groupBy($"contig")
        .agg(count(lit(1)).as("n_pairs"),
          sum($"rstart".cast("long")).as("sum_rstart"),
          sum($"vstart".cast("long")).as("sum_vstart"))
        .orderBy($"contig")
    },

    // -- Time-series: hourly event aggregation (batch twin of the streaming
    //    windowed agg in graft.streaming).
    "q_events_hourly" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          $"event_type")
        .agg(count(lit(1)).as("n"), sum(cents($"value")).as("value_c"))
        .orderBy($"hour", $"event_type")
    },

    // -- TIME-SERIES GAP FILL + linear interpolation (the warehouse
    //    "resample" op): sparse hourly revenue per event type becomes a
    //    DENSE hourly series — the spine is sequence()-exploded from each
    //    type's [min,max] hour (one row per type feeds the Generate, never
    //    a driver loop), missing hours take the exact integer
    //    interpolation pv + FLOOR((nv-pv)·Δt/span) between their non-null
    //    neighbors (FLOOR over doubles ≤ 2^29 — exact, and the SAME
    //    rounding rule DuckDB's FLOOR applies, where `div`'s
    //    truncate-toward-zero would drift on falling slopes), and edges
    //    carry the nearest value. Windows partition by event_type — each
    //    series' state stays on one partition, series count scales out.
    "q_events_gapfill" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, d).filter($"value" > 80)
        .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
        .agg(sum(cents($"value")).as("rev_c"))
      val spine = hourly.groupBy($"event_type")
        .agg(min($"h").as("h0"), max($"h").as("h1"))
        .select($"event_type", explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      // both carries as RUNNING frames: an UnboundedFollowing frame is
      // O(series²) in Spark (per-row rescan to partition end), so the
      // next-neighbor carry runs over the REVERSED hour order instead
      val back = Window.partitionBy($"event_type").orderBy($"h")
        .rowsBetween(Window.unboundedPreceding, 0)
      val fwdRev = Window.partitionBy($"event_type").orderBy($"h".desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(hourly, Seq("event_type", "h"), "left")
        .withColumn("hh", expr("unix_millis(h) div 3600000"))
        .withColumn("pv", last($"rev_c", ignoreNulls = true).over(back))
        .withColumn("ph", last(when($"rev_c".isNotNull, $"hh"), ignoreNulls = true).over(back))
        .withColumn("nv", last($"rev_c", ignoreNulls = true).over(fwdRev))
        .withColumn("nh", last(when($"rev_c".isNotNull, $"hh"), ignoreNulls = true).over(fwdRev))
        .select($"event_type", $"hh",
          when($"rev_c".isNotNull, $"rev_c")
            .when($"ph".isNull, $"nv")
            .when($"nh".isNull, $"pv")
            .otherwise($"pv" + expr("CAST(FLOOR((nv - pv) * (hh - ph) / (nh - ph)) AS BIGINT)"))
            .as("filled_c"),
          $"rev_c".isNull.as("is_gap"))
        .orderBy($"event_type", $"hh")
    },

    // -- Semi-structured: JSON extraction from the props column.
    "q_events_json" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select(get_json_object($"props", "$.k").cast("long").as("k"), $"value")
        .groupBy(($"k" % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(cents($"value")).as("value_c"))
        .orderBy($"k_bucket")
    },

    // -- Sessionization: 30-minute-gap sessions per user via window lag.
    "q_events_sessions" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("prev_ms", lag(unix_millis($"ts"), 1).over(w))
        .withColumn("new_session",
          when($"prev_ms".isNull || unix_millis($"ts") - $"prev_ms" > 1800000L, 1L)
            .otherwise(0L))
        .groupBy($"user_id")
        .agg(sum($"new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    },

    // -- As-of join (an operator Spark has no native form of): attribute
    // each purchase to the user's most recent view at or before it. The
    // distributed shape is union-both-sides + ONE window over (user_id, ts)
    // with last(_, ignoreNulls) carry-forward — one shuffle on user_id,
    // linear in events, no per-row range probe and no broadcast
    // requirement; this is how an as-of join stays an equi-shuffle at
    // 100 TB. Views pre-aggregate per (user_id, ts) so the match is
    // deterministic at any SF; ties (purchase at a view's exact ts) take
    // the view, matching the oracle's ASOF >= semantics. The oracle is
    // DuckDB's native ASOF LEFT JOIN; sum_lag_us pins WHICH view matched,
    // not just how many.
    "q_events_asof" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val views = ev.where($"event_type" === "view")
        .groupBy($"user_id", $"ts").agg(max(cents($"value")).as("v_value"))
      val purch = ev.where($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id")
      val tagged = views
        .select($"user_id", $"ts", lit(0).as("side"), $"v_value",
          lit(null).cast("long").as("event_id"))
        .unionByName(purch.select($"user_id", $"ts", lit(1).as("side"),
          lit(null).cast("long").as("v_value"), $"event_id"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("lv", last($"v_value", ignoreNulls = true).over(w))
        .withColumn("lts", last(when($"side" === 0, $"ts"), ignoreNulls = true).over(w))
        .where($"side" === 1)
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_purchases"),
          count($"lv").as("n_attributed"),
          sum($"lv").as("sum_view_value"),
          sum(unix_micros($"ts") - unix_micros($"lts")).as("sum_lag_us"))
        .orderBy($"user_id")
    },

    // -- Ordered funnel: per user, first view -> first later click -> first
    // later purchase. Each stage joins only its stage-filtered slice on
    // user_id (never the full stream against itself), and every stage
    // shares the user_id shuffle key, so at scale the three aggregations
    // co-partition and the funnel costs one filtered pass per stage.
    "q_events_funnel" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ms").as("t_view_ms"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ms" > $"t_view_ms")
        .groupBy($"user_id").agg(min($"ms").as("t_click_ms"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"ms" > $"t_click_ms")
        .groupBy($"user_id").agg(min($"ms").as("t_purchase_ms"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select($"user_id", $"t_view_ms", $"t_click_ms", $"t_purchase_ms",
          ($"t_purchase_ms" - $"t_view_ms").as("conv_ms"))
        .orderBy($"user_id")
    },

    // -- Cohort retention: users grouped by first-activity week; for each
    // (cohort_week, weeks_since) the distinct users still active that week.
    // The cohort assignment and the join back share the user_id shuffle key
    // (co-partitioned, no extra exchange shape), and the final rollup is
    // cohort × week cardinality — tiny at any corpus size.
    // -- DAU / WAU / stickiness: the engagement rollup every event
    // pipeline reports. The trailing-7-day distinct is NOT a range join:
    // each distinct (user, day) EXPLODES into the 7 window days it
    // contributes to (a fixed ×7 fan-out, co-partitioned by window day) —
    // at a year of 100 TB events a day×user range join would be a nested
    // loop over days × user-days, where this stays user-day linear.
    "q_events_dau" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id", to_date($"ts").as("day"))
      val ud = ev.distinct()
      val wau = ud
        .select($"user_id", explode(sequence($"day", date_add($"day", 6))).as("w_day"))
        .groupBy($"w_day").agg(countDistinct($"user_id").as("wau"))
      val daily = ev.groupBy($"day")
        .agg(countDistinct($"user_id").as("dau"), count(lit(1)).as("n_events"))
      daily.join(wau, $"day" === $"w_day")
        .select(date_format($"day", "yyyy-MM-dd").as("day"),
          $"n_events", $"dau", $"wau",
          expr("(dau * 1000) div wau").as("stickiness_milli"))
        .orderBy($"day")
    },

    "q_events_retention" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", date_trunc("week", $"ts").as("wk"))
      val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cwk"))
      ev.join(cohort, "user_id")
        .groupBy(date_format($"cwk", "yyyy-MM-dd").as("cohort_week"),
          (datediff($"wk", $"cwk") / 7).cast("long").as("weeks_since"))
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort_week", $"weeks_since")
    },

    // -- Pivot: the daily event mix in WIDE form — one row per day, one
    //    column per event type. `pivot` with an explicit value list
    //    compiles to ONE aggregate pass (PivotFirst) — explicit values
    //    matter at scale: the two-argument form needs no extra job to
    //    discover the pivot domain, and the column count is fixed at plan
    //    time. Absent cells coalesce to 0 to match the oracle's
    //    conditional-count form.
    "q_events_type_pivot" -> { (s, d) =>
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val piv = Tables.events(s, d)
        .select(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"),
          $"event_type", cents($"value").as("v"))
        .groupBy($"day")
        .pivot("event_type", types)
        .agg(count(lit(1)).as("n"), sum($"v").as("v_c"))
      piv.select($"day" +: types.flatMap(t => Seq(
          coalesce(col(s"${t}_n"), lit(0L)).as(s"${t}_n"),
          coalesce(col(s"${t}_v_c"), lit(0L)).as(s"${t}_v_c"))): _*)
        .orderBy($"day")
    },

    // -- Corpus profiling with a hand-rolled HyperLogLog: per event type,
    // the 256-register distinct-users sketch. Unlike approx_count_distinct
    // (whose sketch bytes are engine-specific and can never hash-match an
    // oracle), every step here is portable integer math: md5 → 32-bit
    // prefix → bucket = h mod 256, rank = leading zeros of the remaining
    // 24 bits; registers merge with MAX (duplicates are absorbed — no
    // distinct, no dedup shuffle), and the harmonic-mean sum is exact
    // because the 2^-rank terms are scaled to integers. The query emits
    // the MERGEABLE summary (non-empty registers, scaled harmonic sum) —
    // the state a 100 TB profiling job persists per partition/day — plus
    // the raw estimate via a rational alpha and integer division. The
    // small-range linear-counting correction (E < 2.5m → m·ln(m/V))
    // involves a transcendental, so it stays presentation-side
    // (PlanShapeSpec applies it and asserts accuracy vs exact counts).
    // At scale the shuffle carries ≤ (#types × 256) rows, while exact
    // distinct would shuffle every (type, user) pair.
    "q_profile_hll" -> { (s, d) =>
      import s.implicits._
      val m = 256
      val ev = Tables.events(s, d).select($"event_type",
        conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      val regs = ev
        .select($"event_type", pmod($"h", lit(m)).as("bucket"),
          expr("h div 256").as("w"))
        .withColumn("rank",
          when($"w" === 0, lit(25)).otherwise(lit(25) - length(bin($"w"))))
        .groupBy($"event_type", $"bucket")
        .agg(max($"rank").as("r"))
      regs.groupBy($"event_type")
        .agg(sum(expr("shiftleft(1L, cast(25 - r as int))")).as("s_present"),
          count(lit(1)).as("nb"))
        // empty registers contribute 2^-0 = 1, scaled: 2^25 each
        .withColumn("s_total",
          $"s_present" + (lit(m) - $"nb") * lit(1L << 25))
        // raw E = alpha_m * m^2 / sum(2^-rank); alpha as the rational
        // 7213/10042 ≈ 0.71828 (0.7213/(1+1.079/m) at m=256, to 1e-5),
        // INTEGER division so both engines produce the identical bigint
        .select($"event_type", $"nb", $"s_total",
          expr(s"(${7213L * m.toLong * m * (1L << 25)}L div (10042 * s_total))")
            .as("hll_raw_e"))
        .orderBy($"event_type")
    },

    // -- Histogram quantiles (p50/p95 of event value per type): the
    // portable alternative to percentile_approx, whose t-digest-ish
    // sketch could never hash-match an oracle. Values bucket into
    // per-dollar integer bins; the histogram is the only full-data
    // aggregation (shuffle carries #types × #bins rows at any corpus
    // size); quantiles come from an integer cumulative-sum walk —
    // smallest bucket whose cumulative count covers the target rank,
    // with cross-multiplied rank tests so no division ever happens.
    "q_profile_quantiles" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"event_type",
          expr("cast(round(value * 100) as bigint) div 100").as("bucket"))
      val hist = ev.groupBy($"event_type", $"bucket").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"event_type").orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum($"c").over(w))
      val tot = hist.groupBy($"event_type").agg(sum($"c").as("n"))
      val j = cum.join(broadcast(tot), "event_type")
      val p50 = j.filter($"cum" * 2 >= $"n")
        .groupBy($"event_type").agg(min($"bucket").as("p50_dollar"))
      val p95 = j.filter($"cum" * 20 >= $"n" * 19)
        .groupBy($"event_type").agg(min($"bucket").as("p95_dollar"))
      p50.join(p95, "event_type").join(tot, "event_type")
        .select($"event_type", $"n", $"p50_dollar", $"p95_dollar")
        .orderBy($"event_type")
    },

    // -- View→purchase attribution: every purchase joined to the same
    // user's views in the trailing hour (inclusive lower bound matching
    // the streaming twin's time-range condition) — the oracled BATCH face
    // of Streaming.attribution. One equi-join on user_id (both sides
    // co-partition on the natural key; the time range is a residual), so
    // the pair space is bounded by per-user activity, never corpus².
    "q_events_attribution" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", $"event_id", $"event_type", unix_millis($"ts").as("ms"))
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ms".as("vms"))
      val buys = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ms".as("pms"))
      buys.join(views, Seq("user_id"))
        .filter($"vms" <= $"pms" && $"vms" >= $"pms" - 3600000L)
        .groupBy($"user_id", $"purchase_id")
        .agg(count(lit(1)).as("n_views"),
          min($"vms").as("first_view_ms"), max($"vms").as("last_view_ms"))
        .orderBy($"user_id", $"purchase_id")
    },

    // -- Event pathing: the (from → to) transition matrix of consecutive
    // events per user — the navigation-flow rollup product analytics runs
    // daily. ONE shuffle on user_id feeds the lead() window (ties broken
    // by event_id, so the sequence is deterministic in both engines); the
    // transition rollup is #types² rows at any corpus size.
    "q_events_pathing" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"from_type", $"to_type")
    },

    // -- Z-order layout: the multi-dimensional data-skipping operator. Two
    // hash-spread 16-bit dimensions interleave into a 32-bit Morton key
    // (one narrow codegen'd projection — graft.functions zkey16); the
    // query reports per-z-bucket row counts and min/max bounds of BOTH
    // dimensions, which is exactly the statistic a z-ordered file layout
    // hands to scan pruning: every bucket is a bounded hyperrectangle
    // (x-span AND y-span ≤ 2^11 for a 10-bit bucket prefix), where a
    // linear sort bounds only its leading column. The write-side layout
    // (repartitionByRange on the z-key + sortWithinPartitions) is pinned
    // by ZOrderSpec, which measures per-partition spans against a
    // single-column sort. Scale shape: narrow pass + one aggregate whose
    // shuffle carries ≤ 1024 bucket rows per partition.
    "q_layout_zorder" -> { (s, d) =>
      import s.implicits._
      val src = Tables.lineitem(s, d).select(
        (($"l_partkey" * 40503L) % 65536L).as("x"),
        (($"l_suppkey" * 30011L) % 65536L).as("y"))
      src.withColumn("zbucket", shiftright(zkey16($"x", $"y"), 22))
        .groupBy($"zbucket")
        .agg(count(lit(1)).as("n"),
          min($"x").as("min_x"), max($"x").as("max_x"),
          min($"y").as("min_y"), max($"y").as("max_y"))
        .withColumn("x_span", $"max_x" - $"min_x")
        .withColumn("y_span", $"max_y" - $"min_y")
        .orderBy($"zbucket")
    },

    // -- Count-min sketch frequency profiling: the third portable sketch
    // next to the HLL (cardinality) and the histogram (quantiles) — a
    // 4×1024-cell counter grid estimating per-user event counts in
    // bounded memory. Build is one narrow explode (4 cells per event)
    // into a map-side-combined aggregate whose shuffle carries at most
    // 4096 rows per partition at ANY corpus size; estimates are the min
    // over the 4 probed cells. The exact per-user pass exists here as the
    // verification harness (the point of the sketch at 100 TB is to SKIP
    // it); the report checks the CMS guarantee estimate ≥ exact on the
    // top-20 heavy hitters. All hashing is the portable md5-based hash60,
    // so the oracle reproduces every cell exactly.
    "q_profile_cms" -> { (s, d) =>
      import s.implicits._
      val width = 1024L
      val ev = Tables.events(s, d).select($"user_id")
      val sketch = ev
        .select(posexplode(array(cmsCells($"user_id", width): _*)).as(Seq("row", "cell")))
        .groupBy($"row", $"cell").agg(count(lit(1)).as("cnt"))
      val top = ev.groupBy($"user_id").agg(count(lit(1)).as("exact_n"))
        .orderBy($"exact_n".desc, $"user_id").limit(20)
      top
        .select($"user_id", $"exact_n",
          posexplode(array(cmsCells($"user_id", width): _*)).as(Seq("row", "cell")))
        .join(broadcast(sketch), Seq("row", "cell"), "left")
        .groupBy($"user_id", $"exact_n")
        .agg(min(coalesce($"cnt", lit(0L))).as("cms_n"))
        .select($"user_id", $"exact_n", $"cms_n", ($"cms_n" - $"exact_n").as("overcount"))
        .orderBy($"user_id")
    },

    // -- Rolling-window spike detection: hourly event counts per type
    // flagged when ≥1.5× the trailing-24-hour mean (full windows only).
    // The rolling frame is a rows-between window over the hourly rollup —
    // the aggregation that crosses the corpus is the hourly groupBy
    // (#types × #hours rows); the spike test cross-multiplies
    // (2·n·cnt ≥ 3·sum) so the 1.5× threshold stays integer-exact.
    "q_events_spikes" -> { (s, d) =>
      import s.implicits._
      val hourly = Tables.events(s, d)
        .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"hour")
        .rowsBetween(-24, -1)
      hourly
        .withColumn("prev_sum", sum($"n").over(w))
        .withColumn("prev_cnt", count($"n").over(w))
        .filter($"prev_cnt" === 24 && $"n" * $"prev_cnt" * 2 >= $"prev_sum" * 3)
        .select($"event_type", date_format($"hour", "yyyy-MM-dd HH:mm:ss").as("hour"),
          $"n", $"prev_sum")
        .orderBy($"event_type", $"hour")
    },

    // -- Latest-state compaction (the CDC/upsert read shape): each user's
    // most recent event wins. Expressed as a top-1 window so Spark plans
    // WindowGroupLimit: per-partition top-1 BEFORE the user_id exchange —
    // the shuffle carries one row per (partition, user), not the corpus.
    "q_events_latest" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type", cents($"value").as("value_c"))
        .orderBy($"user_id")
    },

    // -- Salted join: the skew-mitigation shape for a join key whose
    // cardinality is tiny (event_type: ~5 values), when the dim side is
    // too large to broadcast. The fact side salts each row into one of 16
    // sub-keys; the dim side replicates 16×; the join key becomes
    // (event_type, salt), spreading each hot key over 16 partitions
    // instead of one. Results are identical to the unsalted join (oracle
    // is the plain join); PlanShapeSpec pins that the exchange really is
    // on the salted pair. Broadcast stays the first choice for dims that
    // fit — salting is the fallback that keeps the worst key from pinning
    // a single reducer at 100 TB.
    "q_skew_salted_join" -> { (s, d) =>
      import s.implicits._
      val salts = 16
      val ev = Tables.events(s, d)
        .select($"event_type", $"value",
          pmod($"event_id", lit(salts)).as("salt"))
      val dim = Tables.events(s, d).select($"event_type").distinct()
        .withColumn("type_weight", length($"event_type").cast("long"))
        .withColumn("salt", explode(sequence(lit(0L), lit(salts - 1L))))
        .hint("shuffle_merge")
      ev.join(dim, Seq("event_type", "salt"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(cents($"value") * $"type_weight").as("weighted_c"))
        .orderBy($"event_type")
    },

    // -- Hive-partitioned layout + partition-pruned scan: the corpus is
    //    written `partitionBy(lang)` and the language filter then prunes
    //    at the DIRECTORY level — the scan never opens a non-matching
    //    file, which at 100 TB is the difference between reading one
    //    language and reading the lake (PlanShapeSpec pins the
    //    PartitionFilters entry and that `lang` is out of the data
    //    schema). Partition values round-trip through directory names,
    //    so the aggregate also proves the layout didn't mangle the key.
    "q_partition_prune" -> { (s, d) =>
      import s.implicits._
      val base = s"${FormatQueries.tmpBase}/partby/${d.hashCode.toHexString}"
      Tables.documents(s, d).write.mode("overwrite").partitionBy("lang").parquet(base)
      s.read.parquet(base)
        .filter($"lang" === "en")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .orderBy($"source")
    },

    // -- DYNAMIC partition pruning: the runtime counterpart of
    //    q_partition_prune. The fact table is partitioned by ship month;
    //    the months worth reading are only known after FILTERING the
    //    dimension side, so Catalyst injects the dim's build output as a
    //    runtime partition filter (dynamicpruning expression) — the fact
    //    scan plans all 12 directories but READS only the dim-selected
    //    ones. At 100 TB this is the star-join pattern: the dim filter,
    //    not a static literal, decides which fact partitions exist for
    //    this query. PlanShapeSpec pins the dynamicpruning entry.
    "q_dpp_join" -> { (s, d) =>
      import s.implicits._
      val base = s"${FormatQueries.tmpBase}/dpp/${d.hashCode.toHexString}"
      Tables.lineitem(s, d)
        .withColumn("ship_month", month($"l_shipdate"))
        .write.mode("overwrite").partitionBy("ship_month").parquet(base)
      val fact = s.read.parquet(base)
      val dim = Tables.nation(s, d)
        .filter($"n_regionkey" === 1)
        .select(($"n_nationkey" % 12 + 1).as("m"), $"n_name")
      fact.join(dim, $"ship_month" === $"m")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_items"),
          sum(cents($"l_extendedprice")).as("price_c"))
        .orderBy($"n_name")
    },

    // -- Compaction round-trip: documents written as 20 small files,
    // compacted by graft.sources.Compact (narrow coalesce, no exchange),
    // read back and aggregated — proving the maintenance pass preserves
    // every row through the driver's hash gate, the same way the format
    // round-trips prove their sinks.
    "q_compact_roundtrip" -> { (s, d) =>
      import s.implicits._
      val base = s"${FormatQueries.tmpBase}/compact/${d.hashCode.toHexString}"
      Tables.documents(s, d).repartition(20).write.mode("overwrite").parquet(s"$base/in")
      val (nIn, nOut, _) = graft.sources.Compact.parquet(s, s"$base/in", s"$base/out")
      // compaction must reduce the file count; the exact output count is
      // byte-targeted, so it legitimately grows past 1 at larger SFs
      require(nOut < nIn, s"compaction did not reduce files: $nIn -> $nOut")
      s.read.parquet(s"$base/out")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .orderBy($"lang")
    },

    // -- Bucketed co-located join: the ONE big-big join shape where a
    // shuffle is avoidable by layout instead of by broadcast. Both fact
    // tables are written bucketed + sorted on the join key; the join then
    // reads bucket i against bucket i with NO Exchange on either side —
    // at 100 TB this turns the nightly fact-fact join from a full
    // corpus shuffle into a partition-local merge (pay the shuffle once
    // at ingest, reuse the layout every query). `hint("merge")` keeps the
    // demonstration honest at oracle SF where the planner would otherwise
    // broadcast the small side; PlanShapeSpec pins the no-Exchange shape.
    "q_bucketed_join" -> { (s, d) =>
      import s.implicits._
      val nb = 8
      val base = s"${FormatQueries.tmpBase}/bucketed/${d.hashCode.toHexString}"
      def prep(df: DataFrame, table: String, key: String): DataFrame = {
        // repartition on the bucket key first: Spark's bucket-file routing
        // uses the same Murmur3 hash as the shuffle, so each task holds
        // exactly one bucket's rows -> one file per bucket (which is also
        // what lets the scan trust the per-bucket sort order at read time)
        df.repartition(nb, col(key))
          .write.mode("overwrite")
          .option("path", s"$base/$table")
          .bucketBy(nb, key).sortBy(key)
          .saveAsTable(table)
        s.table(table)
      }
      val l = prep(Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount"),
        "graft_bkt_lineitem", "l_orderkey")
      val o = prep(Tables.orders(s, d)
        .select($"o_orderkey", $"o_orderpriority"),
        "graft_bkt_orders", "o_orderkey")
      l.hint("merge").join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"))
        .orderBy($"o_orderpriority")
    },

    // -- ROLLUP (grouping sets): region × priority revenue with subtotal
    //    and grand-total rows in ONE pass — Catalyst's Expand replicates
    //    each row once per grouping set BEFORE the partial aggregate, so
    //    the shuffle carries only (3 × |groups|) pre-aggregated rows, not
    //    3× the fact table. Rolled-up labels coalesce to 'ALL' (no real
    //    region/priority uses that name) so null-ordering differences
    //    between engines can't bite; gid pins WHICH set each row is from.
    "q_rollup_region_priority" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).select($"c_custkey", $"c_nationkey")
      val n = Tables.nation(s, d).select($"n_nationkey", $"n_regionkey")
      val r = Tables.region(s, d).select($"r_regionkey", $"r_name")
      o.join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"o_orderpriority")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"), sum(cents($"o_totalprice")).as("total_c"))
        .select(coalesce($"r_name", lit("ALL")).as("region"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"gid", $"n_orders", $"total_c")
        .orderBy($"gid", $"region", $"priority")
    },

    // -- EXISTS semi-join (TPC-H Q4 shape): orders with at least one
    //    returned item, counted per priority. LeftSemi never materializes
    //    the probe side's payload — the join output is orders-sized
    //    regardless of how many matching lineitems exist, and the
    //    lineitem side is pruned to the join key + pushed filter.
    "q_returned_orders_semijoin" -> { (s, d) =>
      import s.implicits._
      val ret = Tables.lineitem(s, d)
        .filter($"l_returnflag" === "R").select($"l_orderkey")
      Tables.orders(s, d)
        .join(ret, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum(cents($"o_totalprice")).as("total_c"))
        .orderBy($"o_orderpriority")
    },

    // -- Correlated aggregate subquery, decorrelated (TPC-H Q17 shape):
    //    items whose quantity is under 20% of their part's average. The
    //    correlated per-part avg becomes ONE part-keyed aggregate joined
    //    back on l_partkey — the canonical decorrelation; both sides
    //    shuffle on the same key once (AQE broadcasts the agg side at
    //    small SF). The 20%-of-avg test stays in integers:
    //    5·qty·cnt < sum_qty — exact in both engines, no avg() floats.
    "q_small_qty_items" -> { (s, d) =>
      import s.implicits._
      val l = Tables.lineitem(s, d)
      val perPart = l.groupBy($"l_partkey".as("pk"))
        .agg(sum(cents($"l_quantity")).as("sum_qty_c"), count(lit(1)).as("cnt"))
      val p = Tables.part(s, d).select($"p_partkey", $"p_brand")
      l.join(perPart, $"l_partkey" === $"pk")
        .filter(cents($"l_quantity") * 5 * $"cnt" < $"sum_qty_c")
        .join(broadcast(p), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_items"), sum(cents($"l_extendedprice")).as("price_c"))
        .orderBy($"p_brand")
    },

    // -- Set operations: INTERSECT/EXCEPT compile to distinct + semi/anti
    //    joins — each count is one key-shuffle over the distinct supplier
    //    sets, never a materialized intersection table. The three counts
    //    cross-join as single rows.
    "q_set_ops" -> { (s, d) =>
      import s.implicits._
      val l = Tables.lineitem(s, d)
      val h1 = l.filter($"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .select($"l_suppkey").distinct()
      val h2 = l.filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp"))
        .select($"l_suppkey").distinct()
      h1.intersect(h2).agg(count(lit(1)).as("n_both"))
        .crossJoin(h1.except(h2).agg(count(lit(1)).as("n_h1_only")))
        .crossJoin(h2.except(h1).agg(count(lit(1)).as("n_h2_only")))
    },

    // -- SQL-text interface: the same engine through `spark.sql` over
    //    registered views — the reference's compose-with-Spark-SQL claim
    //    (README.md:139-141) exercised literally. The plan is identical
    //    to the DataFrame form; this pins that the library's tables are
    //    first-class SQL citizens.
    "q_sql_interface" -> { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS n_orders,
              |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
              |FROM g_lineitem JOIN g_orders ON l_orderkey = o_orderkey
              |WHERE l_returnflag = 'A'
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // -- Ratio-to-report window: each supplier's share of its nation's
    //    revenue, without a self-join — ONE aggregate to supplier grain,
    //    then a windowed total over the nation slice (25 keys, each pass
    //    partition-local). The ppm ratio stays in integers.
    "q_supplier_share" -> { (s, d) =>
      import s.implicits._
      val sup = Tables.supplier(s, d).select($"s_suppkey", $"s_nationkey")
      val rev = Tables.lineitem(s, d)
        .groupBy($"l_suppkey")
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("rev_c"))
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      val w = Window.partitionBy($"s_nationkey")
      rev
        .withColumn("nation_c", sum($"rev_c").over(w))
        .withColumn("share_ppm", expr("rev_c * 1000000 div nation_c"))
        .filter($"share_ppm" >= 60000)
        .select($"s_nationkey", $"l_suppkey".as("suppkey"), $"rev_c",
          $"nation_c", $"share_ppm")
        .orderBy($"s_nationkey", $"suppkey")
    },

    // -- PageRank (3 power iterations) over the customer↔supplier
    //    purchase graph — the iterative-graph shape beyond connected
    //    components. Nodes are customers and offset suppliers; each
    //    distinct purchase relation contributes BOTH directions, so no
    //    bipartite side is dangling. All arithmetic is integer
    //    milli-rank (r = 150 + 0.85·Σ r_u/deg_u, scaled ×1000 with div)
    //    — deterministic at any parallelism and bit-equal to the
    //    oracle's chained CTEs. Scale shape: the edge list materializes
    //    ONCE (persist) and every iteration is one edge-keyed shuffle
    //    join + one dst rollup — edge-linear per round, the same
    //    contract as the CC layer; the final cut is TakeOrdered, not a
    //    sort.
    "q_pagerank" -> { (s, d) =>
      import s.implicits._
      val rel = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .select($"o_custkey".as("c"), ($"l_suppkey" + 1000000L).as("p"))
        .distinct()
      val edges = rel.select($"c".as("src"), $"p".as("dst"))
        .union(rel.select($"p".as("src"), $"c".as("dst")))
      val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
      // deg pre-joined ONCE (the naive form re-joined outdeg every
      // round); localCheckpoint materializes the degree-carrying edge
      // table and truncates lineage — the CC layer's pattern — so each
      // iteration plans against exact sizes and AQE broadcasts the
      // node-sized rank table into the edge join at test SF (at a scale
      // where ranks outgrow a broadcast, the same plan degrades to an
      // edge-keyed shuffle join, still edge-linear per round).
      val eout = edges.join(outdeg, "src")
        .select($"src", $"dst", $"deg").localCheckpoint()
      val nodes = eout.select($"src".as("id")).distinct().localCheckpoint()
      var ranks = nodes.withColumn("r", lit(1000L))
      // no per-iteration checkpoint: each rank table appears exactly once in
      // the next iteration's plan, so the 3-deep tree executes each level
      // once in ONE final job — the per-round localCheckpoint materialized a
      // node-sized table 3 times for nothing but lineage hygiene, and at 3
      // rounds the lineage is shallow (the checkpointed eout/nodes upstream
      // already cut it at the edge table)
      for (_ <- 1 to 3) {
        val contrib = eout
          .join(ranks.select($"id".as("src"), $"r"), "src")
          .groupBy($"dst").agg(sum(expr("r div deg")).as("inc"))
        ranks = nodes.join(contrib.select($"dst".as("id"), $"inc"), Seq("id"), "left")
          .select($"id", (lit(150L) + expr("(850 * coalesce(inc, 0L)) div 1000")).as("r"))
      }
      ranks.orderBy($"r".desc, $"id").limit(20)
        .select($"id", $"r".as("rank_milli"))
    },

    // -- NTILE bucketing: per-priority spend deciles. The window
    //    partitions on o_orderpriority (5 keys), so each decile pass
    //    sorts only its partition's slice; the tie-break on o_orderkey
    //    makes bucket boundaries deterministic at any parallelism (NTILE
    //    remainder-to-leading-buckets semantics are identical in Spark
    //    and DuckDB). The rollup output is 5×10 rows.
    "q_order_deciles" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy(cents($"o_totalprice"), $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy($"o_orderpriority", $"decile")
        .agg(count(lit(1)).as("n_orders"),
          sum(cents($"o_totalprice")).as("total_c"),
          max(cents($"o_totalprice")).as("max_c"))
        .orderBy($"o_orderpriority", $"decile")
    },

    // -- RANGE-frame moving window: 7-day trailing order revenue. Days
    //    collapse to one row each BEFORE the window (the window input is
    //    calendar-sized, not fact-sized), then ONE ordered pass computes
    //    the trailing sums over an integer day index — rangeBetween
    //    handles calendar gaps correctly where a ROWS frame would not.
    //    A single unpartitioned window over ~dates rows is fine at any
    //    corpus size; the fact table itself never sorts.
    "q_daily_moving_revenue" -> { (s, d) =>
      import s.implicits._
      val daily = Tables.orders(s, d)
        .groupBy(datediff(to_date($"o_orderdate"), lit("1970-01-01")).as("dayno"))
        .agg(count(lit(1)).as("n_orders"), sum(cents($"o_totalprice")).as("day_c"))
      // unpartitioned by design: input is one row per calendar day
      // (PlanHygieneSpec allowlist: q_daily_moving_revenue)
      val w = Window.orderBy($"dayno").rangeBetween(-6, 0)
      daily
        .withColumn("ma7_c", sum($"day_c").over(w))
        .withColumn("ma7_orders", sum($"n_orders").over(w))
        .select(date_format(date_add(lit("1970-01-01").cast("date"), $"dayno"), "yyyy-MM-dd").as("day"),
          $"n_orders", $"day_c", $"ma7_c", $"ma7_orders",
          expr("ma7_c div ma7_orders").as("avg_order_ma7_c"))
        .orderBy($"day")
    },

    // -- Correlated EXISTS with a non-equi predicate (TPC-H Q4 shape):
    //    orders in a window that had at least one line shipped >60 days
    //    after the order date. The EXISTS compiles to ONE left-semi join
    //    whose condition mixes the equi key (orderkey) with the non-equi
    //    lateness test — the semi join stops probing an order at its
    //    first late line, and the lineitem side is pruned to two columns
    //    at the scan. One orderkey shuffle; no count-then-filter
    //    materialization of the late set.
    "q_late_priority_orders" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate")
      o.join(l, $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    },

    // -- Outer-join distribution (TPC-H Q13 shape): how many customers
    //    placed k non-urgent orders, including k=0 — the LEFT join keeps
    //    orderless customers, then a SECOND aggregation folds the
    //    per-customer counts into a histogram. Both aggregations are
    //    key-shuffles (custkey, then the tiny k domain); the histogram
    //    side is bounded by max-orders-per-customer, not corpus size.
    "q_cust_order_distribution" -> { (s, d) =>
      import s.implicits._
      val perCust = Tables.orders(s, d)
        .filter($"o_orderpriority" =!= "1-URGENT")
        .groupBy($"o_custkey").agg(count(lit(1)).as("cnt"))
      Tables.customer(s, d)
        .join(perCust, $"c_custkey" === $"o_custkey", "left")
        .select(coalesce($"cnt", lit(0L)).as("c_count"))
        .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },

    // -- HAVING over a fact aggregate joined back to dimensions (TPC-H
    //    Q18 shape): orders whose total quantity exceeds 150. The
    //    quantity rollup happens FIRST (one orderkey shuffle, map-side
    //    partial), the >150 survivors — a tiny fraction — then join
    //    orders and customer; AQE sees the post-HAVING size and
    //    broadcasts the survivor side into both joins. Quantities stay
    //    in cents so the threshold is exact.
    "q_large_orders" -> { (s, d) =>
      import s.implicits._
      val big = Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(sum(cents($"l_quantity")).as("sum_qty_c"))
        .filter($"sum_qty_c" > 15000L)
      big.join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"o_orderkey", cents($"o_totalprice").as("totalprice_c"),
          $"sum_qty_c")
        .orderBy($"totalprice_c".desc, $"o_orderkey")
        .limit(20)
    },

    // -- Semi + anti on the same fact (TPC-H Q21 shape): suppliers that
    //    were the SOLE late shipper in a multi-supplier order. Instead of
    //    the textbook double correlated EXISTS/NOT EXISTS self-join, the
    //    per-order facts decorrelate into two orderkey-grain aggregates
    //    (distinct suppliers; distinct late suppliers) joined back to the
    //    late lines — every join and aggregate keys on l_orderkey, so the
    //    whole query lives in ONE shuffle domain and AQE reuses the
    //    exchange. At 100 TB this is 3 passes over co-partitioned data,
    //    not a quadratic self-probe.
    "q_late_sole_supplier" -> { (s, d) =>
      import s.implicits._
      val l = Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey")
      val late = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk")).distinct()
      val allS = l.groupBy($"l_orderkey")
        .agg(countDistinct($"l_suppkey").as("all_s"))
      val lateS = late.groupBy($"ok".as("lok")).agg(count(lit(1)).as("late_s"))
      late
        .join(allS, $"ok" === $"l_orderkey")
        .join(lateS, $"ok" === $"lok")
        .filter($"all_s" > 1 && $"late_s" === 1)
        .join(broadcast(Tables.supplier(s, d)), $"sk" === $"s_suppkey")
        .groupBy($"s_suppkey", $"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_suppkey")
        .limit(20)
    },

    // -- Scalar subquery + anti join (TPC-H Q22 shape): above-average-
    //    balance customers with no order since 2000. The global average
    //    is ONE row (broadcast cross join), and the comparison stays in
    //    integers (acct_c · cnt > sum_c) so Spark and the oracle agree
    //    bit-for-bit — no float avg. The anti join keys on custkey; the
    //    orders side is pruned to 2000+ rows before it.
    "q_lapsed_rich_customers" -> { (s, d) =>
      import s.implicits._
      val cc = Tables.customer(s, d)
        .select($"c_custkey", $"c_mktsegment", cents($"c_acctbal").as("acct_c"))
      val pos = cc.filter($"acct_c" > 0)
      val tot = pos.agg(sum($"acct_c").as("sum_c"), count(lit(1)).as("cnt"))
      val recent = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
        .select($"o_custkey")
      pos.crossJoin(broadcast(tot))
        .filter($"acct_c" * $"cnt" > $"sum_c")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), sum($"acct_c").as("bal_c"))
        .orderBy($"c_mktsegment")
    },

    // -- Triangle counting over the bulk co-purchase part graph, by
    //    DEGREE-ORDERED ORIENTATION (the MR-triangle-counting classic):
    //    every undirected edge points from its (degree, id)-smaller
    //    endpoint, so each triangle materializes exactly once and the
    //    oriented out-degree is O(√m) even on power-law graphs — the
    //    wedge join e1⋈e2 never explodes on a hub the way the naive
    //    undirected 3-way join does. Pair generation stays ORDER-LOCAL
    //    (a self-join inside the orderkey group, bounded by lines-per-
    //    order); everything downstream keys on node ids. Output is the
    //    integer triangle census incl. a ppm clustering coefficient.
    "q_triangle_count" -> { (s, d) =>
      import s.implicits._
      val items = Tables.lineitem(s, d)
        .filter($"l_quantity" >= 25)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
      val pairs = items.as("a").join(items.as("b"),
          $"a.ok" === $"b.ok" && $"a.p" < $"b.p")
        .select($"a.p".as("u"), $"b.p".as("v")).distinct()
      GraphOps.triangleCensus(pairs)
    },

    // -- BFS shortest-path levels from a seed set (suppliers of nation
    //    0) over the purchase graph — the frontier-expansion iterative
    //    primitive underneath k-hop neighborhoods and reachability.
    //    Each round is ONE src-keyed join + distinct + an anti join
    //    against the visited set; localCheckpoint truncates lineage so
    //    round k plans against materialized sizes, and an empty
    //    frontier short-circuits the remaining rounds. Edge-linear per
    //    round at any scale — no transitive-closure blowup, unlike a
    //    path-enumerating recursive join.
    "q_bfs_levels" -> { (s, d) =>
      import s.implicits._
      val rel = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .select($"o_custkey".as("c"), ($"l_suppkey" + 1000000L).as("p"))
        .distinct()
      val edges = rel.select($"c".as("src"), $"p".as("dst"))
        .union(rel.select($"p".as("src"), $"c".as("dst")))
        .localCheckpoint()
      val seeds = Tables.supplier(s, d).filter($"s_nationkey" === 0)
        .select(($"s_suppkey" + 1000000L).as("id"))
      GraphOps.bfsLevels(edges, seeds, 4)
    },

    // -- GVCF block COMBINE (joint-genotyping shape, à la GLnexus): two
    //    samples' disjoint reference blocks — (start, end, min-GQ) runs —
    //    intersect into the segments where BOTH samples have coverage,
    //    each segment carrying the pairwise min GQ. The overlap join runs
    //    as the binned equi-join (bin width = the larger block width, so
    //    blocks explode to ≤2 bins and each pair counts once in the bin
    //    of its intersection start); per-sample block construction is one
    //    groupBy each. At N samples this becomes a fold of the same
    //    pairwise combine — every step stays an equi-shuffle.
    "q_gvcf_combine" -> { (s, d) =>
      import s.implicits._
      val a = Tables.orders(s, d).select(
          concat(lit("chr"), ($"o_orderkey" % 3).cast("string")).as("contig"),
          (($"o_custkey" * 53) % 4000).as("blk"),
          ($"o_orderkey" % 60).as("g"))
        .groupBy($"contig", $"blk").agg(min($"g").as("gq_a"))
        .select($"contig", ($"blk" * 250 + 1).as("sa"),
          ($"blk" * 250 + 250).as("ea"), $"gq_a")
      val b = Tables.lineitem(s, d).select(
          concat(lit("chr"), ($"l_orderkey" % 3).cast("string")).as("bcontig"),
          (($"l_partkey" * 37) % 5000).as("blk"),
          ($"l_suppkey" % 60).as("g"))
        .groupBy($"bcontig", $"blk").agg(min($"g").as("gq_b"))
        .select($"bcontig", ($"blk" * 200 + 1).as("sb"),
          ($"blk" * 200 + 200).as("eb"), $"gq_b")
      val ab = a.withColumn("bin", explode(expr("sequence((sa - 1) div 250, (ea - 1) div 250)")))
      val bb = b.withColumn("vbin", explode(expr("sequence((sb - 1) div 250, (eb - 1) div 250)")))
      ab.join(bb, $"contig" === $"bcontig" && $"bin" === $"vbin" &&
          $"sa" <= $"eb" && $"sb" <= $"ea" &&
          $"bin" === expr("(greatest(sa, sb) - 1) div 250"))
        .select($"contig", greatest($"sa", $"sb").as("ss"),
          least($"ea", $"eb").as("ee"), least($"gq_a", $"gq_b").as("gq"))
        .groupBy($"contig")
        .agg(count(lit(1)).as("n_segments"),
          sum($"ee" - $"ss" + 1).as("covered_bp"),
          sum(($"ee" - $"ss" + 1) * $"gq").as("gq_bp"))
        .orderBy($"contig")
    },

    // -- Interval MERGE (`bedtools merge` shape): collapse overlapping/
    //    touching intervals per contig into maximal covered runs. A new
    //    run starts where rstart exceeds the CUMULATIVE MAX of all prior
    //    ends (the running max handles contained intervals that a
    //    lag(end) would miss); the run id is the prefix sum of those
    //    starts. Both windows partition on contig, so each sort slice is
    //    one contig's intervals — and contig count grows with the corpus
    //    (more genomes, not denser ones), keeping slices bounded at
    //    100 TB. Ties at equal rstart are order-robust: any tied row
    //    after the first sees a prev_end ≥ its own rstart, so run
    //    boundaries are deterministic at any parallelism.
    "q_interval_merge" -> { (s, d) =>
      import s.implicits._
      val iv = Tables.lineitem(s, d).select(
          concat(lit("chr"), ($"l_orderkey" % 3).cast("string")).as("contig"),
          (($"l_partkey" * 37) % 100000).cast("long").as("rstart"))
        .withColumn("rend", $"rstart" + 150)
        .distinct()
      val wPrev = Window.partitionBy($"contig").orderBy($"rstart")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.partitionBy($"contig").orderBy($"rstart")
        .rowsBetween(Window.unboundedPreceding, 0)
      iv.withColumn("prev_end", max($"rend").over(wPrev))
        .withColumn("newc",
          when($"prev_end".isNull || $"rstart" > $"prev_end", 1L).otherwise(0L))
        .withColumn("cluster", sum($"newc").over(wCum))
        .groupBy($"contig", $"cluster")
        .agg(min($"rstart").as("mstart"), max($"rend").as("mend"))
        .groupBy($"contig")
        .agg(count(lit(1)).as("n_merged"),
          sum($"mend" - $"mstart" + 1).as("covered_bp"),
          max($"mend" - $"mstart" + 1).as("max_len"))
        .orderBy($"contig")
    },

    // -- INTERVAL SUBTRACT (bedtools subtract A \ B): B is first merged
    //    to disjoint blocks with the running-frame pass above, candidate
    //    (A,B) pairs come from a 4 KiB-grid binned equi-join (never A×B),
    //    and each A emits its uncovered pieces via ONE lag() window over
    //    its overlapping blocks (disjoint + sorted, so the previous
    //    block's end is the full covered frontier) plus a per-A tail and
    //    the untouched-A anti-join branch. Per-A fan-out is bounded by
    //    local B density; nothing is quadratic and nothing collects.
    "q_interval_subtract" -> { (s, d) =>
      import s.implicits._
      val a = Tables.orders(s, d).select(
          concat(lit("chr"), ($"o_custkey" % 3).cast("string")).as("contig"),
          (($"o_orderkey" * 97) % 100000).cast("long").as("astart"),
          ((($"o_orderkey" * 97) % 100000) + ($"o_orderkey" % 400) + 50)
            .cast("long").as("aend"))
        .distinct()
      val b0 = Tables.part(s, d).select(
          concat(lit("chr"), ($"p_partkey" % 3).cast("string")).as("contig"),
          (($"p_partkey" * 53) % 100000).cast("long").as("bstart"),
          ((($"p_partkey" * 53) % 100000) + ($"p_partkey" % 37) + 10)
            .cast("long").as("bend"))
        .distinct()
      val wPrev = Window.partitionBy($"contig").orderBy($"bstart")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.partitionBy($"contig").orderBy($"bstart")
        .rowsBetween(Window.unboundedPreceding, 0)
      val bm = b0.withColumn("prev_end", max($"bend").over(wPrev))
        .withColumn("newc",
          when($"prev_end".isNull || $"bstart" > $"prev_end", 1L).otherwise(0L))
        .withColumn("cl", sum($"newc").over(wCum))
        .groupBy($"contig", $"cl")
        .agg(min($"bstart").as("bstart"), max($"bend").as("bend"))
        .select($"contig", $"bstart", $"bend")
      val aBins = a.withColumn("bin",
        explode(expr("sequence(astart div 4096, aend div 4096)")))
      val bBins = bm.withColumn("bin",
        explode(expr("sequence(bstart div 4096, bend div 4096)")))
      val ov = aBins.join(bBins, Seq("contig", "bin"))
        .filter($"astart" <= $"bend" && $"aend" >= $"bstart")
        .select($"contig", $"astart", $"aend", $"bstart", $"bend")
        .distinct()
      val wg = Window.partitionBy($"contig", $"astart", $"aend").orderBy($"bstart")
      val gaps = ov
        .withColumn("gs",
          greatest($"astart", coalesce(lag($"bend", 1).over(wg) + 1, $"astart")))
        .withColumn("ge", least($"bstart" - 1, $"aend"))
        .filter($"gs" <= $"ge")
        .select($"contig", $"gs", $"ge")
      val tails = ov.groupBy($"contig", $"astart", $"aend")
        .agg(max($"bend").as("mbend"))
        .select($"contig", greatest($"astart", $"mbend" + 1).as("gs"),
          $"aend".as("ge"))
        .filter($"gs" <= $"ge")
      val whole = a.join(ov.select($"contig", $"astart", $"aend").distinct(),
          Seq("contig", "astart", "aend"), "left_anti")
        .select($"contig", $"astart".as("gs"), $"aend".as("ge"))
      gaps.unionByName(tails).unionByName(whole)
        .groupBy($"contig")
        .agg(count(lit(1)).as("n_pieces"),
          sum($"ge" - $"gs" + 1).as("bp_left"),
          sum($"gs").as("sum_starts"),
          max($"ge" - $"gs" + 1).as("max_piece"))
        .orderBy($"contig")
    },

    // -- ACTIVITY STREAKS (gaps-and-islands): each user's longest run of
    //    consecutive active DAYS — the engagement metric every product
    //    dashboard carries. The dn − row_number() island key turns
    //    consecutive days into one group with ZERO self-joins; windows
    //    partition per user (scale out over users), and the output is the
    //    bounded best-streak histogram.
    "q_events_streaks" -> { (s, d) =>
      import s.implicits._
      val days = Tables.events(s, d)
        .select($"user_id", to_date($"ts").as("day")).distinct()
        .withColumn("dn", datediff($"day", lit("1970-01-01").cast("date")).cast("long"))
      val w = Window.partitionBy($"user_id").orderBy($"dn")
      days
        .withColumn("grp", $"dn" - row_number().over(w))
        .groupBy($"user_id", $"grp")
        .agg(count(lit(1)).as("len"))
        .groupBy($"user_id")
        .agg(max($"len").as("best_streak"), count(lit(1)).as("n_streaks"))
        .groupBy($"best_streak")
        .agg(count(lit(1)).as("n_users"), sum($"n_streaks").as("sum_streaks"))
        .orderBy($"best_streak")
    },

    // -- EXACT weighted quantiles via the native histogram aggregate
    //    (graft_hist_quantile, a TypedImperativeAggregate): the buffer is
    //    a value→weight map, so map-side combine reduces each partition
    //    to ≤|domain| entries and the shuffle carries bounded histograms,
    //    not rows — exact medians/p90s with ONE small shuffle where a
    //    sort-based percentile shuffles the corpus. Bounded-domain only
    //    (quantized cents here); the aggregate throws past 2²⁰ bins
    //    rather than OOM. Same rows also probed price-WEIGHTED.
    "q_hist_quantiles" -> { (s, d) =>
      import s.implicits._
      graft.functions.HistQuantileAgg.register(s)
      Tables.lineitem(s, d)
        .select($"l_returnflag",
          cents($"l_quantity").as("qty_c"), cents($"l_extendedprice").as("price_c"))
        .groupBy($"l_returnflag")
        .agg(expr("graft_hist_quantile(qty_c, 1, 500)").as("median_qty_c"),
          expr("graft_hist_quantile(qty_c, 1, 900)").as("p90_qty_c"),
          expr("graft_hist_quantile(qty_c, price_c, 500)").as("wmedian_qty_c"))
        .orderBy($"l_returnflag")
    },

    // -- CDC apply (MERGE INTO … WHEN MATCHED / NOT MATCHED semantics):
    //    a change set (deletes, balance updates, inserts under fresh
    //    keys) applied to the customer base as ONE full-outer join on
    //    the key — the scalable merge shape: both sides co-shuffle on
    //    custkey once, the apply is a projection, and nothing ever
    //    collects to the driver. Deletes drop, matched updates take the
    //    change's balance, unmatched changes insert under a NEW segment,
    //    untouched base rows pass through.
    "q_cdc_upsert" -> { (s, d) =>
      import s.implicits._
      val base = Tables.customer(s, d)
        .select($"c_custkey", $"c_mktsegment", cents($"c_acctbal").as("bal_c"))
      val chg = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
        .groupBy($"o_custkey")
        .agg(sum(cents($"o_totalprice")).as("chg_bal_c"))
        .select(
          when($"o_custkey" % 5 === 4, $"o_custkey" + 10000000L)
            .otherwise($"o_custkey").as("k"),
          when($"o_custkey" % 4 === 0, lit("D")).otherwise(lit("U")).as("op"),
          $"chg_bal_c")
      base.join(chg, $"c_custkey" === $"k", "full_outer")
        // deletes drop whether matched or absent (no-op); base-only rows
        // carry a NULL op and MUST survive — hence the null-safe test
        .filter($"op".isNull || $"op" =!= "D")
        .select(
          coalesce($"c_mktsegment", lit("NEW")).as("segment"),
          when($"op" === "U", $"chg_bal_c").otherwise($"bal_c").as("new_bal_c"))
        .groupBy($"segment")
        .agg(count(lit(1)).as("n_rows"), sum($"new_bal_c").as("total_bal_c"))
        .orderBy($"segment")
    },

    // -- National market share (TPC-H Q8 shape): one brand's ppm share of
    //    ASIA-customer revenue per year, through a SIX-table join — the
    //    deepest join tree in the roster. region/nation broadcast; the
    //    target brand is itself a broadcast scalar (MIN(p_brand), so the
    //    probe exists at every SF); lineitem⋈orders⋈customer and
    //    lineitem⋈part co-shuffle on their natural keys. The share is a
    //    conditional aggregate over ONE pass — no brand-filtered second
    //    scan — and stays in integer ppm.
    "q_brand_market_share" -> { (s, d) =>
      import s.implicits._
      val r = Tables.region(s, d).filter($"r_name" === "ASIA")
      val qb = Tables.part(s, d).agg(min($"p_brand").as("qb"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
        .crossJoin(broadcast(qb))
        .groupBy(year($"o_orderdate").cast("long").as("yr"))
        .agg(
          sum(when($"p_brand" === $"qb",
            cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).otherwise(0L)).as("brand_c"),
          sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("total_c"))
        .select($"yr", $"brand_c", $"total_c",
          expr("brand_c * 1000000 div total_c").as("share_ppm"))
        .orderBy($"yr")
    },

    // -- Session-stats quantiles: 30-minute-gap sessionization (the
    //    q_events_sessions machinery) rolled into EXACT p50/p90 of
    //    events-per-session and session length, via the native histogram
    //    aggregate — whose optimizer rule fuses the two per-column
    //    quantiles into one shared buffer each. Sessions aggregate on
    //    (user_id, sid) — the same shuffle domain the sessionization
    //    window already established — and the final rollup ships two
    //    bounded histograms, not the session table.
    "q_session_quantiles" -> { (s, d) =>
      import s.implicits._
      graft.functions.HistQuantileAgg.register(s)
      val ev = Tables.events(s, d)
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
      ev
        .withColumn("prev_ms", lag($"ms", 1).over(w))
        .withColumn("ns",
          when($"prev_ms".isNull || $"ms" - $"prev_ms" > 1800000L, 1L).otherwise(0L))
        .withColumn("sid", sum($"ns").over(wCum))
        .groupBy($"user_id", $"sid")
        .agg(count(lit(1)).as("n_ev"),
          expr("(max(ms) - min(ms)) div 1000").as("len_s"))
        .agg(count(lit(1)).as("n_sessions"),
          expr("graft_hist_quantile(n_ev, 1, 500)").as("p50_events"),
          expr("graft_hist_quantile(n_ev, 1, 900)").as("p90_events"),
          expr("graft_hist_quantile(len_s, 1, 500)").as("p50_len_s"),
          expr("graft_hist_quantile(len_s, 1, 900)").as("p90_len_s"))
    },

    // -- Market-basket affinity (association-rules lift): brand pairs
    //    that co-occur in orders more than independence predicts. Pair
    //    generation is ORDER-LOCAL (self-join inside the orderkey group,
    //    bounded by distinct brands per order); supports and totals are
    //    broadcast-sized rollups (brand domain ≤ 25). The ppm lift stays
    //    in Long-safe order: (n_ab·10⁶ div n_a) ≤ 10⁶ BEFORE multiplying
    //    by the order count — n_ab·N·10⁶ would overflow at corpus scale.
    "q_brand_affinity" -> { (s, d) =>
      import s.implicits._
      val ob = Tables.lineitem(s, d)
        .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey".as("ok"), $"p_brand".as("b")).distinct()
      val n = ob.select($"ok").distinct().count()
      val support = ob.groupBy($"b").agg(count(lit(1)).as("n_b"))
      val pairs = ob.as("x").join(ob.as("y"), $"x.ok" === $"y.ok" && $"x.b" < $"y.b")
        .groupBy($"x.b".as("ba"), $"y.b".as("bb"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(support.select($"b".as("sa"), $"n_b".as("n_a"))), $"ba" === $"sa")
        .join(broadcast(support.select($"b".as("sb"), $"n_b".as("n_bb"))), $"bb" === $"sb")
        .filter($"n_ab" >= 50)
        .select($"ba", $"bb", $"n_ab",
          expr(s"((n_ab * 1000000 div n_a) * ${n}L) div n_bb").as("lift_ppm"))
        .orderBy($"lift_ppm".desc, $"ba", $"bb")
        .limit(15)
    },

    // -- CUBE: all four grouping sets over (returnflag, linestatus) in
    //    ONE pass — Catalyst's Expand emits each row once per grouping
    //    set before a single shuffle on the tiny key space, so the cube
    //    costs one corpus scan, not four.
    "q_cube_sales" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_items"), sum(cents($"l_extendedprice")).as("price_c"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n_items", $"price_c")
        .orderBy($"returnflag", $"linestatus")
    },

    // -- TPC-H Q6 shape: pure scan-aggregate. Zero joins, zero wide
    //    dependencies — every filter reaches the parquet scan as a
    //    PushedFilter and only three columns are read. At 100 TB this is
    //    the query whose cost is entirely I/O: row groups outside the
    //    shipdate range never leave disk (min/max stats).
    "q_filtered_revenue" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          cents($"l_discount").between(5L, 7L) && $"l_quantity" < 24)
        .agg(sum(cents($"l_extendedprice" * $"l_discount")).as("revenue_c"),
          count(lit(1)).as("n_lines"))
    },

    // -- TPC-H Q7 shape: volume shipping between a nation PAIR. The two
    //    nation lookups are filtered to the pair BEFORE the broadcast
    //    joins, so they act as early row filters on supplier/customer —
    //    the fact table only shuffles for the two key joins it genuinely
    //    needs (orderkey, then custkey via orders).
    "q_nation_volume" -> { (s, d) =>
      import s.implicits._
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = Tables.nation(s, d).filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("nk1"), $"n_name".as("supp_nation"))
      val n2 = Tables.nation(s, d).filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("nk2"), $"n_name".as("cust_nation"))
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(n1), $"s_nationkey" === $"nk1")
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(n2), $"c_nationkey" === $"nk2")
        .filter($"supp_nation" =!= $"cust_nation")
        .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").cast("long").as("yr"))
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("volume_c"))
        .orderBy($"supp_nation", $"cust_nation", $"yr")
    },

    // -- TPC-H Q9 shape (adapted: no partsupp table, so p_retailprice is
    //    the unit-cost proxy): profit by supplier nation × order year for
    //    parts matching a name substring. The part filter prunes BEFORE
    //    the partkey shuffle join; profit stays in exact integer cents.
    "q_product_profit" -> { (s, d) =>
      import s.implicits._
      val p = Tables.part(s, d).filter($"p_name".contains("gear"))
        .select($"p_partkey", $"p_retailprice")
      Tables.lineitem(s, d)
        .join(p, $"l_partkey" === $"p_partkey")
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("long").as("yr"))
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount")) -
          cents($"p_retailprice" * $"l_quantity")).as("profit_c"))
        .orderBy($"nation", $"yr".desc)
    },

    // -- TPC-H Q10 shape: returned-item revenue per customer for one
    //    quarter, top 20. The quarter filter cuts orders before the join;
    //    returnflag cuts lineitem at the scan; the top-k is TakeOrdered
    //    (no global sort materialization).
    "q_returned_top_customers" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      Tables.lineitem(s, d).filter($"l_returnflag" === "R")
        .join(o, $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name".as("nation"))
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"))
        .orderBy($"revenue_c".desc, $"c_custkey")
        .limit(20)
    },

    // -- TPC-H Q14 shape: promo revenue share for one month — conditional
    //    aggregation over a partkey join, share computed in exact ppm
    //    (integer division; numerator bounded promo_c ≤ total_c so the
    //    ×10⁶ stays Long-safe far past corpus scale).
    "q_promo_share" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1997-09-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-10-01").cast("timestamp"))
        .join(Tables.part(s, d).select($"p_partkey", $"p_type"),
          $"l_partkey" === $"p_partkey")
        .agg(
          sum(when($"p_type" === "PROMO",
            cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).otherwise(0L)).as("promo_c"),
          sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("total_c"))
        .select($"promo_c", $"total_c",
          expr("promo_c * 1000000 div total_c").as("promo_ppm"))
    },

    // -- TPC-H Q15 shape: top supplier(s) by quarterly revenue, ties kept.
    //    The fact table is scanned ONCE: the scalar max rides a global
    //    window OVER THE PER-SUPPLIER AGGREGATE (supplier-cardinality rows,
    //    never the corpus — a broadcast-probe formulation re-scans lineitem
    //    because Spark shares no uncached subplan), and only the surviving
    //    row(s) join supplier for names.
    "q_top_supplier" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("total_rev_c"))
      val top = rev
        // unpartitioned by design: input is the per-supplier aggregate —
        // supplier-dimension-sized, never the corpus (PlanHygieneSpec
        // allowlist: q_top_supplier)
        .withColumn("mx", max($"total_rev_c").over(
          Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter($"total_rev_c" === $"mx")
      Tables.supplier(s, d)
        .join(broadcast(top), $"s_suppkey" === $"l_suppkey")
        .select($"s_suppkey", $"s_name", $"total_rev_c")
        .orderBy($"s_suppkey")
    },

    // -- TPC-H Q19 shape: disjunctive predicate join. Catalyst extracts
    //    the common equi-key (partkey) for the join and keeps the OR of
    //    (brand, size, quantity) bands as a join residual — one shuffle
    //    join, never a nested-loop — while the per-side conjuncts that
    //    can be hoisted (quantity ≤ 30, brand IN set via constraint
    //    propagation) prune at the scans.
    "q_disjunctive_join" -> { (s, d) =>
      import s.implicits._
      val p = Tables.part(s, d).select($"p_partkey", $"p_brand", $"p_size")
      val cond = $"l_partkey" === $"p_partkey" && (
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 20) &&
          $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#14" && $"p_size".between(1, 25) &&
          $"l_quantity".between(20, 30)))
      Tables.lineitem(s, d)
        .join(p, cond)
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"),
          count(lit(1)).as("n_lines"))
    },

    // -- TPC-H Q16 shape (s_acctbal < 0 stands in for the complaint
    //    exclusion; no partsupp, so supply pairs come from lineitem):
    //    distinct-supplier variety per part attribute triple. The bad-
    //    supplier set is tiny → broadcast ANTI join (never a shuffle);
    //    the (part,supp) pairs are deduped BEFORE the count-distinct so
    //    the wide shuffle carries each pair once, not once per line.
    "q_part_supplier_variety" -> { (s, d) =>
      import s.implicits._
      val p = Tables.part(s, d)
        .filter($"p_brand" =!= "Brand#45" && !$"p_type".startsWith("MEDIUM") &&
          $"p_size".isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
      val bad = Tables.supplier(s, d).filter($"s_acctbal" < 2000).select($"s_suppkey")
      val pairs = Tables.lineitem(s, d)
        .select($"l_partkey", $"l_suppkey").distinct()
        .join(broadcast(bad), $"l_suppkey" === bad("s_suppkey"), "left_anti")
      pairs.join(p, $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    },

    // -- TPC-H Q2 shape (lineitem supply lines stand in for partsupp):
    //    cheapest supplier(s) PER PART for a size/type slice — the
    //    per-group argmin with TIES KEPT, so it's the aggregate+join-back
    //    formulation (a max_by/WindowGroupLimit would drop tied
    //    suppliers). Both aggregates and the join-back shuffle on
    //    partkey-rooted keys; the part filter prunes before any of them;
    //    supplier/nation ride in as broadcasts.
    "q_min_cost_supplier" -> { (s, d) =>
      import s.implicits._
      val p = Tables.part(s, d)
        .filter($"p_size" === 15)
        .select($"p_partkey", $"p_retailprice")
      val supply = Tables.lineitem(s, d)
        .join(broadcast(p), $"l_partkey" === $"p_partkey")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min(cents($"l_extendedprice" / $"l_quantity")).as("cost_c"))
      val best = supply.groupBy($"l_partkey".as("bp"))
        .agg(min($"cost_c").as("best_c"))
      supply
        .join(best, $"l_partkey" === $"bp" && $"cost_c" === $"best_c")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .select($"l_partkey".as("partkey"), $"l_suppkey".as("suppkey"),
          $"s_name", $"n_name".as("nation"), $"cost_c")
        .orderBy($"partkey", $"suppkey")
    },

    // -- TPC-H Q20 shape (lineitem stands in for partsupp availability):
    //    suppliers who shipped an excess quantity of name-matched parts
    //    in one year. The correlated "half of yearly demand" subquery is
    //    decorrelated into one (partkey, suppkey) aggregate; the name-
    //    filtered part set prunes before that shuffle; the surviving
    //    supplier keys are a LEFT SEMI probe into supplier (no row
    //    duplication), with nation broadcast for the name.
    "q_excess_stock_suppliers" -> { (s, d) =>
      import s.implicits._
      val p = Tables.part(s, d).filter($"p_name".contains("gear"))
        .select($"p_partkey")
      val shipped = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .join(p, $"l_partkey" === $"p_partkey")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(sum($"l_quantity").as("qty"))
        .filter($"qty" > 60)
        .select($"l_suppkey").distinct()
      Tables.supplier(s, d)
        .join(shipped, $"s_suppkey" === $"l_suppkey", "left_semi")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"n_name".as("nation"))
        .orderBy($"s_suppkey")
    }
  )

  def oracles: Map[String, String] = Map(
    "q_events_gapfill" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM events WHERE value > 80 GROUP BY 1, 2),
        |span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1),
        |spine AS (SELECT event_type,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span),
        |j AS (SELECT s.event_type, s.h, rev_c,
        |    CAST(epoch(s.h) AS BIGINT) // 3600 AS hh
        |  FROM spine s LEFT JOIN hourly USING (event_type, h)),
        |w AS (SELECT *,
        |    LAST_VALUE(rev_c IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY h ROWS UNBOUNDED PRECEDING) AS pv,
        |    LAST_VALUE(CASE WHEN rev_c IS NOT NULL THEN hh END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY h ROWS UNBOUNDED PRECEDING) AS ph,
        |    FIRST_VALUE(rev_c IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY h
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    FIRST_VALUE(CASE WHEN rev_c IS NOT NULL THEN hh END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY h
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j)
        |SELECT event_type, hh,
        |  CAST(CASE WHEN rev_c IS NOT NULL THEN rev_c
        |       WHEN ph IS NULL THEN nv
        |       WHEN nh IS NULL THEN pv
        |       ELSE pv + CAST(FLOOR((nv - pv) * (hh - ph) / (nh - ph)) AS BIGINT)
        |  END AS BIGINT) AS filled_c,
        |  rev_c IS NULL AS is_gap
        |FROM w ORDER BY event_type, hh""".stripMargin,
    "q_min_cost_supplier" ->
      """WITH supply AS (SELECT l_partkey, l_suppkey,
        |    CAST(MIN(CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT)) AS BIGINT)
        |      AS cost_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 15
        |  GROUP BY 1, 2),
        |best AS (SELECT l_partkey AS bp, MIN(cost_c) AS best_c FROM supply GROUP BY 1)
        |SELECT l_partkey AS partkey, l_suppkey AS suppkey, s_name,
        |  n_name AS nation, cost_c
        |FROM supply
        |JOIN best ON l_partkey = bp AND cost_c = best_c
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY partkey, suppkey""".stripMargin,
    "q_part_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_excess_stock_suppliers" ->
      """SELECT s_suppkey, s_name, n_name AS nation
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%gear%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_partkey, l_suppkey
        |  HAVING SUM(l_quantity) > 60)
        |ORDER BY s_suppkey""".stripMargin,
    "q_filtered_revenue" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT)
        |    AS revenue_c,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "q_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT)
        |    AS volume_c
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)
        |         - CAST(ROUND(p_retailprice*l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS profit_c
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
    "q_returned_top_customers" ->
      """SELECT c_custkey, c_name, n_name AS nation,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT)
        |    AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin,
    "q_promo_share" ->
      """WITH m AS (SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS promo_c,
        |    CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT)
        |      AS total_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01')
        |SELECT promo_c, total_c,
        |  CAST(promo_c * 1000000 // total_c AS BIGINT) AS promo_ppm
        |FROM m""".stripMargin,
    "q_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT)
        |      AS total_rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_c
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_disjunctive_join" ->
      """SELECT
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT)
        |    AS revenue_c,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_rollup_region_priority" ->
      """SELECT COALESCE(r_name, 'ALL') AS region,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(r_name, o_orderpriority) AS BIGINT) AS gid,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, o_orderpriority)
        |ORDER BY gid, region, priority""".stripMargin,
    "q_returned_orders_semijoin" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_small_qty_items" ->
      """WITH pp AS (SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_c
        |FROM lineitem
        |JOIN pp ON l_partkey = pk
        |JOIN part ON l_partkey = p_partkey
        |WHERE CAST(ROUND(l_quantity*100) AS BIGINT) * 5 * cnt < sum_qty_c
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_set_ops" ->
      """WITH h1 AS (SELECT DISTINCT l_suppkey FROM lineitem
        |  WHERE l_shipdate < TIMESTAMP '1998-01-01'),
        |h2 AS (SELECT DISTINCT l_suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01')
        |SELECT
        |  (SELECT COUNT(*) FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)) AS n_both,
        |  (SELECT COUNT(*) FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)) AS n_h1_only,
        |  (SELECT COUNT(*) FROM (SELECT * FROM h2 EXCEPT SELECT * FROM h1)) AS n_h2_only""".stripMargin,
    "q_sql_interface" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'A'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_supplier_share" ->
      """WITH rev AS (SELECT l_suppkey AS suppkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT s_nationkey, suppkey, rev_c,
        |    CAST(SUM(rev_c) OVER (PARTITION BY s_nationkey) AS BIGINT) AS nation_c
        |  FROM rev JOIN supplier ON suppkey = s_suppkey)
        |SELECT s_nationkey, suppkey, rev_c, nation_c,
        |  rev_c * 1000000 // nation_c AS share_ppm
        |FROM j WHERE rev_c * 1000000 // nation_c >= 60000
        |ORDER BY s_nationkey, suppkey""".stripMargin,
    "q_pagerank" -> {
      def iter(prev: String, k: Int): String =
        s"""inc$k AS (SELECT e.dst, SUM(r.r // o.deg) AS inc
           |  FROM edges e JOIN outdeg o ON e.src = o.src
           |  JOIN $prev r ON e.src = r.id GROUP BY e.dst),
           |it$k AS (SELECT n.id, 150 + (850 * COALESCE(i.inc, 0)) // 1000 AS r
           |  FROM nodes n LEFT JOIN inc$k i ON n.id = i.dst)""".stripMargin
      s"""WITH rel AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, p AS dst FROM rel
         |  UNION ALL SELECT p AS src, c AS dst FROM rel),
         |outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |it0 AS (SELECT id, 1000 AS r FROM nodes),
         |${iter("it0", 1)},
         |${iter("it1", 2)},
         |${iter("it2", 3)}
         |SELECT CAST(id AS BIGINT) AS id, CAST(r AS BIGINT) AS rank_milli
         |FROM it3 ORDER BY r DESC, id LIMIT 20""".stripMargin
    },
    "q_order_deciles" ->
      """WITH o AS (SELECT o_orderpriority,
        |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS c, o_orderkey
        |  FROM orders),
        |t AS (SELECT o_orderpriority, c,
        |    CAST(NTILE(10) OVER (PARTITION BY o_orderpriority
        |      ORDER BY c, o_orderkey) AS BIGINT) AS decile
        |  FROM o)
        |SELECT o_orderpriority, decile, COUNT(*) AS n_orders,
        |  CAST(SUM(c) AS BIGINT) AS total_c, CAST(MAX(c) AS BIGINT) AS max_c
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_daily_moving_revenue" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dayno,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS day_c
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT dayno, n_orders, day_c,
        |    CAST(SUM(day_c) OVER (ORDER BY dayno
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS ma7_c,
        |    CAST(SUM(n_orders) OVER (ORDER BY dayno
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS ma7_orders
        |  FROM daily)
        |SELECT strftime(DATE '1970-01-01' + dayno * INTERVAL 1 DAY, '%Y-%m-%d') AS day,
        |  n_orders, day_c, ma7_c, ma7_orders, ma7_c // ma7_orders AS avg_order_ma7_c
        |FROM w ORDER BY day""".stripMargin,
    "q_profile_hll" ->
      """WITH h AS (SELECT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h % 256 AS bucket,
        |    CASE WHEN h // 256 = 0 THEN 25
        |         ELSE 25 - length(bin(h // 256)) END AS rank
        |  FROM h),
        |regs AS (SELECT event_type, bucket, MAX(rank) AS r
        |  FROM r GROUP BY event_type, bucket),
        |agg AS (SELECT event_type,
        |    SUM(CAST(1 AS BIGINT) << (25 - r)) AS s_present,
        |    COUNT(*) AS nb
        |  FROM regs GROUP BY event_type)
        |SELECT event_type, nb,
        |  CAST(s_present + (256 - nb) * 33554432 AS BIGINT) AS s_total,
        |  CAST(15861554742296576 // (10042 * (s_present + (256 - nb) * 33554432)) AS BIGINT) AS hll_raw_e
        |FROM agg ORDER BY event_type""".stripMargin,
    "q_profile_quantiles" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(ROUND(value*100) AS BIGINT) // 100 AS bucket FROM events),
        |hist AS (SELECT event_type, bucket, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |cum AS (SELECT event_type, bucket, c, SUM(c) OVER (PARTITION BY event_type
        |    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist),
        |tot AS (SELECT event_type, SUM(c) AS n FROM hist GROUP BY 1),
        |p50 AS (SELECT cum.event_type, MIN(bucket) AS p50_dollar
        |  FROM cum JOIN tot USING (event_type) WHERE cum*2 >= n GROUP BY 1),
        |p95 AS (SELECT cum.event_type, MIN(bucket) AS p95_dollar
        |  FROM cum JOIN tot USING (event_type) WHERE cum*20 >= n*19 GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n, p50_dollar, p95_dollar
        |FROM p50 JOIN p95 USING (event_type) JOIN tot USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q_events_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |v AS (SELECT user_id, ms AS vms FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, ms AS pms
        |  FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, COUNT(*) AS n_views,
        |  MIN(v.vms) AS first_view_ms, MAX(v.vms) AS last_view_ms
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND v.vms <= p.pms AND v.vms >= p.pms - 3600000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_pathing" ->
      """WITH n AS (SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, COUNT(*) AS n FROM n
        |WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_layout_zorder" -> {
      val zTerms = (0 until 16).map(i =>
        s"((x & ${1L << i}) << $i) + ((y & ${1L << i}) << ${i + 1})").mkString(" + ")
      s"""WITH src AS (SELECT (l_partkey * 40503) % 65536 AS x,
         |    (l_suppkey * 30011) % 65536 AS y FROM lineitem),
         |z AS (SELECT x, y, ($zTerms) >> 22 AS zbucket FROM src)
         |SELECT zbucket, COUNT(*) AS n,
         |  MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
         |  MAX(x) - MIN(x) AS x_span, MAX(y) - MIN(y) AS y_span
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q_profile_cms" ->
      """WITH ev AS (SELECT user_id FROM events),
        |cells AS (SELECT user_id, j,
        |    CAST('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 1024 AS cell
        |  FROM ev, UNNEST(range(0, 4)) AS u(j)),
        |sketch AS (SELECT j AS row, cell, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
        |top AS (SELECT user_id, COUNT(*) AS exact_n FROM ev GROUP BY 1
        |  ORDER BY exact_n DESC, user_id LIMIT 20),
        |probes AS (SELECT t.user_id, t.exact_n, j AS row,
        |    CAST('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || '|' || CAST(t.user_id AS VARCHAR)), 1, 15) AS BIGINT) % 1024 AS cell
        |  FROM top t, UNNEST(range(0, 4)) AS u(j)),
        |est AS (SELECT p.user_id, p.exact_n, MIN(COALESCE(s.cnt, 0)) AS cms_n
        |  FROM probes p LEFT JOIN sketch s ON p.row = s.row AND p.cell = s.cell
        |  GROUP BY 1, 2)
        |SELECT user_id, exact_n, CAST(cms_n AS BIGINT) AS cms_n,
        |  CAST(cms_n - exact_n AS BIGINT) AS overcount
        |FROM est ORDER BY user_id""".stripMargin,
    "q_events_spikes" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |    COUNT(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, hour, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS prev_sum,
        |    COUNT(n) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS prev_cnt
        |  FROM hourly)
        |SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
        |  CAST(n AS BIGINT) AS n, CAST(prev_sum AS BIGINT) AS prev_sum
        |FROM r WHERE prev_cnt = 24 AND n * prev_cnt * 2 >= prev_sum * 3
        |ORDER BY event_type, hour""".stripMargin,
    "q_events_latest" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(ROUND(value*100) AS BIGINT) AS value_c
        |FROM (SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_skew_salted_join" ->
      """SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT) * length(d.event_type)) AS BIGINT) AS weighted_c
        |FROM events e JOIN (SELECT DISTINCT event_type FROM events) d
        |  ON e.event_type = d.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dpp_join" ->
      """WITH f AS (SELECT month(l_shipdate) AS ship_month, l_extendedprice FROM lineitem),
        |dim AS (SELECT n_nationkey % 12 + 1 AS m, n_name FROM nation WHERE n_regionkey = 1)
        |SELECT n_name, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_c
        |FROM f JOIN dim ON ship_month = m
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_partition_prune" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang = 'en' GROUP BY source ORDER BY source""".stripMargin,
    "q_compact_roundtrip" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY revenue_c DESC, n_name""".stripMargin,
    "q_top_orders_per_customer" ->
      """SELECT o_custkey, rk, o_orderkey, totalprice_c FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_customers_without_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q_active_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey
        |  AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY s_suppkey""".stripMargin,
    "q_priority_rollup" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,
    "q_distinct_parts_per_supplier" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_repeat_customers" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "q_interval_coverage" ->
      """WITH reads AS (
        |  SELECT 'chr' || CAST(l_orderkey % 3 AS VARCHAR) AS contig,
        |    (l_partkey * 37) % 100000 AS rstart,
        |    (l_partkey * 37) % 100000 + 150 AS rend
        |  FROM lineitem),
        |bins AS (
        |  SELECT 'chr' || CAST(n_nationkey % 3 AS VARCHAR) AS icontig,
        |    CAST(n_nationkey AS BIGINT) * 4000 AS istart,
        |    CAST(n_nationkey AS BIGINT) * 4000 + 3999 AS iend
        |  FROM nation)
        |SELECT icontig, istart, iend, COUNT(*) AS depth
        |FROM reads JOIN bins ON contig = icontig AND rstart <= iend AND rend >= istart
        |GROUP BY 1, 2, 3 ORDER BY icontig, istart""".stripMargin,

    // the oracle states the SEMANTICS (plain overlap join — DuckDB's IEJoin
    // handles it); the Spark side is graded on reaching the same result
    // through the binned equi-join shape
    "q_interval_join_binned" ->
      """WITH nc AS (SELECT GREATEST(3, COUNT(*) // 20000) AS nc FROM lineitem),
        |reads AS (
        |  SELECT 'chr' || CAST(l_orderkey % nc AS VARCHAR) AS contig,
        |    (l_partkey * 37) % 100000 AS rstart,
        |    (l_partkey * 37) % 100000 + 150 AS rend
        |  FROM lineitem, nc),
        |vars AS (
        |  SELECT 'chr' || CAST(o_orderkey % nc AS VARCHAR) AS vcontig,
        |    (o_custkey * 53) % 100000 AS vstart,
        |    (o_custkey * 53) % 100000 + 30 AS vend
        |  FROM orders, nc)
        |SELECT contig, COUNT(*) AS n_pairs,
        |  CAST(SUM(rstart) AS BIGINT) AS sum_rstart,
        |  CAST(SUM(vstart) AS BIGINT) AS sum_vstart
        |FROM reads JOIN vars ON contig = vcontig AND rstart <= vend AND rend >= vstart
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_events_sessions" ->
      """SELECT user_id,
        |  CAST(SUM(new_session) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM (
        |    SELECT user_id, ts,
        |      LAG(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        |    FROM events) t1) t2
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_events_asof" ->
      """WITH views AS (
        |  SELECT user_id, ts, MAX(CAST(ROUND(value*100) AS BIGINT)) AS v_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |purch AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.user_id, p.ts AS pts, v.ts AS vts, v.v_value
        |  FROM purch p ASOF LEFT JOIN views v
        |    ON p.user_id = v.user_id AND p.ts >= v.ts)
        |SELECT user_id, COUNT(*) AS n_purchases,
        |  COUNT(v_value) AS n_attributed,
        |  CAST(SUM(v_value) AS BIGINT) AS sum_view_value,
        |  CAST(SUM(epoch_us(pts) - epoch_us(vts)) AS BIGINT) AS sum_lag_us
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |v AS (SELECT user_id, MIN(ms) AS t_view_ms FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ms) AS t_click_ms FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ms > v.t_view_ms GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ms) AS t_purchase_ms FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ms > c.t_click_ms GROUP BY 1)
        |SELECT v.user_id, v.t_view_ms, c.t_click_ms, p.t_purchase_ms,
        |  p.t_purchase_ms - v.t_view_ms AS conv_ms
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_events_dau" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |ud AS (SELECT DISTINCT user_id, day FROM ev),
        |w AS (SELECT user_id, CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |        CAST(day AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS w_day FROM ud),
        |wau AS (SELECT w_day, COUNT(DISTINCT user_id) AS wau FROM w GROUP BY 1),
        |daily AS (SELECT day, COUNT(DISTINCT user_id) AS dau, COUNT(*) AS n_events FROM ev GROUP BY 1)
        |SELECT strftime(daily.day, '%Y-%m-%d') AS day, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
        |  CAST(dau * 1000 // wau AS BIGINT) AS stickiness_milli
        |FROM daily JOIN wau ON daily.day = wau.w_day ORDER BY day""".stripMargin,

    "q_events_retention" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |coh AS (SELECT user_id, MIN(wk) AS cwk FROM ev GROUP BY 1)
        |SELECT strftime(coh.cwk, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', coh.cwk, ev.wk) / 7 AS BIGINT) AS weeks_since,
        |  COUNT(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN coh USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_type_pivot" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cols = types.map { t =>
        s"""|  CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS ${t}_n,
            |  CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS ${t}_v_c""".stripMargin
      }.mkString(",\n")
      s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |$cols
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_late_priority_orders" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o.o_orderkey
        |                AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cust_order_distribution" ->
      """WITH pc AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders
        |            WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
        |SELECT COALESCE(pc.cnt, 0) AS c_count, COUNT(*) AS custdist
        |FROM customer c LEFT JOIN pc ON c.c_custkey = pc.o_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_large_orders" ->
      """WITH big AS (SELECT l_orderkey, CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |             FROM lineitem GROUP BY 1 HAVING SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) > 15000)
        |SELECT c_name, o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c, sum_qty_c
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |         JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice_c DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_late_sole_supplier" ->
      """WITH late AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |              WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
        |alls AS (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS all_s FROM lineitem GROUP BY 1),
        |lates AS (SELECT ok AS lok, COUNT(*) AS late_s FROM late GROUP BY 1)
        |SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM late JOIN alls ON ok = l_orderkey
        |          JOIN lates ON ok = lok
        |          JOIN supplier ON sk = s_suppkey
        |WHERE all_s > 1 AND late_s = 1
        |GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,

    "q_lapsed_rich_customers" ->
      """WITH cc AS (SELECT c_custkey, c_mktsegment,
        |              CAST(ROUND(c_acctbal*100) AS BIGINT) AS acct_c FROM customer),
        |pos AS (SELECT * FROM cc WHERE acct_c > 0),
        |t AS (SELECT SUM(acct_c) AS sum_c, COUNT(*) AS cnt FROM pos)
        |SELECT c_mktsegment, COUNT(*) AS n_cust, CAST(SUM(acct_c) AS BIGINT) AS bal_c
        |FROM pos, t
        |WHERE acct_c * cnt > sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = pos.c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_triangle_count" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |               FROM lineitem WHERE l_quantity >= 25),
        |pairs AS (SELECT DISTINCT a.p AS u, b.p AS v
        |          FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p),
        |deg AS (SELECT n, COUNT(*) AS dg
        |        FROM (SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs) GROUP BY 1),
        |e AS (SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v) THEN u ELSE v END AS src,
        |             CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v) THEN v ELSE u END AS dst
        |      FROM pairs JOIN deg du ON u = du.n JOIN deg dv ON v = dv.n),
        |tri AS (SELECT COUNT(*) AS n_triangles
        |        FROM e e1 JOIN e e2 ON e1.dst = e2.src
        |                  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |w AS (SELECT COUNT(*) AS n_nodes, CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
        |ec AS (SELECT COUNT(*) AS n_edges FROM pairs)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  CAST(n_triangles * 3000000 // n_wedges AS BIGINT) AS gcc_ppm
        |FROM w, ec, tri""".stripMargin,

    "q_bfs_levels" ->
      """WITH RECURSIVE rel AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
        |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT c AS src, p AS dst FROM rel UNION ALL SELECT p, c FROM rel),
        |reach(id, lvl) AS (
        |  SELECT s_suppkey + 1000000, 0 FROM supplier WHERE s_nationkey = 0
        |  UNION
        |  SELECT e.dst, r.lvl + 1 FROM reach r JOIN edges e ON r.id = e.src WHERE r.lvl < 4),
        |best AS (SELECT id, MIN(lvl) AS lvl FROM reach GROUP BY 1)
        |SELECT CAST(lvl AS BIGINT) AS lvl, COUNT(*) AS n_nodes
        |FROM best GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_gvcf_combine" ->
      """WITH a0 AS (SELECT 'chr' || CAST(o_orderkey % 3 AS VARCHAR) AS contig,
        |    (o_custkey * 53) % 4000 AS blk, o_orderkey % 60 AS g FROM orders),
        |a1 AS (SELECT contig, blk, MIN(g) AS gq_a FROM a0 GROUP BY contig, blk),
        |a AS (SELECT contig, blk * 250 + 1 AS sa, blk * 250 + 250 AS ea, gq_a FROM a1),
        |b0 AS (SELECT 'chr' || CAST(l_orderkey % 3 AS VARCHAR) AS contig,
        |    (l_partkey * 37) % 5000 AS blk, l_suppkey % 60 AS g FROM lineitem),
        |b1 AS (SELECT contig, blk, MIN(g) AS gq_b FROM b0 GROUP BY contig, blk),
        |b AS (SELECT contig, blk * 200 + 1 AS sb, blk * 200 + 200 AS eb, gq_b FROM b1),
        |j AS (SELECT a.contig, GREATEST(sa, sb) AS ss, LEAST(ea, eb) AS ee,
        |        LEAST(gq_a, gq_b) AS gq
        |      FROM a JOIN b ON a.contig = b.contig AND sa <= eb AND sb <= ea)
        |SELECT contig, COUNT(*) AS n_segments,
        |  CAST(SUM(ee - ss + 1) AS BIGINT) AS covered_bp,
        |  CAST(SUM((ee - ss + 1) * gq) AS BIGINT) AS gq_bp
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_interval_merge" ->
      """WITH iv AS (SELECT DISTINCT 'chr' || CAST(l_orderkey % 3 AS VARCHAR) AS contig,
        |    CAST((l_partkey * 37) % 100000 AS BIGINT) AS rstart,
        |    CAST((l_partkey * 37) % 100000 + 150 AS BIGINT) AS rend FROM lineitem),
        |f AS (SELECT contig, rstart, rend,
        |    MAX(rend) OVER (PARTITION BY contig ORDER BY rstart
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM iv),
        |g AS (SELECT contig, rstart, rend,
        |    CASE WHEN prev_end IS NULL OR rstart > prev_end THEN 1 ELSE 0 END AS newc FROM f),
        |h AS (SELECT contig, rstart, rend,
        |    SUM(newc) OVER (PARTITION BY contig ORDER BY rstart
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster FROM g),
        |m AS (SELECT contig, cluster, MIN(rstart) AS mstart, MAX(rend) AS mend FROM h GROUP BY 1, 2)
        |SELECT contig, COUNT(*) AS n_merged, CAST(SUM(mend - mstart + 1) AS BIGINT) AS covered_bp,
        |  CAST(MAX(mend - mstart + 1) AS BIGINT) AS max_len
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_interval_subtract" ->
      """WITH a AS (SELECT DISTINCT 'chr' || CAST(o_custkey % 3 AS VARCHAR) AS contig,
        |    CAST((o_orderkey * 97) % 100000 AS BIGINT) AS astart,
        |    CAST((o_orderkey * 97) % 100000 + (o_orderkey % 400) + 50 AS BIGINT) AS aend
        |  FROM orders),
        |b0 AS (SELECT DISTINCT 'chr' || CAST(p_partkey % 3 AS VARCHAR) AS contig,
        |    CAST((p_partkey * 53) % 100000 AS BIGINT) AS bstart,
        |    CAST((p_partkey * 53) % 100000 + (p_partkey % 37) + 10 AS BIGINT) AS bend
        |  FROM part),
        |m1 AS (SELECT contig, bstart, bend,
        |    MAX(bend) OVER (PARTITION BY contig ORDER BY bstart
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM b0),
        |m2 AS (SELECT contig, bstart, bend,
        |    SUM(CASE WHEN prev_end IS NULL OR bstart > prev_end THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY contig ORDER BY bstart ROWS UNBOUNDED PRECEDING) AS cl
        |  FROM m1),
        |bm AS (SELECT contig, MIN(bstart) AS bstart, MAX(bend) AS bend
        |  FROM m2 GROUP BY contig, cl),
        |ov AS (SELECT a.contig, a.astart, a.aend, bm.bstart, bm.bend
        |  FROM a JOIN bm ON a.contig = bm.contig
        |    AND a.astart <= bm.bend AND a.aend >= bm.bstart),
        |gaps AS (SELECT contig,
        |    GREATEST(astart, COALESCE(LAG(bend) OVER (
        |      PARTITION BY contig, astart, aend ORDER BY bstart) + 1, astart)) AS gs,
        |    LEAST(bstart - 1, aend) AS ge
        |  FROM ov),
        |tails AS (SELECT contig, GREATEST(astart, MAX(bend) + 1) AS gs, aend AS ge
        |  FROM ov GROUP BY contig, astart, aend),
        |whole AS (SELECT a.contig, astart AS gs, aend AS ge FROM a
        |  WHERE NOT EXISTS (SELECT 1 FROM bm WHERE bm.contig = a.contig
        |    AND a.astart <= bm.bend AND a.aend >= bm.bstart)),
        |pieces AS (
        |  SELECT contig, gs, ge FROM gaps WHERE gs <= ge
        |  UNION ALL SELECT contig, gs, ge FROM tails WHERE gs <= ge
        |  UNION ALL SELECT contig, gs, ge FROM whole)
        |SELECT contig, COUNT(*) AS n_pieces,
        |  CAST(SUM(ge - gs + 1) AS BIGINT) AS bp_left,
        |  CAST(SUM(gs) AS BIGINT) AS sum_starts,
        |  CAST(MAX(ge - gs + 1) AS BIGINT) AS max_piece
        |FROM pieces GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_events_streaks" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |d AS (SELECT user_id,
        |    CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS dn FROM ud),
        |g AS (SELECT user_id, dn,
        |    dn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dn) AS grp FROM d),
        |st AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2),
        |b AS (SELECT user_id, MAX(len) AS best_streak, COUNT(*) AS n_streaks
        |  FROM st GROUP BY 1)
        |SELECT best_streak, COUNT(*) AS n_users,
        |  CAST(SUM(n_streaks) AS BIGINT) AS sum_streaks
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_hist_quantiles" ->
      """WITH h AS (SELECT l_returnflag AS rf, CAST(ROUND(l_quantity*100) AS BIGINT) AS v,
        |    COUNT(*) AS w, CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS pw
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT rf, v,
        |    SUM(w)  OVER (PARTITION BY rf ORDER BY v) AS cw,
        |    SUM(w)  OVER (PARTITION BY rf) AS tw,
        |    SUM(pw) OVER (PARTITION BY rf ORDER BY v) AS cpw,
        |    SUM(pw) OVER (PARTITION BY rf) AS tpw
        |  FROM h)
        |SELECT rf AS l_returnflag,
        |  CAST(MIN(CASE WHEN cw * 1000 >= 500 * tw THEN v END) AS BIGINT) AS median_qty_c,
        |  CAST(MIN(CASE WHEN cw * 1000 >= 900 * tw THEN v END) AS BIGINT) AS p90_qty_c,
        |  CAST(MIN(CASE WHEN cpw * 1000 >= 500 * tpw THEN v END) AS BIGINT) AS wmedian_qty_c
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cdc_upsert" ->
      """WITH base AS (SELECT c_custkey, c_mktsegment,
        |    CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c FROM customer),
        |chg0 AS (SELECT o_custkey,
        |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS chg_bal_c
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY 1),
        |chg AS (SELECT CASE WHEN o_custkey % 5 = 4 THEN o_custkey + 10000000 ELSE o_custkey END AS k,
        |    CASE WHEN o_custkey % 4 = 0 THEN 'D' ELSE 'U' END AS op, chg_bal_c FROM chg0),
        |j AS (SELECT b.c_custkey, b.c_mktsegment, b.bal_c, c.op, c.chg_bal_c
        |      FROM base b FULL OUTER JOIN chg c ON b.c_custkey = c.k)
        |SELECT COALESCE(c_mktsegment, 'NEW') AS segment, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN op = 'U' THEN chg_bal_c ELSE bal_c END) AS BIGINT) AS total_bal_c
        |FROM j WHERE op IS NULL OR op <> 'D'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_brand_market_share" ->
      """WITH rev AS (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, p_brand,
        |    CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS rev_c
        |  FROM lineitem
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |    JOIN part ON l_partkey = p_partkey
        |  WHERE r_name = 'ASIA'),
        |qb AS (SELECT MIN(p_brand) AS qb FROM part)
        |SELECT yr,
        |  CAST(SUM(CASE WHEN p_brand = (SELECT qb FROM qb) THEN rev_c ELSE 0 END) AS BIGINT) AS brand_c,
        |  CAST(SUM(rev_c) AS BIGINT) AS total_c,
        |  CAST(SUM(CASE WHEN p_brand = (SELECT qb FROM qb) THEN rev_c ELSE 0 END) * 1000000
        |    // SUM(rev_c) AS BIGINT) AS share_ppm
        |FROM rev GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_session_quantiles" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |x AS (SELECT user_id, event_id, ms,
        |    LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms FROM ev),
        |y AS (SELECT user_id, event_id, ms,
        |    CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT user_id, ms,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM y),
        |sess AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_ev,
        |    CAST((MAX(ms) - MIN(ms)) // 1000 AS BIGINT) AS len_s FROM z GROUP BY 1, 2),
        |he AS (SELECT n_ev AS v, COUNT(*) AS w FROM sess GROUP BY 1),
        |ce AS (SELECT v, SUM(w) OVER (ORDER BY v) AS cw, (SELECT COUNT(*) FROM sess) AS tw FROM he),
        |hl AS (SELECT len_s AS v, COUNT(*) AS w FROM sess GROUP BY 1),
        |cl AS (SELECT v, SUM(w) OVER (ORDER BY v) AS cw, (SELECT COUNT(*) FROM sess) AS tw FROM hl)
        |SELECT (SELECT COUNT(*) FROM sess) AS n_sessions,
        |  (SELECT CAST(MIN(CASE WHEN cw * 1000 >= 500 * tw THEN v END) AS BIGINT) FROM ce) AS p50_events,
        |  (SELECT CAST(MIN(CASE WHEN cw * 1000 >= 900 * tw THEN v END) AS BIGINT) FROM ce) AS p90_events,
        |  (SELECT CAST(MIN(CASE WHEN cw * 1000 >= 500 * tw THEN v END) AS BIGINT) FROM cl) AS p50_len_s,
        |  (SELECT CAST(MIN(CASE WHEN cw * 1000 >= 900 * tw THEN v END) AS BIGINT) FROM cl) AS p90_len_s""".stripMargin,

    "q_brand_affinity" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |            FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT COUNT(DISTINCT ok) AS nn FROM ob),
        |sup AS (SELECT b, COUNT(*) AS n_b FROM ob GROUP BY 1),
        |pr AS (SELECT x.b AS ba, y.b AS bb, COUNT(*) AS n_ab
        |       FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b GROUP BY 1, 2)
        |SELECT ba, bb, n_ab,
        |  CAST(((n_ab * 1000000 // sa.n_b) * nn) // sb.n_b AS BIGINT) AS lift_ppm
        |FROM pr JOIN sup sa ON ba = sa.b JOIN sup sb ON bb = sb.b, n
        |WHERE n_ab >= 50
        |ORDER BY lift_ppm DESC, ba, bb LIMIT 15""".stripMargin,

    "q_cube_sales" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_c
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin
  )
}
