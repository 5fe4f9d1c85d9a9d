package graft.operators

import graft.{QFn, Tables, Det}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-microstructure composites (round 8, session 5) — the quant
  * staples the intraday bid/ask domain still lacked: a quote
  * (bid/ask/spread/mid) summary, series autocorrelation, rolling
  * beta vs a market series, historical VaR/expected shortfall, and
  * the as-of-enriched trade analytics (effective spread, Lee–Ready
  * trade sign, order-flow imbalance). The shipped `events` table has
  * no real quote sides, so two event-type tick streams stand in for
  * the bid and ask feeds — the PLANS (conditional aggregation onto
  * the bar grain, per-symbol bounded-frame windows over exact-integer
  * moments, native as-of enrichment) are the production shapes
  * regardless of which columns carry the quotes.
  *
  * Cross-engine determinism follows the `ts_anomaly` recipe
  * (TimeSeries.scala): bar averages come from exact DECIMAL sums,
  * quantize to milli-unit integers (`floor(x·1e3)` — value ≤ 560.21
  * in the shipped data, so q ≤ 5.6e5, Σq² over a 24-bar frame
  * ≤ 2.3e14 and every n·Σ product stays ≤ ~1.6e17, far inside Long),
  * moments are exact integer sums, and the final statistic is ONE
  * double expression over those identical integers, floor-quantized
  * via [[graft.Det.fq]] (r9: round()'s tie behavior is engine-
  * specific; floor of an identical double is not).
  *
  * Scale notes: every key is (pre-aggregate onto the bar grain →
  * bounded work per bar). The hourly aggregation is map-side
  * combinable, so 100 TB of ticks reduce to #bars·#symbols rows
  * before any window runs; window partitions are per-symbol series —
  * the per-instrument layout a tick store shards by anyway.
  */
object TimeSeries2 {

  import Det._

  private val bar = date_trunc("hour", col("ts"))

  /** Hourly QUOTE summary — the reference's namesake shape: the
    * 'view' stream stands in for bid quotes and 'purchase' for asks.
    * ONE conditional aggregation onto the bar grain (no join, no
    * second scan): per hour, the average bid and ask, the quoted
    * spread, the midprice, and the relative spread in basis points.
    * Hours quoted on only one side are dropped (no market).
    *
    * All derived columns are INTEGER MICRO-UNITS (price·1e6) built
    * entirely in exact integer arithmetic — `csum2` cents sums, then
    * `div` — because r8's round(<derived double>, 6) variant landed
    * on a representation boundary and hash-diverged from DuckDB
    * (same failure class as the ts_anomaly note, TimeSeries.scala).
    * Sign care: the one signed quotient (spread is negative ~half
    * the bars) is computed as sign·(abs `div` mid), so the result is
    * engine-independent even if one dialect's integer division ever
    * floors instead of truncating (DuckDB's `//` truncates today,
    * matching Spark's `div`, but that's exactly the kind of version
    * detail r8's failure taught us not to lean on). bid/ask/mid
    * numerators are non-negative (value ≥ 0 in the data contract),
    * where trunc == floor unconditionally. */
  val tsBidaskSpread: QFn = (s, d) => {
    val bidv = when(col("event_type") === "view", col("value"))
    val askv = when(col("event_type") === "purchase", col("value"))
    Tables.events(s, d)
      .groupBy(bar.as("bar"))
      .agg(
        csum2(bidv).as("bid_c"), count(bidv).as("n_bid"),
        csum2(askv).as("ask_c"), count(askv).as("n_ask"))
      .filter(col("n_bid") > 0 && col("n_ask") > 0)
      .withColumn("bid_micro", expr("bid_c * 10000 div n_bid"))
      .withColumn("ask_micro", expr("ask_c * 10000 div n_ask"))
      .withColumn("spread_micro", col("ask_micro") - col("bid_micro"))
      .withColumn("mid_micro", expr("(bid_micro + ask_micro) div 2"))
      .select(
        col("bar"), col("bid_micro"), col("ask_micro"),
        col("spread_micro"), col("mid_micro"),
        when(col("mid_micro") > 0,
          when(col("spread_micro") < 0, lit(-1L)).otherwise(lit(1L)) *
            expr("abs(spread_micro) * 1000000 div mid_micro"))
          .as("spread_bps_c"),
        col("n_bid"), col("n_ask"))
      .orderBy("bar")
  }

  /** Lag-1 / lag-2 AUTOCORRELATION of each symbol's hourly series —
    * the mean-reversion diagnostic. Hourly averages quantize to
    * milli-unit integers; each (x_t, x_{t-k}) pair comes from a lag
    * window over the per-symbol series; Pearson r derives from six
    * exact integer sums in one double expression. The lag pairs for
    * both k ride the SAME window pass (two lag columns, then a
    * 2-element explode), so the series shuffles once. */
  val tsAutocorr: QFn = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(bar.as("bar"), col("event_type"))
      .agg(davg2(col("value")).as("px"))
      .withColumn("q", floor(col("px") * 1000.0).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("bar")
    hourly
      .withColumn("y1", lag("q", 1).over(w))
      .withColumn("y2", lag("q", 2).over(w))
      .select(col("event_type"), col("q").as("x"),
        explode(array(
          struct(lit(1).as("lag"), col("y1").as("y")),
          struct(lit(2).as("lag"), col("y2").as("y")))).as("p"))
      .select(col("event_type"), col("p.lag").as("lag"), col("x"), col("p.y").as("y"))
      .filter(col("y").isNotNull)
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("autocorr", fq(
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6))
      .select("event_type", "lag", "n", "autocorr")
      .orderBy("event_type", "lag")
  }

  /** 24-bar ROLLING BETA of each symbol vs the market series (the
    * 'purchase' stream stands in for the index): cov(x,m)/var(m)
    * over a ROWS 23-PRECEDING frame, from exact integer rolling
    * moments. The market's 720-row hourly series broadcasts onto the
    * symbol series (no fact shuffle for the join — at any scale the
    * index series is #bars rows); emitted after a 12-bar warm-up and
    * only where var(m) > 0. purchase-vs-purchase rows are kept as
    * the beta≡1 sanity diagonal. */
  val tsRollingBeta: QFn = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(bar.as("bar"), col("event_type"))
      .agg(davg2(col("value")).as("px"))
      .withColumn("q", floor(col("px") * 1000.0).cast("long"))
    val mkt = hourly.filter(col("event_type") === "purchase")
      .select(col("bar"), col("q").as("m"))
    val w = Window.partitionBy("event_type").orderBy("bar").rowsBetween(-23, 0)
    hourly.join(broadcast(mkt), "bar")
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum("q").over(w))
      .withColumn("sm", sum("m").over(w))
      .withColumn("sxm", sum(col("q") * col("m")).over(w))
      .withColumn("smm", sum(col("m") * col("m")).over(w))
      .filter(col("n") >= 12)
      .withColumn("den", col("n") * col("smm") - col("sm") * col("sm"))
      .filter(col("den") > 0)
      .select(col("bar"), col("event_type"), col("n"),
        fq((col("n") * col("sxm") - col("sx") * col("sm")).cast("double") /
          col("den").cast("double"), 6).as("beta"))
      .orderBy("bar", "event_type")
  }

  /** Historical VaR(95) + EXPECTED SHORTFALL per symbol — the
    * intraday risk tail pair. Returns are integer milli-unit diffs of
    * consecutive hourly bars (no log returns — no transcendental to
    * disagree on); VaR is the EXACT order statistic at rank
    * ⌈0.05·n⌉ (ascending, ties broken by bar so the rank row is
    * unique), ES the exact-integer mean of the returns at or below
    * that rank. Per-symbol rank windows over #bars-row series —
    * bounded state at any tick volume. */
  val tsVarEs: QFn = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(bar.as("bar"), col("event_type"))
      .agg(davg2(col("value")).as("px"))
      .withColumn("q", floor(col("px") * 1000.0).cast("long"))
    val wLag = Window.partitionBy("event_type").orderBy("bar")
    val rets = hourly
      .withColumn("r", col("q") - lag("q", 1).over(wLag))
      .filter(col("r").isNotNull)
    val wRank = Window.partitionBy("event_type").orderBy("r", "bar")
    rets
      .withColumn("rk", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      // ⌈0.05·n⌉ in EXACT integer arithmetic — (n+19) div 20 — not
      // ceil(n * 0.05): the double product was the one expression in
      // this key that wasn't bit-pinned across engines (r8 ADVICE)
      .withColumn("cut", expr("(n + 19) div 20"))
      .filter(col("rk") <= col("cut"))
      .groupBy("event_type")
      .agg(
        max(col("n")).as("n_returns"),
        fq(max(when(col("rk") === col("cut"), col("r"))).cast("double")
          / 1000.0, 3).as("var95"),
        fq((sum("r").cast("double") / count(lit(1))) / 1000.0, 6).as("es95"))
      .orderBy("event_type")
  }

  /** Shared microstructure enrichment: each trade ('click') carries
    * the prevailing quote mid ('view' stream, deduplicated to one
    * quote per (user, ts) — max value — so the as-of match is
    * unambiguous), matched by the native as-of SparkPlan (one merge
    * pass per co-partitioned group — plans/AsOfJoin.scala), plus its
    * size (the JSON `props.k` field) for the flow keys.
    *
    * MATERIALIZED ONCE per dataset content via the IndexStore staged-
    * artifact convention (r8 verdict item 7): a production tick store
    * runs this enrichment in the ingestion pipeline and every
    * downstream analytic (effective spread, trade sign, OFI) reads
    * the enriched table — re-deriving the as-of join per query tripled
    * its cost across the three consumers here and would re-shuffle
    * 100 TB of trades three times in deployment. Columns are longs,
    * a timestamp, and untouched raw doubles, all of which round-trip
    * parquet bit-exactly, so consumers are oracle-identical off
    * either path. */
  /** The declarative enrichment plan itself (public so the plan spec
    * can pin the native AsOfJoinExec node on the BUILD path — the
    * consumers' own plans read the staged parquet). */
  def enrichTrades(s: org.apache.spark.sql.SparkSession,
                   d: String): org.apache.spark.sql.DataFrame = {
    val e = Tables.events(s, d)
    val quotes = e.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("q_uid"), col("ts").as("q_ts"))
      .agg(max("value").as("qv"))
    val trades = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("sz"))
    graft.plans.AsOfJoinPlans
      .asofJoin(trades, quotes, "user_id", "q_uid", "ts", "q_ts", "qv", "mid")
  }

  private def tradesWithMid(s: org.apache.spark.sql.SparkSession, d: String) = {
    val fp = graft.IndexStore.fingerprint(s"$d/events.parquet")
    val path = graft.IndexStore.cachedDir(s"trades_mid_v2_$fp") { tmp =>
      enrichTrades(s, d).write.parquet(tmp)
    }
    s.read.parquet(path)
  }

  /** EFFECTIVE SPREAD per hour — the microstructure measurement that
    * ties the domain together: each enriched trade's deviation from
    * its prevailing mid, 2·|trade − mid|, averages onto the hour
    * grain with exact decimal sums. Trades with no prevailing quote
    * drop (no market yet). This is the flagship composition: custom
    * physical operator feeding a standard declarative aggregate. */
  val tsEffectiveSpread: QFn = (s, d) => {
    tradesWithMid(s, d)
      .filter(col("mid").isNotNull)
      .select(bar.as("bar"), (lit(2.0) * abs(col("value") - col("mid"))).as("es"))
      .groupBy("bar")
      .agg(count(lit(1)).as("n_trades"),
        fq(dsum4(col("es")) / count(lit(1)), 6).as("avg_eff_spread"))
      .orderBy("bar")
  }

  /** Lee–Ready-style TRADE SIGN classification: each enriched trade
    * compares its price to the prevailing mid — above = buyer-
    * initiated, below = seller-initiated, equal = unclassified (the
    * tick-test tie) — counted per hour with the buy share in floor
    * micro-units. Raw doubles compare EXACTLY (price and mid reach
    * the comparison untouched by arithmetic), so the classification
    * is engine-deterministic with no quantization step. */
  val tsTradeSign: QFn = (s, d) => {
    tradesWithMid(s, d)
      .filter(col("mid").isNotNull)
      .groupBy(bar.as("bar"))
      .agg(
        sum(when(col("value") > col("mid"), 1L).otherwise(0L)).as("n_buy"),
        sum(when(col("value") < col("mid"), 1L).otherwise(0L)).as("n_sell"),
        sum(when(col("value") === col("mid"), 1L).otherwise(0L)).as("n_mid"))
      .withColumn("buy_share_q", floor(
        col("n_buy").cast("double") /
          (col("n_buy") + col("n_sell") + col("n_mid")).cast("double") *
          1000000.0).cast("long"))
      .orderBy("bar")
  }

  /** ORDER-FLOW IMBALANCE — signed size flow per hour: each
    * classified trade contributes its size (the JSON `props.k` field,
    * the same stand-in `ts_vwap` uses) to the buy or sell side by its
    * tick sign; OFI = buy − sell size, plus the normalized imbalance
    * in floor micro-units. Sizes are integers, so every sum and the
    * imbalance numerator/denominator are exact; mid-ties contribute
    * to neither side (standard tick-test treatment). Completes the
    * intraday toolkit: quotes → spread → effective spread → trade
    * sign → signed flow. */
  val tsOfi: QFn = (s, d) => {
    tradesWithMid(s, d)
      .filter(col("mid").isNotNull)
      .groupBy(bar.as("bar"))
      .agg(
        sum(when(col("value") > col("mid"), col("sz")).otherwise(0L)).as("buy_size"),
        sum(when(col("value") < col("mid"), col("sz")).otherwise(0L)).as("sell_size"))
      .withColumn("ofi", col("buy_size") - col("sell_size"))
      .withColumn("imbalance_q", when(col("buy_size") + col("sell_size") > 0,
        floor((col("buy_size") - col("sell_size")).cast("double") /
          (col("buy_size") + col("sell_size")).cast("double") *
          1000000.0).cast("long")))
      .orderBy("bar")
  }

  /** Intraday SEASONALITY profile — the volume-smile diagnostic:
    * hour-of-day × symbol tick counts, exact-decimal average value,
    * total size (JSON `props.k`), and each symbol's activity-rank of
    * the hour (1 = busiest; count ties broken by hour). One
    * map-side-combinable aggregation onto the 24×|symbols| grain —
    * at any tick volume the windowed rank runs over ≤ 24 rows per
    * symbol. */
  val tsIntradayProfile: QFn = (s, d) => {
    Tables.events(s, d)
      .groupBy(hour(col("ts")).as("hour_of_day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_ticks"),
        fq(davg2(col("value")), 6).as("avg_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("total_size"))
      .withColumn("activity_rank", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("n_ticks").desc, col("hour_of_day"))))
      .orderBy("hour_of_day", "event_type")
  }

  /** ROLL (1984) IMPLIED SPREAD — the classic estimator that recovers
    * the effective bid/ask spread from trade prices ALONE: bid-ask
    * bounce makes consecutive price changes negatively serially
    * correlated, and spread = 2·√(−cov(Δp_t, Δp_{t−1})). Hourly bars
    * quantize to milli-unit integers (the module recipe), both lag
    * columns ride ONE window pass, the serial covariance derives from
    * four exact integer sums, and the final sqrt is one double
    * expression floor-quantized identically in both engines. A
    * positive serial covariance (momentum regime) yields NULL spread,
    * the standard treatment. Per-symbol series → bounded window
    * partitions at any tick volume. */
  val tsRollSpread: QFn = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(bar.as("bar"), col("event_type"))
      .agg(davg2(col("value")).as("px"))
      .withColumn("q", floor(col("px") * 1000.0).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("bar")
    hourly
      .withColumn("dp", col("q") - lag("q", 1).over(w))
      .withColumn("dp1", lag("dp", 1).over(w))
      .filter(col("dp").isNotNull && col("dp1").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("dp").as("sx"), sum("dp1").as("sy"),
        sum(col("dp") * col("dp1")).as("sxy"))
      .withColumn("cov_num", col("n") * col("sxy") - col("sx") * col("sy"))
      .select(col("event_type"), col("n"),
        // serial covariance in value² units: cov_num/(n(n−1)) is in
        // milli² → /1e6
        fq(col("cov_num").cast("double")
          / (col("n") * (col("n") - 1)).cast("double") / 1e6, 9)
          .as("serial_cov"),
        when(col("cov_num") < 0,
          fq(lit(2.0) * sqrt(-col("cov_num").cast("double")
            / (col("n") * (col("n") - 1)).cast("double")) / 1000.0, 6))
          .as("roll_spread"))
      .orderBy("event_type")
  }

  /** AMIHUD (2002) ILLIQUIDITY — mean |return|/volume, the price-
    * impact-per-traded-size ratio every liquidity study starts from.
    * Per bar: |Δq|/q_prev (integer milli-units) over the bar's total
    * size (exact integer sum of JSON `props.k`) — one double
    * expression over exact integers, floor-quantized at 12 dp so the
    * per-bar terms sum EXACTLY as DECIMAL(30,12) in any reduction
    * order; the published statistic is the per-symbol mean ×1e6.
    * Zero-volume or zero-price bars drop (undefined impact). Same
    * bounded shape as the rest of the module: bar-grain pre-agg →
    * per-symbol series window → O(#bars) rows. */
  val tsAmihud: QFn = (s, d) => {
    val sz = get_json_object(col("props"), "$.k").cast("long")
    val hourly = Tables.events(s, d)
      .groupBy(bar.as("bar"), col("event_type"))
      .agg(davg2(col("value")).as("px"), sum(sz).as("vol"))
      .withColumn("q", floor(col("px") * 1000.0).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("bar")
    hourly
      .withColumn("qp", lag("q", 1).over(w))
      .filter(col("qp").isNotNull && col("qp") > 0 && col("vol") > 0)
      .withColumn("term", fq(abs(col("q") - col("qp")).cast("double")
        / col("qp").cast("double") / col("vol").cast("double"), 12))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_bars"),
        fq(sum(col("term").cast(org.apache.spark.sql.types.DecimalType(30, 12)))
          .cast("double") / count(lit(1)) * 1e6, 6).as("amihud_x1e6"))
      .orderBy("event_type")
  }

  /** TSRV subsample scale K (ticks). The oracle below embeds the same
    * constant via string interpolation, so changing it re-derives both
    * sides (the KmeansIters/BpeMerges precedent). */
  val TsrvK = 5

  /** TWO-SCALE REALIZED VARIANCE (Zhang–Mykland–Aït-Sahalia 2005) —
    * the noise-robust volatility estimator: all-tick realized variance
    * is dominated by microstructure noise (bid/ask bounce adds 2nσ²
    * bias), so TSRV averages the K-spaced subsample RVs and removes
    * the remaining bias with the all-tick RV:
    * TSRV = (1/K)·Σᵢ(pᵢ−pᵢ₋K)² − (n̄/n)·Σᵢ(pᵢ−pᵢ₋₁)², n̄ = (n−K+1)/K.
    * The identity Σₖ RV⁽ᵏ⁾ = Σᵢ(pᵢ−pᵢ₋K)² collapses the K-offset loop
    * into ONE extra lag column, so both scales ride a single window
    * pass per symbol.
    *
    * Determinism: prices quantize to milli-unit integers at the tick
    * (raw 2-decimal values — exact), both squared-diff sums are exact
    * integer aggregates, and the two emitted statistics are single
    * double expressions over those identical integers, floor-
    * quantized ([[graft.Det.fq]] recipe — no transcendental anywhere).
    * Scale: per-symbol series window over the tick stream — the
    * per-instrument shard layout; sums are map-side combinable. */
  val tsTsrv: QFn = (s, d) => {
    val ticks = Tables.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 1000.0).cast("long").as("q"))
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ticks
      .withColumn("d1", col("q") - lag("q", 1).over(w))
      .withColumn("dk", col("q") - lag("q", TsrvK).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("d1") * col("d1")).as("rv_all_m2"),
        sum(col("dk") * col("dk")).as("rv_k_m2"))
      .filter(col("n") > TsrvK)
      .select(col("event_type"), col("n"),
        // milli² → value² units (/1e6); exact-integer operands → fq
        fq(col("rv_all_m2").cast("double") / 1e6, 9).as("rv_all"),
        fq((col("rv_k_m2").cast("double") / lit(TsrvK.toDouble)
          - ((col("n") - TsrvK + 1).cast("double") / lit(TsrvK.toDouble)
            / col("n").cast("double")) * col("rv_all_m2").cast("double"))
          / 1e6, 9).as("tsrv"))
      .orderBy("event_type")
  }

  /** 3 − 2√2, the Corwin–Schultz denominator. `math.sqrt` is IEEE
    * correctly-rounded and the subtraction is exact, so this double is
    * bit-identical to DuckDB's `3 - 2*sqrt(2)`; the oracle embeds the
    * round-tripping literal below instead of re-deriving it so the two
    * sides cannot even in principle drift. */
  private val CsDen = 3.0 - 2.0 * math.sqrt(2.0)
  private val CsDenLit = java.lang.Double.toString(CsDen)

  /** CORWIN–SCHULTZ (2012) HIGH–LOW SPREAD — the estimator that
    * recovers the bid/ask spread from bar HIGHS AND LOWS alone: the
    * high–low range of a single bar reflects variance PLUS spread
    * while the range of two joined bars reflects two-bar variance
    * plus the same one spread, so the two ranges separate the
    * components. Per consecutive-bar pair: β = ln²(H₀/L₀) + ln²(H₁/L₁),
    * γ = ln²(max(H)/min(L)), α = (√(2β)−√β)/(3−2√2) − √(γ/(3−2√2)),
    * S = 2(eᵅ−1)/(eᵅ+1); per-symbol output is the mean raw S and the
    * mean of max(S, 0) (negative estimates floor to zero per the
    * paper's treatment).
    *
    * Determinism: H/L are max/min of RAW prices (both engines pick the
    * same stored double — no arithmetic), the ln/sqrt/exp chain is
    * transcendental so the per-pair S takes round(6) as the ulp
    * absorber (the retained-round taxonomy — same class as fn_math and
    * llm_lm_score; fq would split ulp-apart values across a grid
    * edge), and the means are exact DECIMAL(30,6) sums of the rounded
    * terms divided by the count — order-independent, final fq for
    * presentation. Same bounded shape as the rest of the module:
    * map-side-combinable bar pre-agg → per-symbol series window →
    * O(#bars) rows at any tick volume. */
  val tsCorwinSchultz: QFn = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(bar.as("bar"), col("event_type"))
      .agg(max(col("value")).as("hi"), min(col("value")).as("lo"))
    val w = Window.partitionBy("event_type").orderBy("bar")
    val l0 = log(col("hp") / col("lp"))
    val l1 = log(col("hi") / col("lo"))
    val lg = log(greatest(col("hi"), col("hp")) / least(col("lo"), col("lp")))
    val beta = l0 * l0 + l1 * l1
    val gamma = lg * lg
    val alpha = (sqrt(lit(2.0) * beta) - sqrt(beta)) / lit(CsDen) -
      sqrt(gamma / lit(CsDen))
    val sRaw = lit(2.0) * (exp(alpha) - lit(1.0)) / (exp(alpha) + lit(1.0))
    hourly
      .withColumn("hp", lag("hi", 1).over(w))
      .withColumn("lp", lag("lo", 1).over(w))
      .filter(col("hp").isNotNull && col("lp") > 0 && col("lo") > 0)
      .withColumn("s6", round(sRaw, 6))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        fq(dsum6(col("s6")) / count(lit(1)), 9).as("cs_spread_raw"),
        fq(dsum6(greatest(col("s6"), lit(0.0))) / count(lit(1)), 9)
          .as("cs_spread"))
      .orderBy("event_type")
  }

  /** KYLE (1985) LAMBDA — the price-impact slope: regress the hourly
    * mid-price change on the hour's SIGNED order flow (tick-rule
    * signs from the staged trades-with-mid enrichment, sizes from
    * `props.k`; mid series from the quote side). λ = cov(Δp, sv) /
    * var(sv) over the joined hourly frame — the λ numerator/
    * denominator derive from exact integer sums cast to double
    * (deterministic per-engine for identical longs), one final
    * expression, floor-quantized. The joined frame is #bars rows
    * (both inputs are bar-grain aggregates), so the single-series
    * window and the regression run on a bounded frame at any tick
    * volume; emitted in value-per-unit-size ×1e6. */
  val tsKyleLambda: QFn = (s, d) => {
    val flow = tradesWithMid(s, d)
      .filter(col("mid").isNotNull)
      .groupBy(bar.as("bar"))
      .agg(sum(when(col("value") > col("mid"), col("sz"))
        .when(col("value") < col("mid"), -col("sz"))
        .otherwise(0L)).as("sv"))
    val mids = Tables.events(s, d).filter(col("event_type") === "view")
      .groupBy(bar.as("bar"))
      .agg(davg2(col("value")).as("px"))
      .withColumn("q", floor(col("px") * 1000.0).cast("long"))
    val w = Window.orderBy("bar") // single market series: #bars rows post-agg
    mids.join(flow, "bar")
      .withColumn("dp", col("q") - lag("q", 1).over(w))
      .filter(col("dp").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum("sv").as("sx"), sum("dp").as("sy"),
        sum(col("sv") * col("dp")).as("sxy"),
        sum(col("sv") * col("sv")).as("sxx"))
      .select(col("n"),
        when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
          // λ in milli-price per size → /1000 to value units, ×1e6 scale
          fq((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            / 1000.0 * 1e6, 6)).as("kyle_lambda_x1e6"))
  }

  /** LO–MACKINLAY VARIANCE RATIO VR(4) — the random-walk test that
    * pairs with [[tsAutocorr]]: if prices follow a random walk,
    * Var(r_t(4)) = 4·Var(r_t(1)); VR < 1 flags mean reversion, > 1
    * momentum. Both horizons' returns (overlapping, the standard
    * form) come from ONE lag-window pass over the milli-unit hourly
    * series (lag 1 + lag 4 columns); each variance derives from exact
    * integer (n, Σx, Σx²) moments, and VR is a single double
    * expression over the six integers, floor-quantized. Emitted only
    * where the 1-period variance is positive. Same bounded shape as
    * the rest of the module. */
  val tsVarianceRatio: QFn = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(bar.as("bar"), col("event_type"))
      .agg(davg2(col("value")).as("px"))
      .withColumn("q", floor(col("px") * 1000.0).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("bar")
    hourly
      .withColumn("r1", col("q") - lag("q", 1).over(w))
      .withColumn("r4", col("q") - lag("q", 4).over(w))
      .groupBy("event_type")
      .agg(
        count(col("r1")).as("n1"), sum("r1").as("s1"),
        sum(col("r1") * col("r1")).as("ss1"),
        count(col("r4")).as("n4"), sum("r4").as("s4"),
        sum(col("r4") * col("r4")).as("ss4"))
      .filter(col("n1") > 1 && col("n4") > 1 &&
        col("n1") * col("ss1") - col("s1") * col("s1") > 0)
      .select(col("event_type"), col("n1"), col("n4"),
        fq((col("n4") * col("ss4") - col("s4") * col("s4")).cast("double")
          * (col("n1") * col("n1")).cast("double")
          / ((col("n1") * col("ss1") - col("s1") * col("s1")).cast("double")
            * lit(4.0) * (col("n4") * col("n4")).cast("double")), 6)
          .as("vr4"))
      .orderBy("event_type")
  }

  /** CEP-style SEQUENCE-PATTERN detection (the MATCH_RECOGNIZE /
    * Flink-CEP shape, absent from Spark SQL): V-REVERSALS in each
    * user's tick stream — three consecutive strictly-falling ticks
    * followed by an up-tick off the trough. The pattern predicate is
    * a pure lag-window composition (lag 1/2/3 over the per-user
    * (ts, event_id) order — event_id makes the sort total, so the
    * match set is engine-deterministic), which is exactly how a CEP
    * pattern of bounded length compiles to relational form: no state
    * machine, no per-row UDF, one window pass.
    *
    * Ticks quantize to exact integer CENTS per row before any
    * comparison (DECIMAL(30,2)·100 — the micro-unit recipe), so the
    * strict inequalities and every emitted magnitude are integer
    * arithmetic both engines share bit-for-bit. Per user: match
    * count, first/last match time, total rebound (up-tick minus
    * trough) and deepest decline (peak minus trough) in cents.
    *
    * 100 TB shape: the window partitions by user — the per-entity
    * series layout a tick store shards by anyway — and the match
    * aggregate is map-side combinable on the same key, so the plan
    * is one hash exchange + one window sort per partition regardless
    * of tick volume; a length-k pattern costs k lag columns, never a
    * second pass. Kernel factored ([[cepVReversal]]) so the spec can
    * drive hand-built sequences through the production path. */
  def cepVReversal(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ticks
      .select(col("user_id"), col("ts"), col("event_id"),
        cents(col("value")).as("vc"))
      .withColumn("v1", lag("vc", 1).over(w))
      .withColumn("v2", lag("vc", 2).over(w))
      .withColumn("v3", lag("vc", 3).over(w))
      .filter(col("v3") > col("v2") && col("v2") > col("v1") &&
        col("vc") > col("v1"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_matches"),
        min("ts").as("first_match_ts"),
        max("ts").as("last_match_ts"),
        sum(col("vc") - col("v1")).as("rebound_cents"),
        max(col("v3") - col("v1")).as("max_depth_cents"))
      .orderBy("user_id")
  }

  val tsCepPattern: QFn = (s, d) =>
    cepVReversal(Tables.events(s, d).filter(col("event_type") === "click"))

  val entries: Seq[(String, QFn)] = Seq(
    "ts_intraday_profile" -> tsIntradayProfile,
    "ts_bidask_spread" -> tsBidaskSpread,
    "ts_autocorr" -> tsAutocorr,
    "ts_rolling_beta" -> tsRollingBeta,
    "ts_var_es" -> tsVarEs,
    "ts_effective_spread" -> tsEffectiveSpread,
    "ts_trade_sign" -> tsTradeSign,
    "ts_ofi" -> tsOfi,
    "ts_roll_spread" -> tsRollSpread,
    "ts_variance_ratio" -> tsVarianceRatio,
    "ts_amihud" -> tsAmihud,
    "ts_corwin_schultz" -> tsCorwinSchultz,
    "ts_tsrv" -> tsTsrv,
    "ts_kyle_lambda" -> tsKyleLambda,
    "ts_cep_pattern" -> tsCepPattern)

  val oracles: Seq[(String, String)] = Seq(
    "ts_intraday_profile" ->
      s"""WITH prof AS (
            SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour_of_day,
              event_type, count(*) AS n_ticks,
              ${sqlFq(sqlAvg2("value"), 6)} AS avg_value,
              CAST(sum(CAST(props->>'$$.k' AS BIGINT)) AS BIGINT) AS total_size
            FROM events GROUP BY 1, 2)
          SELECT hour_of_day, event_type, n_ticks, avg_value, total_size,
            CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY n_ticks DESC, hour_of_day) AS INT) AS activity_rank
          FROM prof ORDER BY hour_of_day, event_type""",
    // integer micro-unit recipe end to end: `//` on non-negative
    // operands == Spark `div`; the signed bps quotient carries its
    // sign outside the abs() division (see tsBidaskSpread scaladoc)
    "ts_bidask_spread" ->
      s"""WITH q AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar,
              ${sqlCsum2("CASE WHEN event_type = 'view' THEN value END")} AS bid_c,
              count(CASE WHEN event_type = 'view' THEN value END) AS n_bid,
              ${sqlCsum2("CASE WHEN event_type = 'purchase' THEN value END")} AS ask_c,
              count(CASE WHEN event_type = 'purchase' THEN value END) AS n_ask
            FROM events GROUP BY 1),
          ba AS (
            SELECT bar,
              (bid_c * 10000) // n_bid AS bid_micro,
              (ask_c * 10000) // n_ask AS ask_micro,
              n_bid, n_ask
            FROM q WHERE n_bid > 0 AND n_ask > 0)
          SELECT bar, bid_micro, ask_micro,
            ask_micro - bid_micro AS spread_micro,
            (bid_micro + ask_micro) // 2 AS mid_micro,
            CASE WHEN (bid_micro + ask_micro) // 2 > 0 THEN
              (CASE WHEN ask_micro < bid_micro THEN -1 ELSE 1 END) *
                ((abs(ask_micro - bid_micro) * 1000000)
                  // ((bid_micro + ask_micro) // 2)) END AS spread_bps_c,
            n_bid, n_ask
          FROM ba ORDER BY bar""",
    "ts_autocorr" ->
      s"""WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar, event_type,
              CAST(floor(${sqlAvg2("value")} * 1000.0) AS BIGINT) AS q
            FROM events GROUP BY 1, 2),
          lagged AS (
            SELECT event_type, q AS x,
              lag(q, 1) OVER (PARTITION BY event_type ORDER BY bar) AS y1,
              lag(q, 2) OVER (PARTITION BY event_type ORDER BY bar) AS y2
            FROM hourly),
          pairs AS (
            SELECT event_type, 1 AS lag, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
            UNION ALL
            SELECT event_type, 2 AS lag, x, y2 AS y FROM lagged WHERE y2 IS NOT NULL),
          m AS (
            SELECT event_type, lag, count(*) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(y * y) AS BIGINT) AS syy
            FROM pairs GROUP BY 1, 2)
          SELECT event_type, lag, n,
            ${sqlFq("CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))", 6)} AS autocorr
          FROM m ORDER BY event_type, lag""",
    "ts_rolling_beta" ->
      s"""WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar, event_type,
              CAST(floor(${sqlAvg2("value")} * 1000.0) AS BIGINT) AS q
            FROM events GROUP BY 1, 2),
          j AS (
            SELECT h.bar, h.event_type, h.q, m.q AS m
            FROM hourly h
            JOIN (SELECT bar, q FROM hourly WHERE event_type = 'purchase') m
              ON h.bar = m.bar),
          w AS (
            SELECT bar, event_type,
              count(*) OVER win AS n,
              CAST(sum(q) OVER win AS BIGINT) AS sx,
              CAST(sum(m) OVER win AS BIGINT) AS sm,
              CAST(sum(q * m) OVER win AS BIGINT) AS sxm,
              CAST(sum(m * m) OVER win AS BIGINT) AS smm
            FROM j
            WINDOW win AS (PARTITION BY event_type ORDER BY bar
              ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
          SELECT bar, event_type, n,
            ${sqlFq("CAST(n * sxm - sx * sm AS DOUBLE) / CAST(n * smm - sm * sm AS DOUBLE)", 6)} AS beta
          FROM w WHERE n >= 12 AND n * smm - sm * sm > 0
          ORDER BY bar, event_type""",
    "ts_var_es" ->
      s"""WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar, event_type,
              CAST(floor(${sqlAvg2("value")} * 1000.0) AS BIGINT) AS q
            FROM events GROUP BY 1, 2),
          rets AS (
            SELECT event_type, bar,
              q - lag(q, 1) OVER (PARTITION BY event_type ORDER BY bar) AS r
            FROM hourly),
          ranked AS (
            SELECT event_type, r,
              row_number() OVER (PARTITION BY event_type ORDER BY r, bar) AS rk,
              count(*) OVER (PARTITION BY event_type) AS n
            FROM rets WHERE r IS NOT NULL),
          tail AS (
            SELECT event_type, r, rk, n,
              (n + 19) // 20 AS cut
            FROM ranked)
          SELECT event_type, max(n) AS n_returns,
            ${sqlFq("CAST(max(CASE WHEN rk = cut THEN r END) AS DOUBLE) / 1000.0", 3)}
              AS var95,
            ${sqlFq("(CAST(sum(r) AS DOUBLE) / count(*)) / 1000.0", 6)} AS es95
          FROM tail WHERE rk <= cut
          GROUP BY event_type ORDER BY event_type""",
    "ts_effective_spread" ->
      s"""WITH q AS (
            SELECT user_id AS q_uid, ts AS q_ts, max(value) AS qv
            FROM events WHERE event_type = 'view' GROUP BY 1, 2),
          t AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'click'),
          j AS (
            SELECT t.ts, t.value,
              (SELECT qv FROM q
               WHERE q.q_uid = t.user_id AND q.q_ts <= t.ts
               ORDER BY q.q_ts DESC LIMIT 1) AS mid
            FROM t)
          SELECT date_trunc('hour', ts) AS bar, count(*) AS n_trades,
            ${sqlFq(sqlSum4("2.0 * abs(value - mid)") + " / count(*)", 6)}
              AS avg_eff_spread
          FROM j WHERE mid IS NOT NULL GROUP BY 1 ORDER BY bar""",
    "ts_trade_sign" ->
      """WITH q AS (
            SELECT user_id AS q_uid, ts AS q_ts, max(value) AS qv
            FROM events WHERE event_type = 'view' GROUP BY 1, 2),
          t AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'click'),
          j AS (
            SELECT t.ts, t.value,
              (SELECT qv FROM q
               WHERE q.q_uid = t.user_id AND q.q_ts <= t.ts
               ORDER BY q.q_ts DESC LIMIT 1) AS mid
            FROM t),
          agg AS (
            SELECT date_trunc('hour', ts) AS bar,
              CAST(sum(CASE WHEN value > mid THEN 1 ELSE 0 END) AS BIGINT) AS n_buy,
              CAST(sum(CASE WHEN value < mid THEN 1 ELSE 0 END) AS BIGINT) AS n_sell,
              CAST(sum(CASE WHEN value = mid THEN 1 ELSE 0 END) AS BIGINT) AS n_mid
            FROM j WHERE mid IS NOT NULL GROUP BY 1)
          SELECT bar, n_buy, n_sell, n_mid,
            CAST(floor(CAST(n_buy AS DOUBLE) /
              CAST(n_buy + n_sell + n_mid AS DOUBLE) * 1000000.0) AS BIGINT)
              AS buy_share_q
          FROM agg ORDER BY bar""",
    "ts_ofi" ->
      """WITH q AS (
            SELECT user_id AS q_uid, ts AS q_ts, max(value) AS qv
            FROM events WHERE event_type = 'view' GROUP BY 1, 2),
          t AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
              CAST(props->>'$.k' AS BIGINT) AS sz
            FROM events WHERE event_type = 'click'),
          j AS (
            SELECT t.ts, t.value, t.sz,
              (SELECT qv FROM q
               WHERE q.q_uid = t.user_id AND q.q_ts <= t.ts
               ORDER BY q.q_ts DESC LIMIT 1) AS mid
            FROM t),
          agg AS (
            SELECT date_trunc('hour', ts) AS bar,
              CAST(sum(CASE WHEN value > mid THEN sz ELSE 0 END) AS BIGINT) AS buy_size,
              CAST(sum(CASE WHEN value < mid THEN sz ELSE 0 END) AS BIGINT) AS sell_size
            FROM j WHERE mid IS NOT NULL GROUP BY 1)
          SELECT bar, buy_size, sell_size,
            buy_size - sell_size AS ofi,
            CASE WHEN buy_size + sell_size > 0 THEN
              CAST(floor(CAST(buy_size - sell_size AS DOUBLE) /
                CAST(buy_size + sell_size AS DOUBLE) * 1000000.0) AS BIGINT)
            END AS imbalance_q
          FROM agg ORDER BY bar""",
    // Roll: same hourly milli-unit bars; both lags in one window pass
    "ts_roll_spread" ->
      s"""WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar, event_type,
              CAST(floor(${sqlAvg2("value")} * 1000.0) AS BIGINT) AS q
            FROM events GROUP BY 1, 2),
          diffs AS (
            SELECT event_type, bar,
              q - lag(q, 1) OVER win AS dp
            FROM hourly
            WINDOW win AS (PARTITION BY event_type ORDER BY bar)),
          lagged AS (
            SELECT event_type, dp,
              lag(dp, 1) OVER (PARTITION BY event_type ORDER BY bar) AS dp1
            FROM diffs),
          m AS (
            SELECT event_type, count(*) AS n,
              CAST(sum(dp) AS BIGINT) AS sx, CAST(sum(dp1) AS BIGINT) AS sy,
              CAST(sum(dp * dp1) AS BIGINT) AS sxy
            FROM lagged WHERE dp IS NOT NULL AND dp1 IS NOT NULL
            GROUP BY event_type)
          SELECT event_type, n,
            ${sqlFq("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) / 1e6", 9)} AS serial_cov,
            CASE WHEN n * sxy - sx * sy < 0 THEN
              ${sqlFq("2.0 * sqrt(-CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) / 1000.0", 6)}
            END AS roll_spread
          FROM m ORDER BY event_type""",
    // TSRV: tick-grain milli-unit prices, both lag scales in one
    // window, exact integer squared-diff sums, fq on the two ratios
    "ts_tsrv" ->
      s"""WITH ticks AS (
            SELECT event_type, ts, event_id,
              CAST(floor(value * 1000.0) AS BIGINT) AS q
            FROM events),
          lagged AS (
            SELECT event_type,
              q - lag(q, 1) OVER win AS d1,
              q - lag(q, $TsrvK) OVER win AS dk
            FROM ticks
            WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)),
          m AS (
            SELECT event_type, count(*) AS n,
              CAST(sum(d1 * d1) AS BIGINT) AS rv_all_m2,
              CAST(sum(dk * dk) AS BIGINT) AS rv_k_m2
            FROM lagged GROUP BY event_type)
          SELECT event_type, n,
            ${sqlFq("CAST(rv_all_m2 AS DOUBLE) / 1e6", 9)} AS rv_all,
            ${sqlFq(s"(CAST(rv_k_m2 AS DOUBLE) / $TsrvK.0 - (CAST(n - $TsrvK + 1 AS DOUBLE) / $TsrvK.0 / CAST(n AS DOUBLE)) * CAST(rv_all_m2 AS DOUBLE)) / 1e6", 9)} AS tsrv
          FROM m WHERE n > $TsrvK ORDER BY event_type""",
    // Corwin–Schultz: raw max/min bars (no arithmetic → identical
    // doubles), per-pair transcendental chain with round(6) as the ulp
    // absorber, DECIMAL(30,6)-exact means; the denominator 3−2√2 is
    // embedded as the Scala-computed literal so both engines evaluate
    // the identical double
    "ts_corwin_schultz" ->
      s"""WITH h AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar, event_type,
              max(value) AS hi, min(value) AS lo
            FROM events GROUP BY 1, 2),
          p AS (
            SELECT event_type, hi, lo,
              lag(hi, 1) OVER win AS hp, lag(lo, 1) OVER win AS lp
            FROM h
            WINDOW win AS (PARTITION BY event_type ORDER BY bar)),
          b AS (
            SELECT event_type,
              ln(hp/lp)*ln(hp/lp) + ln(hi/lo)*ln(hi/lo) AS beta,
              ln(greatest(hi,hp)/least(lo,lp)) * ln(greatest(hi,hp)/least(lo,lp)) AS gamma
            FROM p WHERE hp IS NOT NULL AND lp > 0 AND lo > 0),
          al AS (
            SELECT event_type,
              (sqrt(2.0*beta) - sqrt(beta))/$CsDenLit - sqrt(gamma/$CsDenLit) AS a
            FROM b),
          t AS (
            SELECT event_type,
              round(2.0*(exp(a) - 1.0)/(exp(a) + 1.0), 6) AS s6 FROM al)
          SELECT event_type, count(*) AS n_pairs,
            ${sqlFq(s"${sqlSum6("s6")} / count(*)", 9)} AS cs_spread_raw,
            ${sqlFq(s"${sqlSum6("greatest(s6, 0.0)")} / count(*)", 9)} AS cs_spread
          FROM t GROUP BY event_type ORDER BY event_type""",
    "ts_variance_ratio" ->
      s"""WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar, event_type,
              CAST(floor(${sqlAvg2("value")} * 1000.0) AS BIGINT) AS q
            FROM events GROUP BY 1, 2),
          lagged AS (
            SELECT event_type,
              q - lag(q, 1) OVER win AS r1,
              q - lag(q, 4) OVER win AS r4
            FROM hourly
            WINDOW win AS (PARTITION BY event_type ORDER BY bar)),
          m AS (
            SELECT event_type,
              count(r1) AS n1, CAST(sum(r1) AS BIGINT) AS s1,
              CAST(sum(r1 * r1) AS BIGINT) AS ss1,
              count(r4) AS n4, CAST(sum(r4) AS BIGINT) AS s4,
              CAST(sum(r4 * r4) AS BIGINT) AS ss4
            FROM lagged GROUP BY event_type)
          SELECT event_type, n1, n4,
            ${sqlFq("CAST(n4 * ss4 - s4 * s4 AS DOUBLE) * CAST(n1 * n1 AS DOUBLE) / (CAST(n1 * ss1 - s1 * s1 AS DOUBLE) * 4.0 * CAST(n4 * n4 AS DOUBLE))", 6)} AS vr4
          FROM m
          WHERE n1 > 1 AND n4 > 1 AND n1 * ss1 - s1 * s1 > 0
          ORDER BY event_type""",
    "ts_amihud" ->
      s"""WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar, event_type,
              CAST(floor(${sqlAvg2("value")} * 1000.0) AS BIGINT) AS q,
              CAST(sum(CAST(props->>'$$.k' AS BIGINT)) AS BIGINT) AS vol
            FROM events GROUP BY 1, 2),
          lagged AS (
            SELECT event_type, q, vol,
              lag(q, 1) OVER (PARTITION BY event_type ORDER BY bar) AS qp
            FROM hourly),
          terms AS (
            SELECT event_type,
              ${sqlFq("CAST(abs(q - qp) AS DOUBLE) / CAST(qp AS DOUBLE) / CAST(vol AS DOUBLE)", 12)} AS term
            FROM lagged WHERE qp IS NOT NULL AND qp > 0 AND vol > 0)
          SELECT event_type, count(*) AS n_bars,
            ${sqlFq("CAST(sum(CAST(term AS DECIMAL(30,12))) AS DOUBLE) / count(*) * 1e6", 6)} AS amihud_x1e6
          FROM terms GROUP BY event_type ORDER BY event_type""",
    // Kyle λ: the trades-with-mid enrichment (same correlated-subquery
    // shape as ts_ofi) signs the flow; mid series from the view side
    "ts_kyle_lambda" ->
      s"""WITH q AS (
            SELECT user_id AS q_uid, ts AS q_ts, max(value) AS qv
            FROM events WHERE event_type = 'view' GROUP BY 1, 2),
          t AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
              CAST(props->>'$$.k' AS BIGINT) AS sz
            FROM events WHERE event_type = 'click'),
          j AS (
            SELECT t.ts, t.value, t.sz,
              (SELECT qv FROM q
               WHERE q.q_uid = t.user_id AND q.q_ts <= t.ts
               ORDER BY q.q_ts DESC LIMIT 1) AS mid
            FROM t),
          flow AS (
            SELECT date_trunc('hour', ts) AS bar,
              CAST(sum(CASE WHEN value > mid THEN sz
                WHEN value < mid THEN -sz ELSE 0 END) AS BIGINT) AS sv
            FROM j WHERE mid IS NOT NULL GROUP BY 1),
          mids AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar,
              CAST(floor(${sqlAvg2("value")} * 1000.0) AS BIGINT) AS q
            FROM events WHERE event_type = 'view' GROUP BY 1),
          dps AS (
            SELECT sv, q - lag(q, 1) OVER (ORDER BY bar) AS dp
            FROM mids JOIN flow USING (bar)),
          m AS (
            SELECT count(*) AS n,
              CAST(sum(sv) AS BIGINT) AS sx, CAST(sum(dp) AS BIGINT) AS sy,
              CAST(sum(sv * dp) AS BIGINT) AS sxy,
              CAST(sum(sv * sv) AS BIGINT) AS sxx
            FROM dps WHERE dp IS NOT NULL)
          SELECT n,
            CASE WHEN n * sxx - sx * sx > 0 THEN
              ${sqlFq("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 1000.0 * 1e6", 6)}
            END AS kyle_lambda_x1e6
          FROM m""",
    // CEP V-reversal: same lag-window compilation of the pattern,
    // exact integer cents end to end (count/sum/max over BIGINTs
    // recast — DuckDB's sum(BIGINT) is HUGEINT)
    "ts_cep_pattern" ->
      """WITH t AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT) AS vc,
             lag(CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT), 1) OVER w AS v1,
             lag(CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT), 2) OVER w AS v2,
             lag(CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT), 3) OVER w AS v3
           FROM events WHERE event_type = 'click'
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, count(*) AS n_matches,
           min(ts) AS first_match_ts, max(ts) AS last_match_ts,
           CAST(sum(vc - v1) AS BIGINT) AS rebound_cents,
           CAST(max(v3 - v1) AS BIGINT) AS max_depth_cents
         FROM t WHERE v3 > v2 AND v2 > v1 AND vc > v1
         GROUP BY user_id ORDER BY user_id""")
}
