#!/usr/bin/env python3
"""Independent pandas-replica oracle for the reference-pipeline rows.

The driver's DuckDB gate (tools/check.py) proves the Spark engine and the
builder's DuckDB SQL agree — but both sides are the same person's
transcription of /root/reference/daily_function.py, so a systematic
misreading (a flipped stop-loss tiebreak, an off-by-one futures window)
would pass both. This tool closes that gap: it re-executes the REFERENCE'S
OWN ALGORITHM SHAPES — pandas rolling windows (daily_function.py:561-597),
the literal per-signal nested trade loop (:686-836), the groupby/agg
metrics chain (:1047-1076), idxmax best-of on sorted condition order
(:1078-1080) — directly over the same parquet, and compares the result to
the parquet `graft.Verify` wrote.

Usage:
    sbt -batch "runMain graft.Verify <sfDir> <outDir>"
    python3 tools/ref_oracle.py <sfDir> <outDir> [--time]

Checks r01-r11, r20, and the composed daily product — the r32 per-day
digest chain (app.py:49 execute_pipeline, one digest per trading day of
the last week) and the r34 buy→hold→sell lot lifecycle
(daily_function.py:1713 create_sell_order_data, :1828 sell execution) —
each replayed one-shot from the raw events, so the engine's persisted
day-by-day incremental carry is compared against an independent full
recompute. `--time` also prints per-stage wall times of the replica
itself — the single-node pandas baseline BASELINE.md lacked.

Comparison policy (declared, not hidden):
  * keys, counts, dates, result strings, and raw data-derived prices
    compare EXACTLY (string-normalized) — these carry the semantics
    (window bounds, precedence, tiebreaks) the gate exists to test;
  * rolling-window floats (CCI/SMA/MAD) compare within 2e-4: one ulp of
    the 4-decimal output grid, covering fold-order noise between pandas'
    pairwise summation and the engine's index-order left fold;
  * derived ROUNDED metrics (r07/r08/r11) follow the reference's exact
    derivation chain (which sums, which ratios, total_revenue rounded to
    integer BEFORE revenue_rate) but apply the engine's DECLARED rounding
    convention — half-up via floor(x*k+0.5)/k (SURVEY §6; portable across
    engines) — instead of numpy round()'s half-to-even, so the compare
    can be tight (1e-6) instead of sloppily toleranced. The deviation the
    convention introduces vs the reference's np.round is REPORTED per
    metric (max |half-up − np.round| and affected-row count): it is
    bounded by one ulp of each rounding grid and occurs only on exact .5
    boundaries, proving the convention is the ONLY divergence from the
    literal reference chain. Argmax row identity (r08-r10) is computed
    under the same declared convention so metric ties break identically;
    the tie-break rule itself (first in sorted condition order = pandas
    idxmax) is the reference's.
"""
import sys
import math
import time

import numpy as np
import pandas as pd

# The engine's simulation grid (CciPipeline.GridConfig defaults) — the
# reference takes these as function arguments (holding_days,
# target_return_values, buy_cci_thresholds, stop_loss_cci_thresholds).
CCI_N = 5
BUY_THRESHOLDS = [-100.0, 0.0, 100.0]
STOP_THRESHOLDS = [-150.0, -100.0]
HOLDING_DAYS = [5, 10]
TARGET_RETURNS = [2.0, 5.0]
HISTORY_GRID_DAYS = [7, 15, 100000]  # r20 (reference years -> days here)
TAX_RATE = 0.0018   # daily_function.py:99
FEE_RATE = 0.00007  # daily_function.py:100
BUDGET = 1000000.0
BUDGET_FRACTION = 0.1
HISTORY_DAYS = 15   # r15 (unused here, r15 not in scope)


def round_half_up(x, k):
    """The engine's declared portable rounding: floor(x*k + 0.5)/k."""
    return np.floor(np.asarray(x, dtype=float) * k + 0.5) / k


# --------------------------------------------------------------- loading

def load_events(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/events.parquet")
    # Mirror Tables.normalizeEventTs: accept int64-nanos, timestamp[us/ns/ms],
    # or naive timestamps — everything lands on epoch micros.
    ts = df["ts"]
    if isinstance(ts.dtype, pd.DatetimeTZDtype):
        # tz-aware (isAdjustedToUTC=true parquet): drop to naive UTC first —
        # .astype to a naive dtype raises TypeError on tz-aware input
        ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    if pd.api.types.is_datetime64_any_dtype(ts):
        ts_us = ts.astype("datetime64[us]").astype("int64")
    else:  # TIMESTAMP(NANOS) parquet read as raw int64
        ts_us = ts.astype("int64") // 1000
    df = df.assign(ts_us=ts_us)
    df["d"] = pd.to_datetime(df["ts_us"], unit="us").dt.normalize()
    return df


def load_spark(out_dir, name):
    import glob
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"{out_dir}/{name}: no parquet written")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


# --------------------------------------------------------- replica stages

def replica_symbol_dim(sf_dir):
    """r01 (reference create_kr_symbol_list, daily_function.py:185-291)."""
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    excluded = set(part.loc[part["p_retailprice"] > 1900.0, "p_brand"])
    out = part[(part["p_size"] > 0) & ~part["p_brand"].isin(excluded)]
    return (out.rename(columns={
        "p_partkey": "symbol", "p_name": "name", "p_type": "type",
        "p_size": "total_stock", "p_retailprice": "marcap"})
        [["symbol", "name", "type", "total_stock", "marcap"]]
        .sort_values("symbol").reset_index(drop=True))


def replica_bars(events):
    """r02: events -> per-(user, day) OHLC (the reference's daily price
    frame, daily_function.py:358-366, built from the event stream).
    Open/close pick the first/last event by the total (ts_us, event_id)
    order — the engine's documented determinism rule."""
    ev = events.sort_values(["user_id", "d", "ts_us", "event_id"],
                            kind="mergesort")
    g = ev.groupby(["user_id", "d"], sort=True)
    out = g.agg(open_pr=("value", "first"),
                high_pr=("value", "max"),
                low_pr=("value", "min"),
                close_pr=("value", "last"),
                volume=("value", "size")).reset_index()
    return out


def replica_item_chart(events):
    """r48 (reference get_item_chart_price, hankook_api.py:197): the
    ranged intraday chart — r02's OHLCV fold at minute grain over the
    [2024-01-08, 2024-01-15) window, open/close by the total
    (ts_us, event_id) order."""
    lo = pd.Timestamp("2024-01-08").value // 1000
    hi = pd.Timestamp("2024-01-15").value // 1000
    ev = events[(events["ts_us"] >= lo) & (events["ts_us"] < hi)].copy()
    ev["m"] = pd.to_datetime(ev["ts_us"], unit="us").dt.floor("min")
    ev = ev.sort_values(["user_id", "m", "ts_us", "event_id"],
                        kind="mergesort")
    return (ev.groupby(["user_id", "m"], sort=True)
              .agg(open_pr=("value", "first"), high_pr=("value", "max"),
                   low_pr=("value", "min"), close_pr=("value", "last"),
                   volume=("value", "size")).reset_index())


def replica_keep_last(events):
    """r03 (reference drop_duplicates(subset=[date], keep='last'),
    daily_function.py:492,516) keyed (user, day, event_type)."""
    ev = events.sort_values(["user_id", "d", "event_type", "ts_us", "event_id"],
                            kind="mergesort")
    out = (ev.groupby(["user_id", "d", "event_type"], sort=True)
             .agg(event_id=("event_id", "last"), value=("value", "last"))
             .reset_index())
    return out


def replica_cci(bars):
    """r04 (reference create_new_cci_data, daily_function.py:561-597):
    TP, rolling SMA, rolling mean-absolute-deviation, CCI — the literal
    pandas formulas, per series. Full-window columns are NaN until the
    window fills, exactly like rolling(cci_ndays) with default
    min_periods; the engine additionally defines partial-window sma/mad
    (sum/cnt over the available frame), replicated here with
    min_periods=1 — its CCI stays null until the window fills either way."""
    def per_user(g):
        g = g.sort_values("d").reset_index(drop=True)
        g["idx"] = np.arange(1, len(g) + 1)
        g["tp_c"] = (g["high_pr"] + g["low_pr"] + g["close_pr"]) / 3.0
        g["tp_o"] = (g["high_pr"] + g["low_pr"] + g["open_pr"]) / 3.0
        mad = lambda x: np.mean(np.abs(x - np.mean(x)))  # noqa: E731
        for side in ("c", "o"):
            tp = g[f"tp_{side}"]
            full_sma = tp.rolling(CCI_N).mean()                   # :588
            full_mad = tp.rolling(CCI_N).apply(mad, raw=True)     # :590
            with np.errstate(invalid="ignore", divide="ignore"):
                cci = (tp - full_sma) / (0.015 * full_mad)        # :594
            cci = cci.where(full_mad != 0.0)  # 0/0 -> NaN either way
            g[f"{side}_cci"] = cci
            g[f"sma_{side}"] = tp.rolling(CCI_N, min_periods=1).mean()
            g[f"mad_{side}"] = tp.rolling(CCI_N, min_periods=1).apply(mad, raw=True)
        return g
    return (bars.groupby("user_id", group_keys=False, sort=True)
                .apply(per_user).reset_index(drop=True)
                .rename(columns={"c_cci": "close_cci", "o_cci": "open_cci"}))


def replica_signals(cci):
    """r05 (daily_function.py:724-725): prev open CCI below threshold,
    current above. shift(1) per series; NaN comparisons are False."""
    rows = []
    for uid, g in cci.groupby("user_id", sort=True):
        g = g.sort_values("d").reset_index(drop=True)
        prev = g["open_cci"].shift(1)
        for thr in BUY_THRESHOLDS:
            mask = (prev < thr) & (g["open_cci"] > thr)
            hit = g[mask.fillna(False)]
            for _, r in hit.iterrows():
                rows.append((uid, r["d"], int(r["idx"]), thr, r["open_pr"],
                             prev[r.name], r["open_cci"]))
    return pd.DataFrame(rows, columns=[
        "user_id", "d", "idx", "buy_thr", "open_pr",
        "prev_open_cci", "open_cci"])


def _trades_for_positions(g, buy_positions, buy_thr, extra=()):
    """The reference's per-signal trade loop (daily_function.py:733-815),
    over one series' positional arrays. future_data = df.iloc[i+1 : i+1+x];
    target: first future close >= buy*(1+target/100); stop: first future
    close-CCI <= stop threshold (NaN False); precedence target-if-earlier
    (strict <, :754), then stop, else maturity on the LAST future row with
    days_held = x (:807 — the condition, not the date diff)."""
    dates = g["d"].to_numpy()
    open_pr = g["open_pr"].to_numpy(dtype=float)
    close_pr = g["close_pr"].to_numpy(dtype=float)
    close_cci = g["close_cci"].to_numpy(dtype=float)
    n = len(g)
    out = []
    for i in buy_positions:
        buy_price = open_pr[i]
        buy_date = dates[i]
        for x in HOLDING_DAYS:
            lo, hi = i + 1, min(i + 1 + x, n)
            if lo >= hi:
                continue                      # future_data.empty (:741)
            fclose = close_pr[lo:hi]
            fcci = close_cci[lo:hi]
            for tgt in TARGET_RETURNS:
                target_price = buy_price * (1 + tgt / 100.0)
                t_hits = np.nonzero(fclose >= target_price)[0]
                t_idx = t_hits[0] if t_hits.size else None
                for stop in STOP_THRESHOLDS:
                    with np.errstate(invalid="ignore"):
                        s_mask = fcci <= stop  # NaN -> False
                    s_hits = np.nonzero(s_mask)[0]
                    s_idx = s_hits[0] if s_hits.size else None
                    if t_idx is not None and (s_idx is None or t_idx < s_idx):
                        sell, result = lo + t_idx, "reach_target"
                        days = (dates[sell] - buy_date).astype("timedelta64[D]").astype(int)
                    elif s_idx is not None:
                        sell, result = lo + s_idx, "stop_loss"
                        days = (dates[sell] - buy_date).astype("timedelta64[D]").astype(int)
                    else:
                        sell, result = hi - 1, "maturity"
                        days = x               # :807 — x, not the diff
                    out.append(extra + (
                        buy_date, buy_price, x, tgt, buy_thr, stop, result,
                        dates[sell], close_pr[sell], int(days)))
    return out


_TRADE_COLS = ["buy_date", "buy_price", "condition_holding_days",
               "condition_target_return", "condition_buy_cci_threshold",
               "condition_stop_loss_cci_threshold", "trade_result",
               "sell_date", "sell_price", "days_held"]


def replica_trades(cci):
    """r06 (create_trade_history_by_symbol, daily_function.py:686-836)."""
    rows = []
    for uid, g in cci.groupby("user_id", sort=True):
        g = g.sort_values("d").reset_index(drop=True)
        prev = g["open_cci"].shift(1).to_numpy(dtype=float)
        cur = g["open_cci"].to_numpy(dtype=float)
        for thr in BUY_THRESHOLDS:
            with np.errstate(invalid="ignore"):
                buys = np.nonzero((prev < thr) & (cur > thr))[0]  # :724
            for row in _trades_for_positions(g, buys, thr):
                rows.append((uid,) + row)
    return pd.DataFrame(rows, columns=["user_id"] + _TRADE_COLS)


def replica_trades_history_grid(cci):
    """r20: the reference's search_history_years loop (:700-711 via
    get_filtered_cci_data :670-682) — slice each series to the trailing
    window from its max date, THEN compute signals on the slice (the first
    slice row's shift(1) is NaN), futures stay inside the slice (a suffix,
    so identical to full-series futures)."""
    rows = []
    for uid, g in cci.groupby("user_id", sort=True):
        g = g.sort_values("d").reset_index(drop=True)
        max_d = g["d"].max()
        for h in HISTORY_GRID_DAYS:
            sl = g[g["d"] >= max_d - pd.Timedelta(days=h)].reset_index(drop=True)
            if sl.empty:
                continue
            prev = sl["open_cci"].shift(1).to_numpy(dtype=float)
            cur = sl["open_cci"].to_numpy(dtype=float)
            for thr in BUY_THRESHOLDS:
                with np.errstate(invalid="ignore"):
                    buys = np.nonzero((prev < thr) & (cur > thr))[0]
                for row in _trades_for_positions(sl, buys, thr, extra=(h,)):
                    rows.append((uid,) + row)
    return pd.DataFrame(rows, columns=["user_id", "search_history_days"] + _TRADE_COLS)


GROUP_COLS = ["condition_holding_days", "condition_target_return",
              "condition_buy_cci_threshold", "condition_stop_loss_cci_threshold"]


CONVENTION_DEVIATIONS = {}


def note_deviation(metric, hu, ref):
    """Record how far the declared half-up convention moved a metric off
    the reference's np.round — printed in the summary as the bounded,
    declared divergence."""
    d = (pd.to_numeric(hu) - pd.to_numeric(ref)).abs()
    d = d[d > 1e-12]
    if len(d):
        prev = CONVENTION_DEVIATIONS.get(metric, (0, 0.0))
        CONVENTION_DEVIATIONS[metric] = (prev[0] + int(len(d)),
                                         max(prev[1], float(d.max())))


def replica_strategy(trades):
    """r07 (daily_function.py:1047-1076): the literal groupby/agg chain,
    per series. Prices are 2-decimal values; per-group totals are carried
    as exact integer cents (np.rint strips float representation error from
    the 2-decimal inputs) so the half-up roundings downstream see the same
    exact doubles the engine's integer-cents aggregation produces."""
    t = trades.copy()
    t["reach_target_date"] = t["sell_date"].where(t["trade_result"] == "reach_target")
    t["stop_loss_date"] = t["sell_date"].where(t["trade_result"] == "stop_loss")
    t["maturity_date"] = t["sell_date"].where(t["trade_result"] == "maturity")
    t["win_dummy"] = (t["sell_price"] > t["buy_price"]).astype(int)    # :1035
    t["lose_dummy"] = (t["sell_price"] < t["buy_price"]).astype(int)   # :1038
    amt = t["sell_price"] - t["buy_price"]                             # :1031
    # :1032 round(amount/days, 2) — declared half-up convention, exact
    # cents; the np.round variant is recorded as the convention deviation
    rpdh_cents = np.floor(amt / t["days_held"] * 100.0 + 0.5)
    note_deviation("rpdh_per_trade", rpdh_cents / 100.0,
                   np.round(amt / t["days_held"], 2))
    t["rpdh_cents"] = rpdh_cents
    t["buy_cents"] = np.rint(t["buy_price"] * 100.0)
    t["sell_cents"] = np.rint(t["sell_price"] * 100.0)
    g = t.groupby(["user_id"] + GROUP_COLS, sort=True)
    r = g.agg(count_buy_date=("buy_date", "nunique"),
              count_reach_target_date=("reach_target_date", "nunique"),
              count_stop_loss_date=("stop_loss_date", "nunique"),
              count_maturity_date=("maturity_date", "nunique"),
              count_win=("win_dummy", "sum"),
              count_lose=("lose_dummy", "sum"),
              n_trades=("buy_date", "size"),
              rpdh_cents=("rpdh_cents", "sum"),
              days_held_sum=("days_held", "sum"),
              buy_cents=("buy_cents", "sum"),
              sell_cents=("sell_cents", "sum")).reset_index()
    # :1066-1074 — the reference's exact derivation chain, including
    # total_revenue rounded to 0 decimals BEFORE revenue_rate
    buy_raw = r["buy_cents"] / 100.0
    sell_raw = r["sell_cents"] / 100.0
    r["win_rate"] = round_half_up(r["count_win"] / r["count_buy_date"] * 100.0, 100)
    r["lose_rate"] = round_half_up(r["count_lose"] / r["count_buy_date"] * 100.0, 100)
    r["total_revenue"] = round_half_up(sell_raw - buy_raw, 1)
    r["revenue_rate"] = round_half_up(r["total_revenue"] / buy_raw * 100.0, 100)
    r["reach_target_rate"] = round_half_up(r["count_reach_target_date"] / r["count_buy_date"] * 100.0, 100)
    r["stop_loss_rate"] = round_half_up(r["count_stop_loss_date"] / r["count_buy_date"] * 100.0, 100)
    r["maturity_rate"] = round_half_up(r["count_maturity_date"] / r["count_buy_date"] * 100.0, 100)
    r["avg_revenue_per_days_held"] = round_half_up(
        r["rpdh_cents"] / r["n_trades"] / 100.0, 10000)
    r["avg_days_held"] = round_half_up(r["days_held_sum"] / r["n_trades"], 10000)
    r["total_buy_price"] = round_half_up(buy_raw, 100)
    r["total_sell_price"] = round_half_up(sell_raw, 100)
    note_deviation("win_rate", r["win_rate"],
                   np.round(r["count_win"] / r["count_buy_date"] * 100, 2))
    note_deviation("total_revenue", r["total_revenue"],
                   np.round(sell_raw - buy_raw, 0))
    note_deviation("revenue_rate", r["revenue_rate"],
                   np.round(np.round(sell_raw - buy_raw, 0) / buy_raw * 100, 2))
    return r.drop(columns=["n_trades", "rpdh_cents", "days_held_sum",
                           "buy_cents", "sell_cents"])


BEST_METRICS = [("win_rate", "win_rate"),
                ("revenue_rate", "revenue_rate"),
                ("revenue_per_days_held", "avg_revenue_per_days_held")]


def replica_best(strategy):
    """r08 (daily_function.py:1078-1080): idxmax per series per investment
    target — first occurrence in sorted condition order (groupby sorted the
    conditions ascending). Metrics are re-rounded under the engine's
    declared half-up convention ONLY for the argmax comparison, so exact
    .5-boundary ties break the same way on both sides; the tie-break rule
    itself (first in condition order) is the reference's."""
    s = strategy.sort_values(["user_id"] + GROUP_COLS).reset_index(drop=True)
    parts = []
    for target, metric in BEST_METRICS:
        best = (s.loc[s.groupby("user_id", sort=True)[metric].idxmax()]
                  .assign(investment_target=target))
        parts.append(best)
    return pd.concat(parts, ignore_index=True)


def replica_recommendations(cci, best):
    """r09 (get_daily_signal_recommendations_sub, daily_function.py:
    1180-1243): best-win condition per series joined to the latest state;
    the reco test uses >= on the current day (:1218) where the sim uses >."""
    bw = best[best["investment_target"] == "win_rate"].set_index("user_id")
    rows = []
    for uid, g in cci.groupby("user_id", sort=True):
        if uid not in bw.index:
            continue
        g = g.sort_values("d").reset_index(drop=True)
        cur = g["open_cci"].iloc[-1]
        prev = g["open_cci"].iloc[-2] if len(g) >= 2 else np.nan
        b = bw.loc[uid]
        thr = b["condition_buy_cci_threshold"]
        has = int((prev < thr) and (cur >= thr)) if not (
            math.isnan(prev) or math.isnan(cur)) else 0
        rows.append((uid, g["open_pr"].iloc[-1], cur, prev,
                     b["condition_holding_days"], b["condition_target_return"],
                     thr, b["condition_stop_loss_cci_threshold"],
                     b["count_win"], has))
    return pd.DataFrame(rows, columns=[
        "user_id", "buy_price", "current_open_cci", "yesterday_open_cci",
        "condition_holding_days", "condition_target_return",
        "condition_buy_cci_threshold", "condition_stop_loss_cci_threshold",
        "count_win", "has_buy_signal"])


def replica_candidates(best):
    """r10 (get_candidate_list, daily_function.py:1302-1329): quantile
    thresholds over the best-win table (the reference's parameterized
    quantile form: 0.7 on the primary metric, 0.3 on count, 1.0 on days)."""
    bw = best[best["investment_target"] == "win_rate"].copy()
    # Linear-interpolation quantiles, same definition as Spark percentile
    # and DuckDB quantile_cont; the 1e-9 epsilon compensates the last-ulp
    # difference between the two interpolation formulas
    # (lo + g*(hi-lo) vs (1-g)*lo + g*hi) when a threshold lands exactly
    # on a sample value — it cannot flip a non-boundary comparison.
    q_win = bw["win_rate"].quantile(0.7) - 1e-9
    q_cnt = bw["count_win"].quantile(0.3) - 1e-9
    q_days = bw["avg_days_held"].quantile(1.0) + 1e-9
    out = bw[(bw["win_rate"] >= q_win) & (bw["count_win"] >= q_cnt) &
             (bw["avg_days_held"] <= q_days)]
    return out[["user_id", "count_win"] + GROUP_COLS].sort_values("user_id")


def replica_notify_feed(reco, cand, best, events):
    """r39 (slack_message.py:7 send_simple_message at its four daily seams —
    daily_function.py:1387 candidate count, :1456 per-candidate crossover
    message, :1534 buy-signal count, :1136 end-of-run summary): the
    notification feed, replayed as PARSED FIELDS. The per-symbol message
    embeds CCIs on the engine's grid chain (4-dp then 1-dp half-up); the
    harness compares those parsed numbers with a one-grid-cell tolerance
    (0.2 > the 0.1 cell), since a last-ulp difference between pandas' and
    the engine's CCI fold can flip the rendered 1-dp digit at a .05
    boundary — counts, kinds, and the as-of date compare exactly."""
    bw = best[best["investment_target"] == "win_rate"]
    cset = set(cand["user_id"])
    buys = reco[(reco["has_buy_signal"] == 1) & reco["user_id"].isin(cset)]
    run_d = str(events["d"].max())[:10]

    def g1(x):  # 4-dp then 1-dp half-up grid; +0.0 normalizes -0.0
        return float(round_half_up(round_half_up(float(x), 10000), 10)) + 0.0

    rows = [(1, np.nan, "candidate_count", float(len(cset)),
             np.nan, np.nan, np.nan, "")]
    for _, r in buys.sort_values("user_id").iterrows():
        rows.append((2, r["user_id"], "buy_signal", np.nan,
                     g1(r["yesterday_open_cci"]), g1(r["current_open_cci"]),
                     g1(r["condition_buy_cci_threshold"]), ""))
    rows.append((3, np.nan, "buy_count", float(len(buys)),
                 np.nan, np.nan, np.nan, ""))
    rows.append((4, np.nan, "run_end", float(len(bw)),
                 np.nan, np.nan, np.nan, run_d))
    return pd.DataFrame(rows, columns=[
        "seq_group", "user_id", "kind", "n", "y_cci", "c_cci", "thr", "run_d"])


def parse_notify_feed(spark_feed):
    """Parse the engine's rendered messages back into the replica's field
    schema, so the string-embedded numbers get numeric comparison."""
    import re
    rows = []
    for _, r in spark_feed.iterrows():
        kind, msg = r["kind"], r["message"]
        n = y = c = t = np.nan
        run_d = ""
        if kind == "buy_signal":
            m = re.search(r"전날 CCI: (-?[0-9.]+), 오늘 CCI: (-?[0-9.]+), "
                          r"매수 기준 CCI: (-?[0-9.]+),", msg)
            if m:
                y, c, t = (float(m.group(i)) for i in (1, 2, 3))
        elif kind == "run_end":
            m = re.search(r"DF length: (\d+), run_d: (\d{4}-\d{2}-\d{2})$", msg)
            if m:
                n, run_d = float(m.group(1)), m.group(2)
        else:
            n = float(msg.rsplit(" : ", 1)[1])
        rows.append((r["seq_group"], r["user_id"], kind, n, y, c, t, run_d))
    return pd.DataFrame(rows, columns=[
        "seq_group", "user_id", "kind", "n", "y_cci", "c_cci", "thr", "run_d"])


def replica_net_revenue(trades):
    """r11 (daily_function.py:99-100,1743-1744): tax on the sell side, fee
    both ways, fee-adjusted target price."""
    t = trades.copy()
    # identical expression ORDER to the engine (and the reference's
    # arithmetic): sell - buy - sell*tax - (buy+sell)*fee — IEEE doubles
    # evaluated in the same order are bit-identical
    net = (t["sell_price"] - t["buy_price"] - t["sell_price"] * TAX_RATE
           - (t["buy_price"] + t["sell_price"]) * FEE_RATE)
    t["gross_revenue"] = round_half_up(t["sell_price"] - t["buy_price"], 10000)
    t["net_revenue"] = round_half_up(net, 10000)
    with np.errstate(divide="ignore", invalid="ignore"):
        rate = round_half_up(net / t["buy_price"] * 100.0, 100)
    t["net_revenue_rate"] = pd.Series(rate).where(t["buy_price"] != 0.0)
    ntp = round_half_up(
        t["buy_price"] * (1.0 + (t["condition_target_return"] + TAX_RATE + FEE_RATE) / 100.0), 1)
    note_deviation("net_target_price", ntp, np.round(
        t["buy_price"] * (1.0 + (t["condition_target_return"] + TAX_RATE + FEE_RATE) / 100.0), 0))
    t["net_target_price"] = ntp
    return t


def _sim_days(events):
    """The r32/r34 run window: each trading day of the last week paired
    with the previous trading day (the fetch window's open end). Trading
    rule = CciPipeline.isTradingDayLocal: epoch-day+3 mod 7 < 5 (Mon-Fri;
    1970-01-01 was a Thursday) and day-of-month % 7 != 3 (the synthetic
    holiday gate)."""
    maxd = events["d"].max()
    start = maxd - pd.Timedelta(days=6)
    epoch = pd.Timestamp("1970-01-01")
    out = []
    prev = start - pd.Timedelta(days=1)
    for s in pd.date_range(start, maxd, freq="D"):
        if ((s - epoch).days + 3) % 7 < 5 and s.day % 7 != 3:
            out.append((s, prev))
            prev = s
    return out


def _latest_state(cci, s):
    """Per-series state as of sim day s: the (max-idx, max-idx−1) CCI rows
    with d <= s — what the engine's state dimension carries forward."""
    cle = cci[cci["d"] <= s]
    tail = (cle.sort_values(["user_id", "idx"], kind="mergesort")
               .groupby("user_id", sort=True).tail(2))
    g = tail.groupby("user_id", sort=True)
    st = g.agg(state_d=("d", "last"), close_pr=("close_pr", "last"),
               close_cci=("close_cci", "last"), cur_cci=("open_cci", "last"))
    st["prev_cci"] = g["open_cci"].agg(
        lambda x: x.iloc[-2] if len(x) >= 2 else np.nan)
    return st


def replica_daily_digest(events, cci):
    """r32 (app.py:49 execute_pipeline, one iteration per trading day):
    the digest a one-shot full recompute produces for each sim day —
    events fetched in the (prev, s] watermark window, CCI rows <= s (a
    trailing window never changes under append, so the day-s CCI state IS
    the full CCI restricted to d <= s), and the crossover count over each
    series' latest (yesterday, current) open-CCI pair against the literal
    threshold grid (recommendation semantics: >= on the current side,
    daily_function.py:1218)."""
    rows = []
    for s, prev in _sim_days(events):
        n_fetched = int(((events["d"] > prev) & (events["d"] <= s)).sum())
        cle = cci[cci["d"] <= s]
        st = _latest_state(cci, s)
        cur = st["cur_cci"].to_numpy(dtype=float)
        prv = st["prev_cci"].to_numpy(dtype=float)
        nsig = 0
        for thr in BUY_THRESHOLDS:
            with np.errstate(invalid="ignore"):
                nsig += int(((prv < thr) & (cur >= thr)).sum())
        rows.append((s, n_fetched, int((cle["d"] > prev).sum()), len(cle),
                     cle["user_id"].nunique(), nsig))
    return pd.DataFrame(rows, columns=[
        "d", "n_fetched", "n_cci_new", "n_cci_total", "n_series",
        "n_buy_signals"])


def replica_daily_positions(events, cci, best):
    """r34: every lot of the daily product's buy→hold→sell lifecycle,
    replayed one-shot. A lot opens on a sim day where the series got a
    fresh bar (state_d > prev sim day) and its (yesterday, current) pair
    crosses the series' best-win buy threshold (daily_function.py:1218
    '>=' on the current side); sizing is the reference's budget-slice
    floor+0.5 (:1393-1401). It closes at the first later sim day where —
    in r06's precedence order — close beats the fee-adjusted net target
    (needs a bar newer than the purchase), close-CCI hits the stop
    threshold (same freshness gate), or the calendar reaches buy date +
    holding days (:1713-1760); otherwise it is still `open`."""
    bw = best[best["investment_target"] == "win_rate"].set_index("user_id")
    sim = _sim_days(events)
    states = [_latest_state(cci, s) for s, _ in sim]
    budget_slice = math.floor(BUDGET * BUDGET_FRACTION)
    lots = []
    for di, (s, prev) in enumerate(sim):
        st = states[di]
        fresh = st[st["state_d"] > prev]
        j = fresh.join(bw, how="inner")
        for uid, r in j.iterrows():
            thr = r["condition_buy_cci_threshold"]
            # NaN CCI on either side compares False -> no signal
            if not (r["prev_cci"] < thr and r["cur_cci"] >= thr):
                continue
            price = r["close_pr"]
            if price == 0.0:
                continue
            qty = math.floor(budget_slice / price + 0.5)
            if qty < 1:
                continue
            ntp = float(math.floor(price * (1.0 + (
                r["condition_target_return"] + TAX_RATE + FEE_RATE) / 100.0) + 0.5))
            lots.append((uid, di, r["state_d"], price, qty,
                         int(r["condition_holding_days"]),
                         r["condition_target_return"],
                         r["condition_stop_loss_cci_threshold"], ntp))
    rows = []
    for uid, buy_i, buy_d, price, qty, h, tgt, stop, ntp in lots:
        result, sell_d, sell_price = "open", pd.NaT, np.nan
        for di in range(buy_i + 1, len(sim)):
            s = sim[di][0]
            r = states[di].loc[uid]
            res = None
            if r["state_d"] > buy_d and r["close_pr"] > ntp:
                res = "reach_target"
            elif r["state_d"] > buy_d and r["close_cci"] <= stop:
                res = "stop_loss"
            elif s >= buy_d + pd.Timedelta(days=h):
                res = "maturity"
            if res is not None:
                result, sell_d, sell_price = res, s, r["close_pr"]
                break
        rows.append((uid, buy_d, price, qty, h, tgt, result, sell_d, sell_price))
    return pd.DataFrame(rows, columns=[
        "user_id", "buy_d", "buy_price", "buy_qty", "condition_holding_days",
        "condition_target_return", "trade_result", "sell_d", "sell_price"])


def replica_index_relative(events, cci):
    """r33 (hankook_api.py:153,174 get_index_daily_price): market-wide
    index bars — every event across all series aggregated per day, first/
    last by the total (ts, event_id) order — run through the SAME rolling
    CCI under a pseudo series key, joined back per symbol as relative
    strength (symbol CCI minus index CCI on the day)."""
    ev = events.sort_values(["d", "ts_us", "event_id"], kind="mergesort")
    g = ev.groupby("d", sort=True)
    ibars = g.agg(open_pr=("value", "first"), high_pr=("value", "max"),
                  low_pr=("value", "min"), close_pr=("value", "last"),
                  volume=("value", "size")).reset_index()
    ibars["user_id"] = -1
    icci = (replica_cci(ibars)[["d", "close_cci"]]
            .rename(columns={"close_cci": "index_cci_raw"}))
    out = cci.merge(icci, on="d", how="inner")
    out = out[out["close_cci"].notna() & out["index_cci_raw"].notna()]
    return pd.DataFrame({
        "user_id": out["user_id"], "d": out["d"],
        "close_cci": round_half_up(out["close_cci"], 10000),
        "index_cci": round_half_up(out["index_cci_raw"], 10000),
        "rel_strength": round_half_up(
            out["close_cci"] - out["index_cci_raw"], 10000)})


def replica_index_category(events):
    """r44 (hankook_api.py:174 get_index_category_price): category index
    bars — every event aggregated per (category = event_type, day), the
    open/close picks by the total (ts_us, event_id) order — run through
    the SAME rolling CCI as r04 with the category as the series key; only
    full-window rows (non-null CCI) survive, 1e-4 half-up grid."""
    ev = events.sort_values(["event_type", "d", "ts_us", "event_id"],
                            kind="mergesort")
    g = ev.groupby(["event_type", "d"], sort=True)
    cbars = (g.agg(open_pr=("value", "first"), high_pr=("value", "max"),
                   low_pr=("value", "min"), close_pr=("value", "last"),
                   volume=("value", "size")).reset_index()
             .rename(columns={"event_type": "user_id"}))
    ccci = replica_cci(cbars)
    out = ccci[ccci["close_cci"].notna()]
    return pd.DataFrame({
        "category": out["user_id"], "d": out["d"],
        "idx": out["idx"].astype("int64"),
        "sma_close": round_half_up(out["sma_c"], 10000),
        "mad_close": round_half_up(out["mad_c"], 10000),
        "index_cci": round_half_up(out["close_cci"], 10000)})


def replica_stock_info(sf_dir):
    """r45 (daily_function.py:245-258): the listing's 'etf' class arrives
    with total_stock = 0 / NULL marcap and each etf symbol is patched
    from the info probe over lineitem (quantity sum -> total_stock,
    2-dp mean price x qty -> marcap); rows the probe cannot resolve drop
    under the final total_stock > 0 filter."""
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_partkey", "l_quantity", "l_extendedprice"]]
    etf = part["p_type"].str.startswith("ECONOMY")
    listing = pd.DataFrame({
        "symbol": part["p_partkey"],
        "name": part["p_name"],
        "type": np.where(etf, "etf", "stock"),
        "total_stock": np.where(etf, 0, part["p_size"]).astype("int64"),
        "marcap": np.where(etf, np.nan, part["p_retailprice"])})
    keys = set(listing.loc[listing["type"] == "etf", "symbol"])
    probe = li[li["l_partkey"].isin(keys)]
    info = (probe.groupby("l_partkey", sort=True)
            .agg(lstg_qty=("l_quantity", "sum"),
                 ref_price=("l_extendedprice", "mean")).reset_index()
            .rename(columns={"l_partkey": "symbol"}))
    info["lstg_qty"] = info["lstg_qty"].astype("int64")
    info["ref_price"] = round_half_up(info["ref_price"], 100)
    out = listing.merge(info, on="symbol", how="left")
    is_etf = out["type"] == "etf"
    out["total_stock"] = np.where(
        is_etf, out["lstg_qty"].fillna(0), out["total_stock"]).astype("int64")
    out["marcap"] = np.where(
        is_etf, round_half_up(out["lstg_qty"] * out["ref_price"], 100),
        out["marcap"])
    out = out[out["total_stock"] > 0]
    return (out[["symbol", "name", "type", "total_stock", "marcap"]]
            .sort_values("symbol").reset_index(drop=True))


def replica_daily_balance(events, cci, best):
    """r36: the cash-balance carry, replayed sequentially. Sizing reads
    the balance entering the lot's open day (get_stock_balance →
    daily_function.py:1462-1474: >= 1M won -> 10% slice, positive < 1M ->
    qty 1, non-positive -> nothing); buys debit cost incl. the buy-side
    fee and sells credit net proceeds (r11 arithmetic) into the next
    day's snapshot. Exact integer cents: per-lot half-up, integer sums."""
    bw = best[best["investment_target"] == "win_rate"].set_index("user_id")
    sim = _sim_days(events)
    states = [_latest_state(cci, s) for s, _ in sim]
    FULL = 100000000  # 1M won in cents

    def qty_of(b, price):
        if b >= FULL:
            return math.floor(math.floor(b / 1000.0) / price + 0.5)
        return 1 if b > 0 else 0

    # candidate lots with close info — sizing-independent, so computable
    # before the balance fold (the close DAY doesn't depend on qty)
    lots = []  # (open_i, buy_price, close_i, sell_price)
    for di, (s, prev) in enumerate(sim):
        st = states[di]
        fresh = st[st["state_d"] > prev]
        j = fresh.join(bw, how="inner")
        for uid, r in j.iterrows():
            thr = r["condition_buy_cci_threshold"]
            if not (r["prev_cci"] < thr and r["cur_cci"] >= thr):
                continue
            if r["close_pr"] == 0.0:
                continue
            buy_d = r["state_d"]
            ntp = float(math.floor(r["close_pr"] * (1.0 + (
                r["condition_target_return"] + TAX_RATE + FEE_RATE) / 100.0) + 0.5))
            close_i, sell_price = None, None
            for dj in range(di + 1, len(sim)):
                r2 = states[dj].loc[uid]
                if ((r2["state_d"] > buy_d and r2["close_pr"] > ntp)
                        or (r2["state_d"] > buy_d
                            and r2["close_cci"] <= r["condition_stop_loss_cci_threshold"])
                        or (sim[dj][0] >= buy_d + pd.Timedelta(
                            days=int(r["condition_holding_days"])))):
                    close_i, sell_price = dj, r2["close_pr"]
                    break
            lots.append((di, float(r["close_pr"]), close_i, sell_price))

    b = float(FULL)
    hist = []
    rows = []
    for di, (s, _) in enumerate(sim):
        hist.append(b)
        cost = sum(math.floor(qty_of(b, p) * p * (1.0 + FEE_RATE) * 100.0 + 0.5)
                   for (oi, p, _, _) in lots if oi == di)
        proc = sum(math.floor(qty_of(hist[oi], p) * sp
                              * (1.0 - TAX_RATE - FEE_RATE) * 100.0 + 0.5)
                   for (oi, p, ci, sp) in lots if ci == di)
        rows.append((s, int(b), int(cost), int(proc), int(b - cost + proc)))
        b = b - cost + proc
    return pd.DataFrame(rows, columns=[
        "d", "bal_start_cents", "buy_cost_cents", "sell_proceeds_cents",
        "bal_end_cents"])


# ----------------- order reconciliation + ledger (VERDICT r13 task 6)
# r18 (reference check_buy_order_execution daily_function.py:1632 and
# check_sell_order_execution :1828) and r26 (the running holdings/cash
# state the reference reads back from the broker before each sell
# decision, hankook_api.py:283), replayed with the reference's own
# idioms: the per-report overwrite loop applies execution reports in
# order so the NEWEST report per order leg wins (== a recency sort +
# drop_duplicates(keep='last')), the trade result is the reference's
# status transition (maturity if the sell executed on/after the
# maturity date, else reach_target/stop_loss on the price sign), and
# the revenue chain is (sell - buy) - (round(sell*fee) + round(sell*tax))
# with rate/per-day rounded to 2 decimals. Declared half-up rounding
# (round_half_up) stands in for the reference's np.round, same policy
# (and same deviation reporting) as the r07/r11 metrics.

def replica_order_reconcile(sf_dir):
    """r18: submitted orders reconciled against the execution feed."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity",
                                  "l_extendedprice", "l_shipdate"])
    ex = li.assign(
        leg=np.where(li["l_linenumber"] % 2 == 1, "buy", "sell"),
        exec_date=pd.to_datetime(li["l_shipdate"]))
    # newest report per (order, leg); recency = (date, line, qty, price),
    # total so keep-last is deterministic under repeated report keys
    ex = ex.sort_values(["l_orderkey", "leg", "exec_date", "l_linenumber",
                         "l_quantity", "l_extendedprice"], kind="mergesort")
    last = ex.drop_duplicates(subset=["l_orderkey", "leg"], keep="last").copy()
    last["fill_qty"] = np.floor(last["l_quantity"])
    last["fill_price"] = np.where(
        last["l_quantity"] != 0.0,
        np.floor(last["l_extendedprice"] / last["l_quantity"] + 0.5), np.nan)
    def leg(name, pre):
        return (last[last["leg"] == name]
                .rename(columns={"exec_date": f"real_{pre}_date",
                                 "fill_qty": f"real_{pre}_qty",
                                 "fill_price": f"real_{pre}_price"})
                [["l_orderkey", f"real_{pre}_date", f"real_{pre}_qty",
                  f"real_{pre}_price"]])
    rec = (orders.assign(
            order_no=orders["o_orderkey"],
            buy_order_date=pd.to_datetime(orders["o_orderdate"]),
            holding_days=(orders["o_orderkey"] % 10 + 1).astype(int))
        .merge(leg("buy", "buy"), left_on="order_no", right_on="l_orderkey")
        .merge(leg("sell", "sell"), left_on="order_no", right_on="l_orderkey",
               how="left"))
    rec = rec[rec["real_buy_qty"] > 0].copy()  # unfilled buys drop (:1703)
    rec["maturity_date"] = (rec["real_buy_date"]
                            + pd.to_timedelta(rec["holding_days"], unit="D"))
    sold = rec["real_sell_date"].notna()
    rec["trade_result"] = np.select(
        [sold & (rec["real_sell_date"] >= rec["maturity_date"]),
         sold & (rec["real_sell_price"] > rec["real_buy_price"]),
         sold],
        ["maturity", "reach_target", "stop_loss"], default=None)
    fee = round_half_up(rec["real_sell_price"] * FEE_RATE, 1)
    tax = round_half_up(rec["real_sell_price"] * TAX_RATE, 1)
    rec["real_revenue"] = (rec["real_sell_price"] - rec["real_buy_price"]
                           - (fee + tax))
    rec["real_days_held"] = ((rec["real_sell_date"]
                              - rec["real_buy_date"]).dt.days + 1)
    rec["real_revenue_rate"] = np.where(
        rec["real_buy_price"] != 0,
        round_half_up(rec["real_revenue"] / rec["real_buy_price"] * 100.0, 100),
        np.nan)
    rec["real_revenue_per_days_held"] = np.where(
        rec["real_days_held"] != 0,
        round_half_up(rec["real_revenue"] / rec["real_days_held"], 100), np.nan)
    return rec[["order_no", "buy_order_date", "holding_days",
                "real_buy_date", "real_buy_qty", "real_buy_price",
                "maturity_date", "real_sell_date", "real_sell_qty",
                "real_sell_price", "trade_result", "real_revenue",
                "real_revenue_rate", "real_days_held",
                "real_revenue_per_days_held"]].reset_index(drop=True)


def replica_position_ledger(sf_dir, rec):
    """r26: each reconciled order's buy/sell fills as ledger events with
    running per-account position and cash balance."""
    cust = pd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"])
    r = rec.merge(cust, left_on="order_no", right_on="o_orderkey")
    buys = pd.DataFrame({
        "cust_id": r["o_custkey"], "event_date": r["real_buy_date"],
        "order_no": r["order_no"], "side": "buy",
        "qty_delta": r["real_buy_qty"],
        "cash_delta": -r["real_buy_qty"] * r["real_buy_price"]})
    sells = pd.DataFrame({
        "cust_id": r["o_custkey"], "event_date": r["real_sell_date"],
        "order_no": r["order_no"], "side": "sell",
        "qty_delta": -r["real_sell_qty"],
        "cash_delta": r["real_sell_qty"] * r["real_sell_price"]})
    fills = pd.concat([buys, sells], ignore_index=True)
    fills = fills[fills["event_date"].notna() & (fills["qty_delta"] != 0)]
    fills = fills.sort_values(["cust_id", "event_date", "order_no", "side"],
                              kind="mergesort").reset_index(drop=True)
    fills["position_qty"] = fills.groupby("cust_id")["qty_delta"].cumsum()
    fills["cash_balance"] = fills.groupby("cust_id")["cash_delta"].cumsum()
    return fills


# ------------------------------------------------------------ comparison

# ------------------------------------- LLM dedup chain (VERDICT r11 task 6)
# The C-section rows rested on single-transcription DuckDB gates alone;
# this replays the d01 -> d10 -> d03 dedup chain in independent pure
# pandas/stdlib code (hashlib md5, re canonicalizer, the documented
# 31-poly rolling hash and (a*x+b) % p minhash family) and compares the
# verdict sets to the parquet graft.Verify wrote. Constants mirror
# dedup/Dedup.scala (MinHashK/BandRows/JaccardThreshold) and
# functions/TextFunctions.scala (HashP, 3-gram shingles over a literal
# single-space split); the canonicalizer uses re.ASCII so \s matches the
# Java regex class, not Unicode whitespace.

import hashlib
import re

MINHASH_K = 32
BAND_ROWS = 4
NUM_BANDS = MINHASH_K // BAND_ROWS
HASH_P = 1000000007
JACCARD_THRESHOLD = 0.5


def load_documents(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]


def replica_dedup_exact(docs):
    d = docs.assign(content_hash=docs["text"].map(
        lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()))
    g = (d.groupby("content_hash", as_index=False)
         .agg(doc_id=("doc_id", "min"), dup_count=("doc_id", "size")))
    return g[["doc_id", "content_hash", "dup_count"]]


_norm_strip = re.compile(r"[^a-z0-9\s]", re.ASCII)
_norm_ws = re.compile(r"\s+", re.ASCII)


def _canon(t):
    return _norm_ws.sub(" ", _norm_strip.sub("", t.lower())).strip()


def replica_dedup_normalized(docs):
    d = docs.assign(
        raw_hash=docs["text"].map(
            lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()),
        norm_hash=docs["text"].map(
            lambda t: hashlib.md5(_canon(t).encode("utf-8")).hexdigest()))
    l1 = (d.groupby(["norm_hash", "raw_hash"], as_index=False)
          .agg(min_id=("doc_id", "min"), n=("doc_id", "size")))
    g = (l1.groupby("norm_hash", as_index=False)
         .agg(doc_id=("min_id", "min"), dup_count=("n", "sum"),
              n_variants=("min_id", "size")))
    return g[["doc_id", "norm_hash", "dup_count", "n_variants"]]


def _shingle_set(text):
    tk = text.split(" ")  # literal single-space split, empties kept
    if len(tk) < 3:
        return set()
    return {tk[i] + " " + tk[i + 1] + " " + tk[i + 2]
            for i in range(len(tk) - 2)}


def _poly_hash(s):
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % HASH_P
    return h


def replica_dedup_minhash(docs):
    shs = {r.doc_id: _shingle_set(r.text) for r in docs.itertuples()}
    a = [2 * i + 3 for i in range(MINHASH_K)]
    b = [97 + 31 * i for i in range(MINHASH_K)]
    buckets = {}
    for did in sorted(shs):
        ss = shs[did]
        if not ss:
            continue  # sub-3-token docs carry no signature (engine parity)
        xs = [_poly_hash(s) for s in ss]
        sig = [min((x * a[i] + b[i]) % HASH_P for x in xs)
               for i in range(MINHASH_K)]
        for band in range(NUM_BANDS):
            key = "-".join(str(sig[band * BAND_ROWS + r])
                           for r in range(BAND_ROWS))
            buckets.setdefault((band, key), []).append(did)
    cand = set()
    for ids in buckets.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    rows = []
    for da, db in sorted(cand):
        sa, sb = shs[da], shs[db]
        common = len(sa & sb)
        jac = common / (len(sa) + len(sb) - common)
        if jac >= JACCARD_THRESHOLD:  # filter on the UNROUNDED value
            rows.append((da, db, math.floor(jac * 10000 + 0.5) / 10000))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def norm_key(v):
    if v is None or v is pd.NaT or (
            isinstance(v, (float, np.floating)) and np.isnan(v)):
        return "null"
    if isinstance(v, (np.floating, float)):
        return repr(round(float(v), 6))
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d")
    if hasattr(v, "isoformat"):
        return v.isoformat()[:10]
    if isinstance(v, np.datetime64):
        return str(v)[:10]
    return str(v)


FAILS = []
CHECKED = []


def compare(name, spark_df, rep_df, keys, exact_cols, tol_cols):
    """Merge on string-normalized keys; exact_cols compare as normalized
    strings (dates, counts, results, raw prices), tol_cols as |a-b| <= tol
    with NaN<->null equivalence."""
    CHECKED.append(name)
    problems = []
    if len(spark_df) == 0 and len(rep_df) == 0:
        # a shared bug (or a data regen that emptied a table) must not
        # read as agreement — every replica-checked stage is non-empty at
        # the gated scale factors
        problems.append("both sides empty — vacuous compare")
    if len(spark_df) != len(rep_df):
        problems.append(f"row count spark={len(spark_df)} replica={len(rep_df)}")
    sk = spark_df.copy()
    rk = rep_df.copy()
    for df in (sk, rk):
        df["_k"] = df[keys].apply(lambda r: "|".join(norm_key(v) for v in r), axis=1)
    s_dup, r_dup = sk["_k"].duplicated().any(), rk["_k"].duplicated().any()
    if s_dup or r_dup:
        problems.append(f"non-unique keys spark={s_dup} replica={r_dup}")
    m = sk.merge(rk, on="_k", how="outer", suffixes=("_s", "_r"), indicator=True)
    only_s = m[m["_merge"] == "left_only"]
    only_r = m[m["_merge"] == "right_only"]
    if len(only_s) or len(only_r):
        problems.append(f"key mismatch: {len(only_s)} only-spark, {len(only_r)} only-replica")
        for _, r in pd.concat([only_s.head(3), only_r.head(3)]).iterrows():
            problems.append(f"  {r['_merge']}: {r['_k']}")
    both = m[m["_merge"] == "both"]
    for c in exact_cols:
        a, b = both[f"{c}_s"] if f"{c}_s" in both else both[c], None
        b = both[f"{c}_r"] if f"{c}_r" in both else both[c]
        av = a.map(norm_key)
        bv = b.map(norm_key)
        bad = both[av.ne(bv)]
        if len(bad):
            r0 = bad.iloc[0]
            problems.append(
                f"col {c}: {len(bad)} mismatches; first at {r0['_k']}: "
                f"spark={r0.get(f'{c}_s', r0.get(c))} replica={r0.get(f'{c}_r')}")
    for c, tol in tol_cols.items():
        a = pd.to_numeric(both.get(f"{c}_s", both.get(c)), errors="coerce")
        b = pd.to_numeric(both.get(f"{c}_r"), errors="coerce")
        null_mismatch = a.isna() ^ b.isna()
        diff = (a - b).abs()
        bad = both[null_mismatch | (diff > tol)]
        if len(bad):
            r0 = bad.iloc[0]
            problems.append(
                f"col {c} (tol {tol}): {len(bad)} beyond tolerance; first at "
                f"{r0['_k']}: spark={r0.get(f'{c}_s')} replica={r0.get(f'{c}_r')}")
    if problems:
        FAILS.append(name)
        print(f"FAIL {name}")
        for p in problems[:8]:
            print(f"  {p}")
    else:
        print(f"PASS {name} ({len(spark_df)} rows)")


# ------------------------------------------------------------------ main

# --------------------------------- LLM text-LM chain (VERDICT r12 task 5)
# t07 (bigram LM) and t09 (per-doc LM scoring) re-derived in independent
# pure-python/pandas code from the DECLARED semantics: a literal
# single-space split (empties kept, matching java split(" ", -1) and
# duckdb string_split), bigram type counts, conditional probability
# fr(c2/c1, 6), and t09's exact-integer-millionths per-doc averaging
# (floor(p*1e6+0.5) summed as ints, mean via the fixed sum/1e6/n_matched
# division chain) — the same float discipline the Scala and SQL share, so
# comparisons are exact-grade (1e-9), not toleranced.

BIGRAM_MIN_COUNT = 5


def _bigrams(text):
    tk = text.split(" ")  # literal single-space split, empties kept
    return list(zip(tk[:-1], tk[1:])) if len(tk) >= 2 else []


def _fr(x, n):
    return math.floor(x * (10 ** n) + 0.5) / (10 ** n)


def _lm_tables(docs):
    from collections import Counter
    c2 = Counter()
    per_doc = []
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        bg = _bigrams(t)
        if bg:
            per_doc.append((doc_id, bg))
            c2.update(bg)
    c1 = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    return c2, c1, per_doc


def replica_bigram_lm(docs):
    c2, c1, _ = _lm_tables(docs)
    rows = [(w1, w2, c, c1[w1], _fr(c / c1[w1], 6))
            for (w1, w2), c in c2.items() if c >= BIGRAM_MIN_COUNT]
    return pd.DataFrame(rows, columns=["w1", "w2", "c2", "c1", "p_cond"])


def replica_lm_score(docs):
    c2, c1, per_doc = _lm_tables(docs)
    lm = {bg: _fr(c / c1[bg[0]], 6)
          for bg, c in c2.items() if c >= BIGRAM_MIN_COUNT}
    rows = []
    for doc_id, bg in per_doc:
        matched = [lm[b] for b in bg if b in lm]
        n_m = len(matched)
        sum_p6 = sum(int(math.floor(p * 1e6 + 0.5)) for p in matched)
        rows.append((doc_id, len(bg), n_m,
                     _fr(n_m / len(bg), 4),
                     _fr(sum_p6 / 1e6 / n_m, 6) if n_m > 0 else float("nan")))
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_pairs", "n_matched", "lm_coverage", "avg_p_cond"])


# ------------------------------------ t02 quality score (round-13)
# Rule-based ratios over the literal single-space split, every division
# and the 0.4/0.4/0.2 blend in the engine's declared order, rounded
# fr(·, 4). len() counts codepoints on both sides; the punct class is
# the shared literal [.,!?;:].

T02_STOPWORDS = {"the", "a", "of", "and", "to", "in", "is", "it",
                 "that", "for"}
_t02_punct = re.compile(r"[.,!?;:]")


def replica_quality(docs):
    rows = []
    for doc_id, lang, source, t in zip(
            docs["doc_id"], docs["lang"], docs["source"], docs["text"]):
        tk = t.split(" ")
        n = len(tk)
        stop = sum(1 for w in tk if w in T02_STOPWORDS)
        punct = len(_t02_punct.findall(t))
        s = 0.0
        for w in tk:
            s += float(len(w))
        avg_tok = s / n
        ln = len(t)
        punct_ratio = _fr(punct / ln, 4) if ln > 0 else float("nan")
        quality = (_fr(0.4 * (stop / n) + 0.4 * min(avg_tok / 10.0, 1.0)
                       + 0.2 * (1.0 - punct / ln), 4)
                   if ln > 0 else float("nan"))
        rows.append((doc_id, lang, source, n, _fr(stop / n, 4),
                     punct_ratio, _fr(avg_tok, 4), quality))
    return pd.DataFrame(rows, columns=[
        "doc_id", "lang", "source", "n_tokens", "stopword_ratio",
        "punct_ratio", "avg_token_len", "quality_score"])


# --------------------------------- t04 document fingerprint (round-13)
# Reuses the dedup replica's independently-derived 31-poly rolling hash:
# whole-text fingerprint + min over the distinct 3-gram shingle hashes,
# docs under 3 tokens dropped (no shingles — the oracle's join drops
# them too).


def replica_fingerprint(docs):
    rows = []
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        if len(t.split(" ")) < 3:
            continue
        shs = _shingle_set(t)
        rows.append((doc_id, _poly_hash(t),
                     min(_poly_hash(s) for s in shs)))
    return pd.DataFrame(rows, columns=[
        "doc_id", "fingerprint", "min_shingle_hash"])


# ------------------------------------ t10 tf-idf top terms (round-13)
# Integer-only chain: per-doc term counts over the literal single-space
# split (empties dropped), corpus document frequency, per-doc top-k by
# (tf desc, df asc, term asc) — the string tiebreak is UTF-8 byte order,
# which equals codepoint order, so python's str compare matches the
# engine's bytewise UTF8String compare.

TFIDF_TOPK = 3


def replica_tfidf(docs):
    from collections import Counter
    doc_tf = []
    df = Counter()
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        tf = Counter(w for w in t.split(" ") if w != "")
        if tf:
            doc_tf.append((doc_id, tf))
            df.update(tf.keys())
    rows = []
    for doc_id, tf in doc_tf:
        ranked = sorted(((-c, df[w], w) for w, c in tf.items()))[:TFIDF_TOPK]
        for rk, (nc, d, w) in enumerate(ranked, start=1):
            rows.append((doc_id, w, -nc, d, rk))
    return pd.DataFrame(rows, columns=["doc_id", "term", "tf", "df", "rk"])


# ------------------------------- ANN brute-force (round-13, missing #4)
# s01 re-derived in pure python: float32 embeddings widened to float64
# (the engine's array<double> cast, exact), norms and dots as ASCENDING-
# INDEX left folds (DotF64Expr / foldSum's declared order, so every IEEE
# op matches bit-for-bit), cosine rounded fr(·, 6) BEFORE ranking, rank
# by (cosine desc, neighbor_id asc), top ANN_TOPK per every
# ANN_QUERY_STRIDE-th vector, self and zero-norm pairs excluded.

ANN_TOPK = 5
ANN_QUERY_STRIDE = 100


def load_embeddings(sf_dir):
    return pd.read_parquet(f"{sf_dir}/embeddings.parquet")[["vec_id", "embedding"]]


def replica_ann_bruteforce(emb):
    vecs = [(int(vid), [float(x) for x in v])
            for vid, v in zip(emb["vec_id"], emb["embedding"])]

    def fold_norm(v):
        s = 0.0
        for x in v:
            s += x * x
        return math.sqrt(s)

    norms = {vid: fold_norm(v) for vid, v in vecs}
    rows = []
    for qid, vq in vecs:
        if qid % ANN_QUERY_STRIDE != 0:
            continue
        nq = norms[qid]
        scored = []
        for nid, vn in vecs:
            if nid == qid:
                continue
            nn = norms[nid]
            if nq * nn == 0.0:
                continue
            s = 0.0
            for a, b in zip(vq, vn):
                s += a * b
            scored.append((-_fr(s / (nq * nn), 6), nid))
        scored.sort()
        for rnk, (negc, nid) in enumerate(scored[:ANN_TOPK], start=1):
            rows.append((qid, rnk, nid, -negc))
    return pd.DataFrame(rows, columns=[
        "query_id", "rnk", "neighbor_id", "cosine"])


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    do_time = "--time" in sys.argv
    timings = {}

    def timed(key, fn, *a):
        t0 = time.time()
        r = fn(*a)
        timings[key] = round(time.time() - t0, 2)
        return r

    events = timed("load", load_events, sf_dir)

    sym = timed("r01_symbol_dim", replica_symbol_dim, sf_dir)
    compare("r01_symbol_dim", load_spark(out_dir, "r01_symbol_dim"), sym,
            ["symbol"], ["name", "type", "total_stock"], {"marcap": 1e-9})

    bars = timed("r02_ohlc_bars", replica_bars, events)
    compare("r02_ohlc_bars", load_spark(out_dir, "r02_ohlc_bars"), bars,
            ["user_id", "d"], ["volume"],
            {c: 1e-9 for c in ["open_pr", "high_pr", "low_pr", "close_pr"]})

    chart = timed("r48_item_chart", replica_item_chart, events)
    # norm_key renders timestamps at DATE granularity — stringify the
    # minute key on both sides so distinct minutes never collide
    spark_chart = load_spark(out_dir, "r48_item_chart")
    spark_chart["m"] = spark_chart["m"].astype("datetime64[us]").astype(str)
    chart["m"] = chart["m"].astype("datetime64[us]").astype(str)
    compare("r48_item_chart", spark_chart, chart,
            ["user_id", "m"], ["volume"],
            {c: 1e-9 for c in ["open_pr", "high_pr", "low_pr", "close_pr"]})

    keep = timed("r03_upsert_keep_last", replica_keep_last, events)
    compare("r03_upsert_keep_last", load_spark(out_dir, "r03_upsert_keep_last"),
            keep, ["user_id", "d", "event_type"], ["event_id"], {"value": 1e-9})

    cci = timed("r04_cci", replica_cci, bars)
    cci_cmp = cci.assign(
        sma_close=round_half_up(cci["sma_c"], 10000),
        mad_close=round_half_up(cci["mad_c"], 10000),
        close_cci_r=round_half_up(cci["close_cci"], 10000),
        open_cci_r=round_half_up(cci["open_cci"], 10000),
    ).rename(columns={"close_cci_r": "close_cci_cmp", "open_cci_r": "open_cci_cmp"})
    spark_cci = load_spark(out_dir, "r04_cci").rename(
        columns={"close_cci": "close_cci_cmp", "open_cci": "open_cci_cmp"})
    compare("r04_cci", spark_cci, cci_cmp, ["user_id", "d"], ["idx"],
            {"open_pr": 1e-9, "close_pr": 1e-9, "sma_close": 2e-4,
             "mad_close": 2e-4, "close_cci_cmp": 2e-4, "open_cci_cmp": 2e-4})

    sig = timed("r05_signals", replica_signals, cci)
    sig_cmp = sig.assign(prev_open_cci=round_half_up(sig["prev_open_cci"], 10000),
                         open_cci=round_half_up(sig["open_cci"], 10000))
    compare("r05_signals", load_spark(out_dir, "r05_signals"), sig_cmp,
            ["user_id", "d", "buy_thr"], ["idx"],
            {"open_pr": 1e-9, "prev_open_cci": 2e-4, "open_cci": 2e-4})

    trades = timed("r06_trade_sim", replica_trades, cci)
    trade_keys = ["user_id", "buy_date"] + GROUP_COLS
    compare("r06_trade_sim", load_spark(out_dir, "r06_trade_sim"), trades,
            trade_keys, ["trade_result", "sell_date", "days_held"],
            {"buy_price": 1e-9, "sell_price": 1e-9})

    strat = timed("r07_strategy_agg", replica_strategy, trades)
    metric_tols = {"win_rate": 1e-6, "lose_rate": 1e-6, "total_revenue": 1e-6,
                   "revenue_rate": 1e-6, "reach_target_rate": 1e-6,
                   "stop_loss_rate": 1e-6, "maturity_rate": 1e-6,
                   "avg_revenue_per_days_held": 1.5e-4, "avg_days_held": 1e-6,
                   "total_buy_price": 1e-6, "total_sell_price": 1e-6}
    compare("r07_strategy_agg", load_spark(out_dir, "r07_strategy_agg"), strat,
            ["user_id"] + GROUP_COLS,
            ["count_buy_date", "count_reach_target_date", "count_stop_loss_date",
             "count_maturity_date", "count_win", "count_lose"], metric_tols)

    best = timed("r08_best_of", replica_best, strat)
    compare("r08_best_of", load_spark(out_dir, "r08_best_of"), best,
            ["investment_target", "user_id"],
            GROUP_COLS + ["count_buy_date", "count_win", "count_lose"],
            {k: metric_tols[k] for k in ["win_rate", "revenue_rate",
             "avg_revenue_per_days_held", "avg_days_held"]})

    reco = timed("r09_recommendations", replica_recommendations, cci, best)
    reco_cmp = reco.assign(
        current_open_cci=round_half_up(reco["current_open_cci"], 10000),
        yesterday_open_cci=round_half_up(reco["yesterday_open_cci"], 10000))
    compare("r09_recommendations", load_spark(out_dir, "r09_recommendations"),
            reco_cmp, ["user_id"],
            GROUP_COLS + ["count_win", "has_buy_signal"],
            {"buy_price": 1e-9, "current_open_cci": 2e-4,
             "yesterday_open_cci": 2e-4})

    cand = timed("r10_candidate_filter", replica_candidates, best)
    compare("r10_candidate_filter", load_spark(out_dir, "r10_candidate_filter"),
            cand, ["user_id"], GROUP_COLS + ["count_win"], {})

    netr = timed("r11_net_revenue", replica_net_revenue, trades)
    compare("r11_net_revenue", load_spark(out_dir, "r11_net_revenue"), netr,
            trade_keys, ["trade_result", "sell_date", "days_held"],
            {"buy_price": 1e-9, "sell_price": 1e-9, "gross_revenue": 1e-6,
             "net_revenue": 1e-6, "net_revenue_rate": 1e-6,
             "net_target_price": 1e-6})

    hist = timed("r20_history_grid_sim", replica_trades_history_grid, cci)
    compare("r20_history_grid_sim", load_spark(out_dir, "r20_history_grid_sim"),
            hist, ["user_id", "buy_date", "search_history_days"] + GROUP_COLS,
            ["trade_result", "sell_date", "days_held"],
            {"buy_price": 1e-9, "sell_price": 1e-9})

    daily = timed("r32_daily_run", replica_daily_digest, events, cci)
    compare("r32_daily_run", load_spark(out_dir, "r32_daily_run"), daily,
            ["d"], ["n_fetched", "n_cci_new", "n_cci_total", "n_series",
                    "n_buy_signals"], {})

    pos = timed("r34_daily_positions", replica_daily_positions, events, cci, best)
    compare("r34_daily_positions", load_spark(out_dir, "r34_daily_positions"),
            pos, ["user_id", "buy_d"],
            ["buy_qty", "condition_holding_days", "trade_result", "sell_d"],
            {"buy_price": 1e-9, "condition_target_return": 1e-9,
             "sell_price": 1e-9})

    idx = timed("r33_index_relative", replica_index_relative, events, cci)
    compare("r33_index_relative", load_spark(out_dir, "r33_index_relative"),
            idx, ["user_id", "d"], [],
            {"close_cci": 2e-4, "index_cci": 2e-4, "rel_strength": 2e-4})

    cat = timed("r44_index_category", replica_index_category, events)
    compare("r44_index_category", load_spark(out_dir, "r44_index_category"),
            cat, ["category", "d"], ["idx"],
            {"sma_close": 2e-4, "mad_close": 2e-4, "index_cci": 2e-4})

    sinfo = timed("r45_stock_info", replica_stock_info, sf_dir)
    sp45 = load_spark(out_dir, "r45_stock_info")
    # stock rows: listing values pass through verbatim — exact compare
    compare("r45_stock_info", sp45[sp45["type"] == "stock"],
            sinfo[sinfo["type"] == "stock"], ["symbol"],
            ["name", "type", "total_stock"], {"marcap": 1e-9})
    # etf rows: marcap = qty * round(mean(price), 2) — the double MEAN is
    # addition-order-dependent in its last ulp, so an exact half-cent
    # boundary can round one cent apart between engines (observed at
    # sf0.1: 17 of ~1900 symbols). Compare the per-unit price with a
    # one-cent band instead of inflating a blanket marcap tolerance by
    # the quantity factor.
    def unit(df):
        return df.assign(unit_price=df["marcap"] / df["total_stock"])
    compare("r45_stock_info_etf", unit(sp45[sp45["type"] == "etf"]),
            unit(sinfo[sinfo["type"] == "etf"]), ["symbol"],
            ["name", "type", "total_stock"], {"unit_price": 0.0101})

    balt = timed("r36_daily_balance", replica_daily_balance, events, cci, best)
    compare("r36_daily_balance", load_spark(out_dir, "r36_daily_balance"),
            balt, ["d"], ["bal_start_cents", "buy_cost_cents",
                          "sell_proceeds_cents", "bal_end_cents"], {})

    feed = timed("r39_notify_feed", replica_notify_feed, reco, cand, best, events)
    compare("r39_notify_feed",
            parse_notify_feed(load_spark(out_dir, "r39_notify_feed")), feed,
            ["seq_group", "user_id"], ["kind", "n", "run_d"],
            # one 1-dp grid cell (0.2 > 0.1): a last-ulp CCI difference may
            # flip the rendered digit at a .05 boundary, never by two cells
            {"y_cci": 0.2, "c_cci": 0.2, "thr": 1e-9})

    rec = timed("r18_order_reconcile", replica_order_reconcile, sf_dir)
    compare("r18_order_reconcile", load_spark(out_dir, "r18_order_reconcile"),
            rec, ["order_no"],
            ["buy_order_date", "holding_days", "real_buy_date",
             "maturity_date", "real_sell_date", "trade_result"],
            {"real_buy_qty": 1e-9, "real_buy_price": 1e-9,
             "real_sell_qty": 1e-9, "real_sell_price": 1e-9,
             "real_revenue": 1e-9, "real_revenue_rate": 1e-6,
             "real_days_held": 1e-9, "real_revenue_per_days_held": 1e-6})

    ledger = timed("r26_position_ledger", replica_position_ledger, sf_dir, rec)
    compare("r26_position_ledger", load_spark(out_dir, "r26_position_ledger"),
            ledger, ["cust_id", "event_date", "order_no", "side"],
            [], {"qty_delta": 1e-9, "cash_delta": 1e-9,
                 "position_qty": 1e-9, "cash_balance": 1e-9})

    docs = timed("load_docs", load_documents, sf_dir)
    d01 = timed("d01_dedup_exact", replica_dedup_exact, docs)
    compare("d01_dedup_exact", load_spark(out_dir, "d01_dedup_exact"), d01,
            ["content_hash"], ["doc_id", "dup_count"], {})
    d10 = timed("d10_dedup_normalized", replica_dedup_normalized, docs)
    compare("d10_dedup_normalized", load_spark(out_dir, "d10_dedup_normalized"),
            d10, ["norm_hash"], ["doc_id", "dup_count", "n_variants"], {})
    d03 = timed("d03_dedup_minhash_lsh", replica_dedup_minhash, docs)
    compare("d03_dedup_minhash_lsh", load_spark(out_dir, "d03_dedup_minhash_lsh"),
            d03, ["doc_a", "doc_b"], [], {"jaccard": 1e-9})

    t07 = timed("t07_bigram_lm", replica_bigram_lm, docs)
    compare("t07_bigram_lm", load_spark(out_dir, "t07_bigram_lm"), t07,
            ["w1", "w2"], ["c2", "c1"], {"p_cond": 1e-9})
    t09 = timed("t09_lm_score", replica_lm_score, docs)
    compare("t09_lm_score", load_spark(out_dir, "t09_lm_score"), t09,
            ["doc_id"], ["n_pairs", "n_matched"],
            {"lm_coverage": 1e-9, "avg_p_cond": 1e-9})

    docs_full = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "lang", "source", "text"]]
    t02 = timed("t02_quality_score", replica_quality, docs_full)
    compare("t02_quality_score", load_spark(out_dir, "t02_quality_score"),
            t02, ["doc_id"], ["lang", "source", "n_tokens"],
            {"stopword_ratio": 1e-9, "punct_ratio": 1e-9,
             "avg_token_len": 1e-9, "quality_score": 1e-9})

    t04 = timed("t04_fingerprint", replica_fingerprint, docs)
    compare("t04_fingerprint", load_spark(out_dir, "t04_fingerprint"), t04,
            ["doc_id"], ["fingerprint", "min_shingle_hash"], {})

    t10 = timed("t10_tfidf", replica_tfidf, docs)
    compare("t10_tfidf", load_spark(out_dir, "t10_tfidf"), t10,
            ["doc_id", "rk"], ["term", "tf", "df"], {})

    emb = timed("load_emb", load_embeddings, sf_dir)
    s01 = timed("s01_ann_bruteforce", replica_ann_bruteforce, emb)
    compare("s01_ann_bruteforce", load_spark(out_dir, "s01_ann_bruteforce"),
            s01, ["query_id", "rnk"], ["neighbor_id"], {"cosine": 1e-9})

    n = len(CHECKED)
    print(f"\n{n - len(FAILS)} pass, {len(FAILS)} fail"
          + (f": {FAILS}" if FAILS else ""))
    if CONVENTION_DEVIATIONS:
        print("declared rounding-convention deviations vs np.round "
              "(half-up differs only on exact .5 grid boundaries):")
        for k, (cnt, mx) in sorted(CONVENTION_DEVIATIONS.items()):
            print(f"  {k}: {cnt} values, max |delta| = {mx:g}")
    else:
        print("declared rounding-convention deviations vs np.round: none")
    if do_time:
        import json
        timings["total"] = round(sum(timings.values()), 2)
        print("REPLICA_TIMINGS " + json.dumps(timings))
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
