"""Round-10 property tests.

Each case replays a round-10 operator's math on synthetic data built to
stress the structure the fixed testdata never does — boundary-exact
attribution windows, gappy hourly series, tie-heavy baskets — against a
pure-Python model (integer arithmetic) or a DuckDB replay of the
registered oracle on the same synthetic relation.
"""

from __future__ import annotations

import random

import duckdb
import pytest


# --- synthetic table writers ----------------------------------------------------


def _write_events(spark, path, rows):
    """rows: (event_id, us_offset, user_id, event_type, cents)."""
    import datetime as dt

    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame(
        [
            (
                eid,
                epoch + dt.timedelta(microseconds=us),
                uid,
                etype,
                float(cents) / 100.0,
                "{}",
            )
            for (eid, us, uid, etype, cents) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _events_duck(path):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{path}/events.parquet/*.parquet')"
    )
    return con


# --- Katz centrality --------------------------------------------------------------


def _model_katz(order_cust, line_supp, rounds, scale):
    """Integer Katz replay: raw co-purchase edges, symmetrize, attenuate
    by 2*maxW, `rounds` iterations from x0 = scale."""
    raw = {}
    cust_of = dict(order_cust)
    for ok, supp in line_supp:
        if ok not in cust_of:
            continue
        key = (cust_of[ok] * 2, supp * 2 + 1)
        raw[key] = raw.get(key, 0) + 1
    edges = {}
    for (s, d), w in raw.items():
        edges[(s, d)] = edges.get((s, d), 0) + w
        edges[(d, s)] = edges.get((d, s), 0) + w
    deg = {}
    for (s, _), w in edges.items():
        deg[s] = deg.get(s, 0) + w
    mxd = 2 * max(deg.values())
    x = {v: scale for v in deg}
    for _ in range(rounds):
        nxt = {}
        for (s, d), w in edges.items():
            nxt[d] = nxt.get(d, 0) + x[s] * w
        x = {v: scale + acc // mxd for v, acc in nxt.items()}
    return x


def test_katz_matches_integer_model(spark, tmp_path_factory):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.graph import (  # noqa: E501
        KATZ_ROUNDS,
        KATZ_SCALE,
        KATZ_TOP,
        gr_katz_centrality,
    )

    rng = random.Random(1010)
    n_orders, n_cust, n_supp = 120, 9, 7
    order_cust = [(ok, rng.randrange(n_cust)) for ok in range(n_orders)]
    line_supp = [
        (rng.randrange(n_orders), rng.randrange(n_supp))
        for _ in range(400)
    ]
    path = str(tmp_path_factory.mktemp("katz"))
    spark.createDataFrame(
        [(ok, ck) for ok, ck in order_cust], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        [(ok, sk) for ok, sk in line_supp], "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")

    got = [(r["node"], r["katz"]) for r in gr_katz_centrality(spark, path).collect()]
    x = _model_katz(order_cust, line_supp, KATZ_ROUNDS, KATZ_SCALE)
    want = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:KATZ_TOP]
    assert got == want
    # attenuation bound: the geometric-series cap must hold
    assert all(v < 2 * KATZ_SCALE for _, v in x.items())


# --- market basket ----------------------------------------------------------------


def _model_basket(baskets, min_pair, top):
    items = {(b, i) for b, its in baskets.items() for i in its}
    n = len({b for b, _ in items})
    cnt = {}
    for _, i in items:
        cnt[i] = cnt.get(i, 0) + 1
    freq = {i for i, c in cnt.items() if c >= min_pair}
    pairs = {}
    for b, its in baskets.items():
        fs = sorted(set(its) & freq)
        for x in range(len(fs)):
            for y in range(x + 1, len(fs)):
                pairs[(fs[x], fs[y])] = pairs.get((fs[x], fs[y]), 0) + 1
    out = []
    for (a, b), pc in pairs.items():
        if pc < min_pair:
            continue
        out.append(
            (
                a,
                b,
                pc,
                pc * 1000000 // n,
                pc * 1000000 // cnt[a],
                ((pc * n) // cnt[a]) * 1000000 // cnt[b],
            )
        )
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out[:top]


def test_market_basket_matches_model(spark, tmp_path_factory):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries.functions_surface import (  # noqa: E501
        BASKET_MIN_PAIR,
        BASKET_TOP,
        fx_market_basket,
    )

    rng = random.Random(77)
    brands = [f"B{i:02d}" for i in range(8)]
    parts = [(pk, brands[pk % len(brands)]) for pk in range(40)]
    baskets = {}
    lineitem = []
    for ok in range(300):
        ks = rng.sample(range(40), rng.randint(1, 6))
        # duplicate part lines: DISTINCT must collapse them
        ks = ks + ks[:1]
        lineitem += [(ok, pk) for pk in ks]
        baskets[ok] = [brands[pk % len(brands)] for pk in ks]
    path = str(tmp_path_factory.mktemp("basket"))
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    spark.createDataFrame(
        parts, "p_partkey long, p_brand string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/part.parquet")

    got = [tuple(r) for r in fx_market_basket(spark, path).collect()]
    assert got == _model_basket(baskets, BASKET_MIN_PAIR, BASKET_TOP)


# --- shard packing ----------------------------------------------------------------


def _model_shards(docs, target, overhead):
    out = {}
    by_source = {}
    for source, doc_id, text in docs:
        by_source.setdefault(source, []).append((doc_id, text))
    for source, rows in by_source.items():
        rows.sort()
        cum = 0
        for doc_id, text in rows:
            rb = len(text.encode("utf-8")) + overhead
            shard = cum // target
            cum += rb
            key = (source, shard)
            n, b, lo, hi = out.get(key, (0, 0, doc_id, doc_id))
            out[key] = (n + 1, b + rb, min(lo, doc_id), max(hi, doc_id))
    return [
        (s, sh, n, b, b * 1000000 // target, lo, hi)
        for (s, sh), (n, b, lo, hi) in sorted(out.items())
    ]


def test_shard_pack_matches_model(spark, tmp_path_factory):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (  # noqa: E501
        SHARD_TARGET_BYTES,
        TAR_RECORD_OVERHEAD,
        mm_shard_pack_plan,
    )

    rng = random.Random(31)
    docs = []
    for i in range(200):
        # multi-byte chars: octet_length must count BYTES, not chars
        body = "x" * rng.randrange(1, 3000) + ("é" if i % 3 == 0 else "")
        docs.append((f"s{i % 4}", i, body))
    path = str(tmp_path_factory.mktemp("shards"))
    spark.createDataFrame(
        docs, "source string, doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")

    got = [tuple(r) for r in mm_shard_pack_plan(spark, path).collect()]
    want = _model_shards(docs, SHARD_TARGET_BYTES, TAR_RECORD_OVERHEAD)
    assert got == want


# --- power-user curve --------------------------------------------------------------


def _model_power_curve(user_counts):
    rows = sorted((n, u) for u, n in user_counts.items())
    total = sum(n for n, _ in rows)
    k = len(rows)
    # SQL NTILE: first (k % 10) tiles get ceil(k/10) rows
    big, rem = divmod(k, 10)
    out = {}
    idx = 0
    for d in range(1, 11):
        size = big + (1 if d <= rem else 0)
        chunk = rows[idx : idx + size]
        idx += size
        if not chunk:
            continue
        out[d] = (len(chunk), sum(n for n, _ in chunk))
    cum = 0
    res = []
    for d in sorted(out):
        n_users, events = out[d]
        cum += events
        res.append(
            (d, n_users, events, events * 1000000 // total, cum * 1000000 // total)
        )
    return res


def test_power_user_curve_matches_model(spark, tmp_path_factory):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries.windows import (  # noqa: E501
        tw_power_user_curve,
    )

    rng = random.Random(5)
    # tie-heavy counts and a non-multiple-of-10 user count: NTILE edges
    user_counts = {u: rng.choice([1, 1, 2, 3, 3, 3, 40]) for u in range(57)}
    rows = []
    eid = 0
    for u, n in user_counts.items():
        for _ in range(n):
            rows.append((eid, eid * 1_000_000, u, "click", 100))
            eid += 1
    path = str(tmp_path_factory.mktemp("pucurve"))
    _write_events(spark, path, rows)
    got = [tuple(r) for r in tw_power_user_curve(spark, path).collect()]
    assert got == _model_power_curve(user_counts)


# --- attribution window -------------------------------------------------------------


def _model_attr(purchases, clicks, window_us):
    per = {}
    for pid, uid, pus in purchases:
        per[pid] = sum(
            1
            for cuid, cus in clicks
            if cuid == uid and pus <= cus < pus + window_us
        )
    hist = {}
    for _, n in per.items():
        hist[n] = hist.get(n, 0) + 1
    tot = len(per)
    return [
        (n, c, c * 1000000 // tot) for n, c in sorted(hist.items())
    ]


def test_attribution_window_boundaries(spark, tmp_path_factory):
    """Clicks at exactly +0, +window−1µs, +window, and bucket-boundary
    times must land per the half-open [ts, ts+window) contract — the
    exploded-bucket rewrite's refine predicate does the work."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.rangejoin import (  # noqa: E501
        ATTR_WINDOW_US,
        rj_purchase_attribution_window,
    )

    rng = random.Random(99)
    hour = 3600 * 1_000_000
    rows, purchases, clicks = [], [], []
    eid = 0

    def add(us, uid, etype):
        nonlocal eid
        rows.append((eid, us, uid, etype, 100))
        if etype == "purchase":
            purchases.append((eid, uid, us))
        elif etype == "click":
            clicks.append((uid, us))
        eid += 1

    # adversarial boundary pack around one purchase
    base = 10 * hour + 123
    add(base, 1, "purchase")
    for off in (0, 1, ATTR_WINDOW_US - 1, ATTR_WINDOW_US, ATTR_WINDOW_US + 1, -1):
        add(base + off, 1, "click")
    # purchase exactly on a bucket boundary
    add(20 * hour, 2, "purchase")
    add(20 * hour + 2 * hour - 1, 2, "click")
    add(20 * hour + 2 * hour, 2, "click")
    # random scatter
    for _ in range(300):
        add(
            rng.randrange(0, 50 * hour),
            rng.randrange(5),
            rng.choice(["purchase", "click", "view"]),
        )
    path = str(tmp_path_factory.mktemp("attr"))
    _write_events(spark, path, rows)
    got = [tuple(r) for r in rj_purchase_attribution_window(spark, path).collect()]
    assert got == _model_attr(purchases, clicks, ATTR_WINDOW_US)


# --- classical decomposition ---------------------------------------------------------


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark DIV and DuckDB //
    semantics (Python // floors, which differs on negative numerators)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _model_decompose(hourly, half):
    """hourly: {(etype, h): cents}. Replays gap-fill + centered MA."""
    span = 2 * half + 1
    out = {}
    by_type = {}
    for (et, h), y in hourly.items():
        by_type.setdefault(et, {})[h] = y
    for et, series in by_type.items():
        h0, h1 = min(series), max(series)
        ys = [series.get(h, 0) for h in range(h0, h1 + 1)]
        for i in range(len(ys)):
            if i < half or i >= len(ys) - half:
                continue
            s25 = sum(ys[i - half : i + half + 1])
            dx = ys[i] * span - s25
            hod = (h0 + i) % 24
            n, acc = out.get((et, hod), (0, 0))
            out[(et, hod)] = (n + 1, acc + dx)
    return [
        (et, hod, n, _tdiv(acc * 1000, span * n))
        for (et, hod), (n, acc) in sorted(out.items())
    ]


def test_classical_decompose_matches_model(spark, tmp_path_factory):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.rollup import (  # noqa: E501
        DECOMP_HALF,
        ht_classical_decompose,
    )

    rng = random.Random(13)
    hour = 3600 * 1_000_000
    rows, hourly = [], {}
    eid = 0
    for et, n_hours, gap_every in (("a", 80, 7), ("b", 60, 5)):
        for h in range(n_hours):
            if h % gap_every == 0:  # hole: gap-fill must zero it
                continue
            for _ in range(rng.randint(1, 3)):
                cents = rng.randrange(-500, 2000)
                us = h * hour + rng.randrange(hour)
                rows.append((eid, us, eid % 4, et, cents))
                hourly[(et, h)] = hourly.get((et, h), 0) + cents
                eid += 1
    path = str(tmp_path_factory.mktemp("decomp"))
    _write_events(spark, path, rows)
    got = [tuple(r) for r in ht_classical_decompose(spark, path).collect()]
    assert got == _model_decompose(hourly, DECOMP_HALF)


# --- experiment readout (DuckDB replay on skewed synthetic arms) ----------------------


def test_experiment_readout_duckdb_replay(spark, tmp_path_factory):
    """Imbalanced arms (SRM), heavy-tailed per-user values, and an
    event_type with tiny n: the double-from-exact-integer t/lift/χ²
    formulas must agree bit-for-bit across engines."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
        registry,
    )

    rng = random.Random(2024)
    rows = []
    eid = 0
    for uid in range(41):  # odd count → arms 21 vs 20
        n_ev = 1 + (uid % 9) * (10 if uid % 7 == 0 else 1)
        for _ in range(n_ev):
            cents = rng.choice([1, 5, 250, 99999])
            rows.append((eid, eid * 777_001, uid, "buy" if uid % 3 else "view", cents))
            eid += 1
    path = str(tmp_path_factory.mktemp("abtest"))
    _write_events(spark, path, rows)
    spec = registry.all_specs()["tw_experiment_readout"]
    got = spec.builder(spark, path).toPandas()
    con = _events_duck(path)
    try:
        want = con.execute(spec.oracle).fetch_df()
    finally:
        con.close()
    from .oracle_harness import compare

    errs = compare(got, want)
    assert not errs, errs


# --- error-context as-of: tie order --------------------------------------------------


def test_error_last_action_timestamp_ties(spark, tmp_path_factory):
    """Equal timestamps are where as-of semantics fork: a reference at
    EXACTLY the error's ts must match (backward ts<=), errors never chain
    to each other, and among equal-ts references the highest event_id
    wins. The fixed corpus has collision-free microsecond timestamps, so
    this is the only place those rules are exercised."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.asof import (  # noqa: E501
        aj_error_last_action,
    )

    t = 1_000_000
    rows = [
        # user 1: click and view at the SAME ts as the error — highest
        # event_id (view, id=3) must win; the error (id=4) excluded
        (2, 5 * t, 1, "click", 100),
        (3, 5 * t, 1, "view", 100),
        (4, 5 * t, 1, "error", 100),
        # user 2: two errors back-to-back — both take the click, never
        # each other; lag measured to the click for BOTH
        (10, 1 * t, 2, "click", 100),
        (11, 2 * t, 2, "error", 100),
        (12, 3 * t, 2, "error", 100),
        # user 3: error before any action → 'none'
        (20, 1 * t, 3, "error", 100),
        (21, 2 * t, 3, "signup", 100),
    ]
    path = str(tmp_path_factory.mktemp("ties"))
    _write_events(spark, path, rows)
    got = {
        r["prior_type"]: (r["n_errors"], r["mean_lag_micros"], r["max_lag_micros"])
        for r in aj_error_last_action(spark, path).collect()
    }
    assert got == {
        "view": (1, 0, 0),
        "click": (2, (1 * t + 2 * t) // 2, 2 * t),
        "none": (1, None, None),
    }


# --- salt plan -----------------------------------------------------------------------


def _model_salt_plan(user_counts, top=20):
    counts = sorted((c, u) for u, c in user_counts.items())
    nk, n = len(counts), sum(c for c, _ in counts)
    p95 = counts[(95 * nk + 95) // 100 - 1][0]
    out = [
        (u, c, (c + p95 - 1) // p95, c * 1000000 // n)
        for c, u in counts
        if (c + p95 - 1) // p95 >= 2
    ]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:top]


def test_salt_plan_matches_model(spark, tmp_path_factory):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.skew import (  # noqa: E501
        sk_salt_plan,
    )

    rng = random.Random(4242)
    # zipf-ish: a few hubs, long tail, ties at the p95 boundary
    user_counts = {u: rng.choice([1, 2, 3, 5, 5, 5, 8]) for u in range(80)}
    user_counts[90] = 400
    user_counts[91] = 77
    user_counts[92] = 10
    rows = []
    eid = 0
    for u, c in user_counts.items():
        for _ in range(c):
            rows.append((eid, eid * 999_983, u, "click", 100))
            eid += 1
    path = str(tmp_path_factory.mktemp("saltplan"))
    _write_events(spark, path, rows)
    got = [tuple(r) for r in sk_salt_plan(spark, path).collect()]
    assert got == _model_salt_plan(user_counts)


# --- retention half-life (DuckDB replay on synthetic decay) ---------------------------


def test_retention_halflife_duckdb_replay(spark, tmp_path_factory):
    """A synthetic corpus with KNOWN exponential decay: users activate on
    day 0 and return on day d with probability ~2^(-d/7) (deterministic
    thinning), so the fitted half-life must land near 7 days AND match
    DuckDB bit-for-bit (the ln-grid least squares)."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
        registry,
    )

    day = 86400 * 1_000_000
    rows = []
    eid = 0
    n_users = 512
    for uid in range(n_users):
        rows.append((eid, uid * 311, uid, "signup", 100))
        eid += 1
        for d in range(1, 29):
            # deterministic thinning: keep user on day d iff uid mod 2^(d/7)
            keep_mod = 2 ** (d // 7 + 1)
            if uid % keep_mod == 0:
                rows.append((eid, d * day + uid * 977, uid, "click", 100))
                eid += 1
    path = str(tmp_path_factory.mktemp("halflife"))
    _write_events(spark, path, rows)
    spec = registry.all_specs()["tw_retention_halflife"]
    got = spec.builder(spark, path).toPandas()
    con = _events_duck(path)
    try:
        want = con.execute(spec.oracle).fetch_df()
    finally:
        con.close()
    from .oracle_harness import compare

    errs = compare(got, want)
    assert not errs, errs
    # step decay: p halves every 7 days ⇒ half-life ≈ 7 days on the fit
    hl = got["halflife_milli_days"][0]
    assert 5000 < hl < 11000, hl


# --- b-bit minhash estimator --------------------------------------------------------


def test_bbit_estimator_clamp_and_identity():
    """Pure-math pins for the b=1 correction: Ĵ = 2E − 1 clamped at 0 —
    raw E = 1/2 (random parities) maps to 0, E = 1 maps to 1, and the
    clamp catches the sub-half noise region."""
    ppm = 1_000_000
    for raw, expect in ((500_000, 0), (1_000_000, ppm), (750_000, 500_000),
                        (400_000, 0), (0, 0)):
        est = max(0, 2 * raw - ppm)
        assert est == expect, (raw, est, expect)
