"""Independent numeric pins for every shared-verbatim SQL fragment family.

The oracle-parity hash gate certifies CROSS-ENGINE AGREEMENT, not SPEC
CORRECTNESS: wherever the Spark query and its DuckDB oracle share a
nontrivial formula verbatim (by design, so IEEE ops execute identically),
a formula bug consistent across both engines is invisible to it.  Round 6
proved this is a real failure mode — ``_BH_P_SQL`` computed erf (1 - p)
instead of erfc for a full round while every hash matched
(``tests/test_statistics.py`` now pins that fragment against
``math.erfc``).  This module extends the same treatment to the remaining
shared-fragment inventory (round-6 verdict ask #5): each test evaluates
the ACTUAL SHIPPED fragment (imported from the query module, or the
registered oracle SQL run on synthetic DuckDB views) against an
independent third reference — stdlib ``math``, ``hashlib``, or a
hand-written Python loop.

Families pinned here (all DuckDB + pure Python; no Spark session needed,
so the module runs in seconds):
  - Z-order Morton interleave   (``sources.files.zorder_key_expr``)
  - zone-map grader end-to-end  (``orders_zone_map_skipping`` oracle)
  - DFT trig literal tables     (``queries.timeseries._COS24/_SIN24``)
  - Holt linear fold            (``nation_revenue_holt_forecast`` oracle)
  - Holt-Winters seasonal fold  (``hourly_counts_holt_winters`` oracle)
  - width_bucket CASE mirror    (``price_histogram`` oracle)
  - KMV md5-60bit hash + estimator (``source_kmv_overlap`` oracle)
  - CMS 53-bit polynomial hash  (``word_count_min_sketch_hh`` oracle)

A mismatch here is a FINDING (spec bug in both engines), not a refactor.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from mapreduce_paradigm_spark.registry import all_specs
from mapreduce_paradigm_spark.sources.files import zorder_key_expr


def _con_with_views(**views: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with each kwarg registered as a view."""
    con = duckdb.connect()
    for name, select in views.items():
        con.execute(f"CREATE OR REPLACE VIEW {name} AS {select}")
    return con


def _oracle(name: str) -> str:
    sql = all_specs()[name].oracle
    assert sql, f"{name} has no oracle"
    return sql


# --- Z-order Morton interleave ------------------------------------------------


def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_fragment_is_exact_morton_interleave():
    bits = 10
    frag = zorder_key_expr("x", "y", bits)
    pts = [
        (0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (5, 9),
        (1023, 0), (0, 1023), (1023, 1023), (512, 511), (341, 682),
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({x}, {y})" for x, y in pts)
    rows = con.execute(
        f"SELECT x, y, CAST({frag} AS BIGINT) FROM (VALUES {vals}) t(x, y) "
        "ORDER BY x, y"
    ).fetchall()
    for x, y, z in rows:
        assert z == _py_morton(x, y, bits), (x, y, z, _py_morton(x, y, bits))
    # structural anchors: interleave of (x,0) spreads x over even bits,
    # (0,y) over odd bits, and the key is within 2*bits bits
    assert _py_morton(1023, 1023, bits) == (1 << 20) - 1


# --- zone-map grader ----------------------------------------------------------


def test_zone_map_oracle_matches_python_simulator():
    """Run the shipped orders_zone_map_skipping oracle on a synthetic
    orders table and replicate the whole grader (ntile zoning, per-zone
    min/max, the 2-D scan predicate, the Morton layout) in plain Python."""
    from mapreduce_paradigm_spark.queries.warehouse import (
        _ZM_BITS,
        _ZM_CK_LO,
        _ZM_CK_HI,
        _ZM_D_LO,
        _ZM_D_HI,
        _ZM_ZONES,
    )
    import datetime as dt

    # 640 rows -> 10 per zone exactly (no ntile remainder subtleties);
    # deterministic LCG spread over custkey/date so every layout differs
    n = 640
    rows = []
    s = 12345
    for k in range(1, n + 1):
        s = (s * 1103515245 + 12345) % (1 << 31)
        ck = s % 400  # straddles the [100, 199] predicate band
        s = (s * 1103515245 + 12345) % (1 << 31)
        day = s % 2400  # days since 1995-01-01; straddles [730, 911]
        rows.append((k, ck, dt.date(1995, 1, 1) + dt.timedelta(days=day)))
    vals = ", ".join(f"({k}, {ck}, DATE '{d}')" for k, ck, d in rows)
    con = _con_with_views(
        orders=f"SELECT * FROM (VALUES {vals}) "
        "t(o_orderkey, o_custkey, o_orderdate)"
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(_oracle("orders_zone_map_skipping")).fetchall()
    }

    # independent Python grader
    dims = []
    epoch = dt.date(1995, 1, 1)
    for k, ck, d in rows:
        day_nr = (d - epoch).days
        zkey = _py_morton(ck % (1 << _ZM_BITS), day_nr % (1 << _ZM_BITS), _ZM_BITS)
        hit = _ZM_CK_LO <= ck <= _ZM_CK_HI and _ZM_D_LO <= day_nr <= _ZM_D_HI
        dims.append({"k": k, "ck": ck, "day": day_nr, "z": zkey, "hit": hit})

    def grade(sort_key):
        orderd = sorted(dims, key=sort_key)
        per = n // _ZM_ZONES
        zones_scanned = rows_scanned = rows_matched = 0
        for zi in range(_ZM_ZONES):
            zone = orderd[zi * per : (zi + 1) * per]
            cks = [r["ck"] for r in zone]
            dys = [r["day"] for r in zone]
            scanned = (
                max(cks) >= _ZM_CK_LO
                and min(cks) <= _ZM_CK_HI
                and max(dys) >= _ZM_D_LO
                and min(dys) <= _ZM_D_HI
            )
            if scanned:
                zones_scanned += 1
                rows_scanned += len(zone)
                rows_matched += sum(r["hit"] for r in zone)
        return (_ZM_ZONES, zones_scanned, rows_scanned, rows_matched)

    want = {
        "date_sorted": grade(lambda r: (r["day"], r["k"])),
        "custkey_sorted": grade(lambda r: (r["ck"], r["k"])),
        "zorder": grade(lambda r: (r["z"], r["k"])),
    }
    assert got == want
    # the scenario must be non-vacuous: some zones pruned in every layout,
    # and the Morton layout must scan no more rows than either 1-D sort
    for layout, (_, zs, _, _) in want.items():
        assert 0 < zs < _ZM_ZONES, (layout, zs)
    # Z-order prunes on BOTH dimensions: it must beat the worst 1-D sort
    # (each 1-D sort prunes only its own dimension; the other is random)
    assert want["zorder"][2] < max(
        want["date_sorted"][2], want["custkey_sorted"][2]
    )


# --- DFT trig literal tables --------------------------------------------------


def test_dft_trig_literals_match_stdlib_math():
    from mapreduce_paradigm_spark.queries.timeseries import _COS24, _SIN24

    cos = [float(v) for v in _COS24.split(", ")]
    sin = [float(v) for v in _SIN24.split(", ")]
    assert len(cos) == len(sin) == 24
    for k in range(24):
        theta = 2.0 * math.pi * k / 24.0
        assert abs(cos[k] - math.cos(theta)) < 1e-15, (k, cos[k])
        assert abs(sin[k] - math.sin(theta)) < 1e-15, (k, sin[k])
        assert abs(cos[k] ** 2 + sin[k] ** 2 - 1.0) < 1e-14


def test_dft_oracle_recovers_planted_sinusoid():
    """End-to-end: a planted pure 24h sinusoid must yield period24_share
    ~= 1; a flat series with one outlier must yield ~0."""
    import datetime as dt

    def events_for(counts):
        base = dt.datetime(2024, 1, 1)
        stamps = []
        for h, c in enumerate(counts):
            t = base + dt.timedelta(hours=h)
            stamps.extend([t] * c)
        vals = ", ".join(f"(TIMESTAMP '{t}')" for t in stamps)
        return f"SELECT * FROM (VALUES {vals}) t(ts)"

    # 72 hours of 100 + 50*cos(2*pi*h/24) (integer-rounded)
    sinus = [int(round(100 + 50 * math.cos(2 * math.pi * h / 24))) for h in range(72)]
    con = _con_with_views(events=events_for(sinus))
    (n, _c, _s, share) = con.execute(
        _oracle("hourly_counts_period24_power")
    ).fetchone()
    assert n == 72
    assert share > 0.95, share

    flat = [100] * 72
    flat[35] = 500  # one spike, no 24h periodicity
    con2 = _con_with_views(events=events_for(flat))
    (_, _, _, share_flat) = con2.execute(
        _oracle("hourly_counts_period24_power")
    ).fetchone()
    assert share_flat < 0.2, share_flat


# --- Holt linear fold ---------------------------------------------------------


def test_holt_oracle_matches_python_recurrence():
    import datetime as dt

    # one nation, one customer, one order per month with known totalprice
    prices = [100.0, 120.0, 90.0, 150.0, 160.0, 155.0, 170.0, 140.0]
    vals = ", ".join(
        f"({i + 1}, 1, {p}, DATE '{dt.date(2024, i + 1, 15)}')"
        for i, p in enumerate(prices)
    )
    con = _con_with_views(
        orders=f"SELECT * FROM (VALUES {vals}) "
        "t(o_orderkey, o_custkey, o_totalprice, o_orderdate)",
        customer="SELECT 1 AS c_custkey, 7 AS c_nationkey",
        nation="SELECT 7 AS n_nationkey, 'FRANCE' AS n_name",
    )
    (nation, n_months, level, trend, fc) = con.execute(
        _oracle("nation_revenue_holt_forecast")
    ).fetchone()
    assert nation == "FRANCE" and n_months == len(prices)

    # independent reference: plain-Python Holt(alpha=beta=0.5) over the
    # integer-micros series the query folds
    ys = [round(p * 1e6) for p in prices]
    l, b = float(ys[1]), float(ys[1]) - ys[0]
    for y in ys[2:]:
        l_new = 0.5 * y + 0.5 * (l + b)
        b = 0.5 * (l_new - l) + 0.5 * b
        l = l_new
    assert level == pytest.approx(round(l / 1e6, 4), abs=1e-9)
    assert trend == pytest.approx(round(b / 1e6, 4), abs=1e-9)
    assert fc == pytest.approx(round((l + b) / 1e6, 4), abs=1e-9)


# --- Holt-Winters additive seasonal fold --------------------------------------


def test_holt_winters_oracle_matches_python_recurrence():
    import datetime as dt

    # 60 hourly buckets: trend + 24h season + deterministic jitter
    counts = [
        5 + (h % 24) // 4 + (h // 24) + ((h * 7) % 3) for h in range(60)
    ]
    base = dt.datetime(2024, 3, 1)
    stamps = []
    for h, c in enumerate(counts):
        stamps.extend([base + dt.timedelta(hours=h)] * c)
    vals = ", ".join(f"(TIMESTAMP '{t}')" for t in stamps)
    con = _con_with_views(
        events=f"SELECT * FROM (VALUES {vals}) t(ts)"
    )
    (n, level, trend, fc) = con.execute(
        _oracle("hourly_counts_holt_winters")
    ).fetchone()
    assert n == 60

    # independent reference: plain-Python additive HW(alpha=beta=gamma=0.5,
    # period 24) with the same head-24 init
    ys = [float(c) for c in counts]
    l = sum(ys[:24]) / 24
    b = (sum(ys[24:48]) - sum(ys[:24])) / 576
    q = [y - l for y in ys[:24]]
    for y in ys[24:]:
        s0 = q[0]
        l_new = 0.5 * (y - s0) + 0.5 * (l + b)
        b = 0.5 * (l_new - l) + 0.5 * b
        q = q[1:] + [0.5 * (y - l_new) + 0.5 * s0]
        l = l_new

    def micro6(x):
        return round(x * 1e6) / 1e6

    assert level == pytest.approx(micro6(l), abs=1e-9)
    assert trend == pytest.approx(micro6(b), abs=1e-9)
    assert fc == pytest.approx(micro6(l + b + q[0]), abs=1e-9)


# --- width_bucket mirror ------------------------------------------------------


def test_width_bucket_oracle_bins_boundaries_like_the_spec():
    lo, hi, nb = 900.0, 105000.0, 20
    width = (hi - lo) / nb
    probes = [
        0.0, 899.999, 900.0, 900.0 + 1e-9, lo + width - 1e-6, lo + width,
        50000.0, hi - 1e-6, hi, hi + 1.0, 1e9,
    ]
    vals = ", ".join(f"(1, {p!r})" for p in probes)
    con = _con_with_views(
        lineitem=f"SELECT * FROM (VALUES {vals}) t(l_orderkey, l_extendedprice)"
    )
    got = dict(con.execute(
        "WITH g AS (" + _oracle("price_histogram") + ") "
        "SELECT bucket, n FROM g"
    ).fetchall())

    def py_bucket(x):
        if x < lo:
            return 0
        if x >= hi:
            return nb + 1
        return int(math.floor((x - lo) / width)) + 1

    want: dict[int, int] = {}
    for p in probes:
        want[py_bucket(p)] = want.get(py_bucket(p), 0) + 1
    assert got == want
    # the spec anchors: lo lands in bucket 1, lo+width in bucket 2,
    # hi exactly is overflow
    assert py_bucket(lo) == 1 and py_bucket(lo + width) == 2
    assert py_bucket(hi) == nb + 1


# --- KMV hash construction + estimator ----------------------------------------


def _kmv_hash(s: str) -> int:
    """The house KMV hash: first 15 hex chars of md5 -> 60-bit int."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_oracle_matches_python_reference_above_k():
    """Two sources with >256 shingles each and a known overlap: the
    shipped oracle's union/jaccard/intersection estimates must equal a
    plain-Python KMV built from hashlib.md5."""
    K = 256
    HSPACE = float(1 << 60)

    def text_of(lo, hi):
        return " ".join(f"w{i}" for i in range(lo, hi))

    # shingle counts: A has 398 shingles (w0..w399), B has 398 (w200..w599)
    # -> ~198 overlapping 3-grams, both sketches saturate at K=256
    docs = {
        "srcA": text_of(0, 400),
        "srcB": text_of(200, 600),
    }
    vals = ", ".join(f"('{s}', '{t}')" for s, t in docs.items())
    con = _con_with_views(
        documents=f"SELECT * FROM (VALUES {vals}) t(source, text)"
    )
    row = con.execute(_oracle("source_kmv_overlap")).fetchone()
    (src_a, src_b, union_est, jaccard_est, inter_est) = row

    def shingles(text):
        toks = text.lower().strip().split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    def sketch(text):
        return sorted(_kmv_hash(s) for s in shingles(text))[:K]

    sa, sb = sketch(docs["srcA"]), sketch(docs["srcB"])
    merged = sorted(set(sa) | set(sb))
    m_n = len(merged)
    topk = merged[:K]
    kv, kn = max(topk), len(topk)
    ki = sum(1 for h in topk if h in set(sa) and h in set(sb))
    raw_union = (K - 1) / (kv / HSPACE) if m_n >= K else float(m_n)
    want_union = round(raw_union, 4)
    want_j = round(ki / kn, 6)
    # the oracle rounds the PRODUCT of the unrounded factors
    want_inter = round((ki / kn) * raw_union, 4)
    assert m_n >= K, "fixture must exercise the estimator branch"
    assert (src_a, src_b) == ("srcA", "srcB")
    assert union_est == pytest.approx(want_union, abs=1e-9)
    assert jaccard_est == pytest.approx(want_j, abs=1e-9)
    assert inter_est == pytest.approx(want_inter, abs=1e-9)
    # sanity vs ground truth: ~600 distinct shingles, ~33% jaccard
    true_union = len(shingles(docs["srcA"]) | shingles(docs["srcB"]))
    assert abs(union_est - true_union) / true_union < 0.25


# --- CMS polynomial rolling hash ----------------------------------------------


def test_cms_oracle_matches_python_reference():
    from mapreduce_paradigm_spark.queries.llm import _CMS_D, _CMS_M, _CMS_W

    text = "the cat sat on the mat the cat ran off the mat again and again"
    con = _con_with_views(
        documents=f"SELECT 's' AS source, '{text}' AS text"
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(_oracle("word_count_min_sketch_hh")).fetchall()
    }

    # independent reference: hashlib-free Horner fold over raw char codes
    def words(t):
        out = []
        for tok in t.split():
            w = "".join(ch for ch in tok if ch.isalpha()).lower()
            if w:
                out.append(w)
        return out

    counts: dict[str, int] = {}
    for w in words(text):
        counts[w] = counts.get(w, 0) + 1

    def bucket(word, i):
        acc = 0
        for ch in f"{word}#{i}":
            acc = (acc * 257 + ord(ch)) % _CMS_M
        return acc % _CMS_W

    cms = [[0] * _CMS_W for _ in range(_CMS_D)]
    for w, n in counts.items():
        for i in range(_CMS_D):
            cms[i][bucket(w, i)] += n

    top10 = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = {
        w: (n, min(cms[i][bucket(w, i)] for i in range(_CMS_D)))
        for w, n in top10
    }
    assert got == want
    # CMS contract: estimate never under-counts
    for w, (n, est) in got.items():
        assert est >= n
