"""Property-based invariants (hypothesis): pointer round-trips, sanitizer
idempotence, sketch merge algebra, ECMA translator safety."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

SEGMENT = st.text(min_size=0, max_size=12)


class TestPointerProperties:
    @given(st.lists(SEGMENT, max_size=6))
    @settings(max_examples=200, deadline=None)
    def test_encode_parse_round_trip(self, segs):
        from engine.pointer import encode_pointer, parse_pointer
        assert parse_pointer(encode_pointer(segs)) == tuple(segs)

    @given(st.lists(SEGMENT, min_size=1, max_size=6))
    @settings(max_examples=100, deadline=None)
    def test_push_pop_inverse(self, segs):
        from engine.pointer import JsonPointer
        p = JsonPointer.from_segments(segs[:-1])
        assert p.push(segs[-1]).pop() == p


class TestSanitizerProperties:
    @given(st.text(max_size=24))
    @settings(max_examples=200, deadline=None)
    def test_field_name_eventually_stable(self, s):
        """Reference parity note: the digit-prefix early return
        (sanitizers.rs:52-54) skips the invalid-char scrub, so one
        application may emit punctuation (e.g. ':' -> 'field_0:') — in the
        REFERENCE too; a second application reaches a fixed point."""
        from engine.sanitizers import sanitize_field_name
        twice = sanitize_field_name(sanitize_field_name(s))
        assert sanitize_field_name(twice) == twice
        assert twice.isidentifier()

    @given(st.text(max_size=24))
    @settings(max_examples=200, deadline=None)
    def test_struct_name_eventually_stable(self, s):
        """heck's PascalCase is not one-shot idempotent on acronym runs
        ("aA" -> "AA" -> "Aa") — reference semantics; a second application
        is a fixed point."""
        from engine.sanitizers import sanitize_struct_name
        twice = sanitize_struct_name(sanitize_struct_name(s))
        assert sanitize_struct_name(twice) == twice


class TestSketchProperties:
    @given(st.lists(st.integers(min_value=0, max_value=50),
                    min_size=0, max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_spacesaving_overestimates_within_bound(self, values):
        import collections
        from engine.sketches import SpaceSaving
        ss = SpaceSaving(8).update(values)
        exact = collections.Counter(values)
        for v, est in ss.counts.items():
            assert est >= exact[v]
            assert est - exact[v] <= ss.errors[v]

    @given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                              width=32), min_size=0, max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_tdigest_merge_total_weight(self, values):
        from engine.sketches import TDigest
        half = len(values) // 2
        a = TDigest().update(np.array(values[:half], dtype=np.float64))
        b = TDigest().update(np.array(values[half:], dtype=np.float64))
        a.merge(b)
        assert abs(a.total - len(values)) < 1e-6


class TestEcmaProperties:
    @given(st.text(alphabet="abc123().*+?[]\\dws^$|{}-", max_size=16))
    @settings(max_examples=300, deadline=None)
    def test_compile_never_raises(self, pattern):
        from engine.ecma import compile_ecma
        rx = compile_ecma(pattern)  # None or compiled, never an exception
        if rx is not None:
            rx.search("a1 b2é")  # and searching never raises either

    @given(st.integers(min_value=0, max_value=0x10FFFF))
    @settings(max_examples=400, deadline=None)
    def test_class_inner_complements_exact_membership(self, cp):
        """Class-inner \\D \\W \\S expand to codepoint ranges that agree
        with direct membership in the ECMA sets, for any codepoint."""
        import unicodedata
        from engine.ecma import compile_ecma, _DIGIT_IV, _WORD_IV, _SPACE_IV
        if unicodedata.category(chr(cp)) in ("Cs",):  # lone surrogates
            return
        s = chr(cp)
        for esc, ivs in (("D", _DIGIT_IV), ("W", _WORD_IV), ("S", _SPACE_IV)):
            rx = compile_ecma(f"^[\\{esc}]$")
            in_set = any(lo <= cp <= hi for lo, hi in ivs)
            assert (rx.search(s) is not None) == (not in_set), (esc, hex(cp))
            # and the positive class agrees with membership too
            rx_pos = compile_ecma(f"^[\\{esc.lower()}]$")
            assert (rx_pos.search(s) is not None) == in_set, (esc, hex(cp))


class TestNewRelationalOps:
    """Randomized differential tests: the distributed operators must match
    brute-force pandas/python references on arbitrary small inputs."""

    def _events(self, rng, n, n_users, tmax=1000):
        import pyarrow as pa
        return {
            "event_id": list(range(n)),
            "user_id": [int(x) for x in rng.integers(0, n_users, n)],
            "ts": [float(x) for x in rng.integers(0, tmax, n)],
            "value": [float(x) for x in rng.normal(0, 10, n)],
        }

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_rolling_mean_matches_bruteforce(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.relational import rolling_window_mean
        rng = np.random.default_rng(seed)
        d = self._events(rng, 60, 5)
        W = 50.0
        got = rolling_window_mean(
            ray.data.from_arrow(pa.table(d)), window_seconds=W) \
            .to_pandas().set_index("event_id")["rolling_mean"]
        for i in range(len(d["event_id"])):
            u, t = d["user_id"][i], d["ts"][i]
            frame = [d["value"][j] for j in range(len(d["event_id"]))
                     if d["user_id"][j] == u and t - W <= d["ts"][j] <= t]
            assert abs(got[i] - np.mean(frame)) < 1e-9, i

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_asof_matches_bruteforce(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.relational import asof_join
        rng = np.random.default_rng(seed ^ 0x5A5A)
        L = self._events(rng, 40, 4)
        R = self._events(rng, 30, 4)
        R["event_id"] = [1000 + i for i in R["event_id"]]
        got = asof_join(ray.data.from_arrow(pa.table(L)),
                        ray.data.from_arrow(pa.table(R))).to_pandas() \
            .set_index("event_id")["value"]
        # brute force: latest right (ties -> max id) per left row
        for i in range(40):
            u, t = L["user_id"][i], L["ts"][i]
            cand = [(R["ts"][j], R["event_id"][j], R["value"][j])
                    for j in range(30)
                    if R["user_id"][j] == u and R["ts"][j] <= t]
            if not cand:
                assert i not in got.index
            else:
                exp = max(cand)[2]
                assert got[i] == exp, i

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_interval_join_matches_bruteforce(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.relational import interval_join
        rng = np.random.default_rng(seed ^ 0xC3C3)
        P = self._events(rng, 40, 4)
        n_iv = 20
        starts = [float(x) for x in rng.integers(0, 1000, n_iv)]
        lens = [float(x) for x in rng.integers(1, 100, n_iv)]
        iv = {"interval_id": list(range(n_iv)),
              "user_id": [int(x) for x in rng.integers(0, 4, n_iv)],
              "start": starts,
              "end": [s + l for s, l in zip(starts, lens)]}
        got = interval_join(ray.data.from_arrow(pa.table(P)),
                            ray.data.from_arrow(pa.table(iv)),
                            max_duration_s=100.0).to_pandas()
        got_pairs = set(zip(got["event_id"], got["interval_id"]))
        exp_pairs = {(P["event_id"][i], iv["interval_id"][j])
                     for i in range(40) for j in range(n_iv)
                     if P["user_id"][i] == iv["user_id"][j]
                     and iv["start"][j] <= P["ts"][i] < iv["end"][j]}
        assert got_pairs == exp_pairs

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_grouped_topk_matches_pandas(self, ray_session, seed):
        import pandas as pd
        import pyarrow as pa
        import ray.data
        from engine.relational import grouped_topk
        rng = np.random.default_rng(seed ^ 0x77)
        n = 50
        df = pd.DataFrame({
            "g": [str(x) for x in rng.integers(0, 6, n)],
            "s": [float(x) for x in rng.integers(0, 10, n)],  # many ties
            "i": list(range(n))})
        got = grouped_topk(ray.data.from_arrow(pa.Table.from_pandas(df)),
                           group_col="g", score_col="s", id_col="i",
                           k=3).to_pandas()
        exp = df.sort_values(["g", "s", "i"],
                             ascending=[True, False, True]) \
            .groupby("g").head(3)
        assert sorted(got["i"]) == sorted(exp["i"])


class TestRound4Ops:
    """Randomized differential tests for the round-4 operators: lag diff,
    grouped moments / correlation, winsorize — brute-force references on
    arbitrary small inputs, NULLs included."""

    def _events(self, rng, n, n_users, null_frac=0.15):
        vals = [float(x) for x in rng.normal(0, 10, n)]
        nulls = rng.random(n) < null_frac
        return {
            "event_id": list(range(n)),
            "user_id": [int(x) for x in rng.integers(0, n_users, n)],
            "ts": [float(x) for x in rng.integers(0, 500, n)],
            "value": [None if m else v for v, m in zip(vals, nulls)],
        }

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_lag_diff_matches_bruteforce(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.relational import lag_diff
        rng = np.random.default_rng(seed ^ 0xD1FF)
        d = self._events(rng, 50, 4)
        got = lag_diff(ray.data.from_arrow(pa.table(d))).to_pandas() \
            .set_index("event_id")["lag_diff"]
        order = sorted(range(50),
                       key=lambda i: (d["user_id"][i], d["ts"][i], i))
        prev: dict = {}
        for i in order:
            u = d["user_id"][i]
            v, p = d["value"][i], prev.get(u, "FIRST")
            exp = None if (p == "FIRST" or v is None or p is None) \
                else v - p
            g = got[i]
            if exp is None:
                assert np.isnan(g), i
            else:
                assert abs(g - exp) < 1e-12, i
            prev[u] = v

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_grouped_moments_matches_numpy(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.stats import grouped_moments
        rng = np.random.default_rng(seed ^ 0x30303)
        d = self._events(rng, 60, 5)
        ds = ray.data.from_arrow(pa.table(
            {"g": [str(u) for u in d["user_id"]], "v": d["value"]}))
        got = grouped_moments(ds, group_col="g", value_col="v") \
            .to_pandas().set_index("g")
        for u in set(d["user_id"]):
            vs = np.array([v for i, v in enumerate(d["value"])
                           if d["user_id"][i] == u and v is not None])
            k = str(u)
            if len(vs) == 0:
                assert k not in got.index
                continue
            r = got.loc[k]
            assert r["n"] == len(vs)
            assert abs(r["mean"] - vs.mean()) < 1e-9
            assert abs(r["vmin"] - vs.min()) < 1e-12
            assert abs(r["vmax"] - vs.max()) < 1e-12
            if len(vs) > 1:
                assert abs(r["std_samp"] - vs.std(ddof=1)) < 1e-9
            else:
                assert np.isnan(r["std_samp"])

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_grouped_corr_matches_numpy(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.stats import grouped_corr
        rng = np.random.default_rng(seed ^ 0xC0CC)
        n = 60
        g = [str(int(x)) for x in rng.integers(0, 4, n)]
        x = [float(v) for v in rng.normal(0, 5, n)]
        y = [a * 0.5 + float(e) for a, e in
             zip(x, rng.normal(0, 2, n))]
        nx = rng.random(n) < 0.1
        x = [None if m else v for v, m in zip(x, nx)]
        ds = ray.data.from_arrow(pa.table({"g": g, "x": x, "y": y}))
        got = grouped_corr(ds, group_col="g", x_col="x", y_col="y") \
            .to_pandas().set_index("g")
        for u in set(g):
            pairs = [(x[i], y[i]) for i in range(n)
                     if g[i] == u and x[i] is not None]
            if not pairs:
                assert u not in got.index
                continue
            r = got.loc[u]
            assert r["n"] == len(pairs)
            xs = np.array([p[0] for p in pairs])
            ys = np.array([p[1] for p in pairs])
            if len(pairs) > 1 and xs.std() > 0 and ys.std() > 0:
                exp = np.corrcoef(xs, ys)[0, 1]
                assert abs(r["corr"] - exp) < 1e-9
            else:
                assert np.isnan(r["corr"])

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=6, deadline=None)
    def test_winsorize_matches_numpy_quantiles(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.stats import winsorize
        rng = np.random.default_rng(seed ^ 0x815)
        d = self._events(rng, 80, 3)
        got = winsorize(ray.data.from_arrow(pa.table(
            {"event_id": d["event_id"], "value": d["value"]})), "value") \
            .to_pandas().set_index("event_id")["value"]
        vs = np.array([v for v in d["value"] if v is not None])
        lo, hi = np.quantile(vs, 0.05), np.quantile(vs, 0.95)
        for i, v in enumerate(d["value"]):
            if v is None:
                assert i not in got.index
            else:
                assert abs(got[i] - float(np.clip(v, lo, hi))) < 1e-9, i


class TestRound4LateOps:
    """Randomized differential tests for the late round-4 operators:
    keep-latest, pivot, set ops, grouped mode, running sum — brute-force
    references on arbitrary small inputs, NULLs included."""

    def _events(self, rng, n, n_users, null_frac=0.15):
        vals = [float(x) for x in rng.normal(0, 10, n)]
        nulls = rng.random(n) < null_frac
        return {
            "event_id": list(range(n)),
            "user_id": [int(x) for x in rng.integers(0, n_users, n)],
            "ts": [float(x) for x in rng.integers(0, 40, n)],
            "value": [None if m else v for v, m in zip(vals, nulls)],
        }

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_keep_latest_matches_bruteforce(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.relational import keep_latest
        rng = np.random.default_rng(seed ^ 0x1A7E57)
        d = self._events(rng, 50, 5)
        got = keep_latest(ray.data.from_arrow(pa.table(d))).to_pandas()
        winners = {}
        for i in range(50):
            u = d["user_id"][i]
            cand = (d["ts"][i], i)
            if u not in winners or cand > winners[u]:
                winners[u] = cand
        assert sorted(got["event_id"]) == \
            sorted(i for (_, i) in winners.values())

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_pivot_matches_bruteforce(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.relational import pivot_agg
        rng = np.random.default_rng(seed ^ 0x91707)
        n = 60
        kinds = ["a", "b", "c"]
        g = [int(x) for x in rng.integers(0, 5, n)]
        p = [kinds[x] if x < 3 else "zz"
             for x in rng.integers(0, 4, n)]   # some undeclared
        v = [None if rng.random() < 0.1 else float(x)
             for x in rng.normal(0, 5, n)]
        ds = ray.data.from_arrow(pa.table({"g": g, "p": p, "v": v}))
        got = pivot_agg(ds, group_col="g", pivot_col="p", value_col="v",
                        values=kinds).to_pandas().set_index("g")
        for grp in set(g):
            for k in kinds:
                exp = sum(v[i] or 0.0 for i in range(n)
                          if g[i] == grp and p[i] == k and v[i] is not None)
                assert abs(got.loc[grp, f"sum_{k}"] - exp) < 1e-9, (grp, k)

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_set_ops_match_python_sets(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.relational import except_distinct, intersect_distinct
        rng = np.random.default_rng(seed ^ 0x5E707)
        lk = [int(x) for x in rng.integers(0, 20, 30)]
        rk = [int(x) for x in rng.integers(10, 30, 30)]
        left = ray.data.from_arrow(pa.table({"k": pa.array(lk, pa.int64())}))
        right = ray.data.from_arrow(pa.table({"k": pa.array(rk, pa.int64())}))
        ex = except_distinct(left, right, key_col="k").to_pandas()
        got_ex = sorted(ex["k"]) if len(ex) else []
        assert got_ex == sorted(set(lk) - set(rk))
        iv = intersect_distinct(left, right, key_col="k").to_pandas()
        got_iv = sorted(iv["k"]) if len(iv) else []
        assert got_iv == sorted(set(lk) & set(rk))

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_grouped_mode_matches_bruteforce(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from collections import Counter
        from engine.relational import grouped_mode
        rng = np.random.default_rng(seed ^ 0x30DE)
        n = 60
        g = [int(x) for x in rng.integers(0, 5, n)]
        v = [None if rng.random() < 0.1 else f"v{int(x)}"
             for x in rng.integers(0, 4, n)]
        ds = ray.data.from_arrow(pa.table({"g": g, "v": v})) \
            .repartition(4)
        got = grouped_mode(ds, group_col="g", value_col="v").to_pandas() \
            .set_index("g")
        for grp in set(g):
            c = Counter(v[i] for i in range(n)
                        if g[i] == grp and v[i] is not None)
            if not c:
                assert grp not in got.index
                continue
            mx = max(c.values())
            exp = min(k for k, n_ in c.items() if n_ == mx)
            assert got.loc[grp, "mode_value"] == exp, grp
            assert got.loc[grp, "n"] == mx, grp

    @given(st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=8, deadline=None)
    def test_running_sum_matches_bruteforce(self, ray_session, seed):
        import pyarrow as pa
        import ray.data
        from engine.relational import running_sum
        rng = np.random.default_rng(seed ^ 0x5B5)
        d = self._events(rng, 50, 4)
        got = running_sum(ray.data.from_arrow(pa.table(d))).to_pandas() \
            .set_index("event_id")["running_sum"]
        order = sorted(range(50),
                       key=lambda i: (d["user_id"][i], d["ts"][i], i))
        acc: dict = {}
        for i in order:
            u = d["user_id"][i]
            acc[u] = acc.get(u, 0.0) + (d["value"][i] or 0.0)
            assert abs(got[i] - acc[u]) < 1e-9, i
