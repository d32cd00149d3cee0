"""Round-4 batch UU: Lindley waits, LIS per user, Belady vs LRU."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q301

def test_lindley_closed_form_equals_recursion(ray_session):
    """Prefix-max closed form == the textbook recursion on random
    arrival sequences (the identity the SQL oracle relies on)."""
    import random

    random.seed(8)
    S = 10
    for _ in range(200):
        n = random.randint(1, 40)
        gaps = [random.randint(0, 30) for _ in range(n - 1)]
        at = [100]
        for g in gaps:
            at.append(at[-1] + g)
        # recursion
        w_rec = [0]
        for i in range(1, n):
            w_rec.append(max(0, w_rec[-1] + S - (at[i] - at[i - 1])))
        # closed form
        a = np.array(at, dtype=np.int64)
        k = np.arange(1, n + 1, dtype=np.int64)
        u = a - k * S
        w_cf = np.maximum(np.maximum.accumulate(u) - u, 0).tolist()
        assert w_rec == w_cf


def test_lindley_query_matches_serial(ray_session):
    from texrex_ray.pipelines.queries import LINDLEY_SERVICE_US, QUERIES

    got = QUERIES["q301_lindley_queue"](SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_id", "event_type"])
    want = {}
    for et, sub in ev.groupby("event_type"):
        sub = sub.sort_values(["ts", "event_id"])
        at = sub["ts"].astype("int64").tolist()
        w = [0]
        for i in range(1, len(at)):
            w.append(max(0, w[-1] + LINDLEY_SERVICE_US - (at[i] - at[i - 1])))
        want[et] = (len(at), sum(1 for x in w if x > 0), sum(w), max(w))
    have = {
        r["event_type"]: (int(r["n_arrivals"]), int(r["n_delayed"]),
                          int(r["sum_wait_us"]), int(r["max_wait_us"]))
        for _, r in got.iterrows()
    }
    assert have == want
    # the first arrival never waits; waits are nonneg by construction
    assert all(v[1] < v[0] for v in want.values())


# ------------------------------------------------------------------- q302

def test_lis_patience_equals_dp(ray_session):
    import bisect
    import random

    random.seed(15)

    def patience(vals):
        tops = []
        for v in vals:
            i = bisect.bisect_left(tops, v)
            if i == len(tops):
                tops.append(v)
            else:
                tops[i] = v
        return len(tops)

    def dp(vals):
        d = [1] * len(vals)
        for i in range(len(vals)):
            for j in range(i):
                if vals[j] < vals[i]:
                    d[i] = max(d[i], d[j] + 1)
        return max(d) if d else 0

    assert patience([]) == 0
    assert patience([5]) == 1
    assert patience([3, 1, 2, 1, 4]) == 3          # 1,2,4
    assert patience([5, 4, 3]) == 1
    assert patience([2, 2, 2]) == 1                 # strict
    for _ in range(200):
        vals = [random.randint(0, 20) for _ in range(random.randint(0, 30))]
        assert patience(vals) == dp(vals), vals


def test_lis_query_matches_serial(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q302_lis_per_user"](SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_id", "user_id", "value"])
    ev = ev.sort_values(["ts", "event_id"])
    want: dict = {}
    for uid, sub in ev.groupby("user_id"):
        vals = [int(round(float(v) * 100)) for v in sub["value"]]
        d = [1] * len(vals)
        for i in range(len(vals)):
            for j in range(i):
                if vals[j] < vals[i]:
                    d[i] = max(d[i], d[j] + 1)
        ln = max(d) if d else 0
        agg = want.setdefault(ln, [0, 0])
        agg[0] += 1
        agg[1] += len(vals)
    have = {
        int(r["lis_len"]): [int(r["n_users"]), int(r["sum_events"])]
        for _, r in got.iterrows()
    }
    assert have == want


# ------------------------------------------------------------------- q303

def test_belady_unit_trace(ray_session):
    """Hand-walked OPT on the classic trace, cap 3:
    a b c d(a evicted? farthest next use) ..."""
    trace = ["a", "b", "c", "d", "a", "b", "e", "a", "b"]
    n = len(trace)
    occ = {}
    for i, k in enumerate(trace):
        occ.setdefault(k, []).append(i)
    ptr = {k: 0 for k in occ}
    res = {}
    hits = 0
    cap = 3
    for i, k in enumerate(trace):
        ptr[k] += 1
        nxt = occ[k][ptr[k]] if ptr[k] < len(occ[k]) else n
        if k in res:
            hits += 1
        elif len(res) >= cap:
            victim = max(res, key=lambda x: (res[x], x))
            del res[victim]
        res[k] = nxt
    # OPT: at d, evict c (next uses: a@4, b@5, c@never) -> a,b hit;
    # at e evict d -> a,b hit again = 4 hits
    assert hits == 4


def test_belady_query_matches_fixture_and_dominates(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q303_belady_vs_lru"](SF)
    # recompute the twin fresh at sf0.001 (fixture is sf0.01-only)
    from collections import OrderedDict

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_id", "user_id"])
    trace = [int(u) for u in ev.sort_values(["ts", "event_id"])["user_id"]]
    n = len(trace)
    occ: dict = {}
    for i, k in enumerate(trace):
        occ.setdefault(k, []).append(i)
    want = []
    for cap in (4, 8, 16, 32):
        lru: OrderedDict = OrderedDict()
        lh = 0
        for k in trace:
            if k in lru:
                lh += 1
                lru.move_to_end(k)
            else:
                if len(lru) >= cap:
                    lru.popitem(last=False)
                lru[k] = True
        ptr = {k: 0 for k in occ}
        res: dict = {}
        oh = 0
        for i, k in enumerate(trace):
            ptr[k] += 1
            nxt = occ[k][ptr[k]] if ptr[k] < len(occ[k]) else n
            if k in res:
                oh += 1
            elif len(res) >= cap:
                victim = max(res, key=lambda x: (res[x], x))
                del res[victim]
            res[k] = nxt
        want.append((cap, n, lh, oh))
    have = [tuple(int(x) for x in r)
            for r in got.itertuples(index=False)]
    assert have == want
    # Belady optimality: OPT >= LRU at every size; hits grow with size
    assert all(o >= l for _, _, l, o in want)
    assert all(want[i][3] <= want[i + 1][3] for i in range(len(want) - 1))
