"""Mergeable sketches — the approximate-aggregate scale path.

At 10^12 rows an exact windowed DISTINCT (see
``relational.hourly_active_users``) stops being shuffle-bounded by a
dimension product; the standard answer is a MERGEABLE SKETCH carried as a
fixed-size binary partial: per-batch register arrays, an algebraic
max-merge, one tiny final estimate. HyperLogLog here (Flajolet et al.;
the classic ~1.04/sqrt(m) relative error).

The HLL/CMS hash rows are the textbook pairwise-independent universal
family h(x) = ((a·x + b) mod p) mod w over the 31-bit Mersenne prime —
the Cormode–Muthukrishnan construction, and SQL-expressible (VERDICT r4
item 4): a sketch's estimate is a DETERMINISTIC function of the data
given its hashes, so agg_hll_users / agg_cms_heavy carry bit-exact
DuckDB oracles that rebuild the same registers/cells in SQL. Pytest
additionally asserts the error bounds against exact counts and
run-to-run determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..ids import hash_series

HLL_P = 12  # 2^12 = 4096 registers → ~1.6% standard error
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)  # bias constant for m ≥ 128

# pairwise-independent 31-bit universal-hash family (shared with CMS):
# row i uses (a_i, b_i) = (A_MULT·i mod p, B_MULT·i mod p), i ≥ 1 — a
# closed form the SQL oracle regenerates; every product stays < 2^62
SKETCH_P = (1 << 31) - 1
SKETCH_A_MULT = 2654435761
SKETCH_B_MULT = 2246822519


def _uhash(values: pd.Series, i: int) -> np.ndarray:
    """Row-i universal hash of an integer key column → [0, p)."""
    k = pd.Series(values).to_numpy(np.int64) % SKETCH_P
    a = (SKETCH_A_MULT * i) % SKETCH_P
    b = (SKETCH_B_MULT * i) % SKETCH_P
    return (a * k + b) % SKETCH_P


def hll_registers(values: pd.Series) -> np.ndarray:
    """One batch of values → a 4096-byte register array (the partial).

    Register index and rank word come from two independent universal
    hashes (rows 1 and 2); rank = leading zeros of the 31-bit rank word
    + 1 = 32 − bit_length(w), computed EXACTLY via ``np.frexp`` (the SQL
    mirror uses length(bin(w)) — also exact, no float in the bit count)."""
    idx = (_uhash(values, 1) % HLL_M).astype(np.int64)
    w = _uhash(values, 2)
    _, e = np.frexp(w.astype(np.float64))  # e = bit_length(w); 0 for w=0
    rank = (32 - e).astype(np.uint8)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(HLL_M, dtype=np.uint8)
    for p in parts:
        np.maximum(out, p, out)
    return out


def hll_estimate(regs: np.ndarray) -> int:
    est = _ALPHA * HLL_M * HLL_M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * HLL_M and zeros:  # small-range linear counting
        est = HLL_M * np.log(HLL_M / zeros)
    return int(round(est))


def hll_distinct_users(sf_dir: str):
    """(event_type, approx_users) — approximate distinct users per event
    type. Shuffle volume: ONE 4 KB register blob per (type, batch) —
    constant in the row count, the whole point of the sketch."""
    import ray.data

    from .agg import hash_groupby

    from ..sources.tables import read_table

    ds = read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        rows = [
            (et, hll_registers(g["user_id"]).tobytes())
            for et, g in t.groupby("event_type", sort=False)
        ]
        return pd.DataFrame(rows, columns=["event_type", "regs"])

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            merged = hll_merge(
                [np.frombuffer(b, dtype=np.uint8) for b in grp["regs"]]
            )
            out.append((et, hll_estimate(merged)))
        df = pd.DataFrame(out, columns=["event_type", "approx_users"])
        df["approx_users"] = df["approx_users"].astype("int64")
        return df

    return hash_groupby(
        ds.map_batches(partial, batch_format="pandas"), "event_type", reduce_group
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — approximate per-key counts in constant state
# ---------------------------------------------------------------------------

CMS_D = 4       # hash rows → error probability ~e^-4
CMS_W = 4096    # columns → overestimate ≤ e/W of the stream mass (w.h.p.)


def _cms_rows(values: pd.Series) -> np.ndarray:
    """(D, n) column indexes for a batch of integer keys — the canonical
    Cormode–Muthukrishnan rows ((a_i·x + b_i) mod p) mod w (rows 3..6 of
    the shared universal family; 1..2 belong to HLL), exactly mirrored by
    the agg_cms_heavy SQL oracle."""
    idx = np.empty((CMS_D, len(values)), dtype=np.int64)
    for i in range(CMS_D):
        idx[i] = _uhash(values, i + 3) % CMS_W
    return idx


def cms_sketch(values: pd.Series) -> np.ndarray:
    """One batch → a (D, W) int64 count-min partial (128 KB, mergeable
    by ELEMENTWISE SUM — the linear-sketch property)."""
    idx = _cms_rows(values)
    sk = np.empty((CMS_D, CMS_W), dtype=np.int64)
    for i in range(CMS_D):
        sk[i] = np.bincount(idx[i], minlength=CMS_W).astype(np.int64)
    return sk


def cms_estimate(sk: np.ndarray, values: pd.Series) -> np.ndarray:
    """Point estimates for a vector of keys: min over the D rows —
    never under the true count; over by ≤ e/W of the total mass w.h.p."""
    idx = _cms_rows(values)
    ests = np.stack([sk[i][idx[i]] for i in range(CMS_D)])
    return ests.min(axis=0)


def cms_heavy_users(sf_dir: str, k: int = 10):
    """(user_id, approx_n) — top-k users by event count, counted by a
    Count-Min sketch: the heavy-hitter scale path. No (key, count) pairs
    ever shuffle — each batch contributes ONE 128 KB linear sketch
    (summed on the driver: batch-count-scale, like the MinHash pair
    merges) plus its distinct user ids (dimension-scale); final point
    estimates + top-k are a vocab-sized vectorized pass. Deterministic:
    universal-hash rows, integer state, (est desc, user_id asc) tie-break
    — identical at any parallelism, and bit-exactly reproduced by the
    agg_cms_heavy SQL oracle; pytest additionally asserts the one-sided
    error bound against exact counts, merge linearity, and run-to-run
    determinism."""
    from ..sources.tables import read_table

    ds = read_table(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        u = t["user_id"].astype("int64")
        return pd.DataFrame({
            "sk": [cms_sketch(u).tobytes()],
            "users": [np.unique(u.to_numpy(np.int64)).tobytes()],
        })

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    sk = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for b in parts["sk"]:
        sk += np.frombuffer(b, dtype=np.int64).reshape(CMS_D, CMS_W)
    users = np.unique(np.concatenate(
        [np.frombuffer(b, dtype=np.int64) for b in parts["users"]]
    ))
    est = cms_estimate(sk, pd.Series(users))
    order = np.lexsort((users, -est))[:k]
    return pd.DataFrame({
        "user_id": users[order].astype("int64"),
        "approx_n": est[order].astype("int64"),
    })


# ---------------------------------------------------------------------------
# Bloom filter — constant-state join prefilter
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 20   # 128 KB bitmap
BLOOM_K = 4            # hash rows → FP ≈ (1 - e^(-kn/m))^k
# splitmix64-style finalizer constants — the Bloom prefilter's RESULT is
# exact either way (False has no false negatives and every True verifies
# exactly), so its hashes stay 64-bit and need no SQL mirror
_BLOOM_MULTS = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
     0xD6E8FEB86659FD93], dtype=np.uint64,
)


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(K, n) bit positions — one SipHash, K integer finalizers."""
    h = hash_series([pd.Series(keys)]).astype(np.uint64)
    pos = np.empty((BLOOM_K, len(h)), dtype=np.int64)
    for i in range(BLOOM_K):
        x = h * _BLOOM_MULTS[i]
        x ^= x >> np.uint64(29)
        pos[i] = (x % np.uint64(BLOOM_BITS)).astype(np.int64)
    return pos


def bloom_partial(keys: np.ndarray) -> bytes:
    """One batch of keys → a packed 128 KB bitmap (mergeable by OR)."""
    bits = np.zeros(BLOOM_BITS, dtype=bool)
    pos = _bloom_positions(keys)
    for i in range(BLOOM_K):
        bits[pos[i]] = True
    return np.packbits(bits).tobytes()


def bloom_might_contain(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Membership test against an UNPACKED bool bitmap: False is
    definitive (no false negatives), True means 'verify exactly'."""
    pos = _bloom_positions(keys)
    out = np.ones(len(keys), dtype=bool)
    for i in range(BLOOM_K):
        out &= bits[pos[i]]
    return out


def customers_without_events(sf_dir: str):
    """(c_custkey, c_name) — customers with NO events, EXACT, via the
    Bloom-prefilter + exact-verify anti-join: the constant-state shape
    for an anti join whose build side's distinct-key set is too large to
    broadcast at corpus scale.

    Phases: (1) each events batch contributes ONE 128 KB Bloom partial
    (OR-merged — batch-count-scale, like the CMS/MinHash merges);
    (2) the probe side keeps every definitely-absent key immediately (a
    Bloom False has no false negatives) and routes only maybe-present
    keys — |true matches| + FP·|probe| — to (3) ONE exact semi pass over
    the build side against the broadcast candidate set. Result is exact
    (SQL-oracled via NOT EXISTS); the Bloom only shrinks the exact join's
    input, never changes its answer."""
    import ray

    from ..sources.tables import read_table
    from .joins import get_broadcast

    ev = read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    parts = ev.map_batches(
        lambda t: pd.DataFrame(
            {"bits": [bloom_partial(t["user_id"].to_numpy(np.int64))]}
        ),
        batch_format="pandas",
    ).to_pandas()
    bits = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    for b in parts["bits"]:
        bits |= np.frombuffer(b, dtype=np.uint8)
    bref = ray.put(np.unpackbits(bits).astype(bool))

    cust = read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_name"])

    def tag(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["maybe"] = bloom_might_contain(
            get_broadcast(bref), t["c_custkey"].to_numpy(np.int64))
        return t

    tagged = cust.map_batches(tag, batch_format="pandas").materialize()
    # vectorized per-batch mask (a row-lambda Dataset.filter evaluates
    # Python per ROW); the driver collects only the candidate keys
    from .agg import empty_safe

    cand = tagged.map_batches(
        lambda t: empty_safe(t.loc[t["maybe"], ["c_custkey"]]),
        batch_format="pandas",
    ).to_pandas()
    cand_keys = (
        np.sort(cand["c_custkey"].to_numpy(np.int64))
        if "c_custkey" in cand.columns else np.empty(0, np.int64)
    )
    cref = ray.put(cand_keys)

    def seen_partial(t: pd.DataFrame) -> pd.DataFrame:
        ck = get_broadcast(cref)
        u = np.unique(t["user_id"].to_numpy(np.int64))
        pos = np.searchsorted(ck, u)
        pos = np.clip(pos, 0, max(len(ck) - 1, 0))
        hit = u[(len(ck) > 0) & (ck[pos] == u)] if len(ck) else u[:0]
        return pd.DataFrame({"k": hit})

    seen = np.unique(
        ev.map_batches(seen_partial, batch_format="pandas").to_pandas()["k"]
        .to_numpy(np.int64)
    )
    sref = ray.put(seen)

    def keep(t: pd.DataFrame) -> pd.DataFrame:
        from .agg import empty_safe

        s = get_broadcast(sref)
        k = t["c_custkey"].to_numpy(np.int64)
        pos = np.clip(np.searchsorted(s, k), 0, max(len(s) - 1, 0))
        in_seen = (s[pos] == k) if len(s) else np.zeros(len(k), dtype=bool)
        out = t[~t["maybe"].to_numpy() | ~in_seen]
        return empty_safe(out[["c_custkey", "c_name"]])

    return tagged.map_batches(keep, batch_format="pandas")
