"""Relational operator archetypes over the testdata tables.

Each function here is the Ray-Data re-expression of an operator family the
reference implements imperatively (SURVEY.md §2 maps each): groupby
canonicalization (`NamespaceCreator.scala:22-28`), global distinct+sort
(`TypeNodePass.scala:7-21`), anti/semi-join stub logic
(`TypeDeclStubCreator.scala:14-50`, `StubRemovalPass.scala:13-27`),
multi-hop linking joins (`CallLinker.scala:42-84`), exact dedup
(`NodeFilter.scala:12-27`), per-row decoration maps
(`MethodDecoratorPass.scala:18-64`), and list-column explode+join
(`Linker.linkToMultiple`, `Linker.scala:88-102`).

Scale discipline: column-pruned reads, per-batch partial aggregation before
every groupby (shuffle partials not rows), broadcast key-set semi/anti
joins, vectorized pandas/numpy batch bodies.

All outputs name their computed columns exactly as the paired oracle SQL in
``__ray_entry__.py`` does (driver hash-compares by sorted column name).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import empty_safe, round_half_away
from .joins import broadcast_join, broadcast_semi_filter


def _read(sf_dir: str, table: str, columns=None):
    from ..sources.tables import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def to_units(x, scale: int) -> np.ndarray:
    """Exact int64 representation of a fixed-decimal money/value column.

    Every oracle-gated float SUM goes through integer units on BOTH sides
    (Ray: this helper; SQL: ``sum(CAST(round(col * scale) AS BIGINT))``):
    float summation is order-dependent, and a distributed partial-sum tree
    can land on the other side of a 0.005 rounding boundary than DuckDB's
    sequential sum (observed: rel_shipped_monthly, 34619311.70499999).
    Integer sums are associative — the gate can never flip on task order.
    np.rint is half-even vs SQL round's half-away, but the scaled values
    sit within 1e-3 of an integer (2-/4-decimal data), never at a tie."""
    return np.rint(np.asarray(x, dtype=np.float64) * scale).astype(np.int64)


# ---------------------------------------------------------------------------
# groupby-aggregate with per-batch partials (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


def q1_pricing(sf_dir: str):
    """Pricing summary per (returnflag, linestatus) — the partial-agg
    combiner pattern: one row per key per batch enters the shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        t = t.assign(
            qty_u=to_units(t["l_quantity"], 100),
            price_u=to_units(t["l_extendedprice"], 100),
            disc_u=to_units(t["l_extendedprice"] * (1 - t["l_discount"]), 10000),
            n=1,
        )
        g = t.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty_u", "sum"),
            sum_base_price=("price_u", "sum"),
            sum_disc_price=("disc_u", "sum"),
            count_order=("n", "sum"),
        )
        return g

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def finish(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["avg_qty"] = round_half_away(t["sum_qty"] / 100.0 / t["count_order"], 4)
        t["avg_price"] = round_half_away(
            t["sum_base_price"] / 100.0 / t["count_order"], 4
        )
        t["sum_qty"] = round_half_away(t["sum_qty"] / 100.0, 2)
        t["sum_base_price"] = round_half_away(t["sum_base_price"] / 100.0, 2)
        t["sum_disc_price"] = round_half_away(t["sum_disc_price"] / 10000.0, 2)
        return t

    return out.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# multi-hop dimension linking (CallLinker static-dispatch join chain)
# ---------------------------------------------------------------------------


def _orders_by_region(sf_dir: str, extra_cols=()):
    """orders ⋈ customer ⋈ nation ⋈ region — the shared dimension chain.

    nation/region are CONSTANT-size dims (25/5 rows) and merge driver-side;
    customer is corpus-proportional, so the orders⋈customer hop goes
    through ``join_auto``: broadcast probe while customer fits the 256 MB
    budget, degrading to Ray's hash-partitioned shuffle join past it —
    never an unconditional driver ``to_pandas()`` of a growing table."""
    from .joins import join_auto

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nd = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "n_name", "r_name"]
    ]
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice", *extra_cols]
    )
    j = join_auto(orders, cust, on="o_custkey", right_on="c_custkey", how="inner")
    return broadcast_join(j, nd, on="c_nationkey", right_on="n_nationkey")


def nation_revenue(sf_dir: str):
    """orders ⋈ customer ⋈ nation ⋈ region → revenue per (region, nation).

    The fact stream (orders) flows through size-aware joins against the
    dimension chain — the reference's name→node map probes re-expressed as
    map-side joins (`Linker.scala:122-130`), degrading to a shuffle join
    when the customer dim outgrows the broadcast budget."""
    from ray.data.aggregate import Count, Sum

    joined = _orders_by_region(sf_dir)

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        t = t.assign(n=1, rev_u=to_units(t["o_totalprice"], 100))
        return t.groupby(["r_name", "n_name"], as_index=False).agg(
            revenue=("rev_u", "sum"), n_orders=("n", "sum")
        )

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
    )
    return out.map_batches(
        lambda t: t.assign(revenue=round_half_away(t["revenue"] / 100.0, 2)),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# anti / semi joins (stub creation / removal archetypes)
# ---------------------------------------------------------------------------


def parts_without_lineitems(sf_dir: str):
    """Parts never referenced by any lineitem — TypeDeclStubCreator's
    left-anti 'which full_names lack a TYPE_DECL' (`TypeDeclStubCreator.
    scala:14-50`), via broadcast key-set anti filter."""
    used = _read(sf_dir, "lineitem", ["l_partkey"]).unique("l_partkey")
    parts = _read(sf_dir, "part", ["p_partkey", "p_name"])
    out = broadcast_semi_filter(parts, used, on="p_partkey", keep=False).to_pandas()
    if out.empty:  # preserve schema when every part is referenced
        out = pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                            "p_name": pd.Series(dtype="object")})
    return out


def customers_with_orders(sf_dir: str):
    """Semi join (StubRemovalPass 'has a real definition' check)."""
    have = _read(sf_dir, "orders", ["o_custkey"]).unique("o_custkey")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return broadcast_semi_filter(cust, have, on="c_custkey", keep=True)


# ---------------------------------------------------------------------------
# global distinct + sort (TypeNodePass)
# ---------------------------------------------------------------------------


def distinct_part_types(sf_dir: str):
    """Distinct p_type, sorted — `usedTypes.sorted` (`TypeNodePass.scala:11`).
    Per-batch dedup partials → groupby → sort."""
    ds = _read(sf_dir, "part", ["p_type"])
    partials = ds.map_batches(lambda t: t.drop_duplicates(), batch_format="pandas")
    from ray.data.aggregate import Count

    return (
        partials.groupby("p_type")
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .sort("p_type")
    )


# ---------------------------------------------------------------------------
# exact dedup (NodeFilter)
# ---------------------------------------------------------------------------


def dedup_docs_exact(sf_dir: str):
    """Group documents by identical text; keep min doc_id — the TYPE-node
    exact dedup (`NodeFilter.scala:15-26`) with deterministic first-wins."""
    from .agg import hash_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        g = t.groupby("text", as_index=False).agg(keep_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        return g

    return hash_agg(
        ds.map_batches(partial, batch_format="pandas"),
        "text",
        keep_id=("keep_id", "min"),
        n_copies=("n_copies", "sum"),
    )


# ---------------------------------------------------------------------------
# canonical groupby (NamespaceCreator)
# ---------------------------------------------------------------------------


def orders_by_priority(sf_dir: str):
    """One canonical row per priority group + representative member —
    `NamespaceCreator.scala:22-28` (groupby name → canonical node)."""
    from ray.data.aggregate import Min, Sum

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        return t.groupby("o_orderpriority", as_index=False).agg(
            first_order=("o_orderkey", "min"), n_orders=("o_orderkey", "size")
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(
            Min("first_order", alias_name="first_order"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# sort + limit (deterministic top-k)
# ---------------------------------------------------------------------------


def top_orders(sf_dir: str, k: int = 10):
    """Top-k orders by totalprice, orderkey tiebreak (order-as-data
    discipline, SURVEY.md §4 'ordering assumptions')."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    # local top-k per batch, then global top-k — never a full sort
    def local_topk(t: pd.DataFrame) -> pd.DataFrame:
        return t.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(k)

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# event-time bucketing (the streaming-shaped groupby window)
# ---------------------------------------------------------------------------


def events_hourly(sf_dir: str):
    """Tumbling 1h window per user over the events log: batch groupby over
    (user, hour) — Ray Data has no watermarks; windows are keys
    (ray_guide 'Streaming-shaped workloads')."""
    from .agg import hash_agg

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        # astype('datetime64[s]') first: arrow timestamp[us] surfaces as
        # datetime64[us] in pandas, so a bare int64 view would be µs
        hour = t["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
        g = pd.DataFrame(
            {"user_id": t["user_id"], "hour_epoch": hour,
             "value_u": to_units(t["value"], 100), "n": 1}
        )
        return g.groupby(["user_id", "hour_epoch"], as_index=False).agg(
            n_events=("n", "sum"), sum_value=("value_u", "sum")
        )

    out = hash_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id", "hour_epoch"],
        n_events=("n_events", "sum"),
        sum_value=("sum_value", "sum"),
    )
    return out.map_batches(
        lambda t: t.assign(sum_value=round_half_away(t["sum_value"] / 100.0, 2)),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# list-column explode + aggregate (linkToMultiple)
# ---------------------------------------------------------------------------


def part_type_tokens(sf_dir: str):
    """Explode p_type into tokens and count — the list-column link pattern
    (`Linker.linkToMultiple`, `Linker.scala:88-102`: explode → join)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "part", ["p_type"])

    def explode(t: pd.DataFrame) -> pd.DataFrame:
        toks = t["p_type"].str.split(" ").explode()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index, "n_parts": vc.to_numpy(np.int64)})

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n_parts", alias_name="n_parts"))
    )


# ---------------------------------------------------------------------------
# per-row decode/decoration map (MethodDecoratorPass / proto decode)
# ---------------------------------------------------------------------------


def events_extract_k(sf_dir: str):
    """Vectorized JSON-ish field extraction from the props string — the
    per-row decode stage (`ProtoToCpg.addNodes` property decode,
    `ProtoToCpg.scala:46-75`), kept fully vectorized."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def extract(t: pd.DataFrame) -> pd.DataFrame:
        k = t["props"].str.extract(r'"k": (\d+)', expand=False).astype("Int64")
        return pd.DataFrame({"event_id": t["event_id"], "k": k})

    return ds.map_batches(extract, batch_format="pandas")


def shipped_monthly(sf_dir: str):
    """Filter (pushed to the read) + monthly revenue — pruned-read +
    vectorized-predicate archetype."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.tables import read_table

    ds = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pc.scalar(pd.Timestamp("1995-01-01"))),
    )

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        month = (
            t["l_shipdate"].dt.to_period("M").dt.to_timestamp()
            .astype("datetime64[s]").astype("int64")
        )
        rev_u = to_units(t["l_extendedprice"] * (1 - t["l_discount"]), 10000)
        g = pd.DataFrame({"month_epoch": month, "revenue": rev_u, "n": 1})
        return g.groupby("month_epoch", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("n", "sum")
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("month_epoch")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_items", alias_name="n_items"))
    )
    return out.map_batches(
        lambda t: t.assign(revenue=round_half_away(t["revenue"] / 10000.0, 2)),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# session windows (gap-based sessionization — the training-data log split)
# ---------------------------------------------------------------------------


def sessionize_events(sf_dir: str, gap_min: int = 30):
    """Gap-based session windows per user over the events log.

    The streaming sessionizer re-expressed batch-style (ray_guide
    'Streaming-shaped workloads'): ``hash_groupby`` co-locates each user's
    events, then ONE vectorized pass per bucket sorts, breaks on
    ``gap > gap_min`` (LAG + cumulative sum — no per-row loop), and
    aggregates per session. Scale shape: the shuffle is keyed by user, so
    session state never crosses tasks and no watermark machinery is
    needed; skew = the hottest single user, which fits one task by
    construction.
    """
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    gap = pd.Timedelta(minutes=gap_min)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = new_user | (g["ts"] - g["ts"].shift() > gap)
        g["_sess"] = brk.cumsum()  # globally increasing → unique per session
        g["_vu"] = to_units(g["value"], 100)
        out = g.groupby(["user_id", "_sess"], as_index=False).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
            sum_value=("_vu", "sum"),
        )
        # per-user session ordinal (sessions sort by start within a user)
        out = out.sort_values(["user_id", "_sess"], ignore_index=True)
        out["session_idx"] = out.groupby("user_id").cumcount() + 1
        out["sum_value"] = round_half_away(out["sum_value"] / 100.0, 2)
        return out[
            ["user_id", "session_idx", "session_start", "session_end",
             "n_events", "sum_value"]
        ]

    return hash_groupby(ds, "user_id", per_bucket)


# ---------------------------------------------------------------------------
# top-k per group (windowed rank — local combiner bounds the shuffle)
# ---------------------------------------------------------------------------


def topk_orders_per_customer(sf_dir: str, k: int = 3):
    """Top-k orders per customer by price (orderkey tiebreak).

    ROW_NUMBER-per-partition re-expressed with the partial-aggregation
    discipline: a per-batch local top-k first (shuffle volume drops from
    all rows to ≤ k per key per batch), then the bucketed groupby takes
    the true top-k and ranks — never a global sort.
    """
    from .agg import hash_groupby

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    BY = ["o_custkey", "o_totalprice", "o_orderkey"]
    ASC = [True, False, True]

    def local_topk(t: pd.DataFrame) -> pd.DataFrame:
        return t.sort_values(BY, ascending=ASC).groupby(
            "o_custkey", as_index=False, sort=False
        ).head(k)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(BY, ascending=ASC, ignore_index=True)
        g = g.groupby("o_custkey", as_index=False, sort=False).head(k).copy()
        g["rnk"] = g.groupby("o_custkey").cumcount() + 1
        return g

    return hash_groupby(
        ds.map_batches(local_topk, batch_format="pandas"), "o_custkey", per_bucket
    )


def percent_rank_orders(sf_dir: str):
    """(o_orderkey, pct) — percent_rank of order price within its priority
    class: the rank-based window archetype (ties share the min rank;
    pct = (rank-1)/(n-1), n>1 guaranteed per class here). One bucketed
    shuffle keyed by the partition key, vectorized rank per bucket —
    same scale shape as the other window operators."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rank = g.groupby("o_orderpriority")["o_totalprice"].rank(method="min")
        n = g.groupby("o_orderpriority")["o_totalprice"].transform("size")
        pct = (rank.to_numpy() - 1) / (n.to_numpy() - 1)
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(np.int64), "pct": pct}
        )

    return hash_groupby(ds, "o_orderpriority", per_bucket)


# ---------------------------------------------------------------------------
# ordered per-key window functions (rolling / lag)
# ---------------------------------------------------------------------------


def rolling_avg_events(sf_dir: str, window: int = 3):
    """(user_id, event_id, avg3) — moving average of ``value`` over the
    current + 2 preceding events per user, ordered by (ts, event_id).

    The ordered-window archetype: Ray Data has no window operator, so the
    scale shape is ONE bucketed shuffle keyed by the partition key (a
    user's history co-locates; the hottest user bounds a task) and a
    vectorized in-bucket sort + cython rolling — order stays data
    (SURVEY.md §4 'ordering assumptions'), never block order."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        # exact int-unit window sums via cumsum differences: pandas'
        # sliding-sum rolling mean uses different float arithmetic than
        # SQL's frame sum and can flip a .round(4) boundary — int windows
        # are associative and land identically on both sides
        vu = to_units(g["value"], 100)
        cs = np.concatenate([np.zeros(1, np.int64), np.cumsum(vu)])
        pos = g.groupby("user_id", sort=False).cumcount().to_numpy()
        w = np.minimum(pos + 1, window)
        i = np.arange(len(g))
        wsum = cs[i + 1] - cs[i + 1 - w]
        return pd.DataFrame(
            {"user_id": g["user_id"], "event_id": g["event_id"],
             "avg3": round_half_away(wsum / 100.0 / w, 4)}
        )

    return hash_groupby(ds, "user_id", per_bucket)


def lag_gaps(sf_dir: str):
    """(user_id, event_id, prev_event_id, gap_us) — LAG over each user's
    event sequence ordered by (ts, event_id); all-integer output. Same
    bucketed-window shape as ``rolling_avg_events``."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        same = g["user_id"].eq(g["user_id"].shift()).to_numpy()
        ts_us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        # int64 end to end — Series.shift would route through float64 and
        # silently corrupt ids above 2^53; np.roll keeps the dtype (row 0
        # wraps but is always masked out by `same`)
        prev_ev = np.roll(g["event_id"].to_numpy(np.int64), 1)
        gap = ts_us - np.roll(ts_us, 1)
        out = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy()[same],
             "event_id": g["event_id"].to_numpy()[same],
             "prev_event_id": prev_ev[same],
             "gap_us": gap[same]}
        )
        return out

    return hash_groupby(ds, "user_id", per_bucket)


# ---------------------------------------------------------------------------
# exact distributed percentile (counting quantile over value partials)
# ---------------------------------------------------------------------------


def median_price_by_priority(sf_dir: str):
    """(o_orderpriority, median_price) — exact percentile_disc(0.5).

    Exact distributed quantile via the counting method: per-batch
    (group, value) partial counts collapse the stream to its value
    histogram (bounded by DISTINCT values, not rows — prices have cents
    precision, so the histogram is dimension-sized even at 10^12 rows),
    then one bucketed shuffle per group walks the cumulative counts to the
    smallest value with cume_dist ≥ 0.5 — exactly DuckDB's
    ``percentile_disc(0.5)``. No sort of the raw stream, no driver
    materialization of row-scale data."""
    from .agg import hash_agg, hash_groupby

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        return t.groupby(["o_orderpriority", "o_totalprice"], as_index=False).agg(
            n=("o_totalprice", "size")
        )

    hist = hash_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority", "o_totalprice"],
        n=("n", "sum"),
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderpriority", "o_totalprice"], ignore_index=True)
        out = []
        for prio, grp in g.groupby("o_orderpriority", sort=False):
            cum = grp["n"].cumsum().to_numpy()
            total = cum[-1]
            idx = int(np.searchsorted(cum * 2, total, side="left"))
            out.append((prio, grp["o_totalprice"].to_numpy()[idx]))
        return pd.DataFrame(out, columns=["o_orderpriority", "median_price"])

    return hash_groupby(hist, "o_orderpriority", pick)


# ---------------------------------------------------------------------------
# deterministic hash sampling (the reproducible-subset operator)
# ---------------------------------------------------------------------------

SAMPLE_MULT = 2654435761  # Knuth multiplicative constant
SAMPLE_MOD = 1 << 32
SAMPLE_KEEP = SAMPLE_MOD // 100  # ≈ 1%


def sample_orders_hash(sf_dir: str):
    """(o_orderkey, o_custkey, o_totalprice) — deterministic ~1% sample by
    multiplicative key hash. Sampling must be a pure function of the key —
    never of block order or an RNG — so two runs (and the SQL oracle) pick
    the IDENTICAL subset at any parallelism: the StableOutputTests
    discipline applied to sampling. Embarrassingly parallel (a stateless
    vectorized filter per batch; no shuffle)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def keep(t: pd.DataFrame) -> pd.DataFrame:
        h = (t["o_orderkey"].to_numpy(np.int64) * SAMPLE_MULT) % SAMPLE_MOD
        return t[h < SAMPLE_KEEP]

    return ds.map_batches(keep, batch_format="pandas")


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1996-06-15"


def q3_unshipped(sf_dir: str, k: int = 10):
    """(l_orderkey, revenue, o_orderdate) — top-k unshipped-order revenue
    in one market segment: the TPC-H Q3 archetype (selective dim semi
    filter → date-pruned fact ⋈ fact → grouped revenue → top-k).

    Scale shape: the segment's customer keys broadcast (dim-scale semi
    filter — Bloom at extreme scale, functions/sketch.py); lineitem
    pre-aggregates revenue per order INSIDE map_batches before the one
    order-keyed exchange; the date-bounded orders side rides join_auto
    (broadcast under the budget, shuffle join beyond); top-k is local
    partials + a k-row sort — never a full sort. Revenue sums in exact
    int64 cents on both sides (to_units discipline)."""
    from .agg import empty_safe, hash_agg

    cutoff = pd.Timestamp(Q3_CUTOFF)
    seg_keys = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.loc[t["c_mktsegment"] == Q3_SEGMENT, ["c_custkey"]],
            batch_format="pandas",
        )
        .unique("c_custkey")
    )
    orders_f = broadcast_semi_filter(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(lambda t: t[t["o_orderdate"] < cutoff],
                     batch_format="pandas"),
        seg_keys, on="o_custkey",
    ).drop_columns(["o_custkey"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def rev_partial(t: pd.DataFrame) -> pd.DataFrame:
        t = t[t["l_shipdate"] > cutoff]
        u = to_units(t["l_extendedprice"] * (1.0 - t["l_discount"]), 100)
        g = pd.DataFrame(
            {"l_orderkey": t["l_orderkey"].to_numpy(np.int64), "rev_u": u}
        ).groupby("l_orderkey", as_index=False).sum()
        return empty_safe(g)

    rev = hash_agg(
        li.map_batches(rev_partial, batch_format="pandas"),
        "l_orderkey", rev_u=("rev_u", "sum"),
    )
    from .joins import join_auto

    joined = join_auto(rev, orders_f, on="l_orderkey",
                       right_on="o_orderkey", how="inner")

    def local_topk(t: pd.DataFrame) -> pd.DataFrame:
        return empty_safe(t.sort_values(
            ["rev_u", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
        ).head(k))

    top = (
        joined.map_batches(local_topk, batch_format="pandas")
        .sort(["rev_u", "o_orderdate", "l_orderkey"],
              descending=[True, False, False])
        .limit(k)
    )
    return top.map_batches(
        lambda t: pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_numpy(np.int64),
            "revenue": round_half_away(t["rev_u"].to_numpy() / 100.0, 2),
            "o_orderdate": t["o_orderdate"],
        }),
        batch_format="pandas",
    )


SHUFFLE_RANGE_BITS = 24  # 2^32 hash space → 256 ordered range buckets


def shuffle_rank_orders(sf_dir: str):
    """(o_orderkey, shuffle_pos) — deterministic global shuffle: every row
    gets its exact position in the corpus ordered by (keyed hash, key).
    The training-data global-shuffle archetype (epoch shuffling without an
    RNG), computed WITHOUT a global sort: the multiplicative hash is
    uniform on [0, 2^32), so its high bits are ORDERED range buckets —
    per-bucket counts (bucket-scale, tiny) give exclusive global offsets,
    and each bucket ranks locally in one task. Shape: one stateless count
    pass + one bucket-keyed exchange; bucket count scales with the hash
    space split, never with corpus bytes.
    """
    from .agg import hash_groupby
    from .joins import get_broadcast

    import ray

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def with_bucket(t: pd.DataFrame) -> pd.DataFrame:
        h = (t["o_orderkey"].to_numpy(np.int64) * SAMPLE_MULT) % SAMPLE_MOD
        return pd.DataFrame({
            "o_orderkey": t["o_orderkey"].to_numpy(np.int64),
            "h": h,
            "rb": (h >> SHUFFLE_RANGE_BITS).astype(np.int64),
        })

    hb = ds.map_batches(with_bucket, batch_format="pandas")

    def count_partial(t: pd.DataFrame) -> pd.DataFrame:
        vc = t["rb"].value_counts()
        return pd.DataFrame({"rb": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    from .agg import hash_agg

    counts = hash_agg(
        hb.map_batches(count_partial, batch_format="pandas"), "rb", n=("n", "sum")
    ).to_pandas().sort_values("rb", ignore_index=True)
    # exclusive scan over the (≤2^(32-bits)) ordered buckets → global offsets
    base = np.cumsum(counts["n"].to_numpy(np.int64)) - counts["n"].to_numpy(np.int64)
    offsets_ref = ray.put(dict(zip(counts["rb"].astype(int), base.tolist())))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = get_broadcast(offsets_ref)
        outs = []
        for rb, grp in g.groupby("rb"):
            grp = grp.sort_values(["h", "o_orderkey"], ignore_index=True)
            outs.append(pd.DataFrame({
                "o_orderkey": grp["o_orderkey"].to_numpy(np.int64),
                "shuffle_pos": off[int(rb)] + np.arange(len(grp), dtype=np.int64),
            }))
        return pd.concat(outs, ignore_index=True)

    return hash_groupby(hb, "rb", per_bucket)


# ---------------------------------------------------------------------------
# range join against a small interval table (banded lookup)
# ---------------------------------------------------------------------------

# value bands: [lo, hi) half-open, covering the full domain
_VALUE_BANDS = [
    (0.0, 10.0, "low"),
    (10.0, 100.0, "mid"),
    (100.0, 1e18, "high"),
]


def events_value_bands(sf_dir: str):
    """Range join of the event stream against a small interval table.

    The canonical scale shape for banded / IP-range / threshold joins:
    the small side is a constant broadcast (here a literal; at scale a
    ``ray.put`` handle) and the probe is a per-batch vectorized
    ``searchsorted`` over the sorted interval starts — no shuffle at all
    on the big side until the final tiny aggregation. An all-to-all range
    join is never needed when one side fits in memory.
    """
    from .agg import hash_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])
    los = np.array([b[0] for b in _VALUE_BANDS])
    names = np.array([b[2] for b in _VALUE_BANDS], dtype=object)

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        idx = np.searchsorted(los, t["value"].to_numpy(), side="right") - 1
        g = pd.DataFrame(
            {"event_type": t["event_type"], "band": names[idx],
             "value_u": to_units(t["value"], 100), "n": 1}
        )
        return g.groupby(["event_type", "band"], as_index=False).agg(
            n_events=("n", "sum"), sum_value=("value_u", "sum")
        )

    out = hash_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "band"],
        n_events=("n_events", "sum"),
        sum_value=("sum_value", "sum"),
    )
    return out.map_batches(
        lambda t: t.assign(sum_value=round_half_away(t["sum_value"] / 100.0, 2)),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# pivot (conditional aggregation) + deterministic collect (string_agg)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_types(sf_dir: str):
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view) — the
    pivot/crosstab operator as conditional aggregation: one wide partial
    row per (user, batch) via a vectorized crosstab, then a bucketed sum —
    the column set is the (fixed, declared) type enum, so the shuffle
    carries one row per user, never one per event."""
    from .agg import hash_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(t["user_id"], t["event_type"])
        ct = ct.reindex(columns=EVENT_TYPES, fill_value=0)
        ct.columns = cols
        return ct.reset_index().astype({c: "int64" for c in cols})

    return hash_agg(
        ds.map_batches(partial, batch_format="pandas"),
        "user_id",
        **{c: (c, "sum") for c in cols},
    )


def region_nation_list(sf_dir: str):
    """(r_name, nations) — per-region comma-joined SORTED nation names: the
    collect_list/string_agg operator with order as data (deterministic at
    any parallelism, `usedTypes.sorted` discipline). Dimension-sized input;
    the same shape scales as hash_groupby + per-group sorted join."""
    nat = _read(sf_dir, "nation", ["n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    m = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    out = (
        m.sort_values(["r_name", "n_name"])
        .groupby("r_name", as_index=False)
        .agg(nations=("n_name", ",".join))
    )
    return out


def rollup_revenue(sf_dir: str):
    """(r_name, n_name, revenue) — revenue with ROLLUP subtotals: one row
    per (region, nation), per region (n_name='ALL'), and a grand total.

    The multi-level aggregate: the corpus-scale work is ONE distributed
    pass (the same broadcast-join + partial-agg plan as nation_revenue);
    the rollup levels derive from the unrounded base aggregate, which is
    dimension-sized (|regions|×|nations|), on the driver. Rounding happens
    once at the end on every level — matching SQL ROLLUP exactly."""
    from ray.data.aggregate import Sum

    joined = _orders_by_region(sf_dir)

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        t = t.assign(rev_u=to_units(t["o_totalprice"], 100))
        return t.groupby(["r_name", "n_name"], as_index=False).agg(
            revenue=("rev_u", "sum")
        )

    base = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    per_region = base.groupby("r_name", as_index=False).agg(revenue=("revenue", "sum"))
    per_region["n_name"] = "ALL"
    total = pd.DataFrame(
        {"r_name": ["ALL"], "n_name": ["ALL"], "revenue": [base["revenue"].sum()]}
    )
    out = pd.concat([base, per_region, total], ignore_index=True)
    # rollup levels summed in exact int units; ONE division at the end
    out["revenue"] = round_half_away(out["revenue"] / 100.0, 2)
    return out[["r_name", "n_name", "revenue"]]


STRAT_K = 10


def sample_stratified_events(sf_dir: str, k: int = STRAT_K):
    """(event_type, event_id) — per event type, the k events with the
    smallest multiplicative key hash: a deterministic stratified sample
    (reservoir sampling without the RNG — same subset at any parallelism
    and in the SQL oracle). Shape = the top-k-per-group combiner: a local
    per-batch top-k bounds the shuffle to ≤ k rows per (type, batch)."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["event_type", "event_id"])

    def with_hash(t: pd.DataFrame) -> pd.DataFrame:
        h = (t["event_id"].to_numpy(np.int64) * SAMPLE_MULT) % SAMPLE_MOD
        t = t.assign(_h=h)
        return t.sort_values(["event_type", "_h", "event_id"]).groupby(
            "event_type", as_index=False, sort=False
        ).head(k)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "_h", "event_id"], ignore_index=True)
        g = g.groupby("event_type", as_index=False, sort=False).head(k)
        return g[["event_type", "event_id"]]

    return hash_groupby(
        ds.map_batches(with_hash, batch_format="pandas"), "event_type", final_topk
    )


def sliding_max_events(sf_dir: str, window_min: int = 30):
    """(user_id, event_id, max30) — max value over each user's trailing
    30-minute TIME window (RANGE semantics, both ends inclusive).

    The time-based sliding-window aggregate (cf. SlickDeque, EDBT 2018 —
    the incremental deque that a true streaming engine would keep per
    key): batch-side, the same result comes from one user-keyed bucketed
    shuffle + a cython time-rolling pass per bucket. Window membership is
    by TIMESTAMP, not row count — `closed="both"` mirrors SQL's RANGE
    BETWEEN ... PRECEDING AND CURRENT ROW exactly. Max is order-exact
    (no float summation), so the oracle compares unrounded."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # TRUE RANGE peer semantics: SQL's RANGE ... CURRENT ROW includes
        # every ts-peer, even rows that sort positionally LATER — pandas'
        # positional rolling excludes them. Collapse to per-(user, ts)
        # maxima first, roll over DISTINCT timestamps, then map back to
        # rows; tie order inside a timestamp can no longer matter.
        g = g.sort_values(["user_id", "ts"], ignore_index=True)
        d = g.groupby(["user_id", "ts"], as_index=False, sort=False).agg(
            max30=("value", "max")
        )
        r = (
            d.groupby("user_id", sort=False)
            .rolling(f"{window_min}min", on="ts", closed="both")["max30"]
            .max()
        )
        # rolling(on="ts") indexes the result by (group, ts) — align
        # POSITIONALLY: group order of appearance == d's sorted order
        d = d.assign(max30=r.to_numpy())
        out = g.merge(d, on=["user_id", "ts"], how="left")
        return out[["user_id", "event_id", "max30"]]

    return hash_groupby(ds, "user_id", per_bucket)


def hourly_active_users(sf_dir: str):
    """(hour_epoch, n_users) — DISTINCT aggregate per window: exact
    distinct-user counts per hour. Two-level shape: dedup partials per
    batch, one bucketed (hour, user) dedup shuffle, then the per-hour
    count — the exact-distinct discipline (no sketch needed because the
    dedup shuffle volume is already bounded by |hours|×|users|, a
    dimension product; at true corpus scale swap level 2 for HLL partials
    and accept approximation)."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        hour = t["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
        return pd.DataFrame({"hour_epoch": hour, "user_id": t["user_id"]}).drop_duplicates()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        out = d.groupby("hour_epoch", as_index=False).agg(n_users=("user_id", "size"))
        return out

    # bucket by hour: all of an hour's rows co-locate → exact distinct count
    return hash_groupby(
        ds.map_batches(partial, batch_format="pandas"), "hour_epoch", per_bucket
    )


def cumulative_new_users(sf_dir: str):
    """(hour_epoch, new_users, cum_users) — user-acquisition curve: how
    many users appear for the FIRST time in each hour, plus the running
    total. The running-DISTINCT archetype: a windowed count(distinct) is
    not directly SQL-window-expressible either — both sides reduce it to
    first-occurrence extraction + an ordinary prefix sum.

    Scale shape: per-batch (user, min-hour) partials → ONE user-keyed
    min exchange (user-dimension volume) → per-batch hour histograms →
    a tiny hour-keyed sum; the prefix scan runs on the HOURS table
    (date-scale, driver-held like the skyline frontier)."""
    from .agg import hash_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def first_partial(t: pd.DataFrame) -> pd.DataFrame:
        hour = t["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
        return pd.DataFrame({"user_id": t["user_id"], "h": hour}).groupby(
            "user_id", as_index=False
        ).min()

    firsts = hash_agg(
        ds.map_batches(first_partial, batch_format="pandas"),
        "user_id", h=("h", "min"),
    )

    def hour_partial(t: pd.DataFrame) -> pd.DataFrame:
        vc = t["h"].value_counts()
        return pd.DataFrame({"h": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    hours = hash_agg(
        firsts.map_batches(hour_partial, batch_format="pandas"),
        "h", new_users=("n", "sum"),
    ).to_pandas().sort_values("h", ignore_index=True)
    return pd.DataFrame({
        "hour_epoch": hours["h"].to_numpy(np.int64),
        "new_users": hours["new_users"].to_numpy(np.int64),
        "cum_users": np.cumsum(hours["new_users"].to_numpy(np.int64)),
    })


def retention_cohorts(sf_dir: str):
    """(cohort_day, age_days, active_users) — classic cohort-retention
    matrix over events: users are grouped by first-activity day (the
    cohort), and each cell counts how many of a cohort's users were active
    ``age_days`` after joining. The product-analytics archetype the
    reference's per-overlay pass structure has no analog for — pure
    query-surface extension.

    Scale shape: per-batch distinct (user, day) partials → ONE user-keyed
    exchange where each user's full day set co-locates, so the cohort
    (min day) and the per-user (cohort, age) rows derive inside the bucket
    with no broadcast → a (cohort, age)-keyed count sum (matrix-scale,
    days² rows)."""
    from .agg import empty_safe, hash_agg, hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def day_partial(t: pd.DataFrame) -> pd.DataFrame:
        day = t["ts"].dt.floor("D").astype("datetime64[s]").astype("int64") // 86400
        return pd.DataFrame(
            {"user_id": t["user_id"], "d": day}
        ).drop_duplicates()

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        cohort = g.groupby("user_id")["d"].transform("min")
        return empty_safe(pd.DataFrame({
            "cohort_day": cohort.to_numpy(np.int64),
            "age_days": (g["d"] - cohort).to_numpy(np.int64),
        }))

    cells = hash_groupby(
        ds.map_batches(day_partial, batch_format="pandas"),
        "user_id",
        per_user,
    )

    out = hash_agg(
        cells.map_batches(
            lambda t: t.groupby(["cohort_day", "age_days"], as_index=False)
                       .size().rename(columns={"size": "n"}),
            batch_format="pandas",
        ),
        ["cohort_day", "age_days"],
        active_users=("n", "sum"),
    ).to_pandas().sort_values(["cohort_day", "age_days"], ignore_index=True)
    out["active_users"] = out["active_users"].astype("int64")
    return out


def trend_slope(sf_dir: str):
    """(event_type, trend_units) — per-type activity trend: the least-
    squares slope of hourly event counts over the corpus's global hour
    axis (zero-filled, so every type regresses over the SAME x range).
    Emitted as the integer slope NUMERATOR n·Σxy − Σx·Σy (the denominator
    n·Σx² − (Σx)² is a positive corpus constant), so ordering/sign carry
    and the gate stays all-integer — the adamic_adar units precedent.
    Zero-filled hours contribute nothing to Σxy/Σy, so only nonzero
    (type, hour) cells ever move.

    Scale shape: per-batch (type, hour) count partials → ONE (type, hour)-
    keyed sum exchange (date×type-scale) → the moment reduction runs on
    that date-scale table (driver-held, the cumulative_users HOURS-table
    precedent)."""
    from .agg import hash_agg

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def hour_partial(t: pd.DataFrame) -> pd.DataFrame:
        h = t["ts"].dt.floor("h").astype("datetime64[s]").astype("int64") // 3600
        g = pd.DataFrame({"event_type": t["event_type"], "h": h}).groupby(
            ["event_type", "h"], as_index=False
        ).size().rename(columns={"size": "n"})
        return g

    hc = hash_agg(
        ds.map_batches(hour_partial, batch_format="pandas"),
        ["event_type", "h"], y=("n", "sum"),
    ).to_pandas()
    if not len(hc):
        return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                             "trend_units": pd.Series(dtype="int64")})
    h0, h1 = int(hc["h"].min()), int(hc["h"].max())
    n = h1 - h0 + 1
    sx = (h1 - h0) * (h1 - h0 + 1) // 2
    x = hc["h"].to_numpy(np.int64) - h0
    y = hc["y"].to_numpy(np.int64)
    per = pd.DataFrame({"event_type": hc["event_type"],
                        "xy": x * y, "y": y}).groupby(
        "event_type", as_index=False
    ).sum()
    return pd.DataFrame({
        "event_type": per["event_type"],
        "trend_units": (n * per["xy"] - sx * per["y"]).astype("int64"),
    }).sort_values("event_type", ignore_index=True)


def event_transitions(sf_dir: str):
    """(from_type, to_type, n) — Markov transition counts over each user's
    event sequence ordered by (ts, event_id): the sequence-bigram
    archetype (session-flow / Sankey input). Same user-bucketed window
    shape as ``lag_gaps``; the final reduce is a (type×type)-scale sum."""
    from .agg import hash_agg, hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        same = g["user_id"].eq(g["user_id"].shift()).to_numpy()
        out = pd.DataFrame(
            {"from_type": g["event_type"].shift().to_numpy()[same],
             "to_type": g["event_type"].to_numpy()[same]}
        )
        return empty_safe(
            out.groupby(["from_type", "to_type"], as_index=False)
            .size().rename(columns={"size": "n"})
        )

    out = hash_agg(
        hash_groupby(ds, "user_id", per_bucket),
        ["from_type", "to_type"], n=("n", "sum"),
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["from_type", "to_type"], ignore_index=True)


def out_of_order_events(sf_dir: str):
    """(user_id, n_events, n_late) — late-arrival detection: an event is
    LATE if its timestamp precedes the running max timestamp of the user's
    previously-INGESTED events (ingest order = event_id). The watermark /
    out-of-orderness audit every event-time streaming pipeline runs before
    choosing window lateness bounds. User-bucketed cummax, all-integer."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"], ignore_index=True)
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        same = g["user_id"].eq(g["user_id"].shift()).to_numpy()
        pmax = ts.groupby(g["user_id"]).cummax().shift().to_numpy()
        late = same & (ts.to_numpy() < pmax)
        agg = pd.DataFrame({"user_id": g["user_id"], "late": late}).groupby(
            "user_id", as_index=False
        ).agg(n_events=("late", "size"), n_late=("late", "sum"))
        agg["n_late"] = agg["n_late"].astype("int64")
        return agg

    return hash_groupby(ds, "user_id", per_bucket)


UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def unpivot_lineitem(sf_dir: str):
    """(l_orderkey, l_linenumber, measure, value_cents) — melt the
    lineitem measure columns into long format (the UNPIVOT archetype,
    inverse of ``pivot_events``). Pure map stage — no shuffle; output is
    4× the input rows; cents quantization keeps the gate integer."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber"] + UNPIVOT_MEASURES)

    def melt(t: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for m in UNPIVOT_MEASURES:
            frames.append(pd.DataFrame({
                "l_orderkey": t["l_orderkey"].to_numpy(np.int64),
                "l_linenumber": t["l_linenumber"].to_numpy(np.int64),
                "measure": m,
                "value_cents": np.floor(
                    np.abs(t[m].to_numpy(np.float64)) * 100.0 + 0.5
                ).astype(np.int64) * np.sign(t[m].to_numpy(np.float64)).astype(np.int64),
            }))
        return pd.concat(frames, ignore_index=True)

    return ds.map_batches(melt, batch_format="pandas")


def orders_above_customer_avg(sf_dir: str):
    """(o_orderkey, o_custkey, o_totalprice) — orders strictly above their
    OWN customer's average order value: the correlated-subquery archetype
    (`WHERE price > (SELECT avg(...) ... same customer)`), decorrelated
    into one custkey-bucketed exchange. The boundary comparison runs in
    exact integer units (price_cents * n > sum_cents), so no float-epsilon
    row can flip between this and the SQL oracle."""
    from .agg import empty_safe, hash_groupby
    from ..sources.tables import read_table

    ds = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        cents = to_units(g["o_totalprice"], 100)
        grp = g.groupby("o_custkey")
        n = grp["o_orderkey"].transform("size").to_numpy(np.int64)
        g = g.assign(_c=cents)
        tot = g.groupby("o_custkey")["_c"].transform("sum").to_numpy(np.int64)
        keep = cents * n > tot
        out = g.loc[keep, ["o_orderkey", "o_custkey", "o_totalprice"]]
        return empty_safe(out)

    return hash_groupby(ds, "o_custkey", per_cust)


def cube_revenue(sf_dir: str):
    """(r_name, o_orderpriority, revenue) — revenue with full CUBE
    subtotals over (region, priority): every grouping-set combination,
    absent dimensions as 'ALL'. Same shape as rollup_revenue: ONE
    distributed partial-agg pass over the fact stream; all four grouping
    sets derive from the dimension-sized base aggregate (|regions| ×
    |priorities|) in exact int units, rounded once at the end."""
    from ray.data.aggregate import Sum

    joined = _orders_by_region(sf_dir, extra_cols=["o_orderpriority"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        t = t.assign(rev_u=to_units(t["o_totalprice"], 100))
        return t.groupby(["r_name", "o_orderpriority"], as_index=False).agg(
            revenue=("rev_u", "sum")
        )

    base = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["r_name", "o_orderpriority"])
        .aggregate(Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    by_r = base.groupby("r_name", as_index=False).agg(revenue=("revenue", "sum"))
    by_r["o_orderpriority"] = "ALL"
    by_p = base.groupby("o_orderpriority", as_index=False).agg(
        revenue=("revenue", "sum")
    )
    by_p["r_name"] = "ALL"
    total = pd.DataFrame({"r_name": ["ALL"], "o_orderpriority": ["ALL"],
                          "revenue": [base["revenue"].sum()]})
    out = pd.concat([base, by_r, by_p, total], ignore_index=True)
    out["revenue"] = round_half_away(out["revenue"] / 100.0, 2)
    return out[["r_name", "o_orderpriority", "revenue"]]


def mode_event_per_user(sf_dir: str):
    """(user_id, mode_event, n) — each user's most frequent event type,
    ties broken by lexicographically smallest type (deterministic — mode
    MUST have a total order on ties or two runs diverge). Partial counts
    per batch collapse the stream to (user, type) pairs before the
    shuffle; the per-bucket pick is a vectorized sort + drop_duplicates."""
    from .agg import hash_agg, hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        return t.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("event_type", "size")
        )

    counts = hash_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id", "event_type"],
        n=("n", "sum"),
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], ignore_index=True)
        out = g.drop_duplicates("user_id")[["user_id", "event_type", "n"]]
        return out.rename(columns={"event_type": "mode_event"}).astype(
            {"user_id": "int64", "n": "int64"})

    return hash_groupby(counts, "user_id", pick)


PRICE_QUANTILES = [(1, 4), (1, 2), (9, 10)]  # p25 / p50 / p90 as fractions


def price_quantiles_by_priority(sf_dir: str,
                                quantiles: list[tuple[int, int]] = PRICE_QUANTILES):
    """(o_orderpriority, p25, p50, p90) — exact discrete quantiles per
    group, generalizing :func:`median_price_by_priority` to a quantile
    VECTOR in one pass: the same counting method (per-batch (group, value)
    partial counts → value histogram, dimension-sized at any row count),
    then each quantile q=num/den picks the smallest value with
    cume_count·den ≥ num·total — all-integer, exactly DuckDB's
    ``quantile_disc``. One histogram shuffle serves every quantile."""
    from .agg import hash_agg, hash_groupby

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        return t.groupby(["o_orderpriority", "o_totalprice"], as_index=False).agg(
            n=("o_totalprice", "size")
        )

    hist = hash_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority", "o_totalprice"],
        n=("n", "sum"),
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderpriority", "o_totalprice"], ignore_index=True)
        out = []
        for prio, grp in g.groupby("o_orderpriority", sort=False):
            cum = grp["n"].cumsum().to_numpy()
            total = cum[-1]
            vals = grp["o_totalprice"].to_numpy()
            row = [prio]
            for num, den in quantiles:
                idx = int(np.searchsorted(cum * den, num * total, side="left"))
                row.append(vals[idx])
            out.append(row)
        return pd.DataFrame(out, columns=["o_orderpriority", "p25", "p50", "p90"])

    return hash_groupby(hist, "o_orderpriority", pick)


FUNNEL_STAGES = ["view", "click", "purchase"]


def funnel_stages(sf_dir: str, stages: list[str] = FUNNEL_STAGES):
    """(user_id, funnel_stage) — ordered-sequence funnel: per user, how far
    through view → click → purchase they progressed, where each stage must
    occur at-or-after the PREVIOUS stage's earliest completion time (the
    classic product-analytics funnel; ties count — `>=`). Stage k's
    completion time is the min ts of stage-k events ≥ stage-(k-1)'s time.

    Shape: one user-bucketed exchange; inside a bucket each stage is a
    groupby-min + merge + filter — vectorized, no per-user loop. Users
    with no stage-1 event drop."""
    from .agg import empty_safe, hash_groupby
    from ..sources.tables import read_table

    ds = read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )
    relevant = ds.map_batches(
        lambda t, st=tuple(stages): t[t["event_type"].isin(st)],
        batch_format="pandas",
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cur = (
            g[g["event_type"] == stages[0]]
            .groupby("user_id", as_index=False)
            .agg(prev_ts=("ts", "min"))
        )
        if cur.empty:
            return empty_safe(pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "funnel_stage": pd.Series(dtype="int64")}))
        stage = np.ones(len(cur), dtype=np.int64)
        reached = cur[["user_id"]].assign(funnel_stage=stage)
        for k, ev in enumerate(stages[1:], start=2):
            nxt = g[g["event_type"] == ev].merge(cur, on="user_id")
            nxt = nxt[nxt["ts"] >= nxt["prev_ts"]]
            if nxt.empty:
                break
            cur = nxt.groupby("user_id", as_index=False).agg(prev_ts=("ts", "min"))
            reached.loc[
                reached["user_id"].isin(cur["user_id"]), "funnel_stage"
            ] = k
        return empty_safe(reached.astype({"user_id": "int64",
                                          "funnel_stage": "int64"}))

    return hash_groupby(relevant, "user_id", per_bucket)


def gap_fill_hourly(sf_dir: str):
    """(user_id, hour_epoch, n_events) — per-user hourly activity series
    with ZERO-filled gaps between each user's first and last active hour
    (the resample/interpolate archetype a feature pipeline runs before
    windowed models). Per-batch (user, hour) partial counts collapse the
    event stream before the shuffle; the fill is a grouped-arange —
    np.repeat of per-user spans, no per-user Python loop — so a user
    spanning the whole calendar costs rows, not driver time."""
    from .agg import hash_agg, hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        hour = (t["ts"].astype("datetime64[us]").astype("int64")
                // 3_600_000_000) * 3600
        return pd.DataFrame({"user_id": t["user_id"], "hour_epoch": hour}) \
            .groupby(["user_id", "hour_epoch"], as_index=False).agg(
                n=("hour_epoch", "size"))

    counts = hash_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id", "hour_epoch"],
        n=("n", "sum"),
    )

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "hour_epoch"], ignore_index=True)
        spans = g.groupby("user_id", as_index=False).agg(
            mn=("hour_epoch", "min"), mx=("hour_epoch", "max"))
        nh = ((spans["mx"] - spans["mn"]) // 3600 + 1).to_numpy(np.int64)
        total = int(nh.sum())
        # grouped arange: hour[i] = mn(user) + (i - span_start(user)) * 3600
        starts = np.concatenate([[0], np.cumsum(nh)[:-1]])
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts, nh)
        full = pd.DataFrame(
            {"user_id": np.repeat(spans["user_id"].to_numpy(np.int64), nh),
             "hour_epoch": np.repeat(spans["mn"].to_numpy(np.int64), nh)
             + idx * 3600})
        out = full.merge(g, on=["user_id", "hour_epoch"], how="left")
        out["n_events"] = out["n"].fillna(0).astype("int64")
        return out[["user_id", "hour_epoch", "n_events"]]

    return hash_groupby(counts, "user_id", fill)


def skyline_orders(sf_dir: str):
    """(o_orderkey, o_orderdate, o_totalprice) — the Pareto frontier of
    orders maximizing price while minimizing date: kept iff no other order
    is at least as expensive AND at least as early with one strict. The
    2-D skyline collapses to a prefix-max over dates: kept iff
    price == max(price | same date) AND price > max(price | earlier date).
    Per-date max partials shuffle (date-scale, never row-scale), the
    prefix-max table broadcasts once, and the corpus filter streams —
    no candidate set ever collects."""
    import ray

    from .joins import get_broadcast

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_totalprice"])

    def per_date_max(t: pd.DataFrame) -> pd.DataFrame:
        d = (t["o_orderdate"].astype("datetime64[us]").astype("int64"))
        return pd.DataFrame({"d": d, "p": t["o_totalprice"]}) \
            .groupby("d", as_index=False).agg(mx=("p", "max"))

    dm = (ds.map_batches(per_date_max, batch_format="pandas")
          .to_pandas().groupby("d", as_index=False).max()
          .sort_values("d", ignore_index=True))
    dates = dm["d"].to_numpy(np.int64)
    mx = dm["mx"].to_numpy(np.float64)
    run = np.maximum.accumulate(mx)                       # max over <= date
    prev = np.concatenate([[-np.inf], run[:-1]])          # max over < date
    ref = ray.put((dates, mx, prev))

    def keep(t: pd.DataFrame) -> pd.DataFrame:
        ds_, mx_, prev_ = get_broadcast(ref)
        d = t["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
        p = t["o_totalprice"].to_numpy(np.float64)
        i = np.searchsorted(ds_, d)
        return t[(p == mx_[i]) & (p > prev_[i])]

    return ds.map_batches(keep, batch_format="pandas")


def first_last_event(sf_dir: str):
    """(user_id, first_event, last_event) — each user's first and last
    event type under the total order (ts, event_id). The distributive
    argmin/argmax merge: every batch keeps only its local first/last row
    per user (2 rows enter the shuffle per user per batch), the bucket
    stage re-minimizes — associative, so any batch split gives the same
    answer."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def extremes(t: pd.DataFrame) -> pd.DataFrame:
        t = t.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        return pd.concat(
            [t.drop_duplicates("user_id", keep="first"),
             t.drop_duplicates("user_id", keep="last")],
            ignore_index=True,
        )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        first = g.drop_duplicates("user_id", keep="first")
        last = g.drop_duplicates("user_id", keep="last")
        return pd.DataFrame(
            {"user_id": first["user_id"].to_numpy(np.int64),
             "first_event": first["event_type"].to_numpy(),
             "last_event": last["event_type"].to_numpy()})

    return hash_groupby(
        ds.map_batches(extremes, batch_format="pandas"), "user_id", pick)


# ---------------------------------------------------------------------------
# two-pass global statistic (equi-width histogram)
# ---------------------------------------------------------------------------

HIST_BINS = 20


def histogram_prices(sf_dir: str, nbins: int = HIST_BINS):
    """(bucket, n) — equi-width histogram of order price: the two-pass
    global-statistic archetype (pass 1 computes a whole-dataset extremum,
    pass 2 re-streams the data against it). The reference computes
    whole-graph statistics the same way (a full pass feeding a keyed
    pass, e.g. `Linker.scala` name maps built before the link scan).

    Scale shape: pass 1 collapses each batch to ONE (min, max) row — the
    driver sees block-count rows, never data; pass 2 is a stateless
    vectorized bucket map + partial counts into a ``nbins``-row aggregate.
    Bucket arithmetic is the identical IEEE double expression tree on both
    sides (``(v - mn) * nbins / (mx - mn)``, floored, max folded into the
    last bucket), so the oracle can never disagree on a boundary value."""
    from .agg import hash_agg

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def mm_partial(t: pd.DataFrame) -> pd.DataFrame:
        from .agg import empty_safe

        if len(t) == 0:
            return empty_safe(pd.DataFrame({"mn": [], "mx": []}, dtype=np.float64))
        v = t["o_totalprice"].to_numpy(np.float64)
        return pd.DataFrame({"mn": [v.min()], "mx": [v.max()]})

    mm = ds.map_batches(mm_partial, batch_format="pandas").to_pandas()
    mn = float(mm["mn"].min())
    mx = float(mm["mx"].max())
    nb = float(nbins)

    def bucketize(t: pd.DataFrame) -> pd.DataFrame:
        from .agg import empty_safe

        v = t["o_totalprice"].to_numpy(np.float64)
        b = np.floor((v - mn) * nb / (mx - mn)).astype(np.int64)
        b = np.minimum(b, nbins - 1)
        g = (
            pd.DataFrame({"bucket": b})
            .groupby("bucket", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return empty_safe(g)

    return hash_agg(
        ds.map_batches(bucketize, batch_format="pandas"), "bucket", n=("n", "sum")
    )


# ---------------------------------------------------------------------------
# NTILE window (equal-frequency bucketing)
# ---------------------------------------------------------------------------

NTILE_N = 4


def ntile_orders(sf_dir: str, n: int = NTILE_N):
    """(o_orderkey, tile) — NTILE(4) of order price within its priority
    class under the deterministic total order (o_totalprice, o_orderkey):
    the equal-frequency bucketing window. SQL NTILE gives the first
    ``cnt % n`` tiles one extra row; the vectorized closed form below
    reproduces that exactly from the in-class row number.

    Same scale shape as the other window operators: ONE bucketed shuffle
    keyed by the partition key, vectorized rank arithmetic per bucket."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_orderpriority", "o_totalprice", "o_orderkey"], ignore_index=True
        )
        rn = g.groupby("o_orderpriority").cumcount().to_numpy() + 1
        cnt = g.groupby("o_orderpriority")["o_orderkey"].transform("size").to_numpy()
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(np.int64),
             "tile": ntile_assign(rn, cnt, n)}
        )

    return hash_groupby(ds, "o_orderpriority", per_bucket)


def ntile_assign(rn: np.ndarray, cnt: np.ndarray, n: int) -> np.ndarray:
    """SQL NTILE(n) closed form from the 1-based in-partition row number
    ``rn`` and partition size ``cnt``: the first ``cnt % n`` tiles hold
    ``cnt // n + 1`` rows, the rest ``cnt // n`` (fuzz-tested against the
    repeat-sizes spec, incl. cnt < n where the tail branch is unused)."""
    base = cnt // n
    rem = cnt % n
    cut = rem * (base + 1)  # rows in the (base+1)-sized head tiles
    head = (rn - 1) // np.maximum(base + 1, 1) + 1
    tail = rem + (rn - 1 - cut) // np.maximum(base, 1) + 1
    return np.where(rn <= cut, head, tail).astype(np.int64)


# ---------------------------------------------------------------------------
# grouped bivariate statistic (Pearson correlation from mergeable moments)
# ---------------------------------------------------------------------------

def corr_qty_price(sf_dir: str):
    """(l_returnflag, corr_qp) — Pearson correlation of quantity vs
    extended price per return flag, from the five mergeable moment sums
    (n, Σx, Σy, Σxy, Σx², Σy²): the distributed bivariate-statistic
    archetype. Each batch contributes ONE partial row per group; the
    moments are exact int64 over tie-free integerizations (quantity is
    integral; price FLOORS to whole dollars on both sides — floor never
    ties, unlike round, and dollar units keep Σy² < 2^63 past sf100), so
    task order can never move the sums, and the final float formula is
    the identical IEEE expression tree as the oracle's explicit-sum corr
    (DuckDB's built-in corr() uses a different one-pass algorithm — the
    oracle spells the moment formula instead)."""
    from .agg import empty_safe, hash_groupby

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(t: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(t["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        y = np.floor(t["l_extendedprice"].to_numpy(np.float64)).astype(np.int64)
        g = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_numpy(),
                "n": np.ones(len(t), np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
                "syy": y * y,
            }
        ).groupby("l_returnflag", as_index=False).sum()
        return empty_safe(g)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("l_returnflag", as_index=False).sum()
        n = g["n"].to_numpy(np.float64)
        sx = g["sx"].to_numpy(np.float64)
        sy = g["sy"].to_numpy(np.float64)
        sxy = g["sxy"].to_numpy(np.float64)
        sxx = g["sxx"].to_numpy(np.float64)
        syy = g["syy"].to_numpy(np.float64)
        corr = (n * sxy - sx * sy) / (
            np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        )
        return pd.DataFrame({"l_returnflag": g["l_returnflag"], "corr_qp": corr})

    return hash_groupby(
        ds.map_batches(moments, batch_format="pandas"), "l_returnflag", finish
    )


# ---------------------------------------------------------------------------
# relational division (the "for all" join)
# ---------------------------------------------------------------------------


def users_all_event_types(sf_dir: str):
    """(user_id, n_types) — users who performed EVERY distinct event type:
    relational division, the classic "for all" archetype (the inverse of
    the anti-join family above — set-containment instead of
    set-disjointness).

    Scale shape: per-batch (user, type) dedup partials collapse the
    stream before ONE user-keyed exchange; the divisor (the distinct type
    set) is dimension-sized and reduces to a single broadcast count —
    division never shuffles the divisor. The in-bucket re-dedup makes the
    per-user distinct count exact regardless of how batches split."""
    from .agg import empty_safe, hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    pairs = ds.map_batches(
        lambda t: empty_safe(t.drop_duplicates(["user_id", "event_type"])),
        batch_format="pandas",
    )
    types = ds.map_batches(
        lambda t: empty_safe(t[["event_type"]].drop_duplicates()),
        batch_format="pandas",
    ).to_pandas()
    n_all = int(types["event_type"].nunique())

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        c = g.groupby("user_id", as_index=False).size().rename(
            columns={"size": "n_types"}
        )
        c = c[c["n_types"] == n_all]
        return pd.DataFrame(
            {"user_id": c["user_id"].to_numpy(np.int64),
             "n_types": c["n_types"].to_numpy(np.int64)}
        )

    return hash_groupby(pairs, "user_id", per_bucket)


# ---------------------------------------------------------------------------
# deterministic weighted sampling (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

WSAMPLE_K = 25


def sample_orders_weighted(sf_dir: str, k: int = WSAMPLE_K):
    """(o_orderkey, o_totalprice, skey) — weight-proportional sample of k
    orders via the Efraimidis–Spirakis key in its log form ``ln(u)/w``
    (a monotone transform of ``u^(1/w)``, so top-k by it IS the A-ES
    sample), with the log quantized ONCE to fixed point before the
    divide (the unigram_logprob/char_entropy discipline): np.log's SIMD
    kernel and DuckDB's libm ``ln`` differ in the last ulp on some
    inputs, and ``pow`` is worse — ``round(ln(u)·10^6)`` absorbs the ulp,
    and dividing the identical integer-valued double by ``w`` is then
    bit-exact on both sides. The one-pass distributed weighted sampler a
    training-data pipeline uses to oversample high-quality documents.
    ``u`` is the multiplicative key hash mapped into (0,1] — a pure
    function of the key (the sample_orders_hash discipline), so any
    parallelism and the SQL oracle pick the IDENTICAL sample. Scale
    shape: per-batch local top-k partials, then
    a k-row global sort — never a full sort, nothing driver-side.
    (o_orderkey·MULT stays under 2^63 for keys < 3.5e9 — beyond that,
    hash the key into 32 bits first.)"""
    from .agg import empty_safe, round_half_away

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def keyed_topk(t: pd.DataFrame) -> pd.DataFrame:
        okey = t["o_orderkey"].to_numpy(np.int64)
        w = t["o_totalprice"].to_numpy(np.float64)
        h = (okey * SAMPLE_MULT) % SAMPLE_MOD
        u = (h.astype(np.float64) + 1.0) / float(SAMPLE_MOD + 1)
        lu = round_half_away(np.log(u) * 1e6, 0)
        skey = lu / w
        out = pd.DataFrame(
            {"o_orderkey": okey, "o_totalprice": w, "skey": skey}
        ).sort_values(["skey", "o_orderkey"], ascending=[False, True]).head(k)
        return empty_safe(out)

    return (
        ds.map_batches(keyed_topk, batch_format="pandas")
        .sort(["skey", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def distinct_until_changed(sf_dir: str):
    """(user_id, event_id, event_type) — drop CONSECUTIVE repeats of the
    same event type per user under the total order (ts, event_id): the
    stream-compaction archetype (distinct-until-changed), the batch
    re-expression of a streaming dedup stage. Same scale shape as the
    other ordered-window operators: ONE user-keyed exchange, vectorized
    in-bucket sort + shift compare — order stays data, never block
    order."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def compact(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        prev_user = g["user_id"].shift()
        prev_type = g["event_type"].shift()
        keep = (g["user_id"] != prev_user) | (g["event_type"] != prev_type)
        k = g[keep]
        return pd.DataFrame(
            {"user_id": k["user_id"].to_numpy(np.int64),
             "event_id": k["event_id"].to_numpy(np.int64),
             "event_type": k["event_type"].to_numpy()}
        )

    return hash_groupby(ds, "user_id", compact)


IC_WINDOW_US = 30 * 60 * 1_000_000  # each event covers [ts, ts+30min)


def interval_coverage(sf_dir: str):
    """(user_id, covered_us, n_islands) — union length of each user's
    activity intervals (event ± the 30-minute session window): the
    gaps-and-islands archetype (merge overlapping intervals, report
    covered time and island count). The batch re-expression of interval
    union — the other classic windowed shape next to sessionize /
    session_overlap. All-integer epoch-µs arithmetic.

    ONE user-keyed exchange; in-bucket vectorized sort + grouped cummax
    island detection (an island breaks where a start exceeds the running
    max end of everything before it) — no per-user Python loop."""
    from .agg import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        s = g["ts"].astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                          "s": s.to_numpy(), "e": s.to_numpy() + IC_WINDOW_US})
        g = g.sort_values(["user_id", "s", "e"], ignore_index=True)
        cm = g.groupby("user_id")["e"].cummax()
        prev = cm.groupby(g["user_id"]).shift()
        new = prev.isna() | (g["s"] > prev)
        island = new.groupby(g["user_id"]).cumsum()
        g["island"] = island.to_numpy(np.int64)
        iv = g.groupby(["user_id", "island"], as_index=False).agg(
            lo=("s", "min"), hi=("e", "max")
        )
        out = iv.assign(len=iv["hi"] - iv["lo"]).groupby(
            "user_id", as_index=False
        ).agg(covered_us=("len", "sum"), n_islands=("len", "size"))
        out["covered_us"] = out["covered_us"].astype("int64")
        out["n_islands"] = out["n_islands"].astype("int64")
        return out

    return hash_groupby(ds, "user_id", islands)
