"""Deterministic content-hash node ids.

The reference pre-assigns id *ranges* per stage/part with ``KeyPool``
(`codepropertygraph/.../passes/KeyPool.scala:23-99`, split per part in
`CfgCreationPass.scala:28-29`) so that ids are stable across runs — and its
`StableOutputTests.scala:8-29` makes that determinism an explicit spec.

On Ray, partition assignment is not stable, so interval pools cannot give
run-stable ids. We instead derive every node id from its *content key*
(``label + canonical key``) with a keyed SipHash — order-free, partition-free,
identical at any parallelism level. Vectorized via
``pandas.util.hash_pandas_object`` (C-level SipHash-1-3 with a fixed key),
so id assignment never loops over Python rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Fixed 16-byte SipHash key — part of the format, never change.
_HASH_KEY = "cpg-ray-kg-v1-00"
_SEP = "\x1f"
_POS_MASK = np.uint64(0x7FFF_FFFF_FFFF_FFFF)


def _maybe_hostile(s: pd.Series) -> bool:
    """Fast may-contain-hostile-bytes probe: scan the utf-8 DATA BUFFER of
    the arrow conversion for the three escape-relevant bytes (one memchr
    sweep, ~2× cheaper than the per-row regex scan and the cost is all in
    the arrow conversion). False POSITIVES are safe — they only route to
    the exact per-row path; a ``True`` from slice-overhang bytes costs one
    regex scan, never a wrong hash."""
    import pyarrow as pa

    try:
        arr = pa.Array.from_pandas(s)
        data = arr.buffers()[2]
        if data is None:
            return False
        bb = data.to_pybytes()
        return b"\x00" in bb or b"\x1e" in bb or b"\x1f" in bb
    except Exception:
        return True  # unknown layout → take the exact path


def _escape_ctl(s: pd.Series) -> pd.Series:
    """Collision-free escaping of the two hash-hostile characters.

    pandas' ``hash_pandas_object`` hashes strings as NUL-TERMINATED C
    strings — ``""``, ``"\\x00"`` and ``"\\x00\\x00"`` all hash equal — and a
    key containing ``_SEP`` would make multi-part joins ambiguous
    (``("a\\x1f", "b")`` vs ``("a", "\\x1fb")``). Escape ``\\x1e`` (the escape
    char) → ``\\x1e1``, NUL → ``\\x1e0``, ``_SEP`` → ``\\x1e2``: injective, so
    distinct part tuples stay distinct. One buffer-level byte probe on the
    hot path; the per-row scan + replaces run only on hostile batches."""
    if not _maybe_hostile(s):
        return s
    mask = s.str.contains("[\x00\x1e\x1f]", regex=True)
    if not mask.any():
        return s
    sub = (
        s[mask]
        .str.replace("\x1e", "\x1e1", regex=False)
        .str.replace("\x00", "\x1e0", regex=False)
        .str.replace("\x1f", "\x1e2", regex=False)
    )
    out = s.copy()
    out[mask] = sub
    return out


def _hash_joined(joined: pd.Series) -> np.ndarray:
    """Hash an ALREADY-ESCAPED joined string series → positive int64."""
    h = pd.util.hash_pandas_object(joined, index=False, hash_key=_HASH_KEY)
    return (h.to_numpy(dtype=np.uint64) & _POS_MASK).view(np.int64)


def _clean(p) -> pd.Series:
    s = p if isinstance(p, pd.Series) else pd.Series(p, dtype="object")
    # positional semantics — drop any incoming index to avoid alignment
    return s.reset_index(drop=True).astype("string").fillna("")


def hash_series(parts: list[pd.Series | np.ndarray | list]) -> np.ndarray:
    """Hash the element-wise concatenation of string parts → positive int64.

    All parts must be string-like and the same length (scalars broadcast via
    pandas). Collisions: 2^-63 per pair — negligible at 10^12 rows relative
    to other failure modes, and identical keys *must* collide (that is the
    dedup semantics, cf. NodeFilter.scala:12-27). Each part is escaped
    exactly once (``_escape_ctl``) so NUL truncation and separator
    injection cannot alias distinct part tuples.
    """
    joined = None
    for p in parts:
        s = _escape_ctl(_clean(p))
        joined = s if joined is None else joined + _SEP + s
    return _hash_joined(joined)


def node_ids(label: str, keys: pd.Series | np.ndarray | list) -> np.ndarray:
    """id = siphash(label ␟ key) — one id per canonical (label, key) pair.

    Duplicate-aware: graph-emission batches hash the same key many times
    (every mention row re-derives its conversation/entity id), so the
    column is factorized first (C-level) and only the UNIQUE keys go
    through the string-hash path — a ~duplication-factor speedup on the
    materialize hot path with bit-identical output."""
    # escape BEFORE factorize: pandas' string hash table also truncates at
    # NUL, so un-escaped '' and '\\x00' would factorize to ONE code
    s = _escape_ctl(_clean(keys))
    lab = str(_escape_ctl(pd.Series([label], dtype="string")).iloc[0]) + _SEP
    codes, uniques = pd.factorize(s, sort=False)
    if len(uniques) >= len(s):  # no duplication — skip the indirection
        return _hash_joined(lab + s)
    uh = _hash_joined(lab + pd.Series(uniques, dtype="string"))
    return uh[codes]


def node_id_scalar(label: str, key: str) -> int:
    return int(node_ids(label, [key])[0])


_SALT_CACHE: dict[str, np.int64] = {}


def composite_ids(label: str, str_key, *int_parts) -> np.ndarray:
    """id for nodes keyed by (one string, ints...) — e.g. TURN =
    (conv_id, turn_idx), MENTION = (conv_id, turn_idx, ordinal).

    The general ``node_ids(label, key)`` path would stringify the ints and
    build a joined key per row (measured: the dominant cost of the graph-
    emission maps — ~16M per-row string builds per sf0.4 materialize).
    Here the ONE string column hashes at C level and the ints fold in via
    the splitmix combiner — no per-row string building. Same properties:
    content-derived, order/partition-free, label-disambiguated (per-label
    salt)."""
    salt = _SALT_CACHE.get(label)
    if salt is None:
        salt = _SALT_CACHE.setdefault(label, np.int64(node_id_scalar("\x00label", label)))
    s = _escape_ctl(_clean(str_key))  # pre-escaped: factorize is NUL-safe
    # factorize: hash each DISTINCT string once (turn batches repeat each
    # conv_id ~n_turns times), then fan back out by code
    codes, uniques = pd.factorize(s, sort=False)
    base = _hash_joined(pd.Series(uniques, dtype="string"))[codes]
    ints = [np.asarray(p).astype(np.int64, copy=False) for p in int_parts]
    return mix_ids(base, *ints, salt)


def mix_ids(*parts) -> np.ndarray:
    """Combine integer arrays into one 64-bit hash — the numeric fast path
    (no string building) used for bucket assignment over int keys.
    splitmix64 finalizer per part; deterministic, order-sensitive."""
    h = None
    for p in parts:
        x = np.asarray(p)
        if x.dtype.kind not in "iu":
            raise TypeError(f"mix_ids needs integer arrays, got {x.dtype}")
        x = x.astype(np.uint64)
        h = x if h is None else h ^ x
        # splitmix64 finalizer
        h = h + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    return (h & _POS_MASK).view(np.int64)
