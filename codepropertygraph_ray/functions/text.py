"""Text analysis operators over the documents table.

The training-data-pipeline operator family (language-ID, quality scoring,
token counting, document fingerprinting). Each runs as a vectorized
``map_batches`` stage; the ones with deterministic hashing use the
SQL-expressible polynomial codepoint hash below (poly_hash), so outputs
are stable across runs and parallelism levels (the StableOutputTests
discipline) AND bit-exactly reproducible by the DuckDB oracles.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd



STOPWORDS = {
    "the", "and", "of", "a", "to", "in", "is", "it", "for", "on", "with",
}

# per-language stopword gazetteers for the n-gram/stopword lang-id heuristic
LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "for", "with", "that", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "auf"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "avec", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "para", "con", "una", "del"},
}

_WORD_RE = re.compile(r"[a-z]+")
_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[.,;:!?]")
# BPE-ish pre-tokenizer (GPT-2-style splits without the byte merges):
# runs of letters / digits / non-space-non-alnum, each optionally preceded
# by one space — approximates subword token counts for budget estimation.
# Portable across Python re and DuckDB RE2 (no lookarounds).
_BPE_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+")
BPE_SQL_RE = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
_CJK_RE = re.compile(r"[一-鿿]")


def _read_docs(sf_dir: str, columns=None):
    from ..sources.tables import read_table

    return read_table(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# SQL-expressible string hashing (VERDICT r4 item 4)
# ---------------------------------------------------------------------------
# Rabin–Karp polynomial hash over unicode CODEPOINTS, h ← (h·B + c) mod P.
# With P < 2^55 every step fits int64 exactly ((P−1)·131 + 0x10FFFF < 2^63),
# so numpy int64 and DuckDB BIGINT compute IDENTICAL values — the
# dataset_split multiplicative-hash precedent extended to strings, which is
# what lets simhash / fingerprint / minhash / CMS / HLL gain bit-exact
# DuckDB oracles (they previously used the non-SQL-expressible keyed
# SipHash and were rows-only checks). SQL mirror (see poly_hash_sql):
#   list_reduce(list_prepend(CAST(0 AS BIGINT),
#     list_transform(string_split(s, ''), c -> CAST(unicode(c) AS BIGINT))),
#     (h, c) -> (h * B + c) % P)

POLY_B = 131
POLY_B2 = 137  # independent second hash (simhash needs 64 mixed bits)
POLY_P55 = 36028797018963913  # largest prime < 2^55
POLY_P31 = (1 << 31) - 1  # Mersenne prime — minhash/CMS/HLL 31-bit field


def poly_hash(strings: pd.Series, base: int = POLY_B, mod: int = POLY_P55) -> np.ndarray:
    """Vectorized polynomial codepoint hash — exact int64, no Python loop
    over strings: ONE utf-32 decode of the concatenated batch, then one
    vectorized pass per char position (token/shingle max length, small)."""
    arr = strings.fillna("").to_numpy(object)
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int64)
    lens = np.fromiter((len(s) for s in arr), np.int64, n)
    buf = np.frombuffer("".join(arr).encode("utf-32-le"), np.uint32).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
    h = np.zeros(n, np.int64)
    for j in range(int(lens.max()) if n else 0):
        m = j < lens
        h[m] = (h[m] * base + buf[offs[m] + j]) % mod
    return h


def poly_hash_sql(expr: str, base: int = POLY_B, mod: int = POLY_P55) -> str:
    """The DuckDB expression computing poly_hash(expr) — same arithmetic.
    NULL/'' → 0 like the Python side (string_split('', '') yields ['']
    whose unicode() is -1, so empties need the explicit branch)."""
    return (
        f"(CASE WHEN {expr} IS NULL OR {expr} = '' THEN 0 ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), "
        f"c -> CAST(unicode(c) AS BIGINT))), "
        f"(h, c) -> (h * {base} + c) % {mod}) END)"
    )


def token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_distinct, n_chars) — whitespace tokenization."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def stats(t: pd.DataFrame) -> pd.DataFrame:
        toks = t["text"].str.findall(_TOKEN_RE)
        return pd.DataFrame(
            {
                "doc_id": t["doc_id"],
                "n_tokens": toks.str.len().astype("int64"),
                "n_distinct": toks.map(lambda x: len(set(x))).astype("int64"),
                "n_chars": t["text"].str.len().astype("int64"),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


def bpe_token_count(sf_dir: str):
    """(doc_id, n_bpe_tokens) — BPE-ish token counting: the GPT-2-style
    pre-tokenizer split (letter / digit / punctuation runs with optional
    leading space) without the learned byte merges — the standard cheap
    token-budget estimator for a training-data pipeline. One compiled
    regex per process, vectorized findall per batch."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def count(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": t["doc_id"],
             "n_bpe_tokens": t["text"].str.findall(_BPE_RE).str.len().astype("int64")}
        )

    return ds.map_batches(count, batch_format="pandas")


def quality_signals(sf_dir: str):
    """(doc_id, n_words, n_stopwords, longest_word, n_punct) — integer
    quality signals (ratios are consumer-side divisions; integers hash
    stably against the SQL oracle)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def signals(t: pd.DataFrame) -> pd.DataFrame:
        words = t["text"].str.lower().str.findall(_WORD_RE)
        return pd.DataFrame(
            {
                "doc_id": t["doc_id"],
                "n_words": words.str.len().astype("int64"),
                "n_stopwords": words.map(
                    lambda ws: sum(w in STOPWORDS for w in ws)
                ).astype("int64"),
                "longest_word": words.map(
                    lambda ws: max((len(w) for w in ws), default=0)
                ).astype("int64"),
                "n_punct": t["text"].str.count(_PUNCT_RE).astype("int64"),
            }
        )

    return ds.map_batches(signals, batch_format="pandas")


def lang_id(sf_dir: str):
    """(doc_id, lang_pred) — stopword-gazetteer language ID with a CJK
    character fast path. Deterministic, so it carries a SQL oracle (the
    same gazetteer + tie-break in DuckDB); accuracy additionally asserted
    in tests against a synthetic multilingual fixture."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def classify(t: pd.DataFrame) -> pd.DataFrame:
        words = t["text"].str.lower().str.findall(_WORD_RE)

        def best(ws_and_text):
            ws, text = ws_and_text
            if _CJK_RE.search(text):
                return "zh"
            scores = {
                lang: sum(w in markers for w in ws)
                for lang, markers in LANG_MARKERS.items()
            }
            top = max(scores.items(), key=lambda kv: (kv[1], kv[0] == "en"))
            return top[0] if top[1] > 0 else "und"

        return pd.DataFrame(
            {
                "doc_id": t["doc_id"],
                "lang_pred": [best(x) for x in zip(words, t["text"])],
            }
        )

    return ds.map_batches(classify, batch_format="pandas")


def simhash64(sf_dir: str):
    """(doc_id, simhash) — 64-bit SimHash over whitespace tokens. Token
    bits come from TWO independent polynomial codepoint hashes (bases 131
    and 137, :func:`poly_hash` — the SQL-expressible mixer, VERDICT r4
    item 4: bit j<32 is h1's bit j, bit j≥32 is h2's bit j−32), so the
    DuckDB oracle reproduces the signature bit-exactly. Bit-majority vote
    weighted by token frequency (each occurrence votes once ≡ frequency
    weighting); bit 63 masked off to keep the signature a positive int64.

    Vectorized batch body: ONE explode of all tokens, ONE hash of the
    exploded column, one (T, 64) bit matrix, per-doc votes via
    ``np.add.reduceat`` over row segments — no per-document Python loop."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    shifts = np.arange(64, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).view(np.int64)

    def sh(t: pd.DataFrame) -> pd.DataFrame:
        toks = t["text"].str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        out = np.zeros(len(t), dtype=np.int64)
        nz = lens > 0
        if nz.any():
            flat = pd.Series(np.concatenate(toks[nz].to_numpy()), dtype="object")
            h1 = poly_hash(flat).astype(np.uint64)
            h2 = poly_hash(flat, base=POLY_B2).astype(np.uint64)
            hs = (h1 & np.uint64(0xFFFFFFFF)) | (
                (h2 & np.uint64(0xFFFFFFFF)) << np.uint64(32)
            )
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            starts = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            votes = np.add.reduceat(2 * bits - 1, starts, axis=0)
            sigs = ((votes > 0).astype(np.int64) * weights[None, :]).sum(axis=1)
            out[nz] = sigs & np.int64(0x7FFF_FFFF_FFFF_FFFF)
        return pd.DataFrame({"doc_id": t["doc_id"], "simhash": out})

    return ds.map_batches(sh, batch_format="pandas")


FP_KGRAM = 8
FP_WINDOW = 4


def _grouped_arange(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenation of ``arange(s, s+c)`` per (s, c) pair — no Python loop.
    Precondition: every count > 0 (call sites filter empties first)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = starts.astype(np.int64)
    counts = counts.astype(np.int64)
    inc = np.ones(total, dtype=np.int64)
    first = np.concatenate(([0], np.cumsum(counts)[:-1]))
    inc[first] = starts - np.concatenate(([0], starts[:-1] + counts[:-1] - 1))
    return np.cumsum(inc)


def fingerprint(sf_dir: str):
    """(doc_id, fingerprint, n_selected) — TRUE winnowing fingerprint
    (Schleimer et al., 'Winnowing: Local Algorithms for Document
    Fingerprinting'): the selected k-grams are the DISTINCT minima of every
    sliding window of ``FP_WINDOW`` consecutive byte-8-gram hashes, and the
    fingerprint column is an order-free xor-fold of that set — documents
    sharing long substrings share selected hashes. ``n_selected`` =
    |selected set| (density ≈ 2/(w+1) of positions per the paper).

    Fully batch-vectorized: ONE concatenated codepoint buffer per batch
    (utf-32 decode), k-gram hashes via 8 multiply-add-mod passes (the
    SQL-expressible :func:`poly_hash` arithmetic, mod the 55-bit prime —
    VERDICT r4 item 4; deterministic across runs/parallelism AND
    reproducible in the DuckDB oracle), global ``sliding_window_view``
    minima, per-doc segments carved with grouped aranges, distinct-minima
    + xor-fold via lexsort + ``reduceat``. Docs shorter than one window
    keep the old semantics (all k-grams selected; < ``FP_KGRAM``
    codepoints → one whole-text hash)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pandas")


def fingerprint_batch(t: pd.DataFrame) -> pd.DataFrame:
    """The vectorized per-batch body of :func:`fingerprint` (module-level so
    tests can exercise it without a Ray session)."""
    K, W = FP_KGRAM, FP_WINDOW
    B, P = POLY_B, POLY_P55
    texts = t["text"].fillna("")
    lens = np.fromiter((len(s) for s in texts), np.int64, len(texts))
    buf = np.frombuffer("".join(texts).encode("utf-32-le"), np.uint32).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))

    # k-gram hashes over the whole buffer (8 vectorized mod-P passes;
    # every step < 2^63, exact in int64 and in the oracle's BIGINT)
    n_pos = max(len(buf) - K + 1, 0)
    kh_all = np.zeros(n_pos, dtype=np.int64)
    for j in range(K):
        kh_all = (kh_all * B + buf[j : j + n_pos]) % P

    # carve each doc's valid k-gram run out of the global array
    g = np.maximum(lens - K + 1, 0)  # k-grams per doc (0 if too short)
    has = g > 0
    idx = _grouped_arange(offs[:-1][has], g[has])
    kh = kh_all[idx]
    doc_of_kh = np.repeat(np.flatnonzero(has), g[has])
    kh_starts = np.concatenate(([0], np.cumsum(g[has])))[:-1]

    sel_docs, sel_hashes = [doc_of_kh[:0]], [kh[:0]]

    # docs with a full window: distinct minima of every sliding window
    counts = g[has]
    big = counts >= W
    if big.any() and len(kh) >= W:
        wins = np.lib.stride_tricks.sliding_window_view(kh, W).min(axis=1)
        w_counts = counts[big] - W + 1
        widx = _grouped_arange(kh_starts[big], w_counts)
        sel_docs.append(np.repeat(np.flatnonzero(has)[big], w_counts))
        sel_hashes.append(wins[widx])

    # short-window docs (0 < k-grams < W): every k-gram is selected
    small = ~big
    if small.any():
        sidx = _grouped_arange(kh_starts[small], counts[small])
        sel_docs.append(np.repeat(np.flatnonzero(has)[small], counts[small]))
        sel_hashes.append(kh[sidx])

    # sub-k-gram docs: one whole-text rolling hash (masked mod-P passes —
    # for L < K this equals poly_hash(text), which is what the SQL mirror
    # computes for the short-doc branch)
    if (~has).any():
        so, sl = offs[:-1][~has], lens[~has]
        sh = np.zeros(len(so), dtype=np.int64)
        for j in range(K):
            m = j < sl
            sh[m] = (sh[m] * B + buf[(so + j)[m]]) % P
        sel_docs.append(np.flatnonzero(~has))
        sel_hashes.append(sh)

    docw = np.concatenate(sel_docs)
    mins = np.concatenate(sel_hashes)
    order = np.lexsort((mins, docw))
    d_s, m_s = docw[order], mins[order]
    keep = np.ones(len(d_s), dtype=bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (m_s[1:] != m_s[:-1])
    d_u, m_u = d_s[keep], m_s[keep]
    seg = np.flatnonzero(np.concatenate(([True], d_u[1:] != d_u[:-1])))

    out = np.zeros(len(t), dtype=np.int64)
    nsel = np.zeros(len(t), dtype=np.int64)
    if len(d_u):
        # hashes < 2^55, so the xor-fold is already a positive int64
        fold = np.bitwise_xor.reduceat(m_u, seg)
        rows = d_u[seg]
        out[rows] = fold.astype(np.int64)
        nsel[rows] = np.diff(np.concatenate((seg, [len(d_u)])))
    return pd.DataFrame({"doc_id": t["doc_id"], "fingerprint": out, "n_selected": nsel})


# ---------------------------------------------------------------------------
# n-gram language statistics (global bigram counts)
# ---------------------------------------------------------------------------

BIGRAM_MIN_N = 5


def bigram_counts(sf_dir: str, min_n: int = BIGRAM_MIN_N):
    """(bigram, n) — corpus-wide word-bigram counts with count ≥ ``min_n``.

    The n-gram statistics stage of a training-data pipeline (vocabulary
    induction / contamination screens). Vectorized per batch: one explode
    of the token stream, consecutive-token concat via a shifted view (no
    per-document Python loop), per-batch value_counts partials, then one
    bucketed sum — the partial-aggregation discipline keeps shuffle volume
    at vocab scale. The ≥ ``min_n`` filter mirrors the oracle's HAVING."""
    from .agg import hash_agg

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        ex = t["text"].str.split(" ").explode()
        doc = ex.index.to_numpy()
        tok = ex.to_numpy(dtype=object)
        if len(tok) < 2:
            return pd.DataFrame({"bigram": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        same = doc[1:] == doc[:-1]
        big = pd.Series(tok[:-1][same]).str.cat(pd.Series(tok[1:][same]), sep=" ")
        vc = big.value_counts()
        return pd.DataFrame({"bigram": vc.index, "n": vc.to_numpy(np.int64)})

    out = hash_agg(
        ds.map_batches(partial, batch_format="pandas"), "bigram", n=("n", "sum")
    )
    return out.map_batches(
        lambda t, m=min_n: t[t["n"] >= m], batch_format="pandas"
    )


def top_term(sf_dir: str):
    """(doc_id, top_term, n) — each document's most frequent whitespace
    token, ties broken lexicographically (order-as-data, never luck).

    TF-IDF-style distinctive-term extraction reduced to its deterministic
    integer core. Documents are row-contained, so the whole computation is
    one stateless vectorized ``map_batches`` — explode, count, one sort,
    first-per-doc — with no shuffle at all."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def pick(t: pd.DataFrame) -> pd.DataFrame:
        ex = t[["doc_id"]].join(t["text"].str.split(" ").explode().rename("term"))
        g = ex.groupby(["doc_id", "term"], as_index=False).size()
        g = g.sort_values(
            ["doc_id", "size", "term"], ascending=[True, False, True],
            ignore_index=True,
        )
        first = g.drop_duplicates("doc_id", keep="first")
        return pd.DataFrame(
            {"doc_id": first["doc_id"].to_numpy(np.int64),
             "top_term": first["term"].to_numpy(),
             "n": first["size"].to_numpy(np.int64)}
        )

    return ds.map_batches(pick, batch_format="pandas")


# ---------------------------------------------------------------------------
# benchmark-contamination screen + deterministic dataset split
# ---------------------------------------------------------------------------

# probe phrases (benchmark n-grams to screen for) — embedded verbatim in
# the SQL oracle, so keep them single-quote-free
CONTAMINATION_PROBES = ["merge slow join", "the fast key", "vector join vector"]


def contamination(sf_dir: str, probes: list[str] | None = None):
    """(doc_id, contaminated) — docs containing ANY probe phrase as a
    substring: the decontamination screen of a training-data pipeline.
    The probe set is dimension-sized → a constant broadcast; the scan is
    a stateless vectorized ``str.contains`` OR-fold per batch (at a large
    probe set, swap in the Aho-Corasick automaton as per-process state —
    same stage shape)."""
    ps = CONTAMINATION_PROBES if probes is None else probes
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def flag(t: pd.DataFrame) -> pd.DataFrame:
        hit = np.zeros(len(t), dtype=bool)
        for p in ps:
            hit |= t["text"].str.contains(p, regex=False).to_numpy()
        return pd.DataFrame({"doc_id": t["doc_id"], "contaminated": hit})

    return ds.map_batches(flag, batch_format="pandas")


SPLIT_MULT = 2654435761
SPLIT_MOD = 1 << 32


def dataset_split(sf_dir: str):
    """(split, n_docs) — deterministic 80/10/10 train/val/test assignment
    by multiplicative key hash (never an RNG, never row order: the same
    doc lands in the same split at any parallelism, across runs, and in
    the SQL oracle). The split itself is a stateless per-batch map; only
    the tiny count rollup aggregates."""
    from .agg import hash_agg

    ds = _read_docs(sf_dir, ["doc_id"])

    def assign(t: pd.DataFrame) -> pd.DataFrame:
        h = (t["doc_id"].to_numpy(np.int64) * SPLIT_MULT) % SPLIT_MOD % 100
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        g = pd.DataFrame({"split": split, "n": 1})
        return g.groupby("split", as_index=False).agg(n_docs=("n", "sum"))

    return hash_agg(
        ds.map_batches(assign, batch_format="pandas"), "split", n_docs=("n_docs", "sum")
    )


# PII-redaction pattern table, applied in order (specific → general, like
# a production scrubber: an email must be masked BEFORE the bare-number
# rule eats its digits). RE2-portable (no lookarounds) so the same
# patterns run verbatim in the DuckDB oracle.
REDACT_RULES = [
    ("[A-Za-z0-9._]+@[A-Za-z0-9.-]+", "<EMAIL>"),
    ("\\+?[0-9][0-9 -]{6,}[0-9]", "<PHONE>"),
    ("[0-9]+", "<NUM>"),
]


def redact(sf_dir: str):
    """(event_id, redacted, n_redacted) — PII-style masking over the
    events ``props`` payload: each REDACT_RULES pattern is replaced by its
    placeholder, in rule order, and the total replacement count is kept
    for audit. Stateless vectorized ``map_batches`` stage (compiled-regex
    `.str.replace` per batch — the CodeDumper-adjacent scrub step a
    training-data pipeline runs before export); no shuffle at all."""
    from ..sources.tables import read_table

    rules = [(re.compile(p), r) for p, r in REDACT_RULES]
    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_id", "props"])

    def scrub(t: pd.DataFrame) -> pd.DataFrame:
        s = t["props"].astype("string")
        n = np.zeros(len(t), dtype=np.int64)
        for pat, repl in rules:
            n += s.str.count(pat).to_numpy(np.int64)
            s = s.str.replace(pat, repl, regex=True)
        return pd.DataFrame({
            "event_id": t["event_id"].to_numpy(np.int64),
            "redacted": s.astype(object),
            "n_redacted": n,
        })

    return ds.map_batches(scrub, batch_format="pandas")


TFIDF_K = 3
TFIDF_ROUND = 6


def tfidf_top_terms(sf_dir: str, k: int = TFIDF_K):
    """(doc_id, term, rank, score) — each document's top-k terms by
    TF-IDF (`tf * ln(N / df)`), rank ties broken lexicographically. The
    full distinctive-term extractor that `top_term` is the integer core
    of.

    Shape: document frequency is ONE term-keyed exchange of per-batch
    partials (documents are row-contained, so per-batch distinct
    (doc, term) IS globally distinct) and broadcasts (vocab-scale);
    scoring is then a stateless vectorized pass over the corpus. Ranking
    compares the score ROUNDED to ``TFIDF_ROUND`` on both sides, so a
    1-ulp libm divergence cannot flip a rank against the SQL oracle."""
    from .agg import hash_agg, round_half_away
    from .joins import build_lookup, get_broadcast, lookup_keys

    import ray

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def df_partial(t: pd.DataFrame) -> pd.DataFrame:
        ex = t[["doc_id"]].join(t["text"].str.split(" ").explode().rename("term"))
        vc = ex.drop_duplicates()["term"].value_counts()
        return pd.DataFrame({"term": vc.index, "df": vc.to_numpy(np.int64)})

    df_tbl = hash_agg(
        ds.map_batches(df_partial, batch_format="pandas"), "term", df=("df", "sum")
    ).to_pandas()
    n_docs = float(ds.count())
    ref = ray.put(build_lookup(df_tbl["term"], df_tbl["df"]))

    def score(t: pd.DataFrame) -> pd.DataFrame:
        ex = t[["doc_id"]].join(t["text"].str.split(" ").explode().rename("term"))
        g = ex.groupby(["doc_id", "term"], as_index=False).size()
        dfv = lookup_keys(get_broadcast(ref), g["term"]).astype("float64")
        g["score"] = round_half_away(
            g["size"].to_numpy(np.float64) * np.log(n_docs / dfv), TFIDF_ROUND
        )
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], ignore_index=True)
        g["rank"] = g.groupby("doc_id").cumcount() + 1
        g = g[g["rank"] <= k]
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(np.int64),
             "term": g["term"].to_numpy(),
             "rank": g["rank"].to_numpy(np.int64),
             "score": g["score"].to_numpy(np.float64)}
        )

    return ds.map_batches(score, batch_format="pandas")


PACK_BUDGET = 512   # tokens per packed training chunk
PACK_SHARDS = 16    # independent pack streams (per-shard loaders at scale)


def pack_chunks(sf_dir: str, budget: int = PACK_BUDGET,
                shards: int = PACK_SHARDS):
    """(doc_id, shard, start_tok, chunk_first, chunk_last) — concat-and-
    chunk sequence packing, the data-loader layout step of a training
    pipeline: documents are concatenated in a deterministic order and the
    token stream is cut every ``budget`` tokens; each doc records its
    stream offset and the first/last chunk it lands in (empty docs span
    the zero-width chunk at their offset).

    Determinism + scale shape: the pack ORDER is (shard, doc_id) where
    shard is the same multiplicative hash as :func:`dataset_split` — never
    row/block order. Offsets are a per-shard exclusive prefix sum, so the
    only exchange is ONE shard-keyed bucketed shuffle (a shard packs in
    one task, exactly how per-shard loader processes pack at scale);
    ``shards`` scales with the corpus."""
    from .agg import hash_groupby

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tok(t: pd.DataFrame) -> pd.DataFrame:
        did = t["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": did,
            "shard": (did * SPLIT_MULT) % SPLIT_MOD % shards,
            "n_tok": t["text"].str.count(_TOKEN_RE).to_numpy(np.int64),
        })

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shard", "doc_id"], ignore_index=True)
        n = g["n_tok"].to_numpy(np.int64)
        # exclusive scan restarting at each shard boundary (a bucket may
        # hold several shards)
        cum = np.cumsum(n) - n
        sh = g["shard"].to_numpy(np.int64)
        starts = np.zeros(len(g), dtype=np.int64)
        first = np.r_[True, sh[1:] != sh[:-1]] if len(g) else np.empty(0, bool)
        np.subtract(cum, np.maximum.accumulate(np.where(first, cum, 0)),
                    out=starts)
        last_tok = starts + np.maximum(n, 1) - 1
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "shard": sh,
            "start_tok": starts,
            "chunk_first": starts // budget,
            "chunk_last": last_tok // budget,
        })

    return hash_groupby(ds.map_batches(tok, batch_format="pandas"),
                        "shard", per_shard)


LOGPROB_UNIT = 6  # fixed-point decimals for per-token log-probabilities


def unigram_logprob(sf_dir: str):
    """(doc_id, n_words, logprob_units) — unigram language-model score:
    each document's sum of ln(count(w)/N) over its words, in int64
    fixed-point units (``LOGPROB_UNIT`` decimals). The corpus IS the
    model — the classic cheap perplexity proxy for quality filtering
    (consumers divide by n_words client-side).

    Scale shape: model fit = ONE term-keyed exchange of per-batch count
    partials (vocab-scale output); per-VOCAB-entry log-probs are rounded
    to fixed point once (libm ``math.log``, matching the oracle's ``ln``)
    and broadcast; scoring is then a stateless vectorized pass whose sums
    are all-integer — associative, so block order can never flip a hash.
    """
    from .agg import hash_agg, round_half_away
    from .joins import build_lookup, get_broadcast, lookup_keys

    import math

    import ray

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def count_partial(t: pd.DataFrame) -> pd.DataFrame:
        vc = t["text"].str.lower().str.findall(_WORD_RE).explode().dropna().value_counts()
        return pd.DataFrame({"term": vc.index, "n": vc.to_numpy(np.int64)})

    vocab = hash_agg(
        ds.map_batches(count_partial, batch_format="pandas"), "term", n=("n", "sum")
    ).to_pandas()
    total = float(vocab["n"].sum())
    units = np.array(
        [int(round_half_away(math.log(c / total) * 10**LOGPROB_UNIT, 0))
         for c in vocab["n"]],
        dtype=np.int64,
    )
    ref = ray.put(build_lookup(vocab["term"], units))

    def score(t: pd.DataFrame) -> pd.DataFrame:
        words = t["text"].str.lower().str.findall(_WORD_RE)
        ex = t[["doc_id"]].join(words.explode().rename("term")).dropna()
        u = lookup_keys(get_broadcast(ref), ex["term"]).astype(np.int64)
        g = pd.DataFrame({"doc_id": ex["doc_id"].to_numpy(np.int64), "u": u}) \
            .groupby("doc_id", as_index=True)["u"].agg(["size", "sum"])
        did = t["doc_id"].to_numpy(np.int64)
        g = g.reindex(did, fill_value=0)  # wordless docs still emit a row
        return pd.DataFrame({
            "doc_id": did,
            "n_words": g["size"].to_numpy(np.int64),
            "logprob_units": g["sum"].to_numpy(np.int64),
        })

    return ds.map_batches(score, batch_format="pandas")


def repetition_stats(sf_dir: str):
    """(doc_id, n_trigrams, n_dup_trigrams) — within-document repetition
    signal (the Gopher/MassiveText duplicate-n-gram quality filter, Rae et
    al. 2021 §A1.1): how many of a document's whitespace-token trigrams
    are repeats of an earlier trigram. Ratio consumers divide client-side;
    integers hash stably against the SQL oracle.

    Purely row-local ⇒ a stateless vectorized ``map_batches`` with no
    shuffle at all — the ideal 100-TB operator shape."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def stats(t: pd.DataFrame) -> pd.DataFrame:
        toks = t["text"].str.findall(_TOKEN_RE)

        def dup(ws: list) -> int:
            n3 = len(ws) - 2
            if n3 <= 0:
                return 0
            return n3 - len({(ws[i], ws[i + 1], ws[i + 2]) for i in range(n3)})

        n_tri = np.maximum(toks.str.len().to_numpy(np.int64) - 2, 0)
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(np.int64),
            "n_trigrams": n_tri,
            "n_dup_trigrams": toks.map(dup).to_numpy(np.int64),
        })

    return ds.map_batches(stats, batch_format="pandas")


ENTROPY_UNIT = 6  # fixed-point decimals for per-character-count logs


def char_entropy(sf_dir: str):
    """(doc_id, n_chars, ent_units) — character-distribution entropy
    signal (the CCNet/Gopher-family quality heuristic that catches
    boilerplate and encoding garbage): per document, Σ_c n_c·ln(n_c) over
    code-point counts in int64 fixed-point units (``ENTROPY_UNIT``
    decimals). Consumers recover Shannon entropy client-side as
    ``ln(n_chars) − ent_units/10^u/n_chars``; keeping the stored columns
    all-integer makes the sums associative, so block order can never
    flip the gate (the unigram_logprob discipline — per-count logs are
    rounded ONCE, libm ``log`` matching the oracle's ``ln``).

    Scale shape: a stateless vectorized map — no shuffle, no broadcast;
    the per-row kernel is C-bound (utf-32 decode + np.unique)."""
    from .agg import round_half_away

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    scale = 10.0 ** ENTROPY_UNIT

    def ent(t: pd.DataFrame) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(np.int64)
        n_chars = np.zeros(len(t), np.int64)
        units = np.zeros(len(t), np.int64)
        for i, s in enumerate(t["text"].fillna("").to_numpy()):
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            if len(cp):
                _, cnt = np.unique(cp, return_counts=True)
                lg = round_half_away(np.log(cnt) * scale, 0).astype(np.int64)
                n_chars[i] = len(cp)
                units[i] = int((cnt * lg).sum())
        return pd.DataFrame(
            {"doc_id": ids, "n_chars": n_chars, "ent_units": units}
        )

    return ds.map_batches(ent, batch_format="pandas")


def bigram_logprob(sf_dir: str):
    """(doc_id, n_bigrams, logprob_units) — add-one-smoothed bigram
    language-model score: each document's Σ ln((c(w1,w2)+1)/(c1(w1)+V))
    over its consecutive space-split token pairs, in int64 fixed-point
    units (``LOGPROB_UNIT`` decimals). The unigram_logprob ladder's next
    rung — the context-aware cheap perplexity proxy (consumers divide by
    n_bigrams client-side); the corpus is the model, so every scored pair
    is seen and the smoothing term only shapes the distribution.

    Scale shape: model fit = ONE pair-keyed exchange of per-batch bigram
    count partials (pair-vocab-scale output); per-pair log-probs round to
    fixed point ONCE (libm ``math.log`` matching the oracle's ``ln``) and
    broadcast as a sorted-hash probe keyed by the space-joined bigram;
    scoring is a stateless vectorized pass with all-integer sums."""
    import math

    import ray

    from .agg import empty_safe, hash_agg, round_half_away
    from .joins import build_lookup, get_broadcast, lookup_keys

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def _pairs(t: pd.DataFrame):
        """(doc positions, w1, w2) arrays for a batch — shifted view."""
        ex = t["text"].str.split(" ").explode()
        doc = ex.index.to_numpy()
        tok = ex.to_numpy(dtype=object)
        if len(tok) < 2:
            return doc[:0], tok[:0], tok[:0]
        same = doc[1:] == doc[:-1]
        return doc[:-1][same], tok[:-1][same], tok[1:][same]

    def count_partial(t: pd.DataFrame) -> pd.DataFrame:
        _, w1, w2 = _pairs(t)
        g = pd.DataFrame({"w1": w1, "w2": w2, "n": np.ones(len(w1), np.int64)})
        return empty_safe(g.groupby(["w1", "w2"], as_index=False).sum())

    pairs = hash_agg(
        ds.map_batches(count_partial, batch_format="pandas"),
        ["w1", "w2"], n=("n", "sum"),
    ).to_pandas()
    if len(pairs) == 0:
        return ds.map_batches(
            lambda t: pd.DataFrame(
                {"doc_id": t["doc_id"].to_numpy(np.int64),
                 "n_bigrams": np.zeros(len(t), np.int64),
                 "logprob_units": np.zeros(len(t), np.int64)}
            ),
            batch_format="pandas",
        )
    c1 = pairs.groupby("w1")["n"].sum()
    v = int(pairs["w2"].nunique())
    denom = pairs["w1"].map(c1).to_numpy(np.int64) + v
    units = np.array(
        [int(round_half_away(math.log((c + 1.0) / d) * 10**LOGPROB_UNIT, 0))
         for c, d in zip(pairs["n"].to_numpy(np.int64), denom)],
        dtype=np.int64,
    )
    key = pairs["w1"].str.cat(pairs["w2"], sep=" ")
    ref = ray.put(build_lookup(key, units))

    def score(t: pd.DataFrame) -> pd.DataFrame:
        doc, w1, w2 = _pairs(t)
        did = t["doc_id"].to_numpy(np.int64)
        if len(doc) == 0:
            return pd.DataFrame(
                {"doc_id": did,
                 "n_bigrams": np.zeros(len(t), np.int64),
                 "logprob_units": np.zeros(len(t), np.int64)}
            )
        k = pd.Series(w1).str.cat(pd.Series(w2), sep=" ")
        u = lookup_keys(get_broadcast(ref), k, default=0).astype(np.int64)
        g = pd.DataFrame({"i": doc, "u": u}).groupby("i")["u"].agg(
            ["size", "sum"]
        )
        g = g.reindex(t.index, fill_value=0)
        return pd.DataFrame(
            {"doc_id": did,
             "n_bigrams": g["size"].to_numpy(np.int64),
             "logprob_units": g["sum"].to_numpy(np.int64)}
        )

    return ds.map_batches(score, batch_format="pandas")
