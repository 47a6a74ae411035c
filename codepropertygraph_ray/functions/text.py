"""Text analysis operators over the documents table.

The training-data-pipeline operator family (language-ID, quality scoring,
token counting, document fingerprinting). Each runs as a vectorized
``map_batches`` stage; the ones with deterministic hashing use the same
keyed SipHash as node ids (ids.py) so outputs are stable across runs and
parallelism levels (the StableOutputTests discipline).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..ids import hash_series

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
_CJK_RE = re.compile(r"[一-鿿]")


def _read_docs(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


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
    character fast path. Heuristic (no SQL oracle); accuracy asserted in
    tests against a synthetic multilingual fixture."""
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
    """(doc_id, simhash) — 64-bit SimHash over whitespace tokens with the
    repo's keyed SipHash (deterministic). Bit-majority vote weighted by
    token frequency (each occurrence votes once ≡ frequency weighting).

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
            hs = hash_series([flat]).astype(np.uint64)
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


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def fingerprint(sf_dir: str):
    """(doc_id, fingerprint, n_selected) — TRUE winnowing fingerprint
    (Schleimer et al., 'Winnowing: Local Algorithms for Document
    Fingerprinting'): the selected k-grams are the DISTINCT minima of every
    sliding window of ``FP_WINDOW`` consecutive 8-gram hashes, and the
    fingerprint column is an order-free xor-fold (splitmix64 of each
    selected hash, xored) of that set — documents sharing long substrings
    share selected hashes. ``n_selected`` = |selected set| (density ≈
    2/(w+1) of positions per the paper). Window minima use
    ``sliding_window_view`` — no per-window Python loop."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(t: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(t), dtype=np.int64)
        nsel = np.zeros(len(t), dtype=np.int64)
        for i, text in enumerate(t["text"]):
            text = text or ""
            if len(text) < FP_KGRAM:
                grams = [text]
            else:
                grams = [text[j : j + FP_KGRAM] for j in range(len(text) - FP_KGRAM + 1)]
            hs = hash_series([pd.Series(grams)])
            if len(hs) >= FP_WINDOW:
                wins = np.lib.stride_tricks.sliding_window_view(hs, FP_WINDOW)
                selected = np.unique(wins.min(axis=1))
            else:
                selected = np.unique(hs)
            folded = np.bitwise_xor.reduce(_splitmix64(selected))
            out[i] = np.int64(folded & np.uint64(0x7FFF_FFFF_FFFF_FFFF))
            nsel[i] = len(selected)
        return pd.DataFrame({"doc_id": t["doc_id"], "fingerprint": out, "n_selected": nsel})

    return ds.map_batches(fp, batch_format="pandas")
