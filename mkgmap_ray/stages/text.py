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


class TextStats:
    """map_batches actor: per-document counts + quality score + langid."""

    def __init__(self):
        self.punct = re.compile(PUNCT_CLASS)
        self.word = re.compile(r"\w+", re.UNICODE)
        self.lang_words = {
            lang: ws for lang, ws in STOPWORDS.items()
        }

    def langid(self, tokens: list[str]) -> str:
        """n-gram-free heuristic: most stopword hits wins; 'zh' when CJK
        codepoints dominate; 'und' when nothing matches."""
        if not tokens:
            return "und"
        joined = "".join(tokens)
        cjk = sum(1 for c in joined if 0x4E00 <= ord(c) <= 0x9FFF)
        if cjk > len(joined) * 0.25:
            return "zh"
        lower = [t.lower() for t in tokens]
        best_lang, best_hits = "und", 0
        for lang, ws in self.lang_words.items():
            hits = sum(1 for t in lower if t in ws)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        batch = batch.copy()
        batch["n_chars_calc"] = text.str.len().astype("int64")
        tokens = text.str.split()
        batch["n_tokens"] = tokens.map(len).astype("int64")
        batch["n_punct"] = text.map(
            lambda t: len(self.punct.findall(t))
        ).astype("int64")
        words = text.map(lambda t: self.word.findall(t))
        batch["n_words"] = words.map(len).astype("int64")
        stop_all = set().union(*STOPWORDS.values())
        batch["stopword_ratio"] = words.map(
            lambda ws: sum(1 for w in ws if w.lower() in stop_all)
            / max(1, len(ws))
        )
        # quality: inside [0,1]; long-enough docs with words and few
        # punct/controls score high (length/punct/stopword ratio recipe)
        n = batch["n_chars_calc"].to_numpy().astype(np.float64)
        punct_ratio = batch["n_punct"].to_numpy() / np.maximum(n, 1)
        length_score = np.clip(n / 200.0, 0, 1)
        batch["quality"] = np.round(
            0.5 * length_score
            + 0.3 * (1 - np.clip(punct_ratio * 5, 0, 1))
            + 0.2 * np.clip(batch["stopword_ratio"].to_numpy() * 4, 0, 1),
            6,
        )
        batch["lang_pred"] = tokens.map(self.langid)
        batch["fingerprint"] = text.map(fingerprint64).astype("int64")
        return batch


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
