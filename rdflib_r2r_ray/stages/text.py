"""Text-analysis stages for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

All stages are vectorized ``map_batches`` transforms (Arrow kernels where
they exist, numpy elsewhere); anything holding compiled state (regexes,
language profiles) builds it once per actor/task in ``__init__``.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting + simple integer text stats (SQL-oracle-able)
# ---------------------------------------------------------------------------


def text_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens, n_alpha, n_digit, n_spaces) — all integer counts so
    the DuckDB oracle matches exactly (no float rounding surface).

    n_tokens = whitespace-separated tokens of the trimmed text (0 if empty).
    """
    text = pc.cast(batch[text_col], pa.string())
    trimmed = pc.utf8_trim_whitespace(text)
    # tokens = runs of non-whitespace
    n_tokens = pc.count_substring_regex(trimmed, r"\S+")
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]")
    n_digit = pc.count_substring_regex(text, r"[0-9]")
    n_spaces = pc.count_substring_regex(text, r" ")
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_alpha": pc.cast(n_alpha, pa.int64()),
            "n_digit": pc.cast(n_digit, pa.int64()),
            "n_spaces": pc.cast(n_spaces, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# BPE-ish subword token counting (regex pre-tokenizer, GPT-2 style)
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer modeled on the public GPT-2 regex (Radford et al.
# 2019) with the `\s+(?!\S)` lookahead dropped: RE2 (DuckDB oracle) has no
# lookarounds, and the lookahead only moves ONE space from a whitespace run
# into the following token — the match COUNT is identical, which is all the
# token counter uses.  Keep this string in sync with SQL_TEXT_TOKENS.
BPEISH_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
_BPEISH = re.compile(BPEISH_PATTERN)


class TokenCounter:
    """Actor-pool stage: word + BPE-ish token counts per document.  The
    compiled regex lives in the actor (``__init__``), not per batch."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.pat = _BPEISH
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n_bpe = pa.array(
            [0 if t is None else len(self.pat.findall(t)) for t in texts], pa.int64()
        )
        trimmed = pc.utf8_trim_whitespace(pc.cast(batch[self.text_col], pa.string()))
        n_ws = pc.cast(pc.count_substring_regex(trimmed, r"\S+"), pa.int64())
        return pa.table(
            {self.id_col: batch[self.id_col], "n_ws_tokens": n_ws, "n_bpe_tokens": n_bpe}
        )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that with for on "
    "as at by from not but have has had i you he she they we".split()
)


QUALITY_COLUMNS = (
    "n_words", "sum_word_len", "n_stop", "n_punct", "n_upper",
    "n_chars", "n_lines", "n_dup_lines", "quality_score",
)


class QualityScorer:
    """Heuristic document-quality signals (Gopher/C4-style filters): word
    count / total word length (mean), stopword count, punctuation count,
    uppercase count, duplicate-line count, plus a composite 0-100 score.

    ALL outputs are integers, and every threshold in the score is evaluated
    as exact integer arithmetic (mean_word_len ∈ [3,10] ⇔ 3·n_words ≤
    sum_word_len ≤ 10·n_words, etc.) — so the DuckDB oracle reproduces the
    score bit-exactly with no float rounding surface.  Keep in sync with
    ``dataq.SQL_TEXT_QUALITY``."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.word_re = re.compile(r"[A-Za-z']+")
        self.punct_re = re.compile(r"[^A-Za-z0-9\s]")
        self.upper_re = re.compile(r"[A-Z]")
        self.text_col, self.id_col = text_col, id_col

    def score_one(self, t: str) -> Dict[str, int]:
        words = self.word_re.findall(t)
        n_words = len(words)
        sum_wl = sum(map(len, words))
        n_chars = len(t)
        n_stop = sum(1 for w in words if w.lower() in _STOPWORDS)
        n_punct = len(self.punct_re.findall(t))
        n_upper = len(self.upper_re.findall(t))
        lines = [ln for ln in t.split("\n") if ln.strip()]
        n_lines = len(lines)
        n_dup = n_lines - len(set(lines))
        score = 100
        if n_words == 0 or not (3 * n_words <= sum_wl <= 10 * n_words):
            score -= 25  # mean word length outside [3, 10]
        if 100 * n_stop < n_words or n_words == 0:
            score -= 25  # stopword ratio < 1%
        if 5 * n_punct > n_chars:
            score -= 20  # punctuation ratio > 20%
        if 10 * n_upper > 3 * n_chars:
            score -= 15  # uppercase ratio > 30%
        if 10 * n_dup > 3 * n_lines:
            score -= 15  # duplicate-line ratio > 30%
        if n_words < 5:
            score -= 40
        return dict(
            n_words=n_words, sum_word_len=sum_wl, n_stop=n_stop,
            n_punct=n_punct, n_upper=n_upper, n_chars=n_chars,
            n_lines=n_lines, n_dup_lines=n_dup, quality_score=max(0, score),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        rows = [self.score_one(t or "") for t in texts]
        out = {self.id_col: batch[self.id_col]}
        for k in QUALITY_COLUMNS:
            out[k] = pa.array([r[k] for r in rows], pa.int64())
        return pa.table(out)


# ---------------------------------------------------------------------------
# language identification (stopword + character-ngram profile heuristic)
# ---------------------------------------------------------------------------

_LANG_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the and of to in is that it was for on are with as be at by this have from or had not but what all were when we there".split()),
    "de": frozenset("der die das und ist nicht ich sie es ein eine zu den von mit auf für im dem des als auch wird bei einer nach werden".split()),
    "fr": frozenset("le la les et de des du en un une est que qui dans pour pas sur au avec ne se ce il elle sont par plus mais nous vous".split()),
    "es": frozenset("el la los las y de en un una es que no se del por con para su al lo como más pero sus le ha o este si porque".split()),
    "it": frozenset("il la le e di che in un una è per non si con del da dei al sono come ma anche più nel alla questo se lo ci".split()),
    "pt": frozenset("o a os as e de que em um uma é do da não se com para por no na mais os como mas foi ao dos das ele isso".split()),
    "nl": frozenset("de het een en van in is dat op te zijn met voor niet aan er ook als bij maar om uit dan nog naar door over zo".split()),
}

_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


class LanguageID:
    """n-gram/stopword-profile language identifier.

    Score per language = fraction of the document's tokens that are in that
    language's stopword profile; CJK short-circuit by Unicode block ratio.
    Returns ``und`` below a confidence floor. Profiles are built once per
    actor (``__init__``)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", min_conf: float = 0.05):
        self.profiles = {k: v for k, v in _LANG_STOPWORDS.items()}
        self.token_re = _TOKEN_RE
        self.min_conf = min_conf
        self.text_col, self.id_col = text_col, id_col

    def detect(self, t: str) -> str:
        if not t:
            return "und"
        # CJK/Cyrillic/Arabic block detection first
        n = len(t)
        cjk = sum(1 for c in t if "一" <= c <= "鿿")
        if cjk / n > 0.2:
            return "zh"
        kana = sum(1 for c in t if "぀" <= c <= "ヿ")
        if kana / n > 0.1:
            return "ja"
        cyr = sum(1 for c in t if "Ѐ" <= c <= "ӿ")
        if cyr / n > 0.2:
            return "ru"
        arab = sum(1 for c in t if "؀" <= c <= "ۿ")
        if arab / n > 0.2:
            return "ar"
        toks = [w.lower() for w in self.token_re.findall(t)]
        if not toks:
            return "und"
        best_lang, best = "und", 0.0
        for lang, prof in self.profiles.items():
            hit = sum(1 for w in toks if w in prof) / len(toks)
            # deterministic tie-break: higher score wins, then lang code
            if hit > best or (hit == best and best > 0 and lang < best_lang):
                best_lang, best = lang, hit
        return best_lang if best >= self.min_conf else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        langs = pa.array([self.detect(t or "") for t in texts], pa.string())
        return pa.table({self.id_col: batch[self.id_col], "lang_pred": langs})


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash / winnowing)
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1000003)
_FP_MASK = np.uint64((1 << 64) - 1)


def rolling_fingerprint(text: str, window: int = 50) -> int:
    """Deterministic polynomial rolling hash over the whole document plus a
    winnowing min over ``window``-byte rolling hashes — robust to where the
    doc is split into batches (pure function of content)."""
    data = text.encode("utf-8", "surrogatepass")
    if not data:
        return 0
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # full-document polynomial hash: h = Σ b_i · BASE^(n-1-i) mod 2^64,
    # identical to the Horner loop but fully vectorized — numpy uint64
    # arithmetic wraps mod 2^64, which IS the `& MASK` of the scalar loop
    n = len(arr)
    with np.errstate(over="ignore"):
        powers = np.empty(n, dtype=np.uint64)
        powers[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, _FP_BASE, dtype=np.uint64), out=powers[1:])
        h = np.uint64((arr * powers[::-1]).sum(dtype=np.uint64))
    if len(arr) >= window:
        # rolling window hashes via prefix products would overflow; use a
        # cheap vectorized alternative: XOR of shifted cumulative sums
        w = np.lib.stride_tricks.sliding_window_view(arr, window)
        wh = (w * (np.arange(window, dtype=np.uint64) + np.uint64(1))).sum(axis=1) & _FP_MASK
        h ^= np.uint64(wh.min())
    return int(h)


class Fingerprinter:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id", window: int = 50):
        self.text_col, self.id_col, self.window = text_col, id_col, window

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        fps = pa.array(
            [rolling_fingerprint(t or "", self.window) for t in texts], pa.uint64()
        )
        return pa.table({self.id_col: batch[self.id_col], "fingerprint": fps})
