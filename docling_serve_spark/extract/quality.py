"""Text-quality analysis + OCR-mode dispatch (operators F1-F10).

Faithful re-expression of the reference's rule-based PDF text-quality
heuristics (reference:docling_serve/pdf_analysis.py:52-141):

  F2  sample pages: first 5 + every ~(pages/10)-th, first 2000 chars
  F3  control-char ratio > 0.03          -> +1 indicator
  F4  punctuation/symbol ratio > 0.30    -> +1
  F5  >5 literal \\xHH escape sequences  -> +2 (weighted)
  F6  mean space-run length > 2.5        -> +1
  F7  U+FFFD replacement chars           -> +count
  F8  score = indicators/len(samples); > 0.8 -> 'poor' else 'good'
  F9  decision tree -> recommended_mode in {skip, redo, force}
  F10 force_ocr promotion

Pure functions: both the single-node oracle and the columnar Spark
stage (operators/analysis.py) call these / implement the same math.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass

_ESCAPE_RE = re.compile(r"\\[0-9a-fA-F]{2}")
_SPACE_RUN_RE = re.compile(r"[ ]{1,10}")

QUALITY_GOOD = "good"
QUALITY_POOR = "poor"
QUALITY_UNKNOWN = "unknown"

MODE_SKIP = "skip"
MODE_REDO = "redo"
MODE_FORCE = "force"


def sample_pages(page_texts: list[str]) -> list[str]:
    """F2 — the reference's sampling rule
    (pdf_analysis.py:58-66): pages with text, sampled at page_num < 5
    or page_num % max(1, pages_total//10) == 0, first 2000 chars."""
    total = len(page_texts)
    step = max(1, int(total / 10))
    samples = []
    for page_num, text in enumerate(page_texts):
        t = text.strip()
        if not t:
            continue
        if page_num < 5 or page_num % step == 0:
            samples.append(t[:2000])
    return samples


# Per-char category memo with small-int codes (1=C, 2=P/S, 0=other):
# samples draw from a small character vocabulary, so after warm-up
# each char costs one dict hit instead of a unicodedata call + string
# compare. (A precompiled regex character class was tried and is ~6x
# SLOWER for non-ASCII text — CPython's re has no fast path for huge
# non-Latin classes.)
_CATCODE: dict[str, int] = {}


def _cat_counts(s: str) -> tuple[int, int]:
    """One pass -> (#category-C chars, #category-P/S chars)."""
    get = _CATCODE.get
    n_c = n_ps = 0
    for ch in s:
        v = get(ch)
        if v is None:
            k = unicodedata.category(ch)[0]
            v = 1 if k == "C" else 2 if k in ("P", "S") else 0
            _CATCODE[ch] = v
        if v:
            if v == 1:
                n_c += 1
            else:
                n_ps += 1
    return n_c, n_ps


def control_ratio(s: str) -> float:
    """F3 — ratio of category-C (control/format/unassigned) chars."""
    return _cat_counts(s)[0] / max(len(s), 1)


def symbol_ratio(s: str) -> float:
    """F4 — ratio of punctuation/symbol (category P or S) chars."""
    return _cat_counts(s)[1] / max(len(s), 1)


def escape_count(s: str) -> int:
    """F5."""
    return len(_ESCAPE_RE.findall(s))


def avg_space_run(s: str) -> float:
    """F6 — mean length of space runs (0.0 when no spaces)."""
    runs = _SPACE_RUN_RE.findall(s)
    if not runs:
        return 0.0
    return sum(len(r) for r in runs) / len(runs)


def replacement_count(s: str) -> int:
    """F7."""
    return s.count("�")


def sample_indicators(s: str) -> int:
    """Poor-quality indicator points for one sample
    (pdf_analysis.py:75-111 loop body)."""
    pts = 0
    n_c, n_ps = _cat_counts(s)  # one pass serves both F3 and F4
    denom = max(len(s), 1)
    if n_c / denom > 0.03:
        pts += 1
    if n_ps / denom > 0.30:
        pts += 1
    if escape_count(s) > 5:
        pts += 2
    if avg_space_run(s) > 2.5:
        pts += 1
    pts += replacement_count(s)
    return pts


def quality_score(samples: list[str]) -> float:
    """F8 — total indicators / number of samples."""
    if not samples:
        return 0.0
    return sum(sample_indicators(s) for s in samples) / max(len(samples), 1)


def classify_quality(samples: list[str]) -> str:
    if not samples:
        return QUALITY_UNKNOWN
    return QUALITY_POOR if quality_score(samples) > 0.8 else QUALITY_GOOD


@dataclass(frozen=True)
class PdfAnalysis:
    """The analysis record (reference:pdf_analysis.py:26-32)."""

    needs_ocr: bool
    has_text: bool
    is_tagged: bool
    text_quality: str
    recommended_mode: str


def decide_mode(has_text: bool, is_tagged: bool, text_quality: str) -> str:
    """F9 — the decision tree (pdf_analysis.py:128-141)."""
    if is_tagged and has_text and text_quality != QUALITY_POOR:
        return MODE_SKIP
    if has_text and text_quality == QUALITY_POOR:
        return MODE_FORCE
    if has_text and not is_tagged:
        return MODE_REDO
    return MODE_FORCE


def analyze_pages(page_texts: list[str], is_tagged: bool) -> PdfAnalysis:
    samples = sample_pages(page_texts)
    has_text = bool(samples)
    tq = classify_quality(samples)
    mode = decide_mode(has_text, is_tagged, tq)
    return PdfAnalysis(
        needs_ocr=mode != MODE_SKIP,
        has_text=has_text,
        is_tagged=is_tagged,
        text_quality=tq,
        recommended_mode=mode,
    )


def force_ocr_effective(recommended_mode: str, force_ocr_option: bool) -> bool:
    """F10 — promotion (reference:engines/async_local/worker.py:150-156)."""
    return force_ocr_option or recommended_mode == MODE_FORCE
