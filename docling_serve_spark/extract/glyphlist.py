"""Glyph-name -> Unicode for simple-font /Encoding resolution.

A hand-selected subset of the Adobe Glyph List (AGL, public spec:
github.com/adobe-type-tools/agl-aglfn) covering every name used by the
three standard Latin base encodings (Standard, WinAnsi, MacRoman — PDF
32000-1:2008 Annex D) plus the ligatures and accents common in
/Differences arrays of subset fonts. ``uniXXXX``/``uXXXX[XX]`` names
are decoded algorithmically per the AGL specification §3.
"""

from __future__ import annotations

import re

# ASCII names (AGL): the printable range maps to itself
_ASCII = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
}
_ASCII.update({c: c for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"})
_ASCII.update({c: c for c in "abcdefghijklmnopqrstuvwxyz"})

# Latin-1 supplement + typographic names (WinAnsi/MacRoman/Standard)
_LATIN = {
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "twosuperior": "²",
    "threesuperior": "³", "acute": "´", "mu": "µ",
    "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "onesuperior": "¹",
    "ordmasculine": "º", "guillemotright": "»",
    "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "questiondown": "¿",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "AE": "Æ", "Ccedilla": "Ç", "Egrave": "È",
    "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î",
    "Idieresis": "Ï", "Eth": "Ð", "Ntilde": "Ñ",
    "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Odieresis": "Ö", "multiply": "×",
    "Oslash": "Ø", "Ugrave": "Ù", "Uacute": "Ú",
    "Ucircumflex": "Û", "Udieresis": "Ü", "Yacute": "Ý",
    "Thorn": "Þ", "germandbls": "ß", "agrave": "à",
    "aacute": "á", "acircumflex": "â", "atilde": "ã",
    "adieresis": "ä", "aring": "å", "ae": "æ",
    "ccedilla": "ç", "egrave": "è", "eacute": "é",
    "ecircumflex": "ê", "edieresis": "ë", "igrave": "ì",
    "iacute": "í", "icircumflex": "î", "idieresis": "ï",
    "eth": "ð", "ntilde": "ñ", "ograve": "ò",
    "oacute": "ó", "ocircumflex": "ô", "otilde": "õ",
    "odieresis": "ö", "divide": "÷", "oslash": "ø",
    "ugrave": "ù", "uacute": "ú", "ucircumflex": "û",
    "udieresis": "ü", "yacute": "ý", "thorn": "þ",
    "ydieresis": "ÿ",
    # typographic / WinAnsi 0x80-0x9F region
    "Euro": "€", "quotesinglbase": "‚", "florin": "ƒ",
    "quotedblbase": "„", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "circumflex": "ˆ",
    "perthousand": "‰", "Scaron": "Š",
    "guilsinglleft": "‹", "OE": "Œ", "Zcaron": "Ž",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "bullet": "•", "endash": "–", "emdash": "—",
    "tilde": "˜", "trademark": "™", "scaron": "š",
    "guilsinglright": "›", "oe": "œ", "zcaron": "ž",
    "Ydieresis": "Ÿ",
    # Standard/MacRoman extras + common subset-font ligatures/accents
    "fraction": "⁄", "fi": "ﬁ", "fl": "ﬂ",
    "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
    "dotlessi": "ı", "Lslash": "Ł", "lslash": "ł",
    "minus": "−", "breve": "˘", "dotaccent": "˙",
    "ring": "˚", "ogonek": "˛", "hungarumlaut": "˝",
    "caron": "ˇ", "nbspace": " ", "sfthyphen": "­",
    "notequal": "≠", "infinity": "∞", "lessequal": "≤",
    "greaterequal": "≥", "partialdiff": "∂",
    "summation": "∑", "product": "∏", "pi": "π",
    "integral": "∫", "Omega": "Ω", "radical": "√",
    "approxequal": "≈", "Delta": "∆", "lozenge": "◊",
    "apple": "", "middot": "·",
}

GLYPHS: dict[str, str] = {**_ASCII, **_LATIN}

_UNI_RE = re.compile(r"^uni([0-9A-Fa-f]{4})$")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def glyph_to_unicode(name: str) -> str | None:
    """AGL lookup with the spec's algorithmic fallbacks: strip a
    variant suffix (``a.sc`` -> ``a``), then ``uniXXXX``/``uXXXXXX``
    hex names. Unknown names (subset-private ``g42``, ``cid107``)
    return None — the caller keeps the raw code, preserving the
    pre-/Encoding behavior for unmappable glyphs."""
    if name in GLYPHS:
        return GLYPHS[name]
    base = name.split(".", 1)[0]
    if base != name and base in GLYPHS:
        return GLYPHS[base]
    m = _UNI_RE.match(base)
    if not m:
        m = _U_RE.match(base)
    if m:
        cp = int(m.group(1), 16)
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            return None  # lone surrogate would poison Arrow transport
        return chr(cp)
    return None


def _enc_table(codec: str, lo: int, hi: int) -> dict[int, str]:
    out: dict[int, str] = {}
    for b in range(lo, hi + 1):
        try:
            ch = bytes([b]).decode(codec)
        except UnicodeDecodeError:
            continue
        if ch != chr(b):  # only store deviations from latin-1 passthrough
            out[b] = ch
    return out


# WinAnsi == cp1252: deviates from latin-1 only in 0x80-0x9F
WIN_ANSI: dict[int, str] = _enc_table("cp1252", 0x80, 0x9F)
# MacRoman deviates across the whole upper half
MAC_ROMAN: dict[int, str] = _enc_table("mac_roman", 0x80, 0xFF)

# Adobe StandardEncoding (PDF 32000-1:2008 Annex D.2), upper half +
# the two typographic quote slots in ASCII space
_STD_NAMES = {
    0x27: "quoteright", 0x60: "quoteleft",
    0xA1: "exclamdown", 0xA2: "cent", 0xA3: "sterling", 0xA4: "fraction",
    0xA5: "yen", 0xA6: "florin", 0xA7: "section", 0xA8: "currency",
    0xA9: "quotesingle", 0xAA: "quotedblleft", 0xAB: "guillemotleft",
    0xAC: "guilsinglleft", 0xAD: "guilsinglright", 0xAE: "fi", 0xAF: "fl",
    0xB1: "endash", 0xB2: "dagger", 0xB3: "daggerdbl",
    0xB4: "periodcentered", 0xB6: "paragraph", 0xB7: "bullet",
    0xB8: "quotesinglbase", 0xB9: "quotedblbase", 0xBA: "quotedblright",
    0xBB: "guillemotright", 0xBC: "ellipsis", 0xBD: "perthousand",
    0xBF: "questiondown", 0xC1: "grave", 0xC2: "acute", 0xC3: "circumflex",
    0xC4: "tilde", 0xC5: "macron", 0xC6: "breve", 0xC7: "dotaccent",
    0xC8: "dieresis", 0xCA: "ring", 0xCB: "cedilla", 0xCD: "hungarumlaut",
    0xCE: "ogonek", 0xCF: "caron", 0xD0: "emdash", 0xE1: "AE",
    0xE3: "ordfeminine", 0xE8: "Lslash", 0xE9: "Oslash", 0xEA: "OE",
    0xEB: "ordmasculine", 0xF1: "ae", 0xF5: "dotlessi", 0xF8: "lslash",
    0xF9: "oslash", 0xFA: "oe", 0xFB: "germandbls",
}
STANDARD: dict[int, str] = {
    code: GLYPHS[name]
    for code, name in _STD_NAMES.items()
    if GLYPHS.get(name) and GLYPHS[name] != chr(code)
}

BASE_ENCODINGS: dict[str, dict[int, str]] = {
    "WinAnsiEncoding": WIN_ANSI,
    "MacRomanEncoding": MAC_ROMAN,
    "StandardEncoding": STANDARD,
}
