"""OCR language-code mapping (operator P4).

Re-expresses the reference's EasyOCR/ISO -> Tesseract conversion
(reference:docling_serve/ocr_language_utils.py:8-194): mapping table,
valid-code set, order-preserving dedupe, '+'-join for OCRMyPDF.
The table itself is the public Tesseract/ISO-639 correspondence.

In Spark this becomes a broadcast lookup join (SURVEY.md §2.9), so the
table is also exposed as (src_code, tesseract_code) rows.
"""

from __future__ import annotations

LANGUAGE_MAPPING: dict[str, str] = {
    "en": "eng", "ar": "ara", "fr": "fra", "de": "deu", "es": "spa",
    "it": "ita", "pt": "por", "ru": "rus", "zh": "chi_sim",
    "zh-cn": "chi_sim", "zh-tw": "chi_tra", "ja": "jpn", "ko": "kor",
    "hi": "hin", "th": "tha", "vi": "vie", "tr": "tur", "pl": "pol",
    "nl": "nld", "sv": "swe", "da": "dan", "no": "nor", "fi": "fin",
    "cs": "ces", "hu": "hun", "ro": "ron", "bg": "bul", "hr": "hrv",
    "sk": "slk", "sl": "slv", "et": "est", "lv": "lav", "lt": "lit",
    "uk": "ukr", "el": "ell", "he": "heb", "fa": "fas", "ur": "urd",
    "bn": "ben", "ta": "tam", "te": "tel", "ml": "mal", "kn": "kan",
    "gu": "guj", "pa": "pan", "or": "ori", "as": "asm", "ne": "nep",
    "si": "sin", "my": "mya", "km": "khm", "lo": "lao", "ka": "kat",
    "am": "amh", "is": "isl", "mt": "mlt", "cy": "cym", "ga": "gle",
    "gd": "gla", "br": "bre", "co": "cos", "eu": "eus", "ca": "cat",
    "gl": "glg", "oc": "oci", "la": "lat", "eo": "epo", "vo": "vol",
    "io": "ido", "ia": "ina", "ie": "ile", "jbo": "jbo", "tlh": "tlh",
    "chinese": "chi_sim", "chinese-simplified": "chi_sim",
    "chinese-traditional": "chi_tra", "english": "eng", "arabic": "ara",
    "french": "fra", "german": "deu", "spanish": "spa", "italian": "ita",
    "portuguese": "por", "russian": "rus", "japanese": "jpn",
    "korean": "kor", "hindi": "hin",
}

TESSERACT_CODES: frozenset[str] = frozenset({
    "afr", "amh", "ara", "asm", "aze", "aze_cyrl", "bel", "ben", "bod",
    "bos", "bre", "bul", "cat", "ceb", "ces", "chi_sim", "chi_tra",
    "chr", "cym", "dan", "deu", "div", "dzo", "ell", "eng", "enm",
    "epo", "est", "eus", "fao", "fas", "fin", "fra", "frk", "frm",
    "fry", "gla", "gle", "glg", "grc", "guj", "hat", "heb", "hin",
    "hrv", "hun", "hye", "iku", "ind", "isl", "ita", "ita_old", "jav",
    "jpn", "kan", "kat", "kat_old", "kaz", "khm", "kir", "kor", "kur",
    "lao", "lat", "lav", "lit", "ltz", "mal", "mar", "mkd", "mlt",
    "mon", "mri", "msa", "mya", "nep", "nld", "nor", "oci", "ori",
    "pan", "pol", "por", "pus", "que", "ron", "rus", "san", "sin",
    "slk", "slv", "snd", "spa", "spa_old", "sqi", "srp", "srp_latn",
    "sun", "swa", "swe", "syr", "tam", "tat", "tel", "tgk", "tgl",
    "tha", "tir", "ton", "tur", "uig", "ukr", "urd", "uzb", "uzb_cyrl",
    "vie", "yid", "yor",
})


def convert_to_tesseract_codes(ocr_languages: list[str] | None) -> list[str]:
    """Normalize -> map -> drop unknown -> dedupe preserving order
    (ocr_language_utils.py:129-181)."""
    if not ocr_languages:
        return []
    converted: list[str] = []
    for lang in ocr_languages:
        lang = lang.lower().strip()
        if not lang:
            continue
        if lang in TESSERACT_CODES:
            converted.append(lang)
        elif lang in LANGUAGE_MAPPING:
            converted.append(LANGUAGE_MAPPING[lang])
        # unknown codes dropped
    unique: list[str] = []
    for lang in converted:
        if lang not in unique:
            unique.append(lang)
    return unique


def format_for_ocrmypdf(tesseract_languages: list[str]) -> str:
    """'+'-join (ocr_language_utils.py:184-194)."""
    return "+".join(tesseract_languages) if tesseract_languages else ""


def mapping_rows() -> list[tuple[str, str]]:
    """(src_code, tesseract_code) rows for the broadcast join, sorted
    for determinism."""
    return sorted(LANGUAGE_MAPPING.items())
