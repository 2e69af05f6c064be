"""Text sanitization + encoding helpers.

Reference: sanitize_text / clean_line / remove_control_chars /
trim_whitespace / replace_whitespace at
/root/reference/search_gov_crawler/search_gov_spiders/helpers/content.py:7-50
and decode_http_response / detect_encoding at helpers/encoding.py:10-34.

Batch variants operate on pandas Series so the hot path stays in
vectorized C string kernels; the scalar forms pin semantics for tests.
"""

from __future__ import annotations

import re

import pandas as pd

# HTML whitespace entities the reference strips (content.py:20-24).
_HTML_SPACE = re.compile(r"&(?:nbsp|ensp|emsp|thinsp);| | | | ")
_CONTROL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f​‎‏﻿]")
_WS_RUN = re.compile(r"[ \t\f\v]+")


def sanitize_text(text: str | None) -> str | None:
    """Remove control/non-printable chars and HTML space entities,
    collapse whitespace, drop empty lines; None when nothing is left."""
    if text is None:
        return None
    lines = []
    for line in text.splitlines():
        line = _HTML_SPACE.sub(" ", line)
        line = _CONTROL.sub("", line)
        line = "".join(ch for ch in line if ch.isprintable() or ch == " ")
        line = _WS_RUN.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines) if lines else None


def sanitize_series(texts: pd.Series) -> pd.Series:
    """Vectorized sanitize for map_batches hot paths (keeps the regex
    parts in C; skips the per-char isprintable pass, which only matters
    for exotic fixtures — those flow through :func:`sanitize_text`)."""
    s = texts.str.replace(_HTML_SPACE, " ", regex=True)
    s = s.str.replace(_CONTROL, "", regex=True)
    s = s.str.replace(_WS_RUN, " ", regex=True)
    s = s.str.replace(r"\n\s*\n+", "\n", regex=True)
    return s.str.strip()


def decode_body(body: bytes) -> str:
    """utf-8 decode with latin-1 fallback (reference decodes utf-8, falls
    back to cchardet detection then str(); cchardet is unavailable here,
    latin-1 is the total fallback — every byte string decodes)."""
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return body.decode("latin-1")


def get_language_code(content_language: str | None) -> str | None:
    """First 2 chars of a Content-Language header, lowercased
    (reference: get_response_language_code, helpers/domain_spider.py:150-167)."""
    if not content_language:
        return None
    code = content_language.strip()[:2].lower()
    return code if len(code) == 2 and code.isalpha() else None
