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


# --- encoding detection chain (reference helpers/encoding.py:10-34) ---
#
# The reference detects with cchardet (absent in this container); we
# prefer it when importable and otherwise use charset_normalizer (same
# public detection contract: bytes -> encoding name or None). Both
# backends feed the reference's VISCII -> cp1258 remap.
try:  # pragma: no cover - cchardet not in this container
    import cchardet as _chardet_backend  # type: ignore

    def _detect_raw(data: bytes) -> str | None:
        return _chardet_backend.detect(data).get("encoding")

except ImportError:
    try:
        from charset_normalizer import from_bytes as _cn_from_bytes

        def _detect_raw(data: bytes) -> str | None:
            best = _cn_from_bytes(data).best()
            return best.encoding if best is not None else None

    except ImportError:  # pragma: no cover - cn is in this container

        def _detect_raw(data: bytes) -> str | None:
            return None


def detect_encoding(data: bytes) -> str | None:
    """Detect the encoding of a byte string; VISCII is remapped to
    cp1258 exactly as the reference does (encoding.py:10-19: python
    lacks a VISCII codec, cp1258 is its closest superset)."""
    encoding = _detect_raw(data)
    if str(encoding).upper() == "VISCII":
        return "cp1258"
    return encoding if encoding else None


def decode_http_response(response_bytes: bytes) -> str:
    """Reference decode chain (encoding.py:22-34): utf-8, else decode
    with the detected encoding, else ``str(bytes)`` (the reference's
    total fallback — yields the ``b'...'`` repr, pinned by parity)."""
    try:
        return response_bytes.decode("utf-8")
    except UnicodeDecodeError:
        try:
            return response_bytes.decode(detect_encoding(response_bytes))
        except (UnicodeDecodeError, TypeError, LookupError):
            return str(response_bytes)


def decode_body(body: bytes) -> str:
    """Engine hot-path decode: utf-8, else detected encoding, else
    latin-1 (total fallback — every byte string decodes to TEXT, unlike
    the reference's str(bytes) repr; corpus bodies are utf-8 so the two
    chains agree on the crawl path)."""
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        enc = detect_encoding(body)
        if enc and enc.lower() not in ("utf-8", "utf_8", "ascii"):
            try:
                return body.decode(enc)
            except (UnicodeDecodeError, LookupError):
                pass
        return body.decode("latin-1")


def get_language_code(content_language: str | None) -> str | None:
    """First 2 chars of a Content-Language header, lowercased
    (reference: get_response_language_code, helpers/domain_spider.py:150-167)."""
    if not content_language:
        return None
    code = content_language.strip()[:2].lower()
    return code if len(code) == 2 and code.isalpha() else None
