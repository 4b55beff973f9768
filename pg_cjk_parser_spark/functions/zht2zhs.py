"""cjk_zht2zhs: traditional -> simplified Chinese normalization.

Semantics of the reference ``prsd2_zht2zhs``
(/root/reference/pg_cjk_parser.c:2960-3009): code points in
[0x346F, 0x9FD3] with a non-zero table entry are replaced by their
simplified counterpart; everything else (incl. 4-byte extension-plane
chars, which the reference's code-point decoder never maps) passes
through unchanged.

Deviation, documented: the reference's byte-walk advances by the
byte-length of the *first* character of the string for every unmapped
character, which can skip characters when a string starts with a
multi-byte non-mappable char.  We walk per character instead (the
behavior its own fixtures document).
"""

from __future__ import annotations

from .zht2zhs_table import SIMPLIFIED, TRADITIONAL

_TRANSLATE = str.maketrans(TRADITIONAL, SIMPLIFIED)


def zht2zhs(text: str) -> str:
    return text.translate(_TRANSLATE)
