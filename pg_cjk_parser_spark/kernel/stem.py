"""Snowball "english" (Porter2) stemmer, pure Python.

Implements the published Porter2 algorithm (snowballstem.org English
stemmer), which is what PostgreSQL's ``english_stem`` dictionary uses
for ``asciiword`` tokens in the reference's search configuration
(/root/reference/postgres-16.sh:20).  Written from the public
algorithm description; longest-suffix-match-then-check semantics
throughout (no backtracking to shorter suffixes).
"""

from __future__ import annotations

VOWELS = frozenset("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)


def _is_vowel(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return True
    return c == "y"  # callers pass the y/Y-marked string; 'Y' is consonant


def _regions(w: str) -> tuple[int, int]:
    """Return (r1, r2) start indices."""
    n = len(w)
    r1 = n
    if w.startswith(("gener", "commun", "arsen")):
        r1 = 6 if w.startswith("commun") else 5
    else:
        for i in range(1, n):
            if w[i] not in VOWELS and w[i - 1] in VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in VOWELS and w[i - 1] in VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _short_syllable_at_end(w: str) -> bool:
    n = len(w)
    if n == 2:
        return w[0] in VOWELS and w[1] not in VOWELS
    if n >= 3:
        a, b, c = w[-3], w[-2], w[-1]
        return (
            a not in VOWELS
            and b in VOWELS
            and c not in VOWELS
            and c not in "wxY"
        )
    return False


def _is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _short_syllable_at_end(w)


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    # mark consonant y as Y
    if w and w[0] == "y":
        w = "Y" + w[1:]
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in "aeiouy":
            chars[i] = "Y"
    w = "".join(chars)

    r1, r2 = _regions(w)

    # Step 0
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(w[i] in VOWELS for i in range(len(w) - 2)):
            w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w.lower().replace("Y", "y")

    # Step 1b
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stemp = w[: -len(suf)]
                if any(c in VOWELS for c in stemp):
                    w = stemp
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, r1):
                        w += "e"
                break

    # Step 1c
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in VOWELS
    ):
        w = w[:-1] + "i"

    # Step 2 (longest match, then R1 check)
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", None), ("li", None),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 3
    step3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 4 (in R2)
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
        "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
    )
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # Step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _short_syllable_at_end(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")
