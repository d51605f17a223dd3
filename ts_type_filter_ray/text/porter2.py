"""Vendored Porter2 ("Snowball English") stemmer — pure Python, zero deps.

Implements the published Snowball English stemming algorithm
(https://snowballstem.org/algorithms/english/stemmer.html). The reference
engine uses ``nltk.stem.snowball.SnowballStemmer("english")`` (reference
``ts_type_filter/inverted_index.py:4-11``), which implements the same
algorithm; NLTK is unavailable in this environment, so the algorithm is
vendored here from the public specification.

This module is the rank-identity anchor: the single-process oracle
(``ts_type_filter_ray.oracle.index``) and the distributed Ray Data engine
both import *this* stemmer, so match sets and BM25 scores are well-defined
and independent of NLTK availability.

Like the reference stemmer, :func:`stem` lowercases its input.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = frozenset("cdeghkmnrt")

# Exceptional forms (spec: "exceptional forms" list).
_SPECIAL = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Invariant after step 1a (spec: "Following step 1a, leave ... invariant").
_EXC2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed")
)

# Step 2 suffix → replacement, longest-match-first order.
_STEP2 = (
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    # "ogi" (needs preceding "l") and "li" (needs valid li-ending) are handled
    # inline because of their extra conditions.
)

_STEP3 = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    # "ative" (delete, requires R2) handled inline.
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

# Step 4 deletions, longest first; "ion" has an extra condition.
_STEP4 = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "al",
    "er",
    "ic",
)


def _regions(word: str) -> tuple[int, int]:
    """Return (r1, r2) start indices for *word* (Y counts as a consonant)."""
    n = len(word)
    if word.startswith(("gener", "arsen")):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        r1 = n
        for i in range(1, n):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True iff *word* ends in a "short syllable" per the spec."""
    n = len(word)
    if n >= 3:
        c1, v, c2 = word[-3], word[-2], word[-1]
        if (
            c1 not in _VOWELS
            and v in _VOWELS
            and c2 not in _VOWELS
            and c2 not in "wxY"
        ):
            return True
    if n == 2 and word[0] in _VOWELS and word[1] not in _VOWELS:
        return True
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _stem_uncached(word: str) -> str:
    word = word.lower()
    if len(word) <= 2:
        return word
    word = (
        word.replace("’", "'").replace("‘", "'").replace("‛", "'")
    )
    if word in _SPECIAL:
        return _SPECIAL[word]
    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word

    # Mark consonant-y as Y (initial y, or y after a vowel), left to right.
    if word[0] == "y":
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word)

    # Step 0: longest among ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(c in _VOWELS for c in word[:-2]):
            word = word[:-1]

    if word in _EXC2:
        return word

    # Step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-5] + "ee"
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-3] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if any(c in _VOWELS for c in stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # Step 1c: y/Y → i when preceded by a non-vowel that is not the first letter
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # Step 2 (suffix must lie in R1)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and len(word) >= 4 and word[-4] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if len(word) - 2 >= r1 and len(word) >= 3 and word[-3] in _LI_ENDINGS:
                word = word[:-2]

    # Step 3 (suffix must lie in R1; "ative" additionally requires R2)
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break
    else:
        if word.endswith("ative"):
            if len(word) - 5 >= r1 and len(word) - 5 >= r2:
                word = word[:-5]

    # Step 4 (suffix must lie in R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                word = word[: -len(suf)]
            break
    else:
        if word.endswith("ion"):
            if len(word) - 3 >= r2 and len(word) >= 4 and word[-4] in "st":
                word = word[:-3]

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


_cached_stem = lru_cache(maxsize=1 << 18)(_stem_uncached)


def stem(word: str) -> str:
    """Stem one word (lowercases first, like the reference's stemmer)."""
    return _cached_stem(word)


class Porter2Stemmer:
    """Duck-typed drop-in for the reference's stemmer contract.

    The reference injects any object with a ``.stem(word)`` method
    (``ts_type_filter/inverted_index.py:36-39``); this class satisfies it.
    """

    __slots__ = ()

    def stem(self, word: str) -> str:
        return stem(word)
