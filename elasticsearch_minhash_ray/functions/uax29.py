"""UAX#29 word segmentation — a faithful reimplementation of the ES/Lucene
``standard`` tokenizer (the reference's documented/tested analyzer:
/root/reference/README.md:32-35, MinHashPluginTest.java:80-82).

Semantics (Unicode UAX#29 default word boundaries + Lucene's token typing):
- ASCII/latin words, numbers, ``it's`` / ``example.com`` / ``1,000`` style
  mid-letter/mid-number joins (WB5-WB13b) exactly per the spec;
- Han ideographs and Hiragana have no word-break property → every character
  is its own segment → one token per character (Lucene's IDEOGRAPHIC /
  HIRAGANA types);
- Katakana runs join (WB13); Hangul syllables are ALetter and join (WB5);
- Southeast-Asian scripts (Thai/Lao/Myanmar/Khmer/…) are emitted as runs,
  mirroring Lucene's ComplexContext handling;
- tokens are segments containing at least one letter/digit — punctuation and
  whitespace segments are dropped;
- ``max_token_length`` (ES default 255): longer tokens are split at
  max_token_length intervals, as the ES standard tokenizer documents.

Implementation: vectorized. The whole text converts to a uint32 codepoint
array (one C call), word-break classes come from a lazily built
0x110000-entry lookup table (~0.5 s once per process, from Python's public
``unicodedata``; major WB property ranges from the public Unicode UCD
WordBreakProperty.txt), and all boundary rules evaluate as shifted boolean
array ops — no per-character Python in the hot path.

Approximations (documented): WB3c (ZWJ emoji sequences) and WB15/16
(regional-indicator flags) are not joined — those segments contain no
letters/digits and are dropped from token output either way; a handful of
rare modifier-letter ALetter additions (Sk ranges) are classified Other.
"""

from __future__ import annotations

import re

import numpy as np

# ASCII fast path: on pure-ASCII text the UAX#29 rules collapse exactly to
# this regex — W+ runs (letters/digits/underscore; ExtendNumLet='_' joins by
# WB13a/b) joined by single mid chars with the spec's flank constraints:
# [.':] between LETTERS (MidNumLet/Single_Quote/MidLetter via WB6+WB7),
# [.,;'] between DIGITS (MidNumLet/MidNum/Single_Quote via WB11+WB12).
# Equivalence to the vectorized path is fuzz-pinned in tests.
_ASCII_UAX29_RE = re.compile(
    # tokens must contain >=1 alnum: a pure-underscore run (ExtendNumLet only)
    # is a segment with no letter/digit and is dropped, like any punct segment
    r"(?=_*[0-9A-Za-z])[0-9A-Za-z_]+"
    r"(?:(?:(?<=[A-Za-z])[.':](?=[A-Za-z])|(?<=[0-9])[.,;'](?=[0-9]))[0-9A-Za-z_]+)*"
)

# word-break classes (table values)
OTHER = 0
CR = 1
LF = 2
NL = 3
WSS = 4  # WSegSpace
SQ = 5  # Single_Quote
DQ = 6  # Double_Quote
MIDL = 7  # MidLetter
MIDN = 8  # MidNum
MIDNL = 9  # MidNumLet
NUM = 10  # Numeric
ALET = 11  # ALetter (incl. Hangul)
HLET = 12  # Hebrew_Letter
KATA = 13  # Katakana
EXTNL = 14  # ExtendNumLet
EXT = 15  # Extend
FMT = 16  # Format
ZWJ = 17
SA = 18  # Southeast-Asian complex-context run (Lucene SOUTHEAST_ASIAN)
HAN = 19  # Ideographic: behaves as Other for breaks, but IS a word char
HIRA = 20  # Hiragana: likewise

_SENT = np.uint8(255)

_TABLES: tuple[np.ndarray, np.ndarray] | None = None


def _set(cls: np.ndarray, ranges, value) -> None:
    for r in ranges:
        if isinstance(r, tuple):
            cls[r[0] : r[1] + 1] = value
        else:
            cls[r] = value


def _build_tables() -> tuple[np.ndarray, np.ndarray]:
    """(cls, word): per-codepoint WB class and is-letter-or-digit flag."""
    import unicodedata

    n = 0x110000
    cats = np.array([unicodedata.category(chr(c)) for c in range(n)])
    cls = np.zeros(n, np.uint8)
    # category-level defaults
    cls[np.isin(cats, ["Lu", "Ll", "Lt", "Lm", "Lo", "Nl"])] = ALET
    cls[cats == "Nd"] = NUM
    cls[np.isin(cats, ["Mn", "Mc", "Me"])] = EXT
    cls[cats == "Cf"] = FMT
    cls[cats == "Zs"] = WSS
    # NOTE deliberately excludes "No" (superscripts/fractions like 2-super,
    # 1/2-vulgar): their UAX#29 WB class is Other, and Lucene's standard
    # tokenizer emits no token for them — including them diverged signatures
    # from the reference on such docs (caught in round-2 review)
    word = np.isin(cats, ["Lu", "Ll", "Lt", "Lm", "Lo", "Nl", "Nd"])

    # WB property overrides (public UCD WordBreakProperty.txt, major ranges)
    _set(cls, [0x00A0, 0x2007, 0x202F], OTHER)  # Zs but not WSegSpace
    _set(cls, [0x0D], CR)
    _set(cls, [0x0A], LF)
    _set(cls, [0x0B, 0x0C, 0x85, 0x2028, 0x2029], NL)
    _set(cls, [0x200D], ZWJ)
    _set(cls, [0x200C], EXT)  # ZWNJ
    _set(cls, [0x27], SQ)
    _set(cls, [0x22], DQ)
    _set(cls, [0x3A, 0xB7, 0x387, 0x55F, 0x5F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A], MIDL)
    _set(
        cls,
        [0x2C, 0x3B, 0x37E, 0x60C, 0x60D, 0x66C, 0x7F8, 0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B],
        MIDN,
    )
    _set(cls, [0x2E, 0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E], MIDNL)
    _set(cls, [0x66B], NUM)  # arabic decimal separator
    cls[cats == "Pc"] = EXTNL  # underscore et al.
    _set(cls, [0x202F], EXTNL)  # narrow NBSP
    _set(cls, [0x5F3], ALET)  # hebrew geresh

    # Hebrew letters
    _set(
        cls,
        [(0x5D0, 0x5EA), 0x5EF, 0xFB1D, (0xFB1F, 0xFB28), (0xFB2A, 0xFB36),
         (0xFB38, 0xFB3C), 0xFB3E, (0xFB40, 0xFB41), (0xFB43, 0xFB44), (0xFB46, 0xFB4F)],
        HLET,
    )
    # Katakana (runs join, WB13)
    _set(
        cls,
        [(0x3031, 0x3035), (0x309B, 0x309C), (0x30A0, 0x30FA), (0x30FC, 0x30FF),
         (0x31F0, 0x31FF), (0x32D0, 0x32FE), (0x3300, 0x3357), (0xFF66, 0xFF9D), 0x1B000],
        KATA,
    )
    # Hiragana → its own class, break semantics = Other (per-char tokens)
    _set(cls, [(0x3041, 0x3096), (0x309D, 0x309E), 0x1B001], HIRA)
    # Ideographic (Han): per-char tokens
    _set(
        cls,
        [(0x3006, 0x3007), (0x3021, 0x3029), (0x3038, 0x303A), (0x3400, 0x4DBF),
         (0x4E00, 0x9FFF), (0xF900, 0xFAFF), (0x17000, 0x18AFF), (0x1B170, 0x1B2FF),
         (0x20000, 0x2FA1F), (0x30000, 0x323AF)],
        HAN,
    )
    # Southeast-Asian complex-context scripts: letter codepoints only (their
    # combining marks stay Extend), emitted as runs like Lucene
    sa_ranges = [(0x0E00, 0x0E7F), (0x0E80, 0x0EFF), (0x1000, 0x109F), (0x1780, 0x17FF),
                 (0x1A20, 0x1AAF), (0xA9E0, 0xA9FF), (0xAA60, 0xAA7F), (0xAA80, 0xAADF)]
    for lo, hi in sa_ranges:
        seg = slice(lo, hi + 1)
        is_letter = np.isin(cats[seg], ["Lu", "Ll", "Lt", "Lm", "Lo"])
        sub = cls[seg]
        sub[is_letter] = SA
        cls[seg] = sub
    return cls, word


def _tables() -> tuple[np.ndarray, np.ndarray]:
    """Load the precomputed class tables (tiny .npz artifact generated by
    :func:`_build_tables` — ~7 ms) or rebuild from unicodedata (~0.4 s). The
    artifact avoids paying the build once per Ray worker process; a test pins
    artifact == builder output."""
    global _TABLES
    if _TABLES is None:
        import os

        path = os.path.join(os.path.dirname(__file__), "_uax29_tables.npz")
        try:
            d = np.load(path)
            _TABLES = (d["cls"], d["word"])
        except Exception:
            _TABLES = _build_tables()
    return _TABLES


def _isin(a: np.ndarray, vals) -> np.ndarray:
    out = a == vals[0]
    for v in vals[1:]:
        out |= a == v
    return out


def tokenize_uax29(text: str, max_token_length: int = 255) -> list[str]:
    """UAX#29 word tokens of ``text`` (ES/Lucene standard-tokenizer semantics,
    no lowercasing)."""
    if not text:
        return []
    if text.isascii():  # C-speed check; code corpora are overwhelmingly ASCII
        return _ascii_tokens(text, max_token_length)
    o_start, o_end = _segments(text)
    out: list[str] = []
    for s, t in zip(o_start.tolist(), o_end.tolist()):
        if t - s <= max_token_length:
            out.append(text[s:t])
        else:
            out.extend(text[p : min(p + max_token_length, t)] for p in range(s, t, max_token_length))
    return out


def _ascii_tokens(text: str, max_token_length: int) -> list[str]:
    toks = _ASCII_UAX29_RE.findall(text)
    # overlong prefilter via C-driven max(map(len, ...)): ~15% of tokenize
    # cost. (A regex probe for long runs on the raw text measured 4x slower —
    # bounded repetition rescans; and cProfile wildly inflates generator
    # alternatives, so trust wall-clock, not profiles, here.)
    if max(map(len, toks), default=0) > max_token_length:
        return _split_long(toks, max_token_length)
    return toks


def _split_long(tokens: list[str], max_token_length: int) -> list[str]:
    out: list[str] = []
    for t in tokens:
        if len(t) <= max_token_length:
            out.append(t)
        else:
            out.extend(t[p : p + max_token_length] for p in range(0, len(t), max_token_length))
    return out


def tokenize_uax29_many(texts: list[str | None], max_token_length: int = 255) -> list[list[str]]:
    """Batch tokenization: all texts join into ONE codepoint array (separated
    by NUL, class Other — no boundary rule joins across it, so tokens never
    span documents) and the boundary rules run once over the whole batch —
    amortizing the ~20 vectorized passes across the batch instead of paying
    their fixed overhead per document. Semantics identical to per-doc
    :func:`tokenize_uax29`."""
    n_docs = len(texts)
    clean = [t if t else "" for t in texts]
    big = "\x00".join(clean)
    out: list[list[str]] = [[] for _ in range(n_docs)]
    if not big:
        return out
    if not big.isascii():
        # mixed batch: regex the ASCII docs, batch the rest through the
        # vectorized path (a zh slice must not drag every doc onto it)
        non_ascii = [i for i, t in enumerate(clean) if t and not t.isascii()]
        if len(non_ascii) < n_docs:
            sub = tokenize_uax29_many([clean[i] for i in non_ascii], max_token_length)
            for i, toks in zip(non_ascii, sub):
                out[i] = toks
            for i, t in enumerate(clean):
                if t and t.isascii():
                    out[i] = _ascii_tokens(t, max_token_length)
            return out
    else:
        # ASCII fast path (the common case for code); NUL can't join tokens
        return [_ascii_tokens(t, max_token_length) if t else [] for t in clean]
    o_start, o_end = _segments(big)
    if len(o_start) == 0:
        return out
    # doc d occupies [doc_off[d], doc_off[d] + len_d); separators are Other
    # segments with no word chars, already filtered out of (o_start, o_end)
    lens = np.fromiter((len(t) for t in clean), dtype=np.int64, count=n_docs)
    doc_off = np.concatenate(([0], np.cumsum(lens + 1)))
    which = np.searchsorted(doc_off, o_start, side="right") - 1
    for s, t, d in zip(o_start.tolist(), o_end.tolist(), which.tolist()):
        if t - s <= max_token_length:
            out[d].append(big[s:t])
        else:
            out[d].extend(big[p : min(p + max_token_length, t)] for p in range(s, t, max_token_length))
    return out


def _segments(text: str) -> tuple[np.ndarray, np.ndarray]:
    """(start, end) codepoint offsets of UAX#29 word segments containing at
    least one letter/digit."""
    table, word = _tables()
    try:
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    except UnicodeEncodeError:  # lone surrogates: substitute, keep alignment
        cps = np.frombuffer(
            text.encode("utf-32-le", "replace"), dtype=np.uint32
        )
    cls = table[cps]
    n = len(cps)

    # WB4: X (Extend|Format|ZWJ)* → X. Ignorables collapse onto the previous
    # base char — EXCEPT ignorables at start-of-text or right after a newline
    # (no base to attach to): those stay, classified Other.
    ign = _isin(cls, (EXT, FMT, ZWJ))
    if ign.any():
        nonign = ~ign
        last_base = np.maximum.accumulate(np.where(nonign, np.arange(n), -1))
        base_cls = np.where(last_base >= 0, cls[np.maximum(last_base, 0)], np.int64(CR))
        bare = ign & ((last_base < 0) | _isin(base_cls, (CR, LF, NL)))
        cls = cls.copy()
        cls[bare] = OTHER
        keep = nonign | bare
        eff_cls = cls[keep]
        eff_idx = np.flatnonzero(keep)
    else:
        eff_cls = cls
        eff_idx = None  # identity
    m = len(eff_cls)
    if m == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if m == 1:
        starts = np.array([0], np.int64)
    else:
        e = eff_cls
        L, R = e[:-1], e[1:]
        L2 = np.concatenate(([_SENT], e[:-2])) if m > 2 else np.array([_SENT], np.uint8)
        R2 = np.concatenate((e[2:], [_SENT])) if m > 2 else np.array([_SENT], np.uint8)
        ah_l = (L == ALET) | (L == HLET)
        ah_r = (R == ALET) | (R == HLET)
        ah_l2 = (L2 == ALET) | (L2 == HLET)
        ah_r2 = (R2 == ALET) | (R2 == HLET)
        anum_l = ah_l | (L == NUM)
        anum_r = ah_r | (R == NUM)
        nobreak = (L == WSS) & (R == WSS)  # WB3d
        nobreak |= anum_l & anum_r  # WB5/8/9/10
        nobreak |= ah_l & _isin(R, (MIDL, MIDNL, SQ)) & ah_r2  # WB6
        nobreak |= _isin(L, (MIDL, MIDNL, SQ)) & ah_l2 & ah_r  # WB7
        nobreak |= (L == HLET) & (R == SQ)  # WB7a
        nobreak |= (L == HLET) & (R == DQ) & (R2 == HLET)  # WB7b
        nobreak |= (L == DQ) & (L2 == HLET) & (R == HLET)  # WB7c
        nobreak |= _isin(L, (MIDN, MIDNL, SQ)) & (L2 == NUM) & (R == NUM)  # WB11
        nobreak |= (L == NUM) & _isin(R, (MIDN, MIDNL, SQ)) & (R2 == NUM)  # WB12
        nobreak |= (L == KATA) & (R == KATA)  # WB13
        nobreak |= (anum_l | (L == KATA) | (L == EXTNL)) & (R == EXTNL)  # WB13a
        nobreak |= (L == EXTNL) & (anum_r | (R == KATA))  # WB13b
        nobreak |= (L == SA) & (R == SA)  # Lucene complex-context runs
        # WB3a/3b: always break around newlines (overrides all the above) …
        nobreak &= ~(_isin(L, (CR, LF, NL)) | _isin(R, (CR, LF, NL)))
        nobreak |= (L == CR) & (R == LF)  # … except WB3: CR × LF
        starts = np.concatenate(([0], np.flatnonzero(~nobreak) + 1))

    if eff_idx is None:
        o_start = starts
        o_end = np.concatenate((starts[1:], [n]))
    else:
        o_start = eff_idx[starts]
        o_end = np.concatenate((eff_idx[starts[1:]], [n]))
    # keep segments containing at least one letter/digit
    w = np.concatenate(([0], np.cumsum(word[cps], dtype=np.int64)))
    has_word = (w[o_end] - w[o_start]) > 0
    return o_start[has_word], o_end[has_word]
