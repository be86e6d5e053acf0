"""PII / secret redaction — the scrubbing pass a training-data
pipeline runs before text leaves the ingest boundary. Two tiers:
`redact_pii` (a minimal scalar chain in the engine-portable regex
subset — replayable byte-for-byte in Python `re`/RE2/DuckDB) and
`redact_documents` (typed detectors + per-kind audit counts, using
Java-regex lookarounds for precision).

Heuristic, pattern-based, and deliberately conservative: each KIND is
one Java regex applied JVM-side (`regexp_replace` — whole-stage
codegen, no Python in the row path), replaced by a typed placeholder
(`[EMAIL]`, `[IPV4]`, ...) so downstream tokenization sees a stable
token instead of a hole. Per-kind hit counts ride the same
projection via `regexp_count`, giving the audit trail without a
second pass.

These are detector HEURISTICS, not validators (no Luhn check, no DNS
lookup): the failure mode of over-redacting a digit run is an odd
token in training text; the failure mode of under-redacting is a
leak — the patterns err toward the former. Compose with
`operators.quality.run_counters` for corpus-level accounting.

Scale notes (100 TB): a narrow map-side projection — no shuffle, no
UDF, no driver state; regex cost is linear in text bytes and fuses
into whatever scan feeds it. Order of application is fixed (emails
before phones, so a numeric user part is not half-eaten) and
documented in KINDS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Portable scalar chain — the minimal scrub, regex-subset-safe.
# ---------------------------------------------------------------------------

# Order matters: IPv4 before bare digit runs, email first (an email
# can contain digit runs). Patterns are deliberately restricted to a
# regex subset with identical semantics in Java regex, Python `re`,
# and RE2-style engines (no backrefs, no lookaround) — this is the
# variant to use when the same scrub must replay in another engine
# (the DuckDB/`re` oracle contract, tests/test_training.py).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{9,19}\b", "<ID>"),
)


def redact_pii(text: Column | str = "text") -> Column:
    """Chain of regexp_replace calls masking emails, IPv4 addresses,
    and long digit runs (SSN/card/phone-shaped) — the standard
    pre-training scrub pass, in the engine-portable regex subset.
    For typed placeholders, finer detectors, and per-kind audit
    counts, use `redact_documents` below (Java-regex lookarounds —
    NOT RE2-portable).

    Scale notes: pure JVM expression chain inside whole-stage
    codegen; no Python in the path. Differential oracle: the same
    patterns via Python `re.sub` (tests/test_training.py) — kept to
    the engine-portable regex subset so both agree byte-for-byte.
    """
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# ---------------------------------------------------------------------------
# Typed detectors with audit counts — the ingest-boundary scrub.
# ---------------------------------------------------------------------------

# kind -> (java_regex, placeholder). Application order matters and is
# the tuple order below: emails first (their digits must not look
# like phones), cards before phones (a 16-digit run is a card, not
# two phone fragments), IPs before phones (dotted quads contain
# phone-shaped digit runs).
KINDS: tuple[tuple[str, str, str], ...] = (
    ("email",
     r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ipv4",
     r"(?<![\d.])(?:\d{1,3}\.){3}\d{1,3}(?![\d.])",
     "[IPV4]"),
    ("card",
     r"(?<!\d)(?:\d{4}[ \-]){3}\d{4}(?!\d)|(?<!\d)\d{15,16}(?!\d)",
     "[CARD]"),
    ("phone",
     r"(?<!\d)(?:\+\d{1,2}[ .\-]?)?(?:\(\d{3}\)[ .\-]?|\d{3}[ .\-])"
     r"\d{3}[ .\-]\d{4}(?!\d)",
     "[PHONE]"),
    ("idnum",
     # bare 9-14 digit runs (SSN/account/IMEI-shaped — 15-16 went to
     # card above) plus the dashed 3-2-4 SSN form; keeps the legacy
     # redact_pii chain's err-toward-over-redaction coverage for
     # digit runs in the typed tier.
     r"(?<![\d\-])\d{3}-\d{2}-\d{4}(?![\d\-])|(?<!\d)\d{9,14}(?!\d)",
     "[IDNUM]"),
    ("secret",
     # long unbroken base64/hex-ish tokens with at least one digit —
     # API keys, tokens, hashes; the digit requirement spares long
     # natural-language words and identifiers.
     r"(?<![A-Za-z0-9_\-])(?=[A-Za-z0-9_\-]*\d)"
     r"[A-Za-z0-9_\-]{32,}(?![A-Za-z0-9_\-])",
     "[SECRET]"),
)
_BY_KIND = {k: (rx, tok) for k, rx, tok in KINDS}


def redact_col(text: Column | str, kinds=None) -> Column:
    """The redacted text expression: `kinds` (default all, applied in
    KINDS order regardless of the order given) chained as
    regexp_replace."""
    c = F.col(text) if isinstance(text, str) else text
    want = set(_BY_KIND if kinds is None else kinds)
    bad = want - set(_BY_KIND)
    if bad:
        raise ValueError(f"unknown redaction kinds {sorted(bad)}; "
                         f"known: {sorted(_BY_KIND)}")
    for k, rx, tok in KINDS:
        if k in want:
            c = F.regexp_replace(c, F.lit(rx), F.lit(tok))
    return c


def redact_documents(docs: DataFrame, text_col: str = "text",
                     kinds=None, counts: bool = True) -> DataFrame:
    """Replace detected PII/secrets in `text_col` in place; with
    `counts=True` add a `redactions` map<kind, int> of per-row hit
    counts (counted on the ORIGINAL text, in the same projection).
    Counts are independent per kind, so text that two patterns both
    match (rare — the lookarounds mostly disjoint them) counts under
    each; the REPLACEMENT is sequential in KINDS order and consumes.

    One narrow select — every other column passes through untouched.
    """
    want = [k for k, *_ in KINDS
            if kinds is None or k in set(kinds)]
    if kinds is not None:
        bad = set(kinds) - set(_BY_KIND)
        if bad:
            raise ValueError(f"unknown redaction kinds {sorted(bad)}; "
                             f"known: {sorted(_BY_KIND)}")
    others = [c for c in docs.columns if c != text_col]
    out = [*(F.col(c) for c in others),
           redact_col(text_col, want).alias(text_col)]
    if counts:
        out.append(F.map_from_arrays(
            F.array(*[F.lit(k) for k in want]),
            F.array(*[F.regexp_count(F.col(text_col),
                                     F.lit(_BY_KIND[k][0]))
                      for k in want])).alias("redactions"))
    return docs.select(*out)
