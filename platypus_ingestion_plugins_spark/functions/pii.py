"""PII detection and redaction as codegen column expressions.

Training-data hygiene: count and scrub personally-identifiable
spans (emails, phone numbers, SSN-shaped ids, IPv4 addresses) before
a corpus is used or shared. Pure ``regexp_count``/``regexp_replace``
expressions — JVM-side, whole-stage-codegen, no UDF — so the pass is
a free rider on whatever scan already touches the text column.

The patterns deliberately use only the regex subset with identical
semantics in Java (Spark) and RE2 (DuckDB/Go): character classes,
bounded quantifiers, no lookaround — so a SQL oracle reproduces the
counts and redactions byte-for-byte. They are calibration-grade, not
exhaustive (production scrubbing layers locale-specific formats on
top); the shape of the pass is what scales, patterns are config.

Redaction replaces left-to-right in a fixed order (email, phone,
SSN, IPv4) — each span is consumed by the first pattern that claims
it, so chained replacement is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java/RE2-common subset only: no lookaround, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"  # intl 2-3-3-4 form
SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

_ORDERED = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (SSN_RE, "<SSN>"),
    (IPV4_RE, "<IP>"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str) -> Column:
    """Per-row PII span counts: struct(n_email, n_phone, n_ssn, n_ip).

    Counts overlap-independent raw pattern hits on the ORIGINAL text
    (an SSN-shaped span inside a longer phone number counts for both
    — counting is an audit signal, redaction is where precedence
    applies)."""
    c = _c(col)
    return F.struct(
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phone"),
        F.regexp_count(c, F.lit(SSN_RE)).alias("n_ssn"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ip"),
    )


def redact_pii(col: Column | str) -> Column:
    """Text with every PII span replaced by its placeholder token, in
    the fixed email -> phone -> SSN -> IPv4 order."""
    out = _c(col)
    for pat, token in _ORDERED:
        out = F.regexp_replace(out, pat, token)
    return out


# 16-digit payment-card shapes, optionally 4-4-4-4 grouped by '-' or
# ' '. Non-capturing group only (Java/RE2-common); no lookaround, so a
# card inside a LONGER digit run can match its first 16 digits —
# checksum validation is what keeps that from mattering in practice.
CC_RE = r"[0-9]{4}(?:[- ]?[0-9]{4}){3}"


def _luhn_valid(s: Column) -> Column:
    """Pure-codegen Luhn checksum over a candidate span: strip
    separators, reverse, double every second digit from the right
    (minus 9 when > 9), valid iff 16 digits and sum % 10 == 0. The
    sum only evaluates inside the length-16 branch, so the degenerate
    empty-digits case never touches Spark's descending
    sequence(1, 0)."""
    rs = F.reverse(F.regexp_replace(s, r"[^0-9]", ""))

    def term(i):
        d = F.ascii(F.substring(rs, i, F.lit(1))) - F.lit(48)
        dbl = d * 2
        return F.when(
            (i - 1) % 2 == 1, F.when(dbl > 9, dbl - 9).otherwise(dbl)
        ).otherwise(d)

    total = F.aggregate(
        F.sequence(F.lit(1), F.length(rs)),
        F.lit(0),
        lambda acc, i: acc + term(i),
    )
    return F.when(F.length(rs) == 16, total % 10 == 0).otherwise(F.lit(False))


def cc_count(col: Column | str) -> Column:
    """Number of Luhn-VALID card-shaped spans — pattern hits that fail
    the checksum (order ids, random digit runs) don't count; that's
    the precision step a bare regex can't give."""
    cands = F.regexp_extract_all(_c(col), F.lit(CC_RE), F.lit(0))
    return F.size(F.filter(cands, _luhn_valid))


def redact_cc(col: Column | str) -> Column:
    """Text with every Luhn-valid card span replaced by <CC>.
    Conditional redaction can't be a regexp_replace (the checksum
    isn't regular), so the valid candidate list folds over the text
    with literal replace() — still one codegen expression, no UDF;
    checksum-failing spans are left untouched."""
    c = _c(col)
    valid = F.filter(
        F.regexp_extract_all(c, F.lit(CC_RE), F.lit(0)), _luhn_valid
    )
    return F.aggregate(
        valid, c, lambda acc, s: F.replace(acc, s, F.lit("<CC>"))
    )
