"""PII detection and redaction column expressions.

A corpus destined for LLM training gets a scrub pass for personally
identifying strings: emails, IPv4 addresses, phone-shaped numbers.
Pure ``regexp_replace``/``regexp_count`` chains — JVM-side, inside
whole-stage codegen, no Python in the row path; at 100 TB this is a
mapper-only stage fused into the scan.

Patterns deliberately use the portable regex subset (character
classes, bounded quantifiers, ``\\b``, non-capturing groups) that
means the same thing to Java regex (Spark), RE2 (DuckDB oracle), and
Python ``re`` (tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

# Redaction order matters: emails first (they contain dots/digits that
# the other patterns could partially claim), then IPs (all-digit dotted
# quads must not be left for the phone pattern), then phones.
_ORDERED: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def redact_pii(text: Column | str) -> Column:
    """Replace every email/IPv4/phone occurrence with a typed placeholder."""
    out = _col(text)
    for pattern, token in _ORDERED:
        out = F.regexp_replace(out, pattern, token)
    return out


def email_count(text: Column | str) -> Column:
    return F.regexp_count(_col(text), F.lit(EMAIL_RE))


def ipv4_count(text: Column | str) -> Column:
    return F.regexp_count(_col(text), F.lit(IPV4_RE))


def phone_count(text: Column | str) -> Column:
    """Counted on the email+IP-redacted text so the three counts add up
    to the number of placeholders redact_pii emits (an IP is never
    double-counted as a phone)."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(_col(text), EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return F.regexp_count(scrubbed, F.lit(PHONE_RE))
