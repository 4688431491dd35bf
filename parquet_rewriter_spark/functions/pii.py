"""PII detection / redaction — regex scrubbing for training corpora.

Emails/phones/etc. must come out of web-scraped text before training.
Everything here is ``regexp_replace`` / ``regexp_count`` — JVM-side,
whole-stage codegen, no Python in the row path; patterns are chosen to
behave identically under Java regex and RE2-style engines so a DuckDB
oracle can replay them (no backreferences, no lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# simple NANP-ish shapes: optional area code, dash/space/dot separators
PHONE_RE = r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def count_emails(text: Column | str) -> Column:
    return F.regexp_count(F.col(text) if isinstance(text, str) else text, F.lit(EMAIL_RE))


def count_phones(text: Column | str) -> Column:
    return F.regexp_count(F.col(text) if isinstance(text, str) else text, F.lit(PHONE_RE))


def redact(text: Column | str) -> Column:
    """Replace every email/phone with a typed placeholder token.
    Emails first — a phone-shaped digit run inside an email local part
    must not be half-redacted."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    return F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)
