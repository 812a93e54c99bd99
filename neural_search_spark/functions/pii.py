"""PII scrubbing for web-corpus curation — all JVM-side regex, no Python.

Standard pre-training hygiene (the C4/RefinedWeb pipelines redact or drop
personally identifying strings before anything else sees the text): emails,
IPv4 addresses, and phone-shaped digit runs are replaced with typed
placeholder tokens. Every pattern is dialect-portable (plain character
classes + non-capturing groups — no lookarounds, no backreferences), so the
driver's DuckDB oracle applies byte-identical regexes and the outputs agree
exactly; the expressions are codegen'd ``regexp_replace`` columns that fuse
into the scan stage, so at 10^12 docs scrubbing runs at scan speed with zero
shuffles.

Redaction is ordered email -> IP -> phone, and each count is measured on the
text as redacted so far: an IPv4 is also a phone-shaped digit run, so
counting phones on the raw text would double-report. The placeholders are
plain ``<EMAIL>``/``<IP>``/``<PHONE>`` (reference-free tokens a tokenizer
keeps intact).

Patterns are deliberately recall-leaning and simple (the industry-standard
naive forms); swapping in stricter ones is a constant change on both the
Spark and oracle sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
PHONE_RE = "\\+?[0-9][0-9()\\-\\s.]{6,}[0-9]"

EMAIL_TOKEN, IP_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("long")


def scrub_pii(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_phones).

    ``clean_text`` has every match replaced by its placeholder; the counts
    are per-stage (phone counted AFTER email/IP redaction — see module
    docstring). Pure column expressions: Catalyst fuses the whole scrub into
    the scan's codegen stage.
    """
    raw = F.col(text_col)
    after_email = F.regexp_replace(raw, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TOKEN)
    after_phone = F.regexp_replace(after_ip, PHONE_RE, PHONE_TOKEN)
    return corpus.select(
        F.col(id_col).alias("doc_id"),
        after_phone.alias("clean_text"),
        _count(raw, EMAIL_RE).alias("n_emails"),
        _count(after_email, IPV4_RE).alias("n_ips"),
        _count(after_ip, PHONE_RE).alias("n_phones"),
    )
