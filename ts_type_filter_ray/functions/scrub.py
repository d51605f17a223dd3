"""PII scrubbing — redact emails and IPv4 addresses from document text,
the standard pre-training compliance pass.

Both patterns are RE2 (no lookaround/backrefs), and Arrow's
``replace_substring_regex`` and DuckDB's ``regexp_replace`` are BOTH
RE2-backed, so the engine output is value-exact checkable against the
SQL oracle. One vectorized ``map_batches`` pass, no shuffle, no Python
per row: the regex kernels run over the whole column in C++.

Redaction is sequential (emails first, then IPs on the email-redacted
text) and the counts report replacements actually performed — an IPv4
that only occurs inside an email's domain part is consumed by the email
redaction and not double-counted.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(ds: Dataset) -> Dataset:
    """(doc_id, clean_text, n_emails, n_ips) — redacted text plus the
    number of replacements per category."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_emails = pc.cast(
            pc.count_substring_regex(text, pattern=EMAIL_RE), pa.int64())
        no_email = pc.replace_substring_regex(
            text, pattern=EMAIL_RE, replacement="<EMAIL>")
        n_ips = pc.cast(
            pc.count_substring_regex(no_email, pattern=IPV4_RE),
            pa.int64())
        clean = pc.replace_substring_regex(
            no_email, pattern=IPV4_RE, replacement="<IP>")
        return pa.table({
            "doc_id": batch["doc_id"],
            "clean_text": clean,
            "n_emails": n_emails,
            "n_ips": n_ips,
        })

    return ds.map_batches(fn, batch_format="pyarrow")
