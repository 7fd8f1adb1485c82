"""PII detection / redaction over a text column — RE2-vectorized, streaming.

A core training-data-pipeline stage the reference does not have (its text
handling is per-page extraction only): scrub emails, US-SSN-shaped ids,
phone numbers and IPv4 addresses from document text before training, and
count what was removed per category for corpus QA.

Scale shape: one stateless ``map_batches`` pass, all matching/replacement in
pyarrow's RE2 kernels (``count_substring_regex`` / ``replace_substring_regex``
— C over whole Arrow arrays, zero Python per row). DuckDB uses the same RE2
engine, which is what makes the SQL oracle (`Q_PII_SQL`) bit-exact.

Patterns apply IN ORDER, each counting on the text state produced by the
previous replacement (so a phone never double-counts an already-redacted
SSN); the oracle mirrors the same chain.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["PII_PATTERNS", "redact_pii"]

# (name, RE2 pattern, replacement) — ordered. Email first (its local part can
# contain digits that would half-match the numeric patterns), SSN before
# phone (both are dash-digit shapes), IPv4 last (digits-and-dots only).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IPV4>"),
]


def redact_pii(
    ds: ray.data.Dataset,
    text_column: str = "text",
    out_column: str = "clean_text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> ray.data.Dataset:
    """Append ``out_column`` (text with every PII match replaced by its tag)
    and one int64 ``n_<name>`` count column per pattern."""
    pats = PII_PATTERNS if patterns is None else patterns

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch[text_column]
        for name, pat, rep in pats:
            hits = pc.count_substring_regex(text, pattern=pat)
            text = pc.replace_substring_regex(text, pattern=pat, replacement=rep)
            batch = batch.append_column(f"n_{name}", hits.cast(pa.int64()))
        return batch.append_column(out_column, text)

    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=None)
