"""PII scrubbing for training corpora (CCNet/Dolma-style masking).

Large-scale pretraining pipelines mask emails, IP addresses and
phone numbers before packing; this is that operator as pure JVM
column expressions (``regexp_extract_all`` for counts,
``regexp_replace`` for masking) — whole-stage codegen, no shuffle,
row-local, the same 100 TB shape as chunking.

The regex surface is deliberately dialect-neutral: plain character
classes and counted repetition only — no lookaround, no ``\\d``
shorthand, no backreferences — so the SAME pattern strings behave
identically under Java regex (Spark executors), RE2 (DuckDB oracle)
and Python ``re`` (tests).  That is what lets the contract gate the
operator hash-exact instead of settling for a rows-only check.

Masking order: emails first (``u@1.2.3.4.com`` is one email whose
domain CONTAINS a dotted quad — it must mask as ``<EMAIL>``, not as
an email fragment around ``<IP>``), then IPs, then phones.  A bare
``x@1.2.3.4`` is not an email at all (the TLD segment requires
letters); its dotted quad masks as an IP.  Counts are computed on the ORIGINAL text per pattern,
independently — deterministic in every engine because the patterns
are one-pass greedy with leftmost-first, non-overlapping matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
IPV4_RE = "[0-9][0-9]?[0-9]?[.][0-9][0-9]?[0-9]?[.]" \
    "[0-9][0-9]?[0-9]?[.][0-9][0-9]?[0-9]?"
PHONE_RE = "[+][0-9]{7,15}"

EMAIL_MASK = "<EMAIL>"
IP_MASK = "<IP>"
PHONE_MASK = "<PHONE>"


def scrub_pii(
    docs: DataFrame,
    *,
    id_col: str = "docid",
    text_col: str = "content",
) -> DataFrame:
    """(id, text) -> (id, n_emails, n_ips, n_phones, scrubbed).

    Counts are per original text; ``scrubbed`` masks in
    email -> IP -> phone order."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    masked = F.regexp_replace(t, EMAIL_RE, EMAIL_MASK)
    masked = F.regexp_replace(masked, IPV4_RE, IP_MASK)
    masked = F.regexp_replace(masked, PHONE_RE, PHONE_MASK)
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0))).cast("int")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))).cast("int")
        .alias("n_phones"),
        masked.alias("scrubbed"),
    )
