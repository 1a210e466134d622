"""PII scrubbing for web-corpus text: emails, phone numbers, and IPv4
addresses replaced with typed placeholder tokens, with per-document
redaction counts.

The standard pre-training scrub pass (the C4/RefinedWeb/ROOTS
pipelines all run a regex PII stage before tokenization). Patterns are
deliberately conservative, anchored forms that mean the same thing in
Java regex (Spark) and RE2 (DuckDB) — no backreferences, no lookahead
— so the oracle replays them verbatim:

  - email: word-ish local part @ dotted domain
  - phone: international-ish +digits/separator runs of >= 9 digits
  - ipv4:  four dotted 1-3 digit groups (word-bounded)

Everything is a regexp_replace / regexp_count chain — JVM-side,
WholeStageCodegen, zero shuffles added on top of the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9][0-9 ()-]{7,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"


def redact_pii(col: Column) -> Column:
    """Text with all three PII classes replaced by placeholder tokens.
    Email runs first so a phone-like digit run inside a local part is
    already gone; IP runs last (an IP is never inside an email after
    the email pass)."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ipv4) found in the raw text, counted in
    the same pass order as redact_pii (phones counted after email
    removal, IPs after both)."""
    after_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    after_phone = F.regexp_replace(after_email, PHONE_RE, PHONE_TOKEN)
    return (
        F.regexp_count(col, F.lit(EMAIL_RE)).cast("bigint"),
        F.regexp_count(after_email, F.lit(PHONE_RE)).cast("bigint"),
        F.regexp_count(after_phone, F.lit(IPV4_RE)).cast("bigint"),
    )


def with_pii_redaction(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean md5, counts, had_pii) per document — the scrub
    stage's audit view. The cleaned text itself is carried as an md5
    digest here to keep the oracle compare narrow; pipelines take
    ``redact_pii`` directly as the column transform."""
    c = F.col(text_col)
    n_email, n_phone, n_ip = pii_counts(c)
    return docs.select(
        F.col("doc_id").cast("bigint"),
        F.md5(redact_pii(c)).alias("clean_md5"),
        n_email.alias("n_emails"),
        n_phone.alias("n_phones"),
        n_ip.alias("n_ipv4"),
        ((n_email + n_phone + n_ip) > 0).alias("had_pii"),
    )


def pii_risk_rollup(pages: DataFrame, host_col: str = "host",
                    text_col: str = "text") -> DataFrame:
    """(host, n_docs, n_pii_docs, n_multi_docs, n_emails, n_phones,
    n_ipv4, pii_rate_bp, multi_rate_bp) — host-grain privacy triage.
    The per-doc signal is not just "has PII" but CO-OCCURRENCE: a page
    carrying two or more identifier classes (email + phone, phone +
    IP) approaches a linkable record — the quasi-identifier
    combination risk behind k-anonymity (Sweeney, "k-anonymity: a
    model for protecting privacy", IJUFKS 2002), categorically worse
    for a training corpus than scattered single identifiers. Hosts
    rank by multi_rate_bp: a contact-directory host scrubs (X17) or
    drops wholesale; a host with stray single emails just redacts.

    Counts reuse ``pii_counts``'s pass order (phones after email
    removal, IPs after both), so per-doc counts match the X17 audit
    row for row. One map-side-combined host groupBy; exchanges carry
    per-doc count triples, never text."""
    c = F.col(text_col)
    n_email, n_phone, n_ip = pii_counts(c)
    n_types = (
        n_email.cast("boolean").cast("int")
        + n_phone.cast("boolean").cast("int")
        + n_ip.cast("boolean").cast("int")
    )
    d = pages.select(
        F.col(host_col).alias("host"),
        n_email.alias("e"), n_phone.alias("p"), n_ip.alias("i"),
        n_types.alias("t"),
    )
    return (
        d.groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("t") > 0).cast("int")).cast("bigint")
            .alias("n_pii_docs"),
            F.sum((F.col("t") >= 2).cast("int")).cast("bigint")
            .alias("n_multi_docs"),
            F.sum("e").cast("bigint").alias("n_emails"),
            F.sum("p").cast("bigint").alias("n_phones"),
            F.sum("i").cast("bigint").alias("n_ipv4"),
        )
        .select(
            "host", "n_docs", "n_pii_docs", "n_multi_docs",
            "n_emails", "n_phones", "n_ipv4",
            F.expr("(10000 * n_pii_docs) div n_docs").cast("bigint")
            .alias("pii_rate_bp"),
            F.expr("(10000 * n_multi_docs) div n_docs").cast("bigint")
            .alias("multi_rate_bp"),
        )
    )
