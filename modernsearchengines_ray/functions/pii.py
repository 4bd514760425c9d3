"""PII redaction kernels — training-data curation beyond the reference.

Scrubs the three classic identifier families (emails, IPv4 addresses,
phone-like digit runs) from a text column.  All three patterns are
RE2-compatible, which matters twice over: pyarrow's
``replace_substring_regex`` / ``count_substring_regex`` compute them
as vectorized Arrow kernels (zero Python in the hot path), and DuckDB's
``regexp_replace(..., 'g')`` is RE2 too, so the driver's SQL oracle can
express the exact same scrub for the correctness gate.

Redaction is SEQUENTIAL — email, then IPv4, then phone — and each
stage's match count is taken on that stage's *input* text, so an IPv4
that was already collapsed to ``<IP>`` can't also be double-counted as
a phone-like digit run.  The placeholders contain no digits or ``@``,
so a later pattern can never match inside an earlier replacement.

The reference has no PII handling (it crawls and indexes raw pages);
this module is part of the LLM-training-data extension family
(SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

import re

#: RFC-ish mailbox: local part @ dotted domain with an alpha TLD.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: Dotted quad framed by word boundaries (no octet range check — the
#: scrub errs on the side of redacting 999.999.999.999 too).
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
#: Digit run with -, space, ( ) separators, >= 8 chars end-to-end,
#: optional leading +.
PHONE_RE = r"\+?\d[\d() -]{6,}\d"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

_EMAIL = re.compile(EMAIL_RE)
_IPV4 = re.compile(IPV4_RE)
_PHONE = re.compile(PHONE_RE)


def redact_pii(text: str) -> tuple[str, int, int, int]:
    """Pure single-string kernel (unit tests / non-Arrow callers).

    Returns ``(redacted_text, n_emails, n_ips, n_phones)`` with the
    same sequential semantics as the vectorized Arrow path in
    ``pipelines.driver_queries.q_pii_redact``.
    """
    n_emails = len(_EMAIL.findall(text))
    t1 = _EMAIL.sub(EMAIL_TOKEN, text)
    n_ips = len(_IPV4.findall(t1))
    t2 = _IPV4.sub(IP_TOKEN, t1)
    n_phones = len(_PHONE.findall(t2))
    t3 = _PHONE.sub(PHONE_TOKEN, t2)
    return t3, n_emails, n_ips, n_phones
