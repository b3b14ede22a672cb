"""Web-corpus scrubbing operators: URL canonicalization and PII redaction.

Engine-new surface (the reference has no corpus-curation path): before a
100 TB crawl is deduplicated or trained on, its URLs must be canonicalized
(the same page is fetched as http/https, with/without www, with tracking
params, with fragments) and its text scrubbed of personal identifiers.

Both operators are pure column expressions (regexp chains inside
WholeStageCodegen — no Python, no UDF) with DuckDB-expressible twins in
`kgforge/driver_queries.py`, so the driver's oracle gate covers them
bit-exactly. The regex rules are deliberately engine-portable (no
lookbehind, no parse_url) so the SAME rule set runs on any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters stripped during canonicalization (public convention:
# Google/Facebook/Microsoft click-tracking junk)
_TRACKING = r"(utm_[a-z]+|fbclid|gclid|msclkid|ref)"

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# international-ish phone: +CC then 2-4 digit groups with optional
# -/space/() separators ("+1 (415) 555-0123"); the leading + keeps the
# rule from eating plain numbers. RE2-compatible (no backrefs) so the
# DuckDB oracle runs the SAME pattern.
_PHONE = r"\+\d{1,3}(?:[-. ]?\(?\d{2,4}\)?){2,4}\b"


def canonical_url(url: Column) -> Column:
    """Canonical form of a crawled URL — the dedup identity.

    Rules (each one regexp_replace, applied in order):

    1. drop the ``#fragment`` (never reaches the server);
    2. lowercase the scheme and host (RFC 3986: both case-insensitive;
       the path is NOT lowercased — it is case-sensitive);
    3. ``http://`` -> ``https://`` (scheme-relative dedup identity);
    4. strip a leading ``www.``;
    5. strip the default port (``:443`` / ``:80`` before / ? or end);
    6. drop tracking query params (utm_*, fbclid, gclid, msclkid, ref),
       then tidy the separators they leave behind (``?&`` -> ``?``,
       ``&&`` -> ``&``, trailing ``?`` / ``&``);
    7. drop ONE trailing slash (including the bare root slash —
       ``…com`` and ``…com/`` are the same resource, and one canonical
       spelling is all dedup needs).
    """
    u = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme://host (group 1 = scheme://, group 2 = host[:port])
    scheme_host = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://)([^/?]*)", 0)
    rest = F.substring(u, F.length(scheme_host) + F.lit(1), F.length(u))
    u = F.concat(F.lower(scheme_host), rest)
    u = F.regexp_replace(u, r"^http://", "https://")
    u = F.regexp_replace(u, r"^(https://)www\.", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/?:]*):(?:443|80)(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"([?&])" + _TRACKING + r"=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"^(https://[^?]+[^/?])/(\?|$)", r"$1$2")
    return u


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_clean"
) -> DataFrame:
    """Redact emails / IPv4 addresses / international phone numbers and
    count what was removed (the audit trail a curation funnel needs).

    Adds ``n_emails`` / ``n_ipv4`` / ``n_phones`` (BIGINT counts of the
    redacted spans) and ``out_col`` with each span replaced by
    ``<EMAIL>`` / ``<IP>`` / ``<PHONE>``. Order matters: emails first
    (an email's host could otherwise be half-eaten by the IP rule),
    then IPs, then phones.
    """
    t = F.col(text_col)
    clean = F.regexp_replace(t, _EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, _IPV4, "<IP>")
    clean = F.regexp_replace(clean, _PHONE, "<PHONE>")
    return df.withColumns(
        {
            "n_emails": F.regexp_count(t, F.lit(_EMAIL)).cast("long"),
            "n_ipv4": F.regexp_count(
                F.regexp_replace(t, _EMAIL, "<EMAIL>"), F.lit(_IPV4)
            ).cast("long"),
            "n_phones": F.regexp_count(
                F.regexp_replace(
                    F.regexp_replace(t, _EMAIL, "<EMAIL>"), _IPV4, "<IP>"
                ),
                F.lit(_PHONE),
            ).cast("long"),
            out_col: clean,
        }
    )
