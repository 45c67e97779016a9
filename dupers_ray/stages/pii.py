"""PII scrubbing: redact emails / phone numbers / IPv4 addresses.

Standard pre-training hygiene (C4/Dolma pipelines scrub contact PII
before anything else sees the text). Pure Arrow RE2 kernels —
``replace_substring_regex`` for the rewrite and ``count_substring_regex``
for the per-doc hit counts — so the stage is a stateless vectorized
``map_batches`` with no Python in the row path, and every pattern is
restatable in DuckDB (also RE2) for the driver oracle.

Patterns are deliberately conservative (precision over recall): a missed
rare format costs little; mangling non-PII text costs a training doc.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ordered: emails first (their dotted hosts would otherwise be eaten by
# the IP pattern's digit runs never — but order is still fixed for
# determinism), then IPs, then phones
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii(
    batch: pa.Table,
    *,
    text_col: str = "text",
    out_col: str = "text_redacted",
    count_cols: bool = True,
) -> pa.Table:
    """Append ``out_col`` with all PII spans replaced by typed tags, and
    (optionally) one ``n_<kind>`` int64 column per pattern. Null text
    stays null with zero counts."""
    s = batch.column(text_col)
    out = batch
    if count_cols:
        for kind, pat, _ in PII_PATTERNS:
            c = pc.count_substring_regex(s, pat)
            out = out.append_column(
                f"n_{kind}", pc.fill_null(pc.cast(c, pa.int64()), 0)
            )
    red = s
    for _, pat, tag in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pattern=pat, replacement=tag)
    return out.append_column(out_col, red)
