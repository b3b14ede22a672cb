"""String codecs from the reference's helpers (SURVEY §2.8 F1/F2).

- `strip_json_fences`: the regex part of `extract_json`
  (/root/reference/graphrag_sdk/helpers.py:9-19) — remove ```json fences
  around a model response before parsing. The reference follows with
  `fix_busted_json.repair_json`; the engine's extraction emits typed columns
  so repair never applies on the hot path, and the fence-strip + parse is a
  pure column expression.
- `strip_cypher_fences`: `extract_cypher` (helpers.py:69-77).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_JSON_FENCE = r"(?s)```(?:json)?\s*(.*?)\s*```"
_CYPHER_FENCE = r"(?s)```(?:cypher)?\s*(.*?)\s*```"


def strip_json_fences(col: Column) -> Column:
    """Return fenced content if present, else the trimmed input."""
    extracted = F.regexp_extract(col, _JSON_FENCE, 1)
    return F.when(extracted != "", extracted).otherwise(F.trim(col))


def strip_cypher_fences(col: Column) -> Column:
    extracted = F.regexp_extract(col, _CYPHER_FENCE, 1)
    return F.when(extracted != "", extracted).otherwise(F.trim(col))


# F8: the reference's date convention is prompt-enforced "YYYY-MM-DD"
# (prompts.py:240,346); the engine normalizes common surface formats to it.
_DATE_FORMATS = [
    ("yyyy-MM-dd", r"^\d{4}-\d{2}-\d{2}$"),
    ("MM/dd/yyyy", r"^\d{2}/\d{2}/\d{4}$"),
    ("dd.MM.yyyy", r"^\d{2}\.\d{2}\.\d{4}$"),
    ("MMMM d, yyyy", r"^[A-Z][a-z]+ \d{1,2}, \d{4}$"),
]


def normalize_date(col: Column) -> Column:
    """Best-effort date-string normalization to YYYY-MM-DD (F8).

    Recognized surface formats parse via `try_to_date` (never throws under
    ANSI mode); unrecognized values pass through untouched — the reference
    carries dates as plain strings, so pass-through is the compatible
    fallback, not null.
    """
    trimmed = F.trim(col)
    candidates = [
        F.when(
            trimmed.rlike(pattern)
            & F.try_to_date(trimmed, fmt).isNotNull(),
            F.date_format(F.try_to_date(trimmed, fmt), "yyyy-MM-dd"),
        )
        for fmt, pattern in _DATE_FORMATS
    ]
    return F.coalesce(*candidates, trimmed)


def stringify_graph_response(response) -> str:
    """F4: render a graph-query result for LLM/chat context (the QA-path
    formatting of ref helpers.stringify_falkordb_response:52-66).

    Accepts the engine's row shapes: a DataFrame (collected driver-side —
    this is chat-context formatting, never a data-plane operator), a list
    of Rows/lists/tuples, or a scalar. Reference semantics: a non-list or
    empty input stringifies wholesale; a list of lists stringifies each
    cell first, so nested graph values render stably.
    """
    from pyspark.sql import DataFrame, Row

    if isinstance(response, DataFrame):
        response = [list(r) for r in response.collect()]
    if not isinstance(response, list) or len(response) == 0:
        return str(response).strip()
    rows = []
    saw_nested = isinstance(response[0], (list, tuple, Row))
    if not saw_nested:
        return str(response).strip()
    for row in response:
        if isinstance(row, (list, tuple, Row)):
            rows.append([str(v) for v in row])
        else:
            rows.append(str(row))
    return str(rows).strip()
