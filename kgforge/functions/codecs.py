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
