"""Large-scale training-data pipeline operators (net-new vs the reference;
SURVEY.md §2.8 / §7 phase 4): deduplication, similarity search, text
analysis, multimodal column plumbing.

Design rule: everything is built from ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no row-at-a-time Python. Pandas UDFs only where the
semantics genuinely need numpy (none so far; multimodal decode is stubbed).
"""

from . import (curation, dedup, multimodal, rangejoin,  # noqa: F401
               similarity, text)
