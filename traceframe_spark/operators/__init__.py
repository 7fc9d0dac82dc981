"""Engine operators: trace/span table construction, critical path, assembly,
and the large-scale data-pipeline operators (dedup, similarity, text,
multimodal)."""

from traceframe_spark.operators.spans import spans_table, with_tag_columns
from traceframe_spark.operators.traces import traces_table
from traceframe_spark.operators.critical_path import critical_path_segments

__all__ = [
    "spans_table",
    "with_tag_columns",
    "traces_table",
    "critical_path_segments",
]
