"""apmbackend_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the APMBackend reference (an APM stream
processor: log parsing -> transaction correlation -> sliding-window stats ->
smoothed z-score anomaly detection -> debounced alerting -> bulk DB sink),
re-expressed Spark-first (DataFrame / SQL / Catalyst / Structured Streaming)
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Reference semantics are cited per-module as ``file:line`` into the reference
repo (ztaylor797/APMBackend); no reference code is copied.
"""

__version__ = "0.1.0"

from apmbackend_spark.session import get_spark  # noqa: F401
