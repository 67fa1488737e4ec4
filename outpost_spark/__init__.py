"""outpost_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of hookdeck/outpost.

Subpackages
-----------
- ``functions``  : column-expression builders (time bucketing, topic glob,
  simplejsonmatch filter compiler, cursor codec, backoff math).
- ``logstore``   : the OLAP layer — denormalized events/attempts tables,
  InsertMany semantics, list queries with keyset pagination, and the
  metrics engine (measures/dimensions/filters/granularity + gap fill).
- ``routing``    : event -> destination fan-out (broadcast match join).
- ``streaming``  : Structured Streaming lift (routing stream, log sink,
  retry timers, alert state machine).
- ``ops``        : large-scale training-data pipeline operators (dedup,
  similarity search, text analysis, multimodal columns).

Everything is built on the public PySpark DataFrame/SQL API; reference
semantics are cited per-function as ``file:line`` into the reference repo.
"""

__version__ = "0.1.0"
