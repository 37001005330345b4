"""ciws_server_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference system
(UCHIC/CIWS-Server, surveyed in SURVEY.md): CSV ingest with
metadata-header routing, a time-series table model
(tags/fields/time), the exercised query surface (tag + time-range
selection, time-bucket aggregation, derived-rate window analytics),
plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal column plumbing).

Architecture: everything is declared through the DataFrame/SQL API so
Catalyst owns the physical plan (pushdown, pruning, join selection,
AQE). Python-side logic is restricted to Arrow-batched pandas UDFs in
the few places built-ins cannot express the semantics.
"""

__version__ = "0.2.0"

from . import session, tables  # noqa: F401
