"""Structured Streaming surface (SURVEY.md §2.9).

``ingest`` — checkpointed file-source ingest with availableNow
trigger, Raw/QC routing, archive/quarantine moves; ``stateful`` —
the session-gap derived-rate operator in streaming form
(applyInPandasWithState) plus watermarked session windows;
``monitor`` — query-progress liveness + alert side-outputs.
"""

from . import ingest, monitor, stateful  # noqa: F401
