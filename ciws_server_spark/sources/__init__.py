"""CSV ingest sources: the reference's landing-directory dataflow.

``residential`` — 3-metadata-line CSVs (Site/Datalogger/Meter header)
with Raw/QC routing; ``campus`` — 1-junk-line CSVs with a 7-column /
4-column legacy schema fallback; ``sinks`` — partitioned table append,
archive and quarantine routing.
"""

from . import campus, residential, sinks  # noqa: F401
