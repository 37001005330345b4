"""CSV ingest sources: the reference's landing-directory dataflow.

``residential`` — 3-metadata-line CSVs (Site/Datalogger/Meter header)
with Raw/QC routing; ``campus`` — 1-junk-line CSVs with a 7-column /
4-column legacy schema fallback; ``sinks`` — partitioned table append,
archive and quarantine routing; ``upload`` — upload acceptance +
token auth (S6/P10); ``sftp_feeder`` — incremental remote-file feeder
(S5/P12/P13).
"""

from . import campus, residential, sftp_feeder, sinks, upload  # noqa: F401
