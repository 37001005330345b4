"""Upload acceptance (S6/P10) + token auth shape, and the full
upload → streaming-ingest handoff."""

from __future__ import annotations

import datetime as dt

import pytest

from ciws_server_spark.sources.upload import (
    UploadRejected,
    check_token,
    make_token,
    save_upload,
)

CSV = """Site #: 0042
Datalogger #: 0007
Meter #: 0001
Time,Pulses
2021-03-01 00:00:04,2
"""


def test_extension_and_path_filtering(tmp_path):
    landing = str(tmp_path / "landing")
    p = save_upload(landing, "data.CSV", b"x")
    assert p.endswith("data.CSV")
    with pytest.raises(UploadRejected, match="extension"):
        save_upload(landing, "notes.txt", b"x")
    with pytest.raises(UploadRejected, match="invalid filename"):
        save_upload(landing, "../escape.csv", b"x")


def test_token_roundtrip_and_hour_window():
    at = dt.datetime(2021, 3, 1, 10, 30, tzinfo=dt.timezone.utc)
    tok = make_token("s3cret", ["a.csv", "b.csv"], at)
    # filename order must not matter; wrong secret/files must fail
    assert check_token("s3cret", ["b.csv", "a.csv"], tok, at)
    assert not check_token("wrong", ["a.csv", "b.csv"], tok, at)
    assert not check_token("s3cret", ["a.csv"], tok, at)
    # previous-hour token still valid; two-hours-old is not
    later = at + dt.timedelta(minutes=45)  # crosses the hour boundary
    assert check_token("s3cret", ["a.csv", "b.csv"], tok, later)
    much_later = at + dt.timedelta(hours=2)
    assert not check_token("s3cret", ["a.csv", "b.csv"], tok, much_later)


def test_upload_to_ingest_handoff(spark, tmp_path):
    from ciws_server_spark.streaming.ingest import run_ingest_pass

    landing = str(tmp_path / "landing")
    save_upload(landing, "field42.csv", CSV.encode())
    table_dir = str(tmp_path / "tables")
    run_ingest_pass(spark, landing, table_dir, str(tmp_path / "ckpt"))
    import os

    raw = spark.read.parquet(os.path.join(table_dir, "raw_data"))
    assert raw.count() == 1
    assert raw.collect()[0]["pulses"] == 2
