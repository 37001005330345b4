"""InfluxQL user management (plans/users.py): the credentials
registry the reference's deployment needs — its clients pass a
database user/password (reference get_hot_intake_interval.py:109-115,
transfer_manager.py:76). Full lifecycle through run_influxql, the
authenticate() hook, and the upstream error/idempotence semantics."""

from __future__ import annotations

import json
import os

import pytest

from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql
from ciws_server_spark.plans.users import authenticate


def _run(spark, td, stmt):
    return run_influxql(spark, {}, stmt, table_dir=td)


def test_user_lifecycle(spark, tmp_path):
    td = str(tmp_path)
    _run(spark, td, "CREATE DATABASE water")
    assert _run(spark, td, "CREATE USER alice WITH PASSWORD 's3cret'") == (
        "alice"
    )
    _run(
        spark, td,
        "CREATE USER admin WITH PASSWORD 'root' WITH ALL PRIVILEGES",
    )

    got = _run(spark, td, "SHOW USERS").collect()
    assert [(r["user"], r["admin"]) for r in got] == [
        ("admin", True),
        ("alice", False),
    ]

    # the hook the front-end calls with the client's credentials
    assert authenticate(td, "alice", "s3cret")
    assert not authenticate(td, "alice", "wrong")
    assert not authenticate(td, "ghost", "s3cret")

    _run(spark, td, "SET PASSWORD FOR alice = 'newpw'")
    assert authenticate(td, "alice", "newpw")
    assert not authenticate(td, "alice", "s3cret")

    # passwords never stored in the clear
    raw = open(os.path.join(td, "_users.json")).read()
    assert "newpw" not in raw and "root" not in raw

    # grants: db-scoped, one privilege per (user, db), upgrade replaces
    _run(spark, td, "GRANT READ ON water TO alice")
    _run(spark, td, "GRANT WRITE ON water TO alice")
    got = _run(spark, td, "SHOW GRANTS FOR alice").collect()
    assert [(r["database"], r["privilege"]) for r in got] == [
        ("water", "WRITE")
    ]
    # revoke is idempotent (no-op on a privilege not held)
    _run(spark, td, "REVOKE ALL ON water FROM alice")
    _run(spark, td, "REVOKE ALL ON water FROM alice")
    assert _run(spark, td, "SHOW GRANTS FOR alice").count() == 0

    # admin toggle via un-scoped ALL PRIVILEGES
    _run(spark, td, "GRANT ALL PRIVILEGES TO alice")
    got = _run(spark, td, "SHOW USERS").collect()
    assert dict((r["user"], r["admin"]) for r in got)["alice"] is True
    got = _run(spark, td, "SHOW GRANTS FOR alice").collect()
    assert got[0]["privilege"] == "ALL PRIVILEGES"
    _run(spark, td, "REVOKE ALL PRIVILEGES FROM alice")

    assert _run(spark, td, "DROP USER alice") is True
    assert [r["user"] for r in _run(spark, td, "SHOW USERS").collect()] == [
        "admin"
    ]


def test_user_named_errors(spark, tmp_path):
    td = str(tmp_path)
    _run(spark, td, "CREATE DATABASE water")
    _run(spark, td, "CREATE USER u WITH PASSWORD 'p'")
    with pytest.raises(InfluxQLError, match="already exists"):
        _run(spark, td, "CREATE USER u WITH PASSWORD 'q'")
    for stmt in (
        "SET PASSWORD FOR ghost = 'x'",
        "DROP USER ghost",
        "GRANT READ ON water TO ghost",
        "SHOW GRANTS FOR ghost",
    ):
        with pytest.raises(InfluxQLError, match="user not found"):
            _run(spark, td, stmt)
    with pytest.raises(InfluxQLError, match="unknown database"):
        _run(spark, td, "GRANT READ ON nosuch TO u")
    with pytest.raises(InfluxQLError, match="database-scoped"):
        _run(spark, td, "GRANT READ TO u")
    with pytest.raises(InfluxQLError, match="requires a table_dir"):
        run_influxql(spark, {}, "SHOW USERS")


def test_user_registry_survives_process_boundary(spark, tmp_path):
    td = str(tmp_path)
    _run(spark, td, "CREATE USER u WITH PASSWORD 'p'")
    # simulate another process: the registry is a file, re-read per call
    state = json.load(open(os.path.join(td, "_users.json")))
    assert set(state) == {"u"}
    assert authenticate(td, "u", "p")


def test_revoke_demotes_all(spark, tmp_path):
    """REVOKE READ from an ALL holder demotes to WRITE (and vice
    versa) — privileges are single-valued per (user, db), upstream."""
    td = str(tmp_path)
    _run(spark, td, "CREATE DATABASE water")
    _run(spark, td, "CREATE USER u WITH PASSWORD 'p'")
    _run(spark, td, "GRANT ALL ON water TO u")
    _run(spark, td, "REVOKE READ ON water FROM u")
    got = _run(spark, td, "SHOW GRANTS FOR u").collect()
    assert [(r["database"], r["privilege"]) for r in got] == [
        ("water", "WRITE")
    ]
    _run(spark, td, "GRANT ALL ON water TO u")
    _run(spark, td, "REVOKE WRITE ON water FROM u")
    got = _run(spark, td, "SHOW GRANTS FOR u").collect()
    assert [(r["database"], r["privilege"]) for r in got] == [
        ("water", "READ")
    ]
