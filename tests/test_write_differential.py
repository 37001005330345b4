"""/write differential fuzz (r12): generated line-protocol batches
against an INDEPENDENT Python model of the documented write contract.

The wire fuzz (tools/experiments/wire_fuzz_run.py) proves the layer
never 500s; this asserts the accepted writes store the RIGHT rows:

* per-(measurement, field) type inference from value syntax
  (``10i`` → bigint, quoted → string, t/true/f/false → boolean,
  bare → double), stable across the whole run (the generator fixes a
  global type per key — cross-type writes are the conflict tests);
* precision rescale to nanoseconds (whole-second timestamps, so the
  ns→µs storage step is exact);
* EVERY tag persists as a string column (r12 contract), absent tags
  are null; partition tags keep working;
* duplicate field key within one line: LAST value wins (upstream);
* one stored row per accepted line (append model — point-identity
  dedupe is deferred maintenance, the documented divergence);
* fields a measurement gains later read back null on earlier rows.

The model accumulates expected rows per measurement; ONE read-back
at the end compares multisets exactly.
"""

from __future__ import annotations

import random

import pytest

from ciws_server_spark.sources import sinks
from ciws_server_spark.sources.http_api import InfluxHTTPApi

_PRECISIONS = {"ns": 10**9, "u": 10**6, "ms": 10**3, "s": 1}
_MEASUREMENTS = ["campus_flow", "wm_diff", "weather_diff"]
_TAG_KEYS = ["buildingID", "host", "site"]
#: fixed global type per field key — cross-type conflicts are tested
#: separately (the engine 400s them)
_FIELD_TYPES = {
    "f1": "float", "f2": "integer", "f3": "string", "f4": "boolean",
    "flowRate": "float",
}


def _gen_value(r: random.Random, ftype: str) -> tuple[str, object]:
    if ftype == "float":
        v = round(r.uniform(-1000, 1000), 3)
        return repr(v), v
    if ftype == "integer":
        v = r.randint(-10**12, 10**12)
        return f"{v}i", v
    if ftype == "string":
        v = f"s{r.randint(0, 999)}"
        return f'"{v}"', v
    v = r.random() < 0.5
    return r.choice(["t", "true"] if v else ["f", "false"]), v


def _gen_batch(r: random.Random):
    """One /write call: (params, body, expected rows).

    Expected row: (measurement, ts_seconds, tags dict, fields dict).
    """
    prec = r.choice(list(_PRECISIONS))
    mult = _PRECISIONS[prec]
    lines, expected = [], []
    for _ in range(r.randint(1, 5)):
        m = r.choice(_MEASUREMENTS)
        tags = {
            k: f"{k[0].upper()}{r.randint(0, 3)}"
            for k in r.sample(_TAG_KEYS, r.randint(0, 3))
        }
        fkeys = r.sample(sorted(_FIELD_TYPES), r.randint(1, 3))
        pairs, fields = [], {}
        for k in fkeys:
            lit, val = _gen_value(r, _FIELD_TYPES[k])
            pairs.append(f"{k}={lit}")
            fields[k] = val
        if r.random() < 0.15:
            # duplicate field key in one line: LAST wins
            k = r.choice(fkeys)
            lit, val = _gen_value(r, _FIELD_TYPES[k])
            pairs.append(f"{k}={lit}")
            fields[k] = val
        ts_s = 1704067200 + r.randint(0, 10_000_000)
        tag_str = "".join(f",{k}={v}" for k, v in sorted(tags.items()))
        lines.append(
            f"{m}{tag_str} {','.join(pairs)} {ts_s * mult}"
        )
        expected.append((m, ts_s, tags, fields))
    return {"precision": prec}, "\n".join(lines).encode(), expected


def _normalize(row, tag_keys, field_keys):
    tags = tuple(
        (k, row[k]) for k in tag_keys if row.get(k) is not None
    )
    fields = tuple(
        (k, row[k]) for k in field_keys if row.get(k) is not None
    )
    return tags, fields


def test_write_differential(spark, tmp_path):
    r = random.Random(20260816)
    api = InfluxHTTPApi(spark, str(tmp_path))
    model: dict[str, list] = {m: [] for m in _MEASUREMENTS}
    n_batches = 40
    for _ in range(n_batches):
        params, body, expected = _gen_batch(r)
        status, resp = api.handle_write(params, body)
        assert status == 204, (resp, body)
        for m, ts_s, tags, fields in expected:
            model[m].append((ts_s, tags, fields))

    import datetime as dt

    for m, exp_rows in model.items():
        if not exp_rows:
            continue
        got = [
            row.asDict()
            for row in sinks.read_table(spark, str(tmp_path), m).collect()
        ]
        assert len(got) == len(exp_rows), m
        got_norm = sorted(
            (
                int(
                    row["time"]
                    .replace(tzinfo=dt.timezone.utc)
                    .timestamp()
                ),
                _normalize(row, _TAG_KEYS, sorted(_FIELD_TYPES)),
            )
            for row in got
        )
        exp_norm = sorted(
            (
                ts_s,
                (
                    tuple(sorted(tags.items())),
                    tuple(sorted(fields.items())),
                ),
            )
            for ts_s, tags, fields in exp_rows
        )
        for g, e in zip(got_norm, exp_norm):
            assert g[0] == e[0], (m, g, e)
            g_tags, g_fields = g[1]
            e_tags, e_fields = e[1]
            assert dict(g_tags) == dict(e_tags), (m, g, e)
            # float compare exact: repr round-trips through the
            # double parse on both sides
            assert dict(g_fields) == dict(e_fields), (m, g, e)


def test_write_cross_batch_type_conflict(spark, tmp_path):
    """A field whose type conflicts with the TABLE's recorded type is
    upstream's 400 'field type conflict' (r12 SchemaConflict
    mapping), and the store keeps the original typed column."""
    api = InfluxHTTPApi(spark, str(tmp_path))
    status, _ = api.handle_write(
        {"precision": "s"}, b"conf_m f=1.5 1704067200\n"
    )
    assert status == 204
    status, resp = api.handle_write(
        {"precision": "s"}, b"conf_m f=2i 1704067260\n"
    )
    assert status == 400 and "conflict" in resp["error"]
    got = sinks.read_table(spark, str(tmp_path), "conf_m").collect()
    assert [r["f"] for r in got] == [1.5]
