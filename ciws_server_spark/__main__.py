"""Deployment entry points: ``python -m ciws_server_spark <cmd>``.

The reference runs as three systemd services plus cron jobs
(doc/deployment_guide.md): an HTTP front, a cron'd loader, and the
transfer manager with its satellite jobs. These subcommands are the
drop-in equivalents, each a thin shell over the engine functions the
tests drive:

    serve           InfluxDB 1.x wire API (/ping /query /write) —
                    what the reference's clients point at
    ingest-pass     one cron-equivalent residential CSV pass
                    (landing → tables, archive/quarantine replay)
    derived-pass    one derived-rate pass (the A5 analytic,
                    checkpointed GroupState across runs)
    tick            the maintenance cron tick: due continuous
                    queries + retention-policy enforcement

Every subcommand takes ``--tables DIR`` (the store root). Wall-clock
enters ONLY here — the library layer stays deterministic-clock."""

from __future__ import annotations

import argparse
import datetime as dt
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ciws_server_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("serve", help="InfluxDB 1.x wire API")
    s.add_argument("--tables", required=True)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8086)
    s.add_argument("--database")

    s = sub.add_parser("ingest-pass", help="one residential CSV pass")
    s.add_argument("--tables", required=True)
    s.add_argument("--landing", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--archive")
    s.add_argument("--quarantine")

    s = sub.add_parser("derived-pass", help="one derived-rate pass")
    s.add_argument("--tables", required=True)
    s.add_argument("--checkpoint", required=True)

    s = sub.add_parser("tick", help="CQ + retention maintenance tick")
    s.add_argument("--tables", required=True)
    s.add_argument(
        "--compact-threshold",
        type=int,
        default=0,
        help="auto-compact any table whose visible file count is at "
        "or over this bound (0 = off); keeps the O(#files) "
        "append-time manifest walk bounded (BENCH_NOTES §52: "
        "compact before ~1M files)",
    )

    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark(f"ciws-{args.cmd}")
    if args.cmd == "serve":
        from .sources.http_api import InfluxHTTPApi, serve

        api = InfluxHTTPApi(spark, args.tables, database=args.database)
        srv = serve(api, host=args.host, port=args.port)
        host, port = srv.server_address
        print(f"ciws wire API on http://{host}:{port}", flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:  # pragma: no cover
            pass
        return 0
    if args.cmd == "ingest-pass":
        from .streaming.ingest import run_ingest_pass

        run_ingest_pass(
            spark,
            args.landing,
            args.tables,
            args.checkpoint,
            archive_dir=args.archive,
            quarantine_dir=args.quarantine,
        )
        return 0
    if args.cmd == "derived-pass":
        from .streaming.ingest import run_derived_pass

        run_derived_pass(spark, args.tables, args.checkpoint)
        return 0
    if args.cmd == "tick":
        from .plans.continuous import run_due_continuous_queries
        from .plans.retention import enforce_retention
        from .sources import sinks

        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        tables = sinks.load_tables(spark, args.tables)
        ran = run_due_continuous_queries(spark, tables, args.tables, now)
        dropped = enforce_retention(spark, args.tables, now)
        compacted = sinks.auto_compact(
            spark, args.tables, args.compact_threshold
        )
        print(
            f"tick: cqs={ran!r} retention={dropped!r} "
            f"compacted={compacted!r}",
            flush=True,
        )
        return 0
    return 2  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
