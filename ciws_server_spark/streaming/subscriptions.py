"""Subscription write-forwarding: deliver each write batch to the
destinations registered with ``CREATE SUBSCRIPTION`` (plans/admin.py).

Upstream InfluxDB duplicates every accepted write to each
subscription endpoint (the Kapacitor feed). Here the delivery unit is
the ingest micro-batch: compose :func:`forward_batch` into a
``foreachBatch`` (or call it after a batch append) and each batch is
rendered to line protocol (plans/line_protocol.render_lines — native
column functions, scan-bound) and POSTed.

Scale shape: rendering is a projection of the batch (no shuffle, no
driver collect); posting happens EXECUTOR-SIDE via ``mapInPandas`` —
each partition posts its own chunk, so a 1000-executor ingest fans
out its subscription traffic from the executors that hold the rows,
never through the driver. The returned counts frame is the only
thing collected (one row per partition × destination).

Destination transports:
* ``http(s)://...`` — stdlib urllib POST of the newline-joined lines
  (InfluxDB ``/write`` body format);
* ``file:///dir`` — drop each chunk as a unique ``.lp`` file in the
  directory (deterministic name: batch ‖ partition ‖ payload hash).
  The durable/testing transport — also what a downstream Spark job
  can re-ingest via plans/line_protocol.parse_lines.

Modes, as upstream: ``ALL`` posts every batch to every destination;
``ANY`` load-balances — deterministic round-robin by batch id, so a
re-run of the same batch sequence picks the same destinations (the
engine's no-RNG determinism contract).

Delivery is BEST-EFFORT, as upstream's subscriber service: an
unreachable or erroring endpoint never fails the write — the chunk
for that destination is dropped and counted (``failed_posts`` in the
returned totals), mirroring upstream's drop-and-log when its
subscriber buffer can't deliver. Within a healthy endpoint the
contract is at-least-once per micro-batch (batch replay re-posts),
with deterministic chunk names making file:// re-delivery idempotent.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, functions as F

from ..plans.admin import _subs_load
from ..plans.line_protocol import render_lines


def _post_chunk(url: str, payload: bytes, batch_id: int, pid: int) -> None:
    if url.startswith("file://"):
        root = url[len("file://"):]
        os.makedirs(root, exist_ok=True)
        digest = hashlib.sha256(payload).hexdigest()[:12]
        name = f"b{batch_id:08d}_p{pid:05d}_{digest}.lp"
        tmp = os.path.join(root, "." + name + ".tmp")
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, os.path.join(root, name))
        return
    import urllib.request

    req = urllib.request.Request(
        url.rstrip("/") + "/write",
        data=payload,
        headers={"Content-Type": "text/plain; charset=utf-8"},
    )
    with urllib.request.urlopen(req, timeout=10.0) as resp:
        resp.read()


def batch_destinations(subs: dict, batch_id: int) -> list[str]:
    """Resolve the destination list for one batch: ALL subscriptions
    contribute every destination; ANY subscriptions contribute one,
    round-robin by batch id (deterministic load balancing)."""
    dests: list[str] = []
    for _key, rec in sorted(subs.items()):
        urls = rec["destinations"]
        if not urls:
            continue
        if rec["mode"] == "ALL":
            dests.extend(urls)
        else:
            dests.append(urls[batch_id % len(urls)])
    # de-dup while preserving order: two subscriptions naming the
    # same endpoint should not double-post one batch
    seen: set[str] = set()
    return [u for u in dests if not (u in seen or seen.add(u))]


def forward_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    table_dir: str,
    measurement: str,
    tag_cols: list[str],
    field_cols: list[str],
    time_col: str = "time",
) -> dict:
    """Render one write batch as line protocol and deliver it to
    every subscription destination. Returns
    ``{"destinations": D, "posts": P, "lines": L}`` (posts = chunks
    actually sent: non-empty partitions × destinations)."""
    subs = _subs_load(table_dir)
    dests = batch_destinations(subs, batch_id)
    if not dests:
        return {"destinations": 0, "posts": 0, "lines": 0}
    lines = render_lines(
        batch_df, measurement, tag_cols, field_cols, time_col
    ).select("line")

    def send(iterator):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = [pdf for pdf in iterator if len(pdf)]
        if not chunks:
            yield pd.DataFrame(
                {"posts": [0], "lines": [0], "failed": [0]}
            )
            return
        body = "\n".join(
            s for pdf in chunks for s in pdf["line"].tolist()
        )
        payload = (body + "\n").encode()
        n_lines = sum(len(pdf) for pdf in chunks)
        posts = 0
        failed = 0
        for url in dests:
            try:
                _post_chunk(url, payload, batch_id, pid)
                posts += 1
            except Exception:
                # an unreachable/erroring endpoint NEVER fails the
                # write — upstream's subscriber service drops and
                # logs when it can't deliver (buffer overflow has
                # the same contract); the failure surfaces in the
                # returned counts, not as a write error
                # (wire-fuzz-found, r12: a dead http:// destination
                # 500'd the whole /write)
                failed += 1
        yield pd.DataFrame(
            {"posts": [posts], "lines": [n_lines * posts],
             "failed": [failed]}
        )

    totals = (
        lines.mapInPandas(send, "posts long, lines long, failed long")
        .agg(
            F.sum("posts").alias("p"),
            F.sum("lines").alias("l"),
            F.sum("failed").alias("f"),
        )
        .first()
    )
    return {
        "destinations": len(dests),
        "posts": int(totals["p"] or 0),
        "lines": int(totals["l"] or 0),
        "failed_posts": int(totals["f"] or 0),
    }


def subscription_forwarder(
    *,
    table_dir: str,
    measurement: str,
    tag_cols: list[str],
    field_cols: list[str],
    time_col: str = "time",
):
    """``foreachBatch``-shaped adapter: compose into a streaming
    ingest so every micro-batch is forwarded after (or alongside) the
    table append."""

    def hook(batch_df: DataFrame, batch_id: int) -> dict:
        return forward_batch(
            batch_df,
            batch_id,
            table_dir=table_dir,
            measurement=measurement,
            tag_cols=tag_cols,
            field_cols=field_cols,
            time_col=time_col,
        )

    return hook
