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
    """SFTP transport over paramiko (reference:
    ``transfer_manager.py:168-231`` moves bytes the same way).

    paramiko is import-gated — it is not installed in this container,
    so construction raises ``NotImplementedError`` here; the full
    logic below is nevertheless real and exercised in
    ``tests/test_ops_and_feeder.py`` through a stand-in paramiko
    module, and a deployment with the real library uses it unchanged.

    Fetches land ATOMICALLY: download to ``<dest>.part`` then
    ``os.replace`` — the streaming file source can never observe a
    half-written landing file, the receive-side complement of the
    in-flight mtime guard.

    Host keys: known hosts are loaded from the system file; unknown
    hosts are auto-accepted by default (the datalogger-fleet posture).
    Pass ``strict_host_key=True`` to reject unknown hosts instead.
    """

    def __init__(
        self,
        host: str,
        username: str,
        keyfile: str,
        remote_dir: str,
        port: int = 22,
        strict_host_key: bool = False,
    ):
        try:
            import paramiko
        except ImportError as e:
            raise NotImplementedError(
                "SFTPTransport requires paramiko (not available in this "
                "environment); use LocalDirTransport or install paramiko"
            ) from e
        self._client = paramiko.SSHClient()
        try:
            self._client.load_system_host_keys()
        except Exception:
            pass  # no known_hosts file — fall through to the policy
        policy = (
            paramiko.RejectPolicy()
            if strict_host_key
            else paramiko.AutoAddPolicy()
        )
        self._client.set_missing_host_key_policy(policy)
        self._client.connect(
            host, port=port, username=username, key_filename=keyfile
        )
        self._sftp = self._client.open_sftp()
        self._remote_dir = remote_dir

    def listdir(self) -> list[RemoteFile]:
        import stat as _stat

        out = []
        for a in sorted(
            self._sftp.listdir_attr(self._remote_dir),
            key=lambda a: a.filename,
        ):
            out.append(
                RemoteFile(
                    a.filename,
                    float(a.st_mtime or 0),
                    int(a.st_size or 0),
                    _stat.S_ISDIR(a.st_mode or 0),
                )
            )
        return out

    def fetch(self, name: str, dest_path: str) -> None:
        import posixpath

        tmp = dest_path + ".part"
        self._sftp.get(posixpath.join(self._remote_dir, name), tmp)
        os.replace(tmp, dest_path)

    def close(self) -> None:
        self._sftp.close()
        self._client.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()


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
