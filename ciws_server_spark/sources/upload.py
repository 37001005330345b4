"""Upload acceptance helpers (S6/P10 + the reference's auth scheme).

The HTTP front itself stays engine-external (SURVEY.md §2.1: any web
server can terminate the POST — the reference uses Bottle+gunicorn).
What belongs to the engine is the acceptance contract these helpers
implement:

* ``save_upload`` — extension allow-list (P10, reference
  ``web_service.py:55-59``) and landing into the streaming source
  directory the ingest watches;
* ``make_token`` / ``check_token`` — the reference's stateless upload
  token: sha256 over (hour-truncated UTC timestamp, shared secret,
  filenames), compared constant-time (``auth.py:42-47,66-80``). The
  previous hour's token is also accepted to avoid top-of-hour races —
  same re-derivation contract, documented divergence (the reference
  accepts only the current hour).
"""

from __future__ import annotations

import hashlib
import hmac
import os
from datetime import datetime, timedelta, timezone

ALLOWED_EXTENSIONS = (".csv",)


class UploadRejected(ValueError):
    pass


def save_upload(landing_dir: str, filename: str, payload: bytes) -> str:
    """Accept one uploaded file part into the landing directory.

    Rejects path traversal and non-CSV extensions (P10). Returns the
    landed path; the streaming ingest picks it up on its next trigger.
    """
    base = os.path.basename(filename)
    if not base or base != filename:
        raise UploadRejected(f"invalid filename: {filename!r}")
    if os.path.splitext(base)[1].lower() not in ALLOWED_EXTENSIONS:
        raise UploadRejected(f"extension not allowed: {base!r}")
    os.makedirs(landing_dir, exist_ok=True)
    dest = os.path.join(landing_dir, base)
    with open(dest, "wb") as f:
        f.write(payload)
    return dest


def _hour_salt(at: datetime | None = None, hours_ago: int = 0) -> str:
    at = at or datetime.now(timezone.utc)
    at = at - timedelta(hours=hours_ago)
    return at.replace(minute=0, second=0, microsecond=0).isoformat()


def make_token(
    secret: str, filenames: list[str], at: datetime | None = None
) -> str:
    """sha256(hour_truncated_utc : secret : filenames) — the
    reference's stateless upload-token derivation."""
    msg = ":".join([_hour_salt(at), secret, *sorted(filenames)])
    return hashlib.sha256(msg.encode()).hexdigest()


def check_token(
    secret: str,
    filenames: list[str],
    token: str,
    at: datetime | None = None,
) -> bool:
    """Constant-time re-derivation check; current or previous hour."""
    for hours_ago in (0, 1):
        t = at or datetime.now(timezone.utc)
        expected = make_token(secret, filenames, t - timedelta(hours=hours_ago))
        if hmac.compare_digest(expected, token):
            return True
    return False
