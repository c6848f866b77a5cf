"""Maintenance lease: writer-vs-compactor mutual exclusion for every
materialized store (VERDICT r7 #2).

Every store in this package (event index, fingerprint/band/SRP
stores, vector index) does periodic maintenance by snapshot →
staged rewrite → directory swap. That is answer-preserving but NOT
writer-concurrent: rows appended between the snapshot read and the
swap would silently vanish. Until now that hazard was only a
docstring contract ("stop the writer first"). This module makes it a
runtime guarantee: appenders and maintenance jobs serialize on a
per-store lease file, so a concurrent pair either interleaves safely
(the default — the late-comer waits its turn) or fails LOUDLY after
the wait budget, never loses rows silently.

Mechanics — one JSON file, ``<store>/_dn_lease``:

* **acquire** = exclusive create (``O_CREAT|O_EXCL``, atomic on POSIX
  and on rename-consistent object-store adapters). Holder metadata
  (op, pid, timestamp, ttl) is written into the file for diagnostics
  and expiry.
* **contention** = poll until the file disappears; past ``wait_s``,
  raise ``LeaseHeldError`` naming the holder — the loud-refusal path.
* **crash recovery** = a holder that died keeps nobody out forever:
  a lease older than its own declared TTL is stale and is stolen by
  the next acquirer (the layout-token + ``_recover_staged``
  machinery already detects and repairs whatever the dead job left
  half-done; the lease only needs to stop LIVE interleaving).
* **reentrancy** = per-thread: a foreachBatch body that holds the
  store lease may call an append helper that also acquires it (the
  inner acquire is a no-op). Distinct threads/processes exclude each
  other normally.

Scale posture: one tiny file create + delete per micro-batch or
maintenance run — no Spark job, no listing. On object stores without
atomic create-exclusive semantics this degrades to best-effort (the
window is the PUT race, milliseconds); a deployment that needs hard
guarantees there should point ``_dn_lease`` at a posix-consistent
path or a lock service — the call sites don't change.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time

LEASE_FILE = "_dn_lease"
#: how long a lease may sit before any other acquirer treats it as a
#: crashed holder and steals it. Generous: a 100 TB-scale compaction
#: holding longer should pass an explicit ttl_s.
DEFAULT_TTL_S = 1800.0
#: how long an acquirer polls before failing loudly.
DEFAULT_WAIT_S = 300.0
POLL_S = 0.2

_held = threading.local()


class LeaseHeldError(RuntimeError):
    """Another writer/maintenance job holds the store lease and did
    not release it within the wait budget."""


def _lease_path(store_path: str) -> str:
    return os.path.join(os.path.abspath(store_path), LEASE_FILE)


def _read_lease(p: str) -> dict | None:
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        # vanished between exists-check and read, or torn write —
        # treat as contended-with-unknown-holder
        return None


def _held_set() -> dict:
    if not hasattr(_held, "paths"):
        _held.paths = {}
    return _held.paths


def acquire_lease(
    store_path: str,
    op: str,
    ttl_s: float = DEFAULT_TTL_S,
    wait_s: float | None = None,
) -> str | None:
    """Take the store's maintenance/append lease, waiting up to
    ``wait_s`` (module default) for a live holder to finish. Returns
    an opaque token for :func:`release_lease`, or None when this
    thread already holds the lease (reentrant no-op)."""
    if wait_s is None:
        wait_s = DEFAULT_WAIT_S
    p = _lease_path(store_path)
    held = _held_set()
    if held.get(p):
        held[p] += 1
        return None
    os.makedirs(os.path.dirname(p), exist_ok=True)
    nonce = f"{os.getpid()}-{threading.get_ident()}-{time.monotonic_ns()}"
    deadline = time.monotonic() + wait_s
    while True:
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            cur = _read_lease(p)
            if cur is not None and time.time() - cur.get("ts", 0) > cur.get(
                "ttl_s", DEFAULT_TTL_S
            ):
                # stale: holder crashed. Steal by removal; the create
                # race among stealers is settled by O_EXCL next loop.
                with contextlib.suppress(OSError):
                    os.remove(p)
                continue
            if time.monotonic() >= deadline:
                who = (
                    f"op={cur.get('op')!r} pid={cur.get('pid')} "
                    f"age={time.time() - cur.get('ts', time.time()):.0f}s"
                    if cur
                    else "unknown holder"
                )
                raise LeaseHeldError(
                    f"store {store_path!r} is locked by a concurrent "
                    f"writer/maintenance job ({who}); refusing to "
                    f"proceed — interleaving would risk silent row "
                    f"loss. Retry after it finishes, or remove "
                    f"{LEASE_FILE} if the holder is known dead."
                )
            time.sleep(POLL_S)
            continue
        with os.fdopen(fd, "w") as f:
            json.dump(
                {
                    "op": op,
                    "pid": os.getpid(),
                    "ts": time.time(),
                    "ttl_s": ttl_s,
                    "nonce": nonce,
                },
                f,
            )
        held[p] = 1
        return nonce


def release_lease(store_path: str, token: str | None) -> None:
    """Release a lease taken by :func:`acquire_lease`. A reentrant
    no-op token (None) only decrements the hold count. Never removes
    a lease stolen by someone else (nonce mismatch)."""
    p = _lease_path(store_path)
    held = _held_set()
    if held.get(p, 0) > 1 or (token is None and held.get(p)):
        held[p] -= 1
        return
    held.pop(p, None)
    cur = _read_lease(p)
    if cur is not None and cur.get("nonce") != token:
        return  # expired out from under us and stolen — not ours
    with contextlib.suppress(OSError):
        os.remove(p)


@contextlib.contextmanager
def hold_lease(
    store_path: str,
    op: str,
    ttl_s: float = DEFAULT_TTL_S,
    wait_s: float | None = None,
):
    token = acquire_lease(store_path, op, ttl_s=ttl_s, wait_s=wait_s)
    try:
        yield
    finally:
        release_lease(store_path, token)
