"""Maintenance lease: writer-vs-compactor mutual exclusion for every
materialized store (VERDICT r7 #2; hardened per r8 ADVICE).

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
  (op, pid, timestamp, ttl, nonce) is written into the file for
  diagnostics and steal-detection.
* **contention** = poll until the file disappears; past ``wait_s``,
  raise ``LeaseHeldError`` naming the holder — the loud-refusal path.
* **heartbeat** = while held, a daemon thread refreshes the lease
  file every ``ttl_s/4`` (atomic tmp-file + ``os.replace``), so a
  LIVE holder never goes stale no matter how long its compaction
  runs — the TTL only ever expires a crashed/paused process. Callers
  therefore do not need to size ``ttl_s`` to their job length.
* **crash recovery** = a holder that died keeps nobody out forever:
  a lease whose file has not been refreshed for longer than its
  declared TTL is stale and is stolen by the next acquirer. The
  steal is an atomic ``os.rename`` to a nonce-suffixed sidecar —
  exactly one stealer wins the rename; losers get ``OSError`` and
  re-loop through ``O_EXCL`` — so two stealers can never both
  proceed (the remove-then-recreate race the old remove-based steal
  had). Staleness is judged by the lease file's **mtime**, not the
  JSON timestamp: a holder that crashed mid-write leaves a torn/empty
  file with no readable ``ts``, and mtime still ages it out; on a
  shared filesystem mtime is stamped by the fs server, so writer-side
  clock skew cannot fake freshness. (Reader-side skew vs the fs
  clock can still mis-age a lease by the skew amount — the posture
  here is posix-local or NTP-disciplined mounts; deployments beyond
  that should point the lease at a lock service.)
* **steal detection** = a holder can ask :func:`ensure_lease`
  whether its nonce is still the one on disk; the staged-swap sites
  call it immediately before their directory renames, so a
  pathologically paused holder whose lease was stolen fails loudly
  *before* clobbering the thief's work instead of after.
* **reentrancy** = per-thread: a foreachBatch body that holds the
  store lease may call an append helper that also acquires it (the
  inner acquire is a no-op). Distinct threads/processes exclude each
  other normally.

Scale posture: one tiny file create + delete per micro-batch or
maintenance run, plus one tmp-rename per ``ttl_s/4`` while held — no
Spark job, no listing. On object stores without atomic
create-exclusive/rename semantics this degrades to best-effort (the
window is the PUT race, milliseconds); a deployment that needs hard
guarantees there should point ``_dn_lease`` at a posix-consistent
path or a lock service — the call sites don't change.
"""

from __future__ import annotations

import contextlib
import glob as _glob
import json
import os
import threading
import time

LEASE_FILE = "_dn_lease"
#: how long a lease file may sit UNREFRESHED before any other
#: acquirer treats the holder as crashed and steals it. The heartbeat
#: refreshes every ttl/4, so live holders of any job length are safe;
#: this is purely the crashed-holder detection horizon.
DEFAULT_TTL_S = 1800.0
#: how long an acquirer polls before failing loudly.
DEFAULT_WAIT_S = 300.0
POLL_S = 0.2

_held = threading.local()


class LeaseHeldError(RuntimeError):
    """Another writer/maintenance job holds the store lease and did
    not release it within the wait budget."""


class LeaseLostError(RuntimeError):
    """This job's lease was stolen out from under it (it stalled past
    its TTL and another job took over). Raised by :func:`ensure_lease`
    before a directory swap so the stall fails loudly instead of
    clobbering the new holder's work."""


class _Hold:
    __slots__ = ("count", "nonce", "stop", "thread", "lost")

    def __init__(self, nonce: str):
        self.count = 1
        self.nonce = nonce
        self.stop = threading.Event()
        self.thread: threading.Thread | None = None
        self.lost = False


def _lease_path(store_path: str) -> str:
    return os.path.join(os.path.abspath(store_path), LEASE_FILE)


def _read_lease(p: str) -> dict | None:
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        # vanished between exists-check and read, or torn write from a
        # holder that crashed mid-json.dump. Staleness falls back to
        # the file's mtime so a torn lease cannot lock a store forever.
        return None


def _held_set() -> dict:
    if not hasattr(_held, "paths"):
        _held.paths = {}
    return _held.paths


def _write_lease_payload(f, op: str, ttl_s: float, nonce: str) -> None:
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


def _heartbeat(p: str, op: str, ttl_s: float, hold: _Hold) -> None:
    """Refresh the lease file's mtime/ts every ttl/4 while held. If the
    on-disk nonce ever stops being ours (stolen after a stall), set
    ``hold.lost`` and stop touching the file — the thief owns it now."""
    interval = max(min(ttl_s / 4.0, 60.0), POLL_S)
    while not hold.stop.wait(interval):
        cur = _read_lease(p)
        if cur is not None and cur.get("nonce") != hold.nonce:
            hold.lost = True
            return
        tmp = p + f".hb.{hold.nonce}"
        try:
            with open(tmp, "w") as f:
                _write_lease_payload(f, op, ttl_s, hold.nonce)
            os.replace(tmp, p)
        except OSError:
            with contextlib.suppress(OSError):
                os.remove(tmp)


def _sweep_stale_sidecars(p: str) -> None:
    """Remove nonce-suffixed sidecars left by a stealer or heartbeat
    that crashed between its rename and its cleanup. Harmless junk —
    they are never read — but unbounded accumulation is rude."""
    for leftover in _glob.glob(p + ".stale.*") + _glob.glob(p + ".hb.*"):
        with contextlib.suppress(OSError):
            if time.time() - os.stat(leftover).st_mtime > DEFAULT_TTL_S:
                os.remove(leftover)


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
    if p in held:
        held[p].count += 1
        return None
    os.makedirs(os.path.dirname(p), exist_ok=True)
    nonce = f"{os.getpid()}-{threading.get_ident()}-{time.monotonic_ns()}"
    deadline = time.monotonic() + wait_s
    while True:
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                age = time.time() - os.stat(p).st_mtime
            except OSError:
                continue  # vanished: holder released — retry create
            cur = _read_lease(p)
            ttl = (
                cur.get("ttl_s", DEFAULT_TTL_S)
                if cur is not None
                else DEFAULT_TTL_S
            )
            if age > ttl:
                # Stale: holder crashed (a live one heartbeats at
                # ttl/4). Steal atomically by rename — exactly one
                # stealer's rename succeeds; losers get OSError and
                # re-loop through O_EXCL, so a slow stealer can never
                # delete the fast stealer's freshly created lease
                # (the remove-based steal's race).
                stale = p + f".stale.{nonce}"
                try:
                    os.rename(p, stale)
                except OSError:
                    continue
                with contextlib.suppress(OSError):
                    os.remove(stale)
                continue
            if time.monotonic() >= deadline:
                who = (
                    f"op={cur.get('op')!r} pid={cur.get('pid')} "
                    f"age={age:.0f}s"
                    if cur
                    else f"unknown holder age={age:.0f}s"
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
            _write_lease_payload(f, op, ttl_s, nonce)
        _sweep_stale_sidecars(p)
        hold = _Hold(nonce)
        hold.thread = threading.Thread(
            target=_heartbeat, args=(p, op, ttl_s, hold), daemon=True
        )
        hold.thread.start()
        held[p] = hold
        return nonce


def ensure_lease(store_path: str) -> None:
    """Raise :class:`LeaseLostError` if this thread's lease on
    ``store_path`` has been stolen (heartbeat observed a foreign
    nonce, or the on-disk nonce no longer matches). No-op when this
    thread does not hold the lease at all — direct unleased callers
    (tests, one-off builds) keep working. Swap sites call this
    immediately before their directory renames."""
    p = _lease_path(store_path)
    hold = _held_set().get(p)
    if hold is None:
        return
    if not hold.lost:
        cur = _read_lease(p)
        if cur is not None and cur.get("nonce") == hold.nonce:
            return
        hold.lost = True
    raise LeaseLostError(
        f"lease on store {store_path!r} was stolen (this job stalled "
        f"past its TTL and another writer took over); aborting before "
        f"the directory swap to avoid clobbering the new holder's "
        f"work. Re-run this job."
    )


def release_lease(store_path: str, token: str | None) -> None:
    """Release a lease taken by :func:`acquire_lease`. A reentrant
    no-op token (None) only decrements the hold count. Never removes
    a lease stolen by someone else (nonce mismatch)."""
    p = _lease_path(store_path)
    held = _held_set()
    hold = held.get(p)
    if hold is not None and (hold.count > 1 or token is None):
        hold.count -= 1
        return
    held.pop(p, None)
    if hold is not None:
        hold.stop.set()
        if hold.thread is not None:
            hold.thread.join(timeout=5.0)
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
