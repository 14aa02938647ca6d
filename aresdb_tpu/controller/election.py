"""Lease-based leader election for controller replicas.

Reference: controller/tasks/etcd/leader_elector.go:105 — campaign on an
etcd election key, resign on shutdown, observe leadership changes. etcd is
not part of this stack; the equivalent coordination substrate here is the
controllers' SHARED STATE DIRECTORY (they already share `root_path` for
snapshots, standing in for the etcd keyspace): the lease is a JSON file
claimed and renewed with atomic O_EXCL/rename operations and a TTL, with a
monotonically increasing epoch as the fencing token.

Protocol:
- the lease file holds {name, address, epoch, expires}.
- the holder renews (rewrites with a fresh expiry) every ttl/3.
- a candidate acquires when the file is absent or expired, serialized
  through an O_EXCL claim lock (stale claim locks are broken after ttl).
- each acquisition bumps `epoch`; an old leader that wakes from a pause
  sees a lease it no longer owns (name/epoch mismatch) and steps down.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from typing import Callable, Optional

log = logging.getLogger("aresdb.election")


class LeaderElector:
    def __init__(self, root_path: str, name: str, address: str,
                 ttl: float = 3.0,
                 on_elected: Optional[Callable[[], None]] = None,
                 on_revoked: Optional[Callable[[], None]] = None):
        self.root_path = root_path
        self.name = name
        self.address = address
        self.ttl = ttl
        self.on_elected = on_elected
        self.on_revoked = on_revoked
        self._lease_path = os.path.join(root_path, "leader.lease")
        self._claim_path = os.path.join(root_path, "leader.claim")
        self._is_leader = False
        self._epoch = -1
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        os.makedirs(root_path, exist_ok=True)

    # -- public --

    @property
    def is_leader(self) -> bool:
        return self._is_leader

    @property
    def epoch(self) -> int:
        return self._epoch

    def current_leader(self) -> Optional[dict]:
        """The current UNEXPIRED lease, or None."""
        lease = self._read_lease()
        if lease and lease["expires"] > time.time():
            return lease
        return None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name=f"elector-{self.name}")
        self._thread.start()

    def stop(self) -> None:
        """Resign: drop the lease if held so a peer takes over immediately
        (reference elector resigns on Close rather than letting the lease
        time out)."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.ttl * 2)
            self._thread = None
        if self._is_leader:
            lease = self._read_lease()
            if lease and lease.get("name") == self.name and \
                    lease.get("epoch") == self._epoch:
                # expire in place (keeps the epoch for fencing continuity)
                tmp = self._lease_path + f".{self.name}.tmp"
                try:
                    with open(tmp, "w") as f:
                        json.dump({**lease, "expires": 0.0}, f)
                    os.replace(tmp, self._lease_path)
                except OSError:
                    pass
            self._set_leader(False)

    # -- internals --

    def _read_lease(self) -> Optional[dict]:
        try:
            with open(self._lease_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _write_lease(self, epoch: int) -> None:
        tmp = self._lease_path + f".{self.name}.tmp"
        with open(tmp, "w") as f:
            json.dump({"name": self.name, "address": self.address,
                       "epoch": epoch, "expires": time.time() + self.ttl}, f)
        os.replace(tmp, self._lease_path)

    def _try_claim_lock(self) -> bool:
        try:
            fd = os.open(self._claim_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(time.time()).encode())
            os.close(fd)
            return True
        except FileExistsError:
            # break stale claim locks (a candidate died mid-claim)
            try:
                if time.time() - os.path.getmtime(self._claim_path) > self.ttl:
                    os.unlink(self._claim_path)
            except OSError:
                pass
            return False

    def _release_claim_lock(self) -> None:
        try:
            os.unlink(self._claim_path)
        except OSError:
            pass

    def _try_acquire(self) -> bool:
        if not self._try_claim_lock():
            return False
        try:
            lease = self._read_lease()
            if lease and lease["expires"] > time.time():
                return False
            epoch = (lease["epoch"] + 1) if lease else 0
            self._write_lease(epoch)
            self._epoch = epoch
            return True
        finally:
            self._release_claim_lock()

    def _set_leader(self, val: bool) -> None:
        if val == self._is_leader:
            return
        self._is_leader = val
        log.info("controller %s %s leadership (epoch %d)", self.name,
                 "gained" if val else "lost", self._epoch)
        cb = self.on_elected if val else self.on_revoked
        if cb is not None:
            try:
                cb()
            except Exception:  # noqa: BLE001 — callback must not kill loop
                log.exception("election callback failed")

    def _renew(self) -> None:
        """Renew under the claim lock, re-verifying ownership AND expiry:
        a leader that paused past its ttl must NOT blind-renew — a
        candidate may be mid-claim about to write epoch+1, and an
        unserialized overwrite would leave two leaders accepting
        mutations. If the claim is contended, skip this round; the
        ownership pre-check fences us next tick."""
        if not self._try_claim_lock():
            return
        try:
            lease = self._read_lease()
            if (lease and lease.get("name") == self.name
                    and lease.get("epoch") == self._epoch
                    and lease.get("expires", 0) > time.time()):
                self._write_lease(self._epoch)
            else:
                self._set_leader(False)
        finally:
            self._release_claim_lock()

    def _run(self) -> None:
        while not self._stop.is_set():
            if self._is_leader:
                lease = self._read_lease()
                if lease is None or lease.get("name") != self.name or \
                        lease.get("epoch") != self._epoch or \
                        lease.get("expires", 0) <= time.time():
                    # fenced out (paused past expiry, peer took over)
                    self._set_leader(False)
                else:
                    self._renew()
                self._stop.wait(self.ttl / 3)
            else:
                if self._try_acquire():
                    self._set_leader(True)
                    self._stop.wait(self.ttl / 3)
                else:
                    self._stop.wait(self.ttl / 2)
