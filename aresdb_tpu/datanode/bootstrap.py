"""Peer bootstrap client: copy a shard's persisted state from a peer.

Reference: memstore/bootstrap.go (TableShard.Bootstrap :107 —
findBootstrapSource, stream metadata + VP files to local disk, set local
metadata, then normal recovery) and datanode/bootstrap/bootstrap_server.go
(the serving side, exposed here as the /peer/* HTTP routes in api/server.py).
"""

from __future__ import annotations

import random
from typing import List, Optional

import requests

from aresdb_tpu.cluster.topology import TopologyView


class BootstrapError(Exception):
    pass


def find_bootstrap_source(view: TopologyView, shard_id: int,
                          self_name: str) -> Optional[str]:
    """Pick a random Available/Leaving peer owning the shard
    (bootstrap.go:611 findBootstrapSource)."""
    peers = [h for h in view.bootstrap_sources(shard_id)
             if h.name != self_name]
    if not peers:
        return None
    return random.choice(peers).address


def bootstrap_shard(peer_address: str, table: str, shard_id: int,
                    diskstore, metastore, session=None) -> dict:
    """Copy archive batches, snapshots, and redologs from the peer.

    After this, the normal recovery path (MemStore._recover_shard) replays
    the copied state exactly as a local restart would.
    """
    s = session or requests.Session()
    base = f"http://{peer_address}/peer/{table}/{shard_id}"
    r = s.get(f"{base}/metadata", timeout=30)
    if r.status_code == 404:
        raise BootstrapError(f"peer has no shard {table}/{shard_id}")
    r.raise_for_status()
    meta = r.json()

    copied = {"archive": 0, "snapshot": 0, "redolog": 0}

    # archive batches
    for bid_s, (version, seq, size) in meta["batches"].items():
        bid = int(bid_s)
        cols = meta["archiveColumns"].get(f"{bid}_{version}_{seq}", [])
        for col in cols:
            fr = s.get(f"{base}/archive/{bid}/{version}/{seq}/{col}",
                       timeout=300)
            fr.raise_for_status()
            diskstore.write_archive_column(
                table, shard_id, bid, version, seq, col, fr.content)
            copied["archive"] += 1
        metastore.add_archive_batch_version(
            table, shard_id, bid, version, seq, size)

    # snapshots (dimension tables)
    srf, soff, sbid, sidx = meta["snapshotProgress"]
    for bid_s, cols in meta.get("snapshotBatches", {}).items():
        for col in cols:
            fr = s.get(f"{base}/snapshot/{srf}/{soff}/{bid_s}/{col}",
                       timeout=300)
            fr.raise_for_status()
            diskstore.write_snapshot_column(
                table, shard_id, srf, soff, int(bid_s), col, fr.content)
            copied["snapshot"] += 1
    if (srf, soff) != (0, 0):
        metastore.update_snapshot_progress(
            table, shard_id, srf, soff, sbid, sidx)

    # redo logs (catch-up replay source)
    for creation_time in meta["redologs"]:
        fr = s.get(f"{base}/redolog/{creation_time}", stream=True, timeout=600)
        fr.raise_for_status()
        with diskstore.open_log_for_append(table, shard_id,
                                           creation_time) as f:
            f.truncate(0)
            for chunk in fr.iter_content(1 << 20):
                f.write(chunk)
        copied["redolog"] += 1

    metastore.update_archiving_cutoff(
        table, shard_id, meta["archivingCutoff"])
    rf, off = meta["backfillProgress"]
    metastore.update_backfill_progress(table, shard_id, rf, off)
    return copied
