"""Peer-copy bootstrap sessions: token held for the copy, keep-alive, expiry.

Reference: datanode/bootstrap/bootstrap_server.go:76-463 (sessions +
keep-alive), memstore/common/types.go:23 (BootStrapToken).
"""

import time

from aresdb_tpu.memstore.common import BootstrapSessionManager, BootstrapToken


def test_session_holds_token_until_close():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=5.0)
    sid = mgr.open("trips", 0)
    # a data job cannot take the token while the session is live
    assert not tok.acquire("trips", 0, blocking=False)
    assert mgr.validate(sid, "trips", 0)
    assert not mgr.validate(sid, "trips", 1)  # wrong shard
    assert mgr.close(sid)
    assert tok.acquire("trips", 0, blocking=False)
    tok.release("trips", 0)
    assert not mgr.close(sid)  # double close is a no-op


def test_session_expires_without_keepalive():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=0.2)
    sid = mgr.open("trips", 0)
    assert not tok.acquire("trips", 0, blocking=False)
    time.sleep(0.3)
    mgr.sweep()
    assert not mgr.validate(sid)
    # expiry released the token so data jobs resume
    assert tok.acquire("trips", 0, blocking=False)
    tok.release("trips", 0)


def test_keepalive_extends_session():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=0.4)
    sid = mgr.open("trips", 0)
    for _ in range(3):
        time.sleep(0.2)
        assert mgr.keepalive(sid)
    assert mgr.validate(sid)
    mgr.close(sid)
    assert not mgr.keepalive(sid)


def test_sweeper_thread_reaps_abandoned_session():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=0.2)
    mgr.open("trips", 3)
    deadline = time.time() + 3
    while time.time() < deadline:
        if tok.acquire("trips", 3, blocking=False):
            tok.release("trips", 3)
            return
        time.sleep(0.05)
    raise AssertionError("sweeper never released the abandoned session")


def test_concurrent_sessions_different_shards():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=5.0)
    s0 = mgr.open("trips", 0)
    s1 = mgr.open("trips", 1)  # different shard: no contention
    assert mgr.validate(s0) and mgr.validate(s1)
    mgr.close(s0)
    mgr.close(s1)


def test_second_session_same_shard_times_out():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=5.0)
    sid = mgr.open("trips", 0)
    try:
        mgr.open("trips", 0, acquire_timeout=0.1)
    except TimeoutError:
        pass
    else:
        raise AssertionError("expected TimeoutError")
    finally:
        mgr.close(sid)
