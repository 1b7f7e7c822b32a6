"""Unit tests for the session-scoped materialization cache's liveness
sweep — pure-Python fakes, no SparkSession: the sweep's contract is about
WHICH probe result evicts, not about Spark itself."""

from __future__ import annotations

from concordium_transaction_logger_spark import cache


class _Artifact:
    def __init__(self):
        self.unpersisted = False

    def unpersist(self):
        self.unpersisted = True


class _ConnectLike:
    """Spark Connect shape: a plain-Python ``is_stopped`` property and no
    ``sparkContext._jsc`` JVM handle."""

    def __init__(self, stopped):
        self._stopped = stopped
        self.probes = 0

    @property
    def is_stopped(self):
        self.probes += 1
        return self._stopped


class _ProbeError:
    """Neither probe works (e.g. an exotic session wrapper): must read as
    ALIVE — an evict-on-error default would disable every session index."""

    @property
    def is_stopped(self):
        raise RuntimeError("no liveness API")

    @property
    def sparkContext(self):
        raise RuntimeError("no JVM")


def _seed(name, sess, n=1):
    c = cache._CACHES.setdefault(name, {})
    arts = []
    for i in range(n):
        a = _Artifact()
        c[(id(sess), f"/corpus/{i}")] = (sess, a)
        arts.append(a)
    return arts


def _drop(name):
    cache._CACHES.pop(name, None)


def test_sweep_evicts_stopped_connect_session():
    sess = _ConnectLike(stopped=True)
    arts = _seed("t_conn_dead", sess, n=3)
    try:
        cache._sweep_dead()
        assert cache._CACHES["t_conn_dead"] == {}
        assert all(a.unpersisted for a in arts)
        # liveness memoized per sweep: one probe for three entries
        assert sess.probes == 1
    finally:
        _drop("t_conn_dead")


def test_sweep_keeps_live_connect_session():
    sess = _ConnectLike(stopped=False)
    _seed("t_conn_live", sess, n=2)
    try:
        cache._sweep_dead()
        assert len(cache._CACHES["t_conn_live"]) == 2
    finally:
        _drop("t_conn_live")


def test_sweep_keeps_session_whose_probes_both_fail():
    sess = _ProbeError()
    _seed("t_probe_err", sess)
    try:
        cache._sweep_dead()
        assert len(cache._CACHES["t_probe_err"]) == 1
    finally:
        _drop("t_probe_err")


def test_get_or_build_survives_probe_error_session():
    sess = _ProbeError()
    try:
        built = []
        v1 = cache.get_or_build("t_gob", sess, "/c", lambda: built.append(1) or "x")
        v2 = cache.get_or_build("t_gob", sess, "/c", lambda: built.append(1) or "y")
        assert (v1, v2) == ("x", "x") and built == [1]
    finally:
        _drop("t_gob")
