"""ConnectionPool (reference ``src/utils/connection_pool.py:34,145-204``
analog): bounded checkout, SELECT-1 health checks on stale idle
connections, reconnect-on-failure, stats — unit-tested against fake
connection factories (the live Postgres tier stays DSN-gated)."""

import threading
import time

import pytest

from archi_tpu.utils.connection_pool import ConnectionPool, \
    PoolExhaustedError


class FakeConn:
    def __init__(self):
        self.alive = True
        self.closed = False
        self.health_probes = 0

    def cursor(self):
        conn = self

        class Cur:
            def execute(self, sql, params=()):
                if sql == "SELECT 1":
                    conn.health_probes += 1
                if not conn.alive:
                    raise ConnectionError("dead")

            def fetchone(self):
                return (1,)

        return Cur()

    def rollback(self):
        if not self.alive:
            raise ConnectionError("dead")

    def close(self):
        self.closed = True


def make_factory(created):
    def connect(dsn):
        c = FakeConn()
        created.append(c)
        return c
    return connect


def test_reuse_and_stats():
    created = []
    p = ConnectionPool("dsn", min_conns=1, max_conns=4,
                       connect=make_factory(created))
    for _ in range(5):
        with p.acquire() as c:
            assert isinstance(c, FakeConn)
    s = p.snapshot()
    assert s["created"] == 1 and s["acquired"] == 5 and s["released"] == 5
    assert s["open"] == 1 and s["idle"] == 1 and s["in_use"] == 0


def test_grows_to_max_then_blocks():
    created = []
    p = ConnectionPool("dsn", min_conns=0, max_conns=2, timeout=0.1,
                       connect=make_factory(created))
    c1 = p.acquire()
    c2 = p.acquire()
    c1.__enter__()
    c2.__enter__()
    assert len(created) == 2
    with pytest.raises(PoolExhaustedError):
        with p.acquire(timeout=0.05):
            pass
    c1.__exit__(None, None, None)
    with p.acquire(timeout=1):  # freed slot is reusable
        pass
    c2.__exit__(None, None, None)


def test_waiter_wakes_on_release():
    created = []
    p = ConnectionPool("dsn", min_conns=0, max_conns=1, timeout=5,
                       connect=make_factory(created))
    got = []
    co = p.acquire()
    co.__enter__()

    def waiter():
        with p.acquire() as c:
            got.append(c)

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.05)
    co.__exit__(None, None, None)
    t.join(timeout=2)
    assert got and len(created) == 1


def test_stale_connection_health_checked_and_reconnected():
    created = []
    p = ConnectionPool("dsn", min_conns=1, max_conns=2,
                       health_check_interval=0.0,   # every reuse is stale
                       connect=make_factory(created))
    created[0].alive = False
    with p.acquire() as c:
        assert c is created[1]          # replaced
    s = p.snapshot()
    assert s["health_failures"] == 1 and s["reconnects"] == 1
    assert created[0].closed


def test_fresh_connection_skips_health_check():
    created = []
    p = ConnectionPool("dsn", min_conns=1, max_conns=2,
                       health_check_interval=60.0,
                       connect=make_factory(created))
    with p.acquire():
        pass
    assert created[0].health_probes == 0


def test_exception_with_dead_connection_discards_it():
    created = []
    p = ConnectionPool("dsn", min_conns=1, max_conns=2,
                       connect=make_factory(created))
    with pytest.raises(ValueError):
        with p.acquire() as c:
            c.alive = False
            raise ValueError("query failed")
    assert created[0].closed
    assert p.snapshot()["open"] == 0
    with p.acquire() as c2:           # pool recovers with a new conn
        assert c2 is created[1]


def test_exception_with_healthy_connection_keeps_it():
    created = []
    p = ConnectionPool("dsn", min_conns=1, max_conns=2,
                       connect=make_factory(created))
    with pytest.raises(ValueError):
        with p.acquire():
            raise ValueError("app-level error, connection fine")
    assert not created[0].closed
    with p.acquire() as c2:
        assert c2 is created[0]


def test_close_all():
    created = []
    p = ConnectionPool("dsn", min_conns=2, max_conns=4,
                       connect=make_factory(created))
    p.close_all()
    assert all(c.closed for c in created)
    with pytest.raises(RuntimeError):
        with p.acquire():
            pass


# ---------------------------------------------------------------- wiring

class SqliteShimConn:
    """Real sqlite3 behind the %s paramstyle, posing as a PG connection."""

    def __init__(self, shared):
        import sqlite3

        self._c = sqlite3.connect(shared, uri=True,
                                  check_same_thread=False)
        self._c.row_factory = sqlite3.Row

    def cursor(self):
        inner = self._c

        class Cur:
            rowcount = -1

            def execute(self, sql, params=()):
                if sql == "SELECT 1":
                    self._rows = [(1,)]
                    return
                sql = (sql.replace("%s", "?")
                       .replace("BIGSERIAL PRIMARY KEY",
                                "INTEGER PRIMARY KEY AUTOINCREMENT")
                       .replace("DOUBLE PRECISION", "REAL")
                       .replace("BIGINT", "INTEGER"))
                cur = inner.execute(sql, tuple(params))
                self._rows = cur.fetchall()
                self.rowcount = cur.rowcount

            def fetchone(self):
                return self._rows[0] if self._rows else None

            def fetchall(self):
                return list(self._rows)

        return Cur()

    def commit(self):
        self._c.commit()

    def rollback(self):
        self._c.rollback()

    def close(self):
        self._c.close()


def test_pooled_catalog_end_to_end(tmp_path):
    from archi_tpu.data.catalog_postgres import PostgresCatalogService

    uri = f"file:{tmp_path}/cat.db"
    pool = ConnectionPool("dsn", min_conns=1, max_conns=3,
                          connect=lambda d: SqliteShimConn(uri))
    svc = PostgresCatalogService(pool=pool)
    svc.upsert_resource("h1", display_name="doc-1", source_type="git",
                        metadata={"k": "v"}, size_bytes=10)
    svc.update_ingestion_status("h1", "embedded")
    docs = svc.list_documents()
    assert len(docs) == 1 and docs[0]["resource_hash"] == "h1"
    assert docs[0]["ingestion_status"] == "embedded"
    assert svc.pool_stats()["created"] >= 1


def test_pooled_app_db_end_to_end(tmp_path):
    from archi_tpu.utils.app_db_postgres import PostgresAppDatabase

    uri = f"file:{tmp_path}/app.db"
    pool = ConnectionPool("dsn", min_conns=1, max_conns=3,
                          connect=lambda d: SqliteShimConn(uri))
    db = PostgresAppDatabase(pool=pool)
    db.execute("INSERT INTO users (email, name) VALUES (%s, %s)"
               .replace("%s", "?"), ("a@b.c", "A"))
    rows = db.query("SELECT email FROM users")
    assert [r["email"] for r in rows] == ["a@b.c"]
    assert db.pool_stats()["created"] >= 1
    db.close()
    assert pool.snapshot()["open"] == 0
