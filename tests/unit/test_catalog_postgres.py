"""Postgres catalog backend: paramstyle translation + SQL surface, tested
against a recording fake DBAPI connection (the analog of the reference's
mocked-psycopg2 tests, tests/unit/test_catalog_postgres_list_documents.py)."""

import pytest

from archi_tpu.data.catalog_postgres import (
    PostgresCatalogService, connect_with_retry,
)


class FakeCursor:
    def __init__(self, log):
        self.log = log
        self.rowcount = 1
        self._rows = []

    def execute(self, sql, params=()):
        assert "?" not in sql, f"untranslated placeholder in: {sql}"
        self.log.append((sql.strip(), tuple(params) if params else ()))

    def fetchone(self):
        return None

    def fetchall(self):
        return []


class FakeConnection:
    def __init__(self):
        self.log = []
        self.commits = 0

    def cursor(self):
        return FakeCursor(self.log)

    def commit(self):
        self.commits += 1

    def close(self):
        pass


@pytest.fixture
def svc():
    conn = FakeConnection()
    s = PostgresCatalogService(connection=conn)
    conn.log.clear()
    return s, conn


def test_schema_created_on_init():
    conn = FakeConnection()
    PostgresCatalogService(connection=conn)
    ddl = " ".join(sql for sql, _p in conn.log)
    assert "CREATE TABLE IF NOT EXISTS documents" in ddl
    assert "BIGSERIAL" in ddl
    assert conn.commits >= 1


def test_upsert_translates_placeholders(svc):
    s, conn = svc
    s.upsert_resource("h1", display_name="doc", source_type="git",
                      metadata={"k": "v"}, size_bytes=10)
    sql, params = conn.log[-1]
    assert "%s" in sql and "?" not in sql
    assert "ON CONFLICT(resource_hash) DO UPDATE" in sql
    assert params[0] == "h1"


def test_status_and_selection_paths(svc):
    s, conn = svc
    s.update_ingestion_status("h1", "embedded")
    assert "%s" in conn.log[-1][0]
    s.set_document_enabled("conv", "h1", False)
    assert conn.log[-1][1] == ("conv", "h1", 0)
    s.retry_failed()
    assert "ingestion_status='pending'" in conn.log[-1][0]


def test_reads_survive_empty_results(svc):
    s, _ = svc
    assert s.get_document("nope") is None
    assert s.all_hashes() == set()
    assert s.list_documents() == []
    assert s.enabled_hashes("conv") is None


def test_connect_with_retry_backoff():
    calls = []

    def failing_connect(dsn):
        calls.append(dsn)
        raise OSError("refused")

    with pytest.raises(ConnectionError, match="after 3 tries"):
        connect_with_retry("dsn", attempts=3, backoff=0.001,
                           connect=failing_connect)
    assert len(calls) == 3

    def ok_connect(dsn):
        return FakeConnection()

    assert isinstance(connect_with_retry("dsn", connect=ok_connect),
                      FakeConnection)


# ---------------------------------------------------------- app db backend
class FakeAppCursor:
    def __init__(self, log):
        self.log = log
        self.rowcount = 1

    def execute(self, sql, params=()):
        assert "?" not in sql, f"untranslated placeholder: {sql}"
        self.log.append((sql.strip(), tuple(params) if params else ()))
        self._last = sql

    def fetchone(self):
        if "lastval" in getattr(self, "_last", ""):
            return (77,)
        return None

    def fetchall(self):
        return []


class FakeAppConnection:
    def __init__(self):
        self.log = []
        self.commits = 0

    def cursor(self):
        return FakeAppCursor(self.log)

    def commit(self):
        self.commits += 1

    def close(self):
        pass


def test_pg_app_db_schema_and_services():
    from archi_tpu.utils.app_db_postgres import PostgresAppDatabase
    from archi_tpu.utils.conversation_service import ConversationService

    conn = FakeAppConnection()
    db = PostgresAppDatabase(connection=conn)
    ddl = " ".join(sql for sql, _p in conn.log)
    assert "BIGSERIAL" in ddl and "agent_traces" in ddl
    conn.log.clear()

    cs = ConversationService(db)
    cid = cs.create_conversation(5, title="t")
    assert cid == 77  # lastrowid emulated via lastval()
    insert_sql = conn.log[0][0]
    assert "%s" in insert_sql and "?" not in insert_sql


def test_open_app_database_dispatch(tmp_path):
    from archi_tpu.utils.app_db import AppDatabase
    from archi_tpu.utils.app_db_postgres import open_app_database

    db = open_app_database(str(tmp_path / "x.db"))
    assert isinstance(db, AppDatabase)
    db.close()
