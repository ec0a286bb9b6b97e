"""Live-Postgres integration tier (VERDICT r1 next #8).

The reference's integration tests run against a real pgvector/pg17
container (``tests/smoke/docker-compose.integration.yaml:20-38``).  This
image ships neither a server nor psycopg2, so these tests GATE on the
``ARCHI_PG_DSN`` env var (e.g. ``postgresql://user:pw@host:5439/archi``)
and run the full Postgres-backed stack — catalog, app DB, services,
transaction-hygiene regression — the moment an environment provides one:

    ARCHI_PG_DSN=postgresql://... python -m pytest tests/integration/test_postgres_live.py
"""

import os
import time

import pytest

DSN = os.environ.get("ARCHI_PG_DSN")
psycopg2 = pytest.importorskip("psycopg2") if DSN else None

pytestmark = pytest.mark.skipif(
    not DSN, reason="set ARCHI_PG_DSN to run against a live Postgres")


@pytest.fixture(scope="module")
def pg_catalog():
    from archi_tpu.data.catalog_postgres import PostgresCatalogService

    svc = PostgresCatalogService(DSN)
    yield svc
    svc._conn.execute("DELETE FROM documents WHERE resource_hash LIKE 'livetest-%'")
    svc._conn.commit()


@pytest.fixture(scope="module")
def pg_app_db():
    from archi_tpu.utils.app_db_postgres import PostgresAppDatabase

    db = PostgresAppDatabase(DSN)
    yield db
    db.execute("DELETE FROM users WHERE email LIKE 'livetest-%'")


def test_catalog_upsert_status_and_listing(pg_catalog):
    h = f"livetest-{int(time.time())}"
    pg_catalog.upsert_resource(h, display_name="live.md",
                               source_type="local_files",
                               file_path="/tmp/live.md")
    assert any(d["resource_hash"] == h for d in pg_catalog.list_documents())
    pg_catalog.update_ingestion_status(h, "embedding")
    pg_catalog.update_ingestion_status(h, "embedded")
    doc = pg_catalog.get_document(h)
    assert doc["ingestion_status"] == "embedded"


def test_catalog_recovers_after_bad_statement(pg_catalog):
    """The rollback-on-error guard: one failed statement must not wedge the
    shared connection (ADVICE r1 high #2)."""
    with pytest.raises(Exception):
        pg_catalog._conn.execute("SELECT * FROM definitely_missing_table")
    # connection still serves queries afterwards
    assert isinstance(pg_catalog.list_documents(), list)


def test_app_db_services_end_to_end(pg_app_db):
    from archi_tpu.utils.conversation_service import ConversationService
    from archi_tpu.utils.user_service import UserService

    users = UserService(pg_app_db)
    convs = ConversationService(pg_app_db)
    email = f"livetest-{int(time.time())}@x"
    uid = users.create_user(email)
    users.set_password(email, "pw123")
    assert users.verify_password(email, "pw123")
    cid = convs.create_conversation(uid, title="live")
    mid = convs.add_message(cid, "User", "hello from live pg")
    assert convs.get_message(mid)["conversation_id"] == cid
    assert convs.user_owns(cid, uid)


def test_app_db_recovers_after_bad_statement(pg_app_db):
    with pytest.raises(Exception):
        pg_app_db.query("SELECT * FROM definitely_missing_table")
    assert isinstance(pg_app_db.query("SELECT 1 AS one"), list)
