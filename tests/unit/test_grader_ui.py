"""Grader web UI: browser-less contract test walking the full student +
admin workflow over the rendered pages (VERDICT r3 item 4 — the reference
serves login/welcome/problem/conversion-approval/result/admin templates,
``src/interfaces/grader_app/app.py`` + ``templates/*.html``)."""

import re
import urllib.parse

import numpy as np
import pytest

from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.orchestrator.archi import Archi
from archi_tpu.utils.app_db import AppDatabase
from archi_tpu.utils.grader_service import GraderService
from archi_tpu.web.framework import Request
from archi_tpu.web.grader_app import create_grader_app
from archi_tpu.web.grader_ui import parse_score, performance_message
from tests.unit.test_vectorstore import FakeEmbeddings

ROSTER = {"alice@mit.edu": "c0de", "bob@mit.edu": "s3cret"}
ADMIN_PW = "adm1n-pw"


class FakeImageArchi:
    def invoke(self, **kwargs):
        class Out:
            answer = "transcribed: x squared plus one"
        assert kwargs.get("images"), "image pipeline called without images"
        return Out()


@pytest.fixture
def app_and_svc(tmp_path):
    data = tmp_path / "grader-data"
    data.mkdir()
    (data / "rubric_1.txt").write_text(
        "Problem 1: integrals\n---\naward 10 points for the right bound")
    (data / "rubric_2.txt").write_text("Problem 2: derivatives")
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["rubric reference content"])
    db = AppDatabase(":memory:")
    svc = GraderService(db)
    app = create_grader_app(
        grading_archi=Archi("GradingPipeline", vectorstore=store),
        image_archi=FakeImageArchi(), grader_service=svc,
        roster=ROSTER, admin_password=ADMIN_PW, data_path=str(data))
    return app, svc


def call(app, method, path, *, form=None, cookie=None, body=None,
         headers=None):
    headers = dict(headers or {})
    if cookie:
        headers["cookie"] = cookie
    if form is not None:
        body = urllib.parse.urlencode(form).encode()
        headers["content-type"] = "application/x-www-form-urlencoded"
    q = urllib.parse.urlparse(path)
    return app.router.dispatch(Request(
        method, q.path, urllib.parse.parse_qs(q.query), headers,
        body or b""))


def text(resp):
    return resp.body.decode()


def login(app, email="alice@mit.edu", code="c0de"):
    r = call(app, "POST", "/login", form={"email": email, "code": code})
    assert r.status == 303 and r.headers["Location"] == "/"
    token = re.search(r"archi_session=([^;]+)", r.headers["Set-Cookie"])
    return f"archi_session={token.group(1)}"


# ------------------------------------------------------------ student flow
def test_pages_require_login(app_and_svc):
    app, _ = app_and_svc
    for path in ("/", "/problem/1"):
        r = call(app, "GET", path)
        assert r.status == 303 and r.headers["Location"] == "/login"


def test_login_rejects_bad_roster_entries(app_and_svc):
    app, _ = app_and_svc
    r = call(app, "POST", "/login",
             form={"email": "eve@mit.edu", "code": "c0de"})
    assert r.status == 303 and "flash=" in r.headers["Location"]
    r = call(app, "POST", "/login",
             form={"email": "alice@mit.edu", "code": "wrong"})
    assert r.status == 303 and "Invalid" in r.headers["Location"]
    # and the login page renders the flash
    r = call(app, "GET", "/login?flash=Invalid+access+code")
    assert r.status == 200 and "Invalid access code" in text(r)


def test_full_student_then_admin_workflow(app_and_svc):
    app, svc = app_and_svc
    cookie = login(app)

    # welcome lists both problems, untouched
    r = call(app, "GET", "/", cookie=cookie)
    page = text(r)
    assert r.status == 200
    assert "Problem 1: integrals" in page and "Problem 2" in page
    assert page.count("not submitted") == 2

    # problem page shows the submission form
    r = call(app, "GET", "/problem/1", cookie=cookie)
    page = text(r)
    assert "submitForm" in page and "textarea" in page

    # submit text → transcription-approval page carries the text
    r = call(app, "POST", "/problem/1", cookie=cookie,
             form={"submission": "the integral evaluates to pi/2"})
    page = text(r)
    assert r.status == 200
    assert "Review your submission" in page
    assert "the integral evaluates to pi/2" in page
    assert "/problem/1/finalize" in page

    # finalize → grading runs, result page renders, queue row pending
    r = call(app, "POST", "/problem/1/finalize", cookie=cookie,
             form={"approved_text": "the integral evaluates to pi/2",
                   "additional_comments": "used substitution"})
    page = text(r)
    assert r.status == 200 and "your result" in page
    assert "pending" in page and "provisional" in page
    subs = svc.list(status="pending")
    assert len(subs) == 1 and subs[0]["problem"] == 1
    assert subs[0]["user_email"] == "alice@mit.edu"
    assert "Additional Comments:\nused substitution" in subs[0]["submission"]
    sid = subs[0]["id"]

    # one-attempt gate: revisit shows the stored result, resubmit bounces
    r = call(app, "GET", "/problem/1", cookie=cookie)
    assert "your result" in text(r)
    r = call(app, "POST", "/problem/1", cookie=cookie,
             form={"submission": "second try"})
    assert r.status == 303
    assert len(svc.list()) == 1

    # welcome now shows pending for problem 1
    r = call(app, "GET", "/", cookie=cookie)
    assert ">pending<" in text(r)

    # ---- admin: wrong password bounces, right password shows the queue
    r = call(app, "POST", "/admin", form={"admin_password": "nope"})
    assert r.status == 303 and "Unauthorized" in r.headers["Location"]
    r = call(app, "POST", "/admin", form={"admin_password": ADMIN_PW})
    page = text(r)
    assert r.status == 200
    assert "Pending queue (1)" in page
    assert "alice@mit.edu" in page
    assert f"/admin/submissions/{sid}/decide" in page

    # approve with an override grade
    r = call(app, "POST", f"/admin/submissions/{sid}/decide",
             form={"admin_password": ADMIN_PW, "action": "approve",
                   "final_grade": "9/10 excellent bound handling"})
    page = text(r)
    assert r.status == 200 and f"Submission {sid} approved" in page
    assert "Pending queue (0)" in page and "Decided (1)" in page

    # the student sees the approved, overridden grade with the score
    r = call(app, "GET", "/problem/1", cookie=cookie)
    page = text(r)
    assert ">approved</span>" in page
    assert "9 / 10" in page and "excellent work" in page
    assert "approved by an instructor" in page


def test_admin_reject_and_reset(app_and_svc):
    app, svc = app_and_svc
    cookie = login(app, "bob@mit.edu", "s3cret")
    call(app, "POST", "/problem/2/finalize", cookie=cookie,
         form={"approved_text": "dy/dx = 2x"})
    sid = svc.list()[0]["id"]
    r = call(app, "POST", f"/admin/submissions/{sid}/decide",
             form={"admin_password": ADMIN_PW, "action": "reject"})
    assert "rejected" in text(r)
    r = call(app, "GET", "/problem/2", cookie=cookie)
    assert "not accepted" in text(r)

    # reset clears the attempt → the form is back
    r = call(app, "POST", "/admin/reset",
             form={"admin_password": ADMIN_PW,
                   "student_email": "bob@mit.edu", "problem": "2"})
    assert "1 attempt(s) removed" in text(r)
    r = call(app, "GET", "/problem/2", cookie=cookie)
    assert "submitForm" in text(r)


def test_admin_rubric_upload_extends_problem_list(app_and_svc, tmp_path):
    app, _ = app_and_svc
    r = call(app, "POST", "/admin/rubrics",
             form={"admin_password": ADMIN_PW, "problem": "3",
                   "text": "Problem 3: limits\naward 5 points"})
    assert r.status == 200 and "Rubric 3 saved" in text(r)
    cookie = login(app)
    r = call(app, "GET", "/", cookie=cookie)
    assert "Problem 3: limits" in text(r)
    # admin actions without the password never write
    r = call(app, "POST", "/admin/rubrics",
             form={"admin_password": "nope", "problem": "4", "text": "x"})
    assert r.status == 303
    r = call(app, "GET", "/", cookie=cookie)
    assert "rubric_4" not in text(r)


def test_image_submission_transcribes_then_grades(app_and_svc):
    app, svc = app_and_svc
    cookie = login(app)
    # the page's inline JS posts base64 images as form fields; emulate it
    r = call(app, "POST", "/problem/2", cookie=cookie,
             form=[("submission", ""), ("images_b64", "aGk="),
                   ("images_b64", "eW8=")])
    page = text(r)
    assert r.status == 200
    assert "transcribed: x squared plus one" in page
    r = call(app, "POST", "/problem/2/finalize", cookie=cookie,
             form={"approved_text": "transcribed: x squared plus one"})
    assert "your result" in text(r)
    assert svc.list()[0]["problem"] == 2


def test_out_of_range_problem(app_and_svc):
    app, _ = app_and_svc
    cookie = login(app)
    assert call(app, "GET", "/problem/99", cookie=cookie).status == 404
    assert call(app, "GET", "/problem/0", cookie=cookie).status == 404
    assert call(app, "GET", "/problem/abc", cookie=cookie).status == 404


def test_json_api_still_served_alongside_ui(app_and_svc):
    app, svc = app_and_svc
    import json
    r = call(app, "POST", "/api/grade",
             body=json.dumps({"submission": "api submission"}).encode(),
             headers={"x-admin-password": ADMIN_PW})
    assert r.status == 200
    sid = json.loads(text(r))["submission_id"]
    assert svc.get(sid)["status"] == "pending"


def test_json_api_locked_down_when_admin_password_configured(app_and_svc):
    """A student must NOT be able to dump everyone's grades or approve
    their own submission by hitting the JSON API next to the UI."""
    app, svc = app_and_svc
    import json
    body = json.dumps({"submission": "s"}).encode()
    assert call(app, "POST", "/api/grade", body=body).status == 403
    assert call(app, "GET", "/api/submissions").status == 403
    sid = svc.add_submission("s", "Grade: 1/10", user_email="a@mit.edu")
    fake = json.dumps({"final_grade": "10/10"}).encode()
    r = call(app, "POST", f"/api/submissions/{sid}/approve", body=fake)
    assert r.status == 403
    assert svc.get(sid)["status"] == "pending"
    # the admin header unlocks the same routes
    r = call(app, "GET", "/api/submissions",
             headers={"x-admin-password": ADMIN_PW})
    assert r.status == 200
    r = call(app, "POST", f"/api/submissions/{sid}/approve", body=fake,
             headers={"x-admin-password": ADMIN_PW})
    assert r.status == 200 and json.loads(text(r))["grade"] == "10/10"


def test_json_api_open_when_no_admin_password():
    """Deployments without the student UI (internal tools behind RBAC)
    keep the open API."""
    import json
    store = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    store.add_texts(["rubric reference content"])
    app = create_grader_app(
        grading_archi=Archi("GradingPipeline", vectorstore=store),
        grader_service=GraderService(AppDatabase(":memory:")))
    r = call(app, "POST", "/api/grade",
             body=json.dumps({"submission": "api submission"}).encode())
    assert r.status == 200


def test_thankyou_and_logout(app_and_svc):
    app, _ = app_and_svc
    r = call(app, "GET", "/thankyou")
    assert "Thank you for your submission" in text(r)
    r = call(app, "GET", "/logout")
    assert r.status == 303 and "Max-Age=0" in r.headers["Set-Cookie"]


# ---------------------------------------------------------------- helpers
def test_parse_score():
    assert parse_score("Total: 7/10") == (7.0, 10.0)
    assert parse_score("part a 2/3\npart b 1/2\nTotal 3/5") == (3.0, 5.0)
    assert parse_score("awarded 85 points", 100) == (85.0, 100.0)
    assert parse_score("no numbers here") is None
    # dates and trailing fraction-shaped tokens must not read as scores
    assert parse_score("Total: 8/10. Reviewed 2026/08/19") == (8.0, 10.0)
    assert parse_score("Total 9/10 ... see rubric item 1/4") == (9.0, 10.0)
    assert parse_score("score 8/10, graded on 2026/08/19") == (8.0, 10.0)
    assert performance_message(30) == "unsatisfactory performance"
    assert performance_message(70) == "satisfactory performance"
    assert performance_message(95) == "excellent work"


def test_load_roster(tmp_path):
    from archi_tpu.web.grader_ui import load_roster
    p = tmp_path / "roster.csv"
    p.write_text("email,access_code\nA@MIT.edu, abc \nbad line\n"
                 "b@mit.edu,xyz\n")
    roster = load_roster(str(p))
    assert roster == {"a@mit.edu": "abc", "b@mit.edu": "xyz"}
