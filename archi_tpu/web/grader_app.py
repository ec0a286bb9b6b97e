"""Grader service: student submissions → transcription → grading → approval.

Mirrors the reference's grader web app
(``src/interfaces/grader_app/app.py``, 840 LoC): students submit text or
images; images run through the ImageProcessingPipeline, the result through
the GradingPipeline; grades land in a pending queue an admin approves or
overrides.
"""

from __future__ import annotations

import base64
import threading
import time

from archi_tpu.web.framework import App, Request, error_response


def create_grader_app(*, grading_archi, image_archi=None) -> App:
    app = App("grader")
    pending: dict[int, dict] = {}
    counter = {"next": 1}
    lock = threading.Lock()

    @app.post("/api/grade")
    def grade(req: Request):
        body = req.json()
        submission = body.get("submission", "")
        images = [base64.b64decode(b) for b in body.get("images_b64", [])]
        if images and image_archi is not None:
            transcription = image_archi.invoke(images=images).answer
            submission = (submission + "\n\n" + transcription).strip()
        if not submission:
            raise ValueError("empty submission")
        out = grading_archi.invoke(
            submission=submission,
            rubric=body.get("rubric", ""),
            max_points=body.get("max_points", 100),
        )
        with lock:
            sid = counter["next"]
            counter["next"] += 1
            pending[sid] = {
                "id": sid,
                "submission": submission[:2000],
                "grade": out.answer,
                "analysis": out.metadata.get("analysis"),
                "summary": out.metadata.get("summary"),
                "status": "pending",
                "created_at": time.time(),
            }
        return {"submission_id": sid, "grade": out.answer,
                "status": "pending"}

    @app.get("/api/submissions")
    def submissions(req: Request):
        with lock:
            return sorted(pending.values(), key=lambda s: s["id"])

    @app.post("/api/submissions/<sid>/approve")
    def approve(req: Request):
        sid = int(req.path_params["sid"])
        with lock:
            if sid not in pending:
                return error_response("not found", 404)
            body = req.json()
            pending[sid]["status"] = "approved"
            if body.get("final_grade"):
                pending[sid]["grade"] = body["final_grade"]
            return pending[sid]

    @app.get("/healthz")
    def health(req: Request):
        return {"status": "ok", "service": "grader"}

    return app
