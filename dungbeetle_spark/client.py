"""Typed HTTP client for the dungbeetle-spark server.

Mirror of the reference Go client SDK (reference: client/client.go:
67-199 — one method per endpoint, envelope unwrap, error surfacing).
stdlib ``urllib`` only; the API is a low-traffic control plane.
"""

from __future__ import annotations

import json
from typing import Any
from urllib import error as urlerror
from urllib import parse as urlparse
from urllib import request as urlrequest


class ClientError(Exception):
    def __init__(self, message: str, code: int = 0):
        super().__init__(message)
        self.code = code


class Client:
    def __init__(self, root_url: str = "http://127.0.0.1:6060", timeout: float = 30.0):
        self.root_url = root_url.rstrip("/")
        self.timeout = timeout

    # -- transport ----------------------------------------------------
    def _do(self, method: str, path: str, body: dict | None = None, **params) -> Any:
        qs = urlparse.urlencode({k: v for k, v in params.items() if v})
        url = f"{self.root_url}{path}" + (f"?{qs}" if qs else "")
        data = json.dumps(body).encode() if body is not None else None
        req = urlrequest.Request(
            url, data=data, method=method,
            headers={"Content-Type": "application/json"} if data else {},
        )
        try:
            with urlrequest.urlopen(req, timeout=self.timeout) as resp:
                payload = json.load(resp)
        except urlerror.HTTPError as exc:
            try:
                payload = json.load(exc)
            except Exception:  # noqa: BLE001
                raise ClientError(f"HTTP {exc.code}", exc.code) from None
            raise ClientError(payload.get("message", f"HTTP {exc.code}"), exc.code) from None
        if payload.get("status") != "success":
            raise ClientError(payload.get("message", "unknown error"))
        return payload.get("data")

    # -- endpoints (client.go:67-199) ---------------------------------
    def get_tasks(self, sql: bool = False) -> Any:
        return self._do("GET", "/tasks", sql="1" if sql else "")

    def explain(self, task: str, args: list[str] | None = None, db: str = "") -> dict:
        """The task's physical plan with args bound (engine extension)."""
        return self._do(
            "GET", f"/tasks/{task}/explain", args=",".join(args or []), db=db
        )

    def post_job(self, task: str, **job) -> dict:
        """Enqueue one job. kwargs: job_id, args, db, ttl, eta, retries, queue."""
        return self._do("POST", f"/tasks/{task}/jobs", body=job)

    def get_job_status(self, job_id: str) -> dict:
        return self._do("GET", f"/jobs/{job_id}")

    def wait(
        self,
        job_id: str,
        timeout: float = 60.0,
        poll: float = 0.2,
        until: tuple[str, ...] = ("SUCCESS", "FAILURE"),
    ) -> dict:
        """Poll until the job reaches a terminal state (the loop every
        reference client test writes by hand, client_test.go:104-122)."""
        import time

        deadline = time.monotonic() + timeout
        while True:
            st = self.get_job_status(job_id)
            if st.get("state") in until:
                return st
            if time.monotonic() >= deadline:
                raise TimeoutError(f"job {job_id} still {st.get('state')!r} after {timeout}s")
            time.sleep(poll)

    def get_pending_jobs(self, queue: str) -> list[dict]:
        return self._do("GET", f"/jobs/queue/{queue}")

    def post_job_group(self, jobs: list[dict], group_id: str = "") -> dict:
        return self._do("POST", "/groups", body={"group_id": group_id, "jobs": jobs})

    def get_group_status(self, group_id: str) -> dict:
        return self._do("GET", f"/groups/{group_id}")

    def get_job_result(self, job_id: str, limit: int = 100) -> dict:
        return self._do("GET", f"/jobs/{job_id}/result", limit=str(limit))

    def compact_job_result(self, job_id: str, files: int = 1) -> dict:
        return self._do("POST", f"/jobs/{job_id}/compact", files=str(files))

    def get_metrics(self) -> dict:
        """Engine gauges: jobs by state, queue backlogs, catalog sizes."""
        return self._do("GET", "/metrics")

    def delete_job(self, job_id: str, purge: bool = False) -> None:
        self._do("DELETE", f"/jobs/{job_id}", purge="true" if purge else "")

    def delete_group(self, group_id: str, purge: bool = False) -> None:
        self._do("DELETE", f"/groups/{group_id}", purge="true" if purge else "")
