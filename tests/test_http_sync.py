"""Driver-side HTTP sync trigger/poll (SURVEY.md §2 op 9).

Mirrors the reference DAG's h0→h1→h2 upstream-sync chain
(load_knowledge_graph.py:206-267): HttpSensor idle-check → SimpleHttpOperator
POST {"full_sync": ...} → HttpSensor completion-poll. Tested against a local
stateful mock HTTP server — no Spark involvement (it is orchestration, not an
operator).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from knowledge_graph_etl_spark.mappings.pipeline import (
    trigger_and_wait,
    trigger_sync,
    wait_until_idle,
)


class _SyncService(BaseHTTPRequestHandler):
    """Mock *2db service: GET reports job state, POST starts a job that
    stays 'running' for the next ``busy_polls_after_trigger`` GETs."""

    def _state(self):
        return self.server.state  # type: ignore[attr-defined]

    def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler API
        st = self._state()
        st["gets"] += 1
        running = st["busy_polls"] > 0
        if running:
            st["busy_polls"] -= 1
        self._reply(200, {"job_running": running})

    def do_POST(self):  # noqa: N802
        st = self._state()
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        st["posts"].append(body)
        st["busy_polls"] = st["busy_polls_after_trigger"]
        echo = st.get("echo_override", body.get("full_sync"))
        self._reply(st.get("post_status", 200), {"full_sync": echo})

    def _reply(self, status, payload):
        data = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def sync_server():
    srv = HTTPServer(("127.0.0.1", 0), _SyncService)
    srv.state = {"gets": 0, "posts": [], "busy_polls": 0, "busy_polls_after_trigger": 2}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, f"http://127.0.0.1:{srv.server_address[1]}/"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_trigger_and_wait_full_chain(sync_server):
    srv, url = sync_server
    # service starts busy for one poll — the idle sensor must wait it out
    srv.state["busy_polls"] = 1
    body = trigger_and_wait(url, full_sync=True, poke_interval=0.01, timeout=10)
    assert body == {"job_running": False}
    assert srv.state["posts"] == [{"full_sync": True}]
    # idle sensor: busy + idle GETs; completion sensor: 2 busy + idle
    assert srv.state["gets"] >= 5


def test_trigger_echo_mismatch_raises(sync_server):
    srv, url = sync_server
    srv.state["echo_override"] = True  # service claims full sync regardless
    with pytest.raises(ValueError, match="full_sync"):
        trigger_sync(url, full_sync=False)
    assert srv.state["posts"][0] == {"full_sync": False}


def test_wait_until_idle_times_out(sync_server):
    srv, url = sync_server
    srv.state["busy_polls"] = 10_000
    with pytest.raises(TimeoutError):
        wait_until_idle(url, poke_interval=0.01, timeout=0.05)


def test_incremental_sync_flag_passed_through(sync_server):
    srv, url = sync_server
    trigger_and_wait(url, full_sync=False, poke_interval=0.01, timeout=10)
    assert srv.state["posts"] == [{"full_sync": False}]
