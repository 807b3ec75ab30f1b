"""Serving-API tests: routes, payloads, blob store — WSGI app called
directly (reference eval/main.py contract: /api/v1.0/bird(s), version root,
elapsed field)."""

import io
import json

import numpy as np
import pytest

from sba_gan_tpu.serving.app import (
    GanService,
    LocalDiskStore,
    make_wsgi_app,
)


def fake_sampler(ids, lens, seed):
    b = ids.shape[0]
    rng = np.random.default_rng(seed)
    fakes = [rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
             for s in (8, 16)]
    atts = [rng.uniform(0, 1, (b, 4, 4, ids.shape[1])).astype(np.float32)]
    return fakes, atts


@pytest.fixture
def client(tmp_path):
    wordtoix = {f"w{i}": i for i in range(1, 20)}
    ixtoword = {i: w for w, i in wordtoix.items()}
    service = GanService(fake_sampler, wordtoix, ixtoword, words_num=6,
                         store=LocalDiskStore(str(tmp_path)))
    app = make_wsgi_app(service)

    def call(method, path, body=None):
        data = json.dumps(body).encode() if body is not None else b""
        status_headers = {}

        def start_response(status, headers):
            status_headers["status"] = status
            status_headers["headers"] = dict(headers)

        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path,
            "CONTENT_LENGTH": str(len(data)),
            "wsgi.input": io.BytesIO(data),
        }
        chunks = app(environ, start_response)
        return status_headers["status"], status_headers["headers"], b"".join(chunks)

    return call


def test_version_route(client):
    status, _, body = client("GET", "/")
    assert status == "200 OK"
    assert json.loads(body)["version"] == "1.0"


def test_bird_route(client):
    status, _, body = client("POST", "/api/v1.0/bird",
                             {"caption": "w1 w2 w3"})
    assert status == "200 OK"
    out = json.loads(body)
    assert out["caption"] == "w1 w2 w3"
    assert len(out["results"]) == 1
    entry = out["results"][0]
    assert {"small", "medium", "map1"} <= set(entry)
    assert out["elapsed"] >= 0


def test_birds_route_and_image_fetch(client):
    status, _, body = client("POST", "/api/v1.0/birds", {"caption": "w1 w4"})
    out = json.loads(body)
    assert len(out["results"]) == 6
    url = out["results"][0]["small"]
    status, headers, img = client("GET", url)
    assert status == "200 OK"
    assert headers["Content-Type"] == "image/png"
    assert img[:8] == b"\x89PNG\r\n\x1a\n"


def test_telemetry_event(tmp_path):
    """One telemetry event per generate call (reference App Insights
    behavior, eval/main.py:67-71)."""
    events = []
    wordtoix = {"w1": 1}
    svc = GanService(fake_sampler, wordtoix, {1: "w1"}, 6,
                     LocalDiskStore(str(tmp_path)), telemetry=events.append)
    svc.generate("w1", copies=2)
    assert len(events) == 1
    assert events[0]["event"] == "generate"
    assert events[0]["copies"] == 2
    assert "elapsed" in events[0]


def test_path_traversal_blocked(client, tmp_path):
    status, _, body = client("GET", "/images/../../etc/passwd")
    assert status == "404 Not Found"
    assert b"root" not in body


def test_bad_request(client):
    status, _, body = client("POST", "/api/v1.0/bird", {"nope": 1})
    assert status == "400 Bad Request"
    status, _, _ = client("GET", "/api/nothing")
    assert status == "404 Not Found"
