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
    """Reference response shape (eval/main.py:27-36): payload under 'bird'
    with small/medium/map1/caption/elapsed, HTTP 201."""
    status, _, body = client("POST", "/api/v1.0/bird",
                             {"caption": "w1 w2 w3"})
    assert status == "201 Created"
    bird = json.loads(body)["bird"]
    assert bird["caption"] == "w1 w2 w3"
    assert {"small", "medium", "map1"} <= set(bird)
    assert bird["elapsed"] >= 0


def test_birds_route_and_image_fetch(client):
    """Reference 6-copy shape (eval/main.py:49-59): bird1..bird6."""
    status, _, body = client("POST", "/api/v1.0/birds", {"caption": "w1 w4"})
    assert status == "201 Created"
    bird = json.loads(body)["bird"]
    assert {f"bird{j}" for j in range(1, 7)} <= set(bird)
    url = bird["bird1"]["small"]
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


def test_request_telemetry_middleware(client, tmp_path):
    """Per-request WSGI events (reference WSGIApplication wrapper,
    eval/main.py:14) and the file-sink TELEMETRY target."""
    import io as _io

    from sba_gan_tpu.serving.app import (
        TelemetryMiddleware,
        make_telemetry,
    )

    events = []
    inner = lambda env, start: (start("200 OK", []), [b"ok"])[1]
    app = TelemetryMiddleware(inner, events.append)
    app({"REQUEST_METHOD": "GET", "PATH_INFO": "/x",
         "wsgi.input": _io.BytesIO(b"")}, lambda *a: None)
    assert events[0]["event"] == "request"
    assert events[0]["path"] == "/x"
    assert events[0]["status"] == "200 OK"
    assert events[0]["ms"] >= 0

    sink = tmp_path / "telemetry.jsonl"
    emit = make_telemetry(str(sink))
    emit({"event": "container start", "starttime": 1.5})
    line = json.loads(sink.read_text().strip())
    assert line["telemetry"]["event"] == "container start"


def test_jpeg_and_scaled_attention_maps(client):
    """Payload-shrink options (VERDICT r4 weak-#6): map_format='jpeg' +
    map_scale<1 produce JPEG overlays at reduced size; stage images stay
    PNG (reference parity)."""
    status, _, body = client(
        "POST", "/api/v1.0/bird",
        {"caption": "w1 w2 w3", "map_format": "jpeg", "map_scale": 0.5})
    assert status == "201 Created"
    bird = json.loads(body)["bird"]
    assert bird["map1"].endswith(".jpg")
    status, headers, img = client("GET", bird["map1"])
    assert status == "200 OK"
    assert headers["Content-Type"] == "image/jpeg"
    assert img[:2] == b"\xff\xd8"  # JPEG SOI
    # stage image still PNG
    status, headers, img = client("GET", bird["small"])
    assert headers["Content-Type"] == "image/png"
    assert img[:8] == b"\x89PNG\r\n\x1a\n"


def test_map_option_validation(client):
    status, _, _ = client("POST", "/api/v1.0/bird",
                          {"caption": "w1", "map_format": "bmp"})
    assert status == "400 Bad Request"
    status, _, _ = client("POST", "/api/v1.0/bird",
                          {"caption": "w1", "map_scale": 0})
    assert status == "400 Bad Request"
