"""Embedding providers: batching contract (≤96, mirroring the reference's
CohereMaxTexts), HTTP provider wire format, determinism."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from kaer_spark.embeddings import HashingEmbedder, HTTPEmbedder


def test_hashing_embedder_deterministic_and_unit_norm():
    e = HashingEmbedder(dim=64, seed=42)
    a = e.embed(["hello world", "zweiter text"])
    b = e.embed(["hello world", "zweiter text"])
    assert a == b
    assert len(a) == 2 and all(len(v) == 64 for v in a)
    for v in a:
        assert abs(sum(x * x for x in v) - 1.0) < 1e-6  # unit-normalized


def test_http_embedder_requires_endpoint():
    with pytest.raises(NotImplementedError):
        HTTPEmbedder()._embed_batch(["x"])


def test_http_embedder_batches_like_reference():
    """Requests must chunk at ≤96 texts (db/cohere.go:10) and parse the
    embeddings payload into floats."""
    calls: list[int] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            calls.append(len(body["texts"]))
            payload = json.dumps(
                {"embeddings": [[float(len(t)), 1.0] for t in body["texts"]]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        emb = HTTPEmbedder(endpoint=f"http://127.0.0.1:{srv.server_port}")
        vecs = emb.embed([f"text-{i:03d}" for i in range(200)])
        assert len(vecs) == 200
        assert calls == [96, 96, 8]  # reference batching
        assert vecs[0] == [8.0, 1.0] and all(isinstance(x, float) for x in vecs[0])
    finally:
        srv.shutdown()
