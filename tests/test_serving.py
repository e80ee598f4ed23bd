"""Serving layer: HTTP field evaluation end-to-end (stdlib client)."""

import json
import urllib.request

import jax
import numpy as np
import pytest

from pinn_elastodynamics_tpu.cases import wave_confined
from pinn_elastodynamics_tpu.serving import FieldEvaluator, FieldServer
from pinn_elastodynamics_tpu.train.checkpoint import load_reference_pickle


@pytest.fixture(scope="module")
def server():
    model = wave_confined.build_model()
    params = load_reference_pickle(
        "/root/reference/ElasticWaveConfined/uv_NN_14s_float64_new.pickle"
    )
    ev = FieldEvaluator(model, params, chunk=256, name="confined").warmup()
    srv = FieldServer(ev).start()
    yield srv
    srv.stop()


def _post(server, path, payload):
    host, port = server.address
    req = urllib.request.Request(
        f"http://{host}:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(server, path):
    host, port = server.address
    with urllib.request.urlopen(f"http://{host}:{port}{path}") as r:
        return r.status, json.loads(r.read())


def test_healthz_and_meta(server):
    code, body = _get(server, "/healthz")
    assert code == 200 and body["status"] == "ok"
    code, meta = _get(server, "/meta")
    assert meta["ndim"] == 2 and meta["formulation"] == "first_order"
    assert "s11" in meta["channels"]


def test_predict_roundtrip(server):
    pts = [[0.0, 5.0], [3.0, -2.0], [10.0, 10.0]]
    code, body = _post(server, "/predict", {
        "points": pts, "t": 6.0, "fields": ["u", "v", "s11"],
    })
    assert code == 200
    assert set(body["fields"]) == {"u", "v", "s11"}
    assert len(body["fields"]["u"]) == 3
    assert all(np.isfinite(body["fields"]["u"]))


def test_predict_matches_direct(server):
    from pinn_elastodynamics_tpu.eval.render import predict_fields
    model = wave_confined.build_model()
    params = load_reference_pickle(
        "/root/reference/ElasticWaveConfined/uv_NN_14s_float64_new.pickle"
    )
    xy = np.array([[1.0, 2.0], [-4.0, 7.0]])
    direct = predict_fields(model, params, xy, 5.0, chunk=256)
    code, body = _post(server, "/predict", {"points": xy.tolist(), "t": 5.0})
    np.testing.assert_allclose(
        body["fields"]["u"], direct["u"], rtol=1e-5
    )


def test_predict_error_paths(server):
    code, body = _post(server, "/predict", {"points": [[1.0]], "t": 0})
    assert code == 400 and "points" in body["error"]
    code, body = _post(server, "/predict", {
        "points": [[0.0, 0.0]], "fields": ["bogus"],
    })
    assert code == 400 and "bogus" in body["error"]
    code, body = _post(server, "/nope", {})
    assert code == 404
