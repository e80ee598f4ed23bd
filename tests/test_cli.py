"""CLI driver (`python -m pinn_elastodynamics_tpu.run`) smoke test."""

import json
import os
import pickle

from pinn_elastodynamics_tpu import run as cli


def test_cli_plate_hole_tiny(tmp_path):
    out = str(tmp_path / "run")
    rc = cli.main([
        "--case", "plate_hole", "--scale", "0.002", "--out", out,
        "--maxiter", "dist=5", "part=5", "uv=5",
        "--log-every", "0",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    events = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    names = [e["event"] for e in events]
    assert "start" in names and "train_done" in names
    assert names.count("phase_end") == 3
    # Reference-compatible uv export.
    with open(os.path.join(out, "plate_hole_quarter_uv.pickle"), "rb") as f:
        w, b = pickle.load(f)
    assert w[0].shape == (3, 70) and b[-1].shape == (1, 5)
    # Native phase checkpoints.
    assert os.path.exists(os.path.join(out, "plate_hole_quarter_uv.ckpt"))


def test_cli_warm_start_from_reference_pickle(tmp_path):
    out = str(tmp_path / "run2")
    rc = cli.main([
        "--case", "wave_confined", "--scale", "0.002", "--out", out,
        "--maxiter", "uv=3",
        "--warm-start",
        "/root/reference/ElasticWaveConfined/uv_NN_14s_float64_new.pickle",
    ])
    assert rc == 0
    events = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    done = [e for e in events if e["event"] == "train_done"][0]
    # Warm-started from the reference's converged net: components small.
    assert done["components"]["f_uv"] < 0.1
