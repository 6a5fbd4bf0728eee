"""Interactive HTML viewer export (C8 interactive counterpart).

The exported file is a standalone WebGL page; these tests validate the
*data contract* it embeds: centered f32 point payloads that decode back
to the inputs, and per-iteration transforms re-based to the centered
frame such that replay in the viewer equals ``session.replay(k)`` in the
world frame (pointcloudviewer.cpp:86-116 semantics)."""

import base64
import json
import re

import numpy as np

from iterativeclosestpoint_tpu.cli import main as cli_main
from iterativeclosestpoint_tpu.io.las import write_las
from iterativeclosestpoint_tpu.runtime.htmlviz import export_interactive_html
from iterativeclosestpoint_tpu.runtime.session import RegistrationSession
from iterativeclosestpoint_tpu.utils.config import ICPConfig
from iterativeclosestpoint_tpu.utils.synth import make_registration_pair


def _payload(path):
    html = path.read_text()
    m = re.search(r"const D=(\{.*?\});\n", html, re.S)
    assert m, "embedded data payload not found"
    return json.loads(m.group(1)), html


def _decode(b64, n):
    pts = np.frombuffer(base64.b64decode(b64), dtype="<f4")
    return pts.reshape(n, 3).astype(np.float64)


def test_export_roundtrip_and_replay_parity(tmp_path):
    src, tgt, _ = make_registration_pair(n=2000, seed=31, noise_sigma=0.01)
    sess = RegistrationSession()
    sess.source = sess.original_source = src
    sess.target = tgt
    sess.run(ICPConfig(max_iterations=8, nn_backend="bruteforce",
                       tolerance=1e-10))
    out = tmp_path / "view.html"
    sess.export_html(out)

    d, html = _payload(out)
    assert "<canvas" in html and "WEBGL" in html.upper() or "webgl" in html
    k = sess.result.iterations
    assert len(d["transforms"]) == k
    assert d["stats"][0]["iteration"] == 1 and "rmse" in d["stats"][0]

    lo = np.minimum(src.min(0), tgt.min(0))
    hi = np.maximum(src.max(0), tgt.max(0))
    center = (lo + hi) / 2

    src_c = _decode(d["src"], d["nSrc"])
    tgt_c = _decode(d["tgt"], d["nTgt"])
    assert np.allclose(src_c + center, src, atol=1e-3)
    assert np.allclose(tgt_c + center, tgt, atol=1e-3)

    # Replay parity: centered transform applied to centered points must
    # equal the world-frame replay minus the center, for every iteration.
    for i in (1, k):
        Tc = np.asarray(d["transforms"][i - 1])
        world = sess.replay(i)
        replayed = src_c @ Tc[:3, :3].T + Tc[:3, 3]
        assert np.allclose(replayed, world - center, atol=1e-3), i


def test_subsampling_cap(tmp_path):
    src, tgt, _ = make_registration_pair(n=3000, seed=32)
    out = tmp_path / "v.html"
    export_interactive_html(out, src, tgt, max_points=500)
    d, _ = _payload(out)
    assert d["nSrc"] == 500 and d["nTgt"] == 500
    assert d["srcTotal"] == 3000 and d["tgtTotal"] == 3000
    assert not d["transforms"]  # no history -> no replay bar data


def test_cli_view_html(tmp_path):
    src, tgt, _ = make_registration_pair(n=1500, seed=33, noise_sigma=0.01)
    sp, tp = tmp_path / "s.las", tmp_path / "t.las"
    write_las(sp, src)
    write_las(tp, tgt)
    reg = tmp_path / "reg.las"
    run_html = tmp_path / "run_view.html"
    rc = cli_main(["run", str(sp), str(tp), "-o", str(reg),
                   "--nn-backend", "bruteforce", "--max-iterations", "6",
                   "--html", str(run_html)])
    assert rc == 0
    d, _ = _payload(run_html)
    assert len(d["transforms"]) >= 1

    hist = tmp_path / "reg_transform.json"  # written next to the report
    out = tmp_path / "v.html"
    rc = cli_main(["view", str(sp), str(tp), "-o", str(out),
                   "--history", str(hist)])
    assert rc == 0
    d, _ = _payload(out)
    assert len(d["transforms"]) >= 1
    # iteration metadata survives the history-JSON roundtrip
    assert d["stats"][0]["valid_points"] > 0
