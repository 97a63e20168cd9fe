"""HTTP serving layer (cli/serve.py): endpoints, errors, CLI loading."""

import json
import pickle
import threading
import urllib.request

import jax
import numpy as np
import pytest

from bridged_gnn_tpu.cli.serve import (
    ServingApp,
    _load_predictor,
    build_argparser,
    make_server,
)
from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.graph import graph_from_dict
from bridged_gnn_tpu.serve import KTGNNPredictor, SimilarityScorer


def _call(port, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    if body is None:
        req = urllib.request.Request(url)
    else:
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def served():
    rng = np.random.default_rng(0)
    # similarity scorer over a tiny source corpus (init weights: the API
    # plumbing is what's under test, not accuracy)
    from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2
    import jax.numpy as jnp

    d = 12
    model = AdversarialLearnerV2(
        dim_in_src=d, dim_in_tar=d, num_classes_src=3, num_classes_tar=3,
        dim_hidden=8, source_clf=True, use_norm=True, norm_mode="None",
        backbone="mlp", sim_mode="mlp",
    )
    x = jnp.zeros((8, d))
    idx = jnp.zeros(4, dtype=jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), x, None, x, None, idx, idx,
        method=AdversarialLearnerV2.init_all,
    )
    g_src = graph_from_dict(dict(
        x=rng.normal(size=(40, d)).astype(np.float32),
        edge_index=np.zeros((2, 0), dtype=np.int64),
        y=rng.integers(0, 3, size=40),
    ))
    scorer = SimilarityScorer(model, variables, g_src, sim_mode="mlp",
                              row_block=16)

    # predictor over a tiny bridged graph (init weights)
    data = make_sync_dataset("relational-intra", n_src=60, n_tar=40, dim=d,
                             num_classes=3, seed=1)
    n = data["x"].shape[0]
    r = rng.random(n)
    data["train_mask"] = r < 0.6
    data["val_mask"] = (r >= 0.6) & (r < 0.8)
    data["test_mask"] = r >= 0.8
    from bridged_gnn_tpu.train.stage2 import (
        Stage2Config,
        build_model,
        prepare_stage2_graph,
    )

    cfg = Stage2Config(hidden=8, to_undirected=True, use_scheduler=False)
    g, adj = prepare_stage2_graph(dict(data), cfg)
    kt = build_model(cfg, 3)
    kt_vars = kt.init(jax.random.PRNGKey(1), g, adj, False)
    predictor = KTGNNPredictor(kt, kt_vars, dict(data), to_undirected=True)

    app = ServingApp(scorer=scorer, predictor=predictor,
                     meta={"mode": "both"})
    srv = make_server(app, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv.server_address[1], data
    srv.shutdown()


def test_healthz_and_meta(served):
    port, _ = served
    code, body = _call(port, "/healthz")
    assert code == 200 and body["status"] == "ok"
    code, body = _call(port, "/meta")
    assert code == 200 and body["mode"] == "both"


def test_topk_endpoint(served):
    port, _ = served
    rng = np.random.default_rng(3)
    q = rng.normal(size=(5, 12)).astype(np.float32)
    code, body = _call(port, "/v1/topk", {"x": q.tolist(), "k": 4})
    assert code == 200
    vals = np.asarray(body["values"])
    idxs = np.asarray(body["indices"])
    assert vals.shape == (5, 4) and idxs.shape == (5, 4)
    assert (idxs >= 0).all() and (idxs < 40).all()
    assert (np.diff(vals, axis=1) <= 1e-6).all()  # sorted descending


def test_predict_endpoint(served):
    port, data = served
    n = data["x"].shape[0]
    code, body = _call(port, "/v1/predict", {"head": "target_hat"})
    assert code == 200 and len(body["labels"]) == n
    code, body = _call(
        port, "/v1/predict",
        {"head": "source", "nodes": [0, 5, 9], "log_probs": True},
    )
    assert code == 200
    assert len(body["labels"]) == 3
    lp = np.asarray(body["log_probs"])
    assert lp.shape == (3, 3) and np.isfinite(lp).all()


def test_predict_live_and_refresh(served):
    """Live inference on updated features (/v1/predict {"x": ...}) and
    persistent refresh (/v1/refresh): VERDICT r4 #5 — predictions must
    actually run the model, not just read the startup cache."""
    port, data = served
    n, d = data["x"].shape
    rng = np.random.default_rng(7)

    # cache and live-on-identical-features must agree exactly
    code, cached = _call(port, "/v1/predict",
                         {"head": "target_hat", "log_probs": True})
    assert code == 200 and cached["computed"] == "cache"
    code, live = _call(port, "/v1/predict", {
        "head": "target_hat", "log_probs": True,
        "x": np.asarray(data["x"], dtype=np.float32).tolist()})
    assert code == 200 and live["computed"] == "live"
    np.testing.assert_allclose(
        np.asarray(live["log_probs"]), np.asarray(cached["log_probs"]),
        rtol=1e-5, atol=1e-6,
    )

    # perturbed features must change SOME outputs (the model really ran)
    x2 = np.asarray(data["x"], dtype=np.float32) + rng.normal(
        scale=3.0, size=(n, d)).astype(np.float32)
    code, moved = _call(port, "/v1/predict", {
        "head": "target_hat", "log_probs": True, "x": x2.tolist()})
    assert code == 200 and moved["computed"] == "live"
    assert not np.allclose(np.asarray(moved["log_probs"]),
                           np.asarray(cached["log_probs"]), atol=1e-4)

    # partial row update via x_nodes
    code, part = _call(port, "/v1/predict", {
        "head": "target_hat", "x": x2[:3].tolist(), "x_nodes": [0, 1, 2]})
    assert code == 200 and part["computed"] == "live"

    # wrong shapes -> 400 with a clear message
    code, body = _call(port, "/v1/predict", {"x": [[0.0] * 3]})
    assert code == 400 and "features must be" in body["error"]
    code, body = _call(port, "/v1/predict",
                       {"x": [[0.0] * d], "x_nodes": [0, 1]})
    assert code == 400

    # refresh installs features persistently: cache now matches the live
    # result for the same features
    code, body = _call(port, "/v1/refresh", {"x": x2.tolist()})
    assert code == 200 and body["updated_rows"] == n
    code, after = _call(port, "/v1/predict",
                        {"head": "target_hat", "log_probs": True})
    assert code == 200 and after["computed"] == "cache"
    np.testing.assert_allclose(
        np.asarray(after["log_probs"]), np.asarray(moved["log_probs"]),
        rtol=1e-5, atol=1e-6,
    )
    # restore the original features for later tests in this module
    code, body = _call(port, "/v1/refresh", {
        "x": np.asarray(data["x"], dtype=np.float32).tolist()})
    assert code == 200


def test_error_paths(served):
    port, _ = served
    code, body = _call(port, "/v1/predict", {"head": "nope"})
    assert code == 400 and "unknown head" in body["error"]
    code, body = _call(port, "/v1/topk", {"x": [1.0, 2.0], "k": 2})
    assert code == 400
    code, body = _call(port, "/v1/topk", {"x": [[0.0] * 12], "k": 10**6})
    assert code == 400
    # wrong feature width -> clear 400, not an XLA shape error
    code, body = _call(port, "/v1/topk", {"x": [[0.0] * 5], "k": 2})
    assert code == 400 and "dim" in body["error"]
    code, body = _call(port, "/nope", {})
    assert code == 404


def test_cli_predictor_loading(tmp_path, served):
    """The --mode predictor loading path: graph npz + pickled variables."""
    _, data = served
    from bridged_gnn_tpu.io import save_graph_npz
    from bridged_gnn_tpu.train.stage2 import (
        Stage2Config,
        build_model,
        prepare_stage2_graph,
    )

    cfg = Stage2Config(hidden=8, to_undirected=True, use_scheduler=False)
    g, adj = prepare_stage2_graph(dict(data), cfg)
    kt = build_model(cfg, 3)
    kt_vars = kt.init(jax.random.PRNGKey(1), g, adj, False)
    gpath = tmp_path / "g.npz"
    save_graph_npz(str(gpath), dict(data))
    cpath = tmp_path / "best.pkl"
    with open(cpath, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, kt_vars), f)
    args = build_argparser().parse_args([
        "--mode", "predictor", "--ckpt", str(cpath),
        "--path_data", str(gpath), "--hidden_dim", "8", "--to_undirected",
    ])
    app = _load_predictor(args)
    out = app.predict({"head": "target_hat"})
    assert len(out["labels"]) == data["x"].shape[0]


class _StubScorer:
    """Minimal scorer surface for HTTP-guard tests (no device work)."""
    num_src = 40
    model = type("_M", (), {"dim_in_tar": 12})()

    def topk_sources(self, x, k):
        if x.shape[0] > 1:
            raise RuntimeError("boom")  # exercises the 500 path
        return (np.zeros((x.shape[0], k), np.float32),
                np.zeros((x.shape[0], k), np.int64))


def test_request_guards_and_500():
    app = ServingApp(scorer=_StubScorer(), meta={"mode": "similarity"},
                     max_request_bytes=10_000, max_query_rows=2)
    srv = make_server(app, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    port = srv.server_address[1]
    try:
        # within limits -> 200
        code, body = _call(port, "/v1/topk", {"x": [[0.0] * 12], "k": 3})
        assert code == 200 and len(body["indices"]) == 1
        # oversized body -> 413 before any parsing/compute
        code, body = _call(
            port, "/v1/topk",
            {"x": [[0.0] * 12], "k": 1, "pad": "x" * 20_000})
        assert code == 413 and "byte limit" in body["error"]
        # too many query rows -> 413
        code, body = _call(
            port, "/v1/topk", {"x": [[0.0] * 12] * 3, "k": 1})
        assert code == 413 and "query rows" in body["error"]
        # model-path runtime error -> JSON 500, not a dropped connection;
        # the body is generic — exception detail stays server-side
        code, body = _call(
            port, "/v1/topk", {"x": [[0.0] * 12] * 2, "k": 1})
        assert code == 500 and body["error"] == "internal error"
        assert "RuntimeError" not in body["error"]
    finally:
        srv.shutdown()
