"""TPU-backend HTTP serving latencies (VERDICT r3 item 8).

Round 3's serving numbers (results_serve_cpu.json) were all host-CPU.
This drives the REAL HTTP path — cli/serve.py in a child process on
whatever backend JAX selects (the tunneled TPU chip when available,
kernel auto-policy on via --matmul_precision default) — and records
endpoint latencies measured from the client side:

  * similarity mode: /v1/topk at batch 1 / 32 / 256 query rows against
    the shipped office a2d checkpoint + corpus;
  * predictor mode: /v1/predict (full-graph KTGNN, 3 heads) over a
    quickly-trained a2d KTGNN snapshot.

Writes results_serve_http_<platform>.json next to the CPU rows.

Usage: nohup python tools/bench_serve_http.py > tools/bench_serve_http.log 2>&1 &
"""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

A2D_CKPT = "/root/reference/ckpt/model_AdvLearner_office_amazon2dslr_best.ckpt"
A2D_GRAPH = (
    "/root/reference/data_bridged_graph/office_amazon2dslr_bridged_graph.dat"
)
PORT_SIM = 18811
PORT_PRED = 18812


def post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def wait_healthy(port, timeout_s=600):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10
            ) as r:
                got = json.loads(r.read())
                if got.get("status") == "ok":
                    return got
        except Exception:
            time.sleep(3)
    raise RuntimeError(f"server on :{port} never became healthy")


def timed(fn, iters=20):
    fn()  # warm (jit/pad-cache)
    fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters * 1e3  # ms


def bench_similarity(out):
    import numpy as np

    proc = subprocess.Popen(
        [sys.executable, "-m", "bridged_gnn_tpu.cli.serve",
         "--mode", "similarity", "--ckpt", A2D_CKPT,
         "--corpus", A2D_GRAPH, "--hidden_dim", "128",
         "--port", str(PORT_SIM)],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    try:
        h = wait_healthy(PORT_SIM)
        out["similarity_backend"] = h.get("backend", "?")
        rng = np.random.default_rng(0)
        for bs in (1, 32, 256):
            x = rng.normal(size=(bs, 256)).astype(np.float32).tolist()
            ms = timed(lambda x=x: post(PORT_SIM, "/v1/topk",
                                        {"x": x, "k": 20}))
            out[f"http_topk_bs{bs}_ms"] = round(ms, 2)
            out[f"http_topk_bs{bs}_qps"] = round(bs / (ms / 1e3), 1)
    finally:
        os.killpg(proc.pid, signal.SIGTERM)
        proc.wait(timeout=30)


def bench_predictor(out, ckpt_pkl, graph_npz, x_rows):
    proc = subprocess.Popen(
        [sys.executable, "-m", "bridged_gnn_tpu.cli.serve",
         "--mode", "predictor", "--ckpt", ckpt_pkl,
         "--path_data", graph_npz, "--hidden_dim", "64",
         "--to_undirected", "--matmul_precision", "default",
         "--port", str(PORT_PRED)],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    try:
        h = wait_healthy(PORT_PRED)
        out["predictor_backend"] = h.get("backend", "?")
        ms = timed(lambda: post(PORT_PRED, "/v1/predict", {}), iters=10)
        # honest row naming (VERDICT r4 #5): no "x" -> startup-cache read
        out["http_predict_cache_ms"] = round(ms, 2)
        out["http_predict_fullgraph_ms"] = round(ms, 2)  # back-compat key
        # LIVE inference rows: the cached jitted program runs on
        # request-supplied features (full matrix / partial rows)
        ms = timed(lambda: post(
            PORT_PRED, "/v1/predict", {"x": x_rows}), iters=5)
        out["http_predict_live_fullx_ms"] = round(ms, 2)
        ms = timed(lambda: post(
            PORT_PRED, "/v1/predict",
            {"x": x_rows[:16], "x_nodes": list(range(16))}), iters=5)
        out["http_predict_live_16rows_ms"] = round(ms, 2)
        ms = timed(lambda: post(
            PORT_PRED, "/v1/refresh", {"x": x_rows}), iters=3)
        out["http_refresh_fullx_ms"] = round(ms, 2)
    finally:
        os.killpg(proc.pid, signal.SIGTERM)
        proc.wait(timeout=30)


def main():
    # train a quick KTGNN snapshot for the predictor endpoint (the
    # serving artifact a production run would have saved)
    import jax

    from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    out = {"platform": jax.devices()[0].platform}

    from bridged_gnn_tpu.graph import graph_from_dict
    from bridged_gnn_tpu.io.pyg_compat import load_pyg_data_dict
    from bridged_gnn_tpu.io.serialize import save_graph_npz
    from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

    data = load_pyg_data_dict(A2D_GRAPH)
    ckpt_pkl = "/tmp/bench_serve_ktgnn.pkl"
    graph_npz = "/tmp/bench_serve_a2d.npz"
    save_graph_npz(graph_npz, data)
    train_ktgnn(dict(data), Stage2Config(
        num_epoch=30, hidden=64, to_undirected=True,
        matmul_precision="default", save_best_path=ckpt_pkl,
    ))

    bench_similarity(out)
    import numpy as _np

    x_rows = _np.asarray(data["x"], dtype=_np.float32).tolist()
    bench_predictor(out, ckpt_pkl, graph_npz, x_rows)

    path = os.path.join(REPO, f"results_serve_http_{out['platform']}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print("wrote", path)


if __name__ == "__main__":
    main()
