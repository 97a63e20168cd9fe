"""Torch-CPU KT-GNN epoch-time baseline on the golden a2d graph.

PyG is not installed here, so this times the reference-equivalent KT-GNN
training step expressed in plain differentiable torch (the same math the
parity oracle uses: scatter-softmax attention + index_add aggregation),
including backward and an Adam step — an apples-to-apples wall-clock
baseline for the framework's 1.17 s/epoch (JAX-CPU) and 0.076 s/epoch
(TPU scan) numbers.

Usage: python tools/bench_torch_baseline.py
"""

import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bridged_gnn_tpu.io import load_pyg_data_dict  # noqa: E402

EPOCHS = 12


def scatter_softmax(logits, index, n):
    m = torch.full((n,), -1e30)
    m = m.scatter_reduce(0, index, logits.detach(), reduce="amax")
    e = (logits - m[index]).exp()
    denom = torch.zeros(n).scatter_add(0, index, e)
    return e / denom.clamp(min=1e-30)[index]


class AdaptedConv(torch.nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.lin_s = torch.nn.Linear(din, dout)
        self.lin_t = torch.nn.Linear(din, dout)
        self.a_g_s2t = torch.nn.Linear(2 * din, 1, bias=False)
        self.a_g_t2s = torch.nn.Linear(2 * din, 1, bias=False)
        self.a_f_s2t = torch.nn.Linear(dout, 1, bias=False)
        self.a_f_t2s = torch.nn.Linear(dout, 1, bias=False)

    def forward(self, x, e1, e2, central):
        n = x.shape[0]
        dd = (x[central].mean(0) - x[~central].mean(0)).expand(x.shape)
        gcat = torch.cat([x, dd], -1)
        x_s2t = x - torch.tanh(self.a_g_s2t(gcat)) * dd * central.float()[:, None]
        x_t2s = x + torch.tanh(self.a_g_t2s(gcat)) * dd * (~central).float()[:, None]
        u_s2t, u_t2s = self.lin_t(x_s2t), self.lin_s(x_t2s)
        a1 = self.a_f_t2s(torch.nn.functional.leaky_relu(
            u_t2s[e1[0]] + u_t2s[e1[1]], 0.1))
        a2 = self.a_f_s2t(torch.nn.functional.leaky_relu(
            u_s2t[e2[0]] + u_s2t[e2[1]], 0.1))
        alpha = scatter_softmax(
            torch.cat([a1, a2])[:, 0], torch.cat([e1[1], e2[1]]), n
        )
        k1 = a1.shape[0]
        out = torch.zeros(n, u_t2s.shape[1])
        out = out.index_add(0, e1[1], u_t2s[e1[0]] * alpha[:k1, None])
        out = out.index_add(0, e2[1], u_s2t[e2[0]] * alpha[k1:, None])
        return out


class KTGNN(torch.nn.Module):
    def __init__(self, din, c, hidden=64):
        super().__init__()
        self.conv = AdaptedConv(din, hidden)
        self.bn = torch.nn.BatchNorm1d(hidden)
        self.clf_base = AdaptedConv(hidden, c)
        self.clf_target = AdaptedConv(hidden, c)
        self.trans = torch.nn.Sequential(
            torch.nn.Linear(hidden, hidden), torch.nn.BatchNorm1d(hidden),
            torch.nn.ReLU(), torch.nn.Linear(hidden, hidden),
        )

    def forward(self, x, e1, e2, central, training):
        h = self.conv(x, e1, e2, central)
        h = self.bn(h)
        h = torch.dropout(torch.relu(h), 0.5, training)
        ls = self.clf_base(h, e1, e2, central)
        lt = self.clf_target(h, e1, e2, central)
        lth = self.clf_target(self.trans(h), e1, e2, central)
        lsm = torch.log_softmax
        return lsm(ls, 1), lsm(lt, 1), lsm(lth, 1)


def main():
    data = load_pyg_data_dict(
        "/root/reference/data_bridged_graph/"
        "office_amazon2dslr_bridged_graph.dat"
    )
    ei = data["edge_index"]
    n = data["x"].shape[0]
    both = np.unique(
        np.concatenate([ei, ei[::-1]], 1).T, axis=0
    ).T  # to_undirected
    loops = np.arange(n)
    keep = both[:, both[0] != both[1]]
    full = np.concatenate([keep, np.stack([loops, loops])], 1)
    central = torch.from_numpy(data["central_mask"].astype(bool))
    m1 = central.numpy()[full[1]]
    e1 = torch.from_numpy(full[:, m1])
    e2 = torch.from_numpy(full[:, ~m1])
    x = torch.from_numpy(data["x"]).float()
    y = torch.from_numpy(data["y"]).long()
    train_mask = torch.from_numpy(data["train_mask"].astype(bool))
    train_mask = train_mask & (y != -1)
    tar_train = train_mask & ~central

    torch.manual_seed(0)
    model = KTGNN(x.shape[1], int(y.max()) + 1)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=5e-3)
    nll = torch.nn.functional.nll_loss

    times = []
    for ep in range(EPOCHS):
        t0 = time.perf_counter()
        model.train()
        opt.zero_grad()
        ls, lt, lth = model(x, e1, e2, central, True)
        loss = (
            2 * nll(ls[train_mask], y[train_mask])
            + nll(lt[tar_train], y[tar_train])
            + nll(lth[tar_train], y[tar_train])
        ) / 4 + torch.nn.functional.kl_div(
            lth, lt, log_target=True, reduction="batchmean"
        )
        loss.backward()
        opt.step()
        with torch.no_grad():
            model.eval()
            model(x, e1, e2, central, False)
        times.append(time.perf_counter() - t0)
    mean = float(np.mean(times[2:]))
    print(f"torch-cpu KTGNN a2d: {mean:.3f} s/epoch "
          f"(loss {float(loss):.4f})")
    json.dump(
        {"torch_cpu_mean_epoch_s": mean},
        open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results_a2d_torch_baseline.json"),
            "w"),
        indent=1,
    )


if __name__ == "__main__":
    main()
