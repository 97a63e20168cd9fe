"""Pure-torch eval-mode oracle for KT-GNN parity tests.

Implements the reference AdaptedConv/KTGNN forward math
(models/KTGNN.py:263-315,401-435) in the reference's own formulation — two
destination-partitioned edge sets, concatenated logits, one joint
scatter-softmax, two scatter-add propagates — using plain torch. The JAX
model uses a single destination-sorted edge array with a per-edge branch
select; matching outputs here proves the two formulations equivalent.

Parameters are supplied in flax layout ([in, out] kernels); this oracle
consumes them directly.
"""

import numpy as np
import torch


def t(a):
    return torch.from_numpy(np.asarray(a)).float()


def scatter_softmax(logits, index, num_nodes):
    """torch_geometric.utils.softmax semantics (max-shifted, by dst)."""
    m = torch.full((num_nodes,), -1e30)
    m = m.scatter_reduce(0, index, logits, reduce="amax")
    shifted = logits - m[index]
    e = shifted.exp()
    denom = torch.zeros(num_nodes).scatter_add(0, index, e)
    denom = torch.where(denom == 0, torch.ones_like(denom), denom)
    return e / denom[index]


def scatter_add_rows(msg, index, num_nodes):
    out = torch.zeros(num_nodes, msg.shape[1])
    return out.index_add(0, index, msg)


def adapted_conv(x, e1, e2, central, p):
    """Reference-formulation AdaptedConv eval forward.

    Args:
      x: [N, D] torch tensor
      e1: [2, E1] edges whose destination is central (source-domain)
      e2: [2, E2] edges whose destination is non-central
      central: [N] bool
      p: flax param dict for one AdaptedConv
    """
    n = x.shape[0]
    dd = x[central].mean(0) - x[~central].mean(0)  # [D]
    ddx = dd.expand(x.shape)
    gcat = torch.cat([x, ddx], dim=-1)
    shift_s2t = torch.tanh(gcat @ t(p["a_g_s2t"]["kernel"])) * ddx
    shift_t2s = torch.tanh(gcat @ t(p["a_g_t2s"]["kernel"])) * ddx
    x_s2t = x - shift_s2t * central.float().unsqueeze(-1)
    x_t2s = x + shift_t2s * (~central).float().unsqueeze(-1)

    u_s2t = x_s2t @ t(p["lin_t"]["kernel"]) + t(p["lin_t"]["bias"])
    u_t2s = x_t2s @ t(p["lin_s"]["kernel"]) + t(p["lin_s"]["bias"])

    a_t2s = torch.nn.functional.leaky_relu(
        u_t2s[e1[0]] + u_t2s[e1[1]], negative_slope=0.1
    )
    a_s2t = torch.nn.functional.leaky_relu(
        u_s2t[e2[0]] + u_s2t[e2[1]], negative_slope=0.1
    )
    alpha1 = a_t2s @ t(p["a_f_t2s"]["kernel"])
    alpha2 = a_s2t @ t(p["a_f_s2t"]["kernel"])
    # joint softmax over concatenated edges keyed by destination
    alpha = torch.cat([alpha1, alpha2], dim=0)[:, 0]
    dst = torch.cat([e1[1], e2[1]], dim=0)
    alpha = scatter_softmax(alpha, dst, n)
    a1, a2 = alpha[: alpha1.shape[0]], alpha[alpha1.shape[0]:]

    out = scatter_add_rows(u_t2s[e1[0]] * a1[:, None], e1[1], n)
    out = out + scatter_add_rows(u_s2t[e2[0]] * a2[:, None], e2[1], n)
    if "lin_r" in p:
        out = out + x @ t(p["lin_r"]["kernel"])
    return out


def bn_eval(x, p, stats):
    return (x - t(stats["mean"])) / torch.sqrt(t(stats["var"]) + 1e-5) * t(
        p["scale"]
    ) + t(p["bias"])


def ktgnn_forward(x, e1, e2, central, params, batch_stats, layer_num=2,
                  use_bn=True):
    """KTGNN_no_complement eval forward (KTGNN.py:401-435)."""
    h = x
    for i in range(max(layer_num - 1, 1)):
        h = adapted_conv(h, e1, e2, central, params[f"convs_{i}"])
        if use_bn:
            h = bn_eval(h, params[f"bns_{i}"], batch_stats[f"bns_{i}"])
        h = torch.relu(h)
    logits_base = adapted_conv(h, e1, e2, central, params["clf_base"])
    ct = params["clf_transformer"]
    ht = h @ t(ct["lin_0"]["kernel"]) + t(ct["lin_0"]["bias"])
    ht = bn_eval(ht, ct["bn_1"], batch_stats["clf_transformer"]["bn_1"])
    ht = torch.relu(ht)
    ht = ht @ t(ct["lin_3"]["kernel"]) + t(ct["lin_3"]["bias"])
    logits_that = adapted_conv(ht, e1, e2, central, params["clf_target"])
    logits_t = adapted_conv(h, e1, e2, central, params["clf_target"])
    ls = torch.log_softmax
    return ls(logits_base, 1), ls(logits_t, 1), ls(logits_that, 1)
