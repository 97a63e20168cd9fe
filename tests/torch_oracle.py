"""Pure-torch eval-mode oracle for parity tests.

Re-expresses (NOT copies) the reference stage-1 forward math
(models/models.py: MLP backbone, Similar_v2 'mlp' head, Target AE encoder)
using only plain torch ops, so per-activation parity of the JAX
implementation can be verified against the shipped checkpoints without PyG.
All functions assume eval mode: BatchNorm uses running stats, dropout off.
"""

import numpy as np
import torch

EPS_BN = 1e-5


def t(a):
    return torch.from_numpy(np.asarray(a)).float()


def linear(x, sd, prefix):
    w, b = t(sd[f"{prefix}.weight"]), sd.get(f"{prefix}.bias")
    out = x @ w.T
    if b is not None:
        out = out + t(b)
    return out


def bn_eval(x, sd, prefix):
    rm, rv = t(sd[f"{prefix}.running_mean"]), t(sd[f"{prefix}.running_var"])
    w, b = t(sd[f"{prefix}.weight"]), t(sd[f"{prefix}.bias"])
    return (x - rm) / torch.sqrt(rv + EPS_BN) * w + b


def mlp_backbone(x, sd, prefix, norm_mode="None"):
    """2-layer MLP backbone, eval mode (models.py:880-893)."""
    assert norm_mode == "None", "oracle only covers the shipped configs"
    h = linear(x, sd, f"{prefix}.layers.0")
    h = torch.relu(h)
    return linear(h, sd, f"{prefix}.layers.1")


def target_encode(x, sd, norm_mode="None"):
    """Equivalence-translation + encoder (models.py:1092-1096), eval mode."""
    h0 = torch.tanh(linear(x, sd, "target_learner.equavilent_trans_layer.0"))
    z = mlp_backbone(h0, sd, "target_learner.encoder", norm_mode)
    return z, h0


def target_decode(z, sd):
    h = torch.relu(linear(z, sd, "target_learner.decoder.layers.0"))
    return torch.tanh(linear(h, sd, "target_learner.decoder.layers.1"))


def pair_mlp_score(z1, z2, idx1, idx2, sd, prefix="source_learner.sim_net"):
    """Similar_v2 'mlp' similarity, eval mode (models.py:949-954)."""
    xp = torch.cat([z1[idx1], z2[idx2]], dim=1)
    h = bn_eval(xp, sd, f"{prefix}.lin_self.0")
    h = linear(h, sd, f"{prefix}.lin_self.1")
    h = bn_eval(h, sd, f"{prefix}.lin_self.2")
    h = torch.relu(h)
    logits = linear(h, sd, f"{prefix}.lin_self.4")
    return torch.sigmoid(logits[:, 0])


def classify(z, sd, prefix="source_learner.sim_net"):
    """Similar_v2 classifier head, eval mode (models.py:993-995)."""
    logits = linear(torch.relu(z), sd, f"{prefix}.lin_clf")
    return torch.log_softmax(logits, dim=-1)


def discriminator(z, sd):
    h = torch.relu(linear(z, sd, "discriminator.layers.0"))
    return torch.sigmoid(linear(h, sd, "discriminator.layers.1"))


def get_probs_cross_domain(x_src, x_tar, idx1, idx2, sd):
    """Eval path of Adversarial_Learner_v2.get_probs_cross_domain
    (models.py:1132-1142), mlp backbone + mlp sim head."""
    z_src = mlp_backbone(x_src, sd, "source_learner.backbone")
    z_tar, _ = target_encode(x_tar, sd)
    probs = pair_mlp_score(z_src, z_tar, idx1, idx2, sd)
    clf_src = classify(z_src, sd).exp()
    clf_tar = classify(z_tar, sd).exp()
    return probs, clf_src, clf_tar, z_src, z_tar
