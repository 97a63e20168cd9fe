"""Device-resident pair sampler: shape parity with the host enumerators,
class/split correctness of the drawn indices, determinism, and a
device-sampling stage-1 scan run end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridged_gnn_tpu.data import dataset_conversion
from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.train.device_sampler import (
    DevicePairSampler,
    DevicePairSamplerCross,
    build_device_samplers,
    sample_epoch_on_device,
)
from bridged_gnn_tpu.train.samplers import (
    PairEnumerator,
    PairEnumeratorCross,
)
from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial


@pytest.fixture(scope="module")
def domains():
    data = make_sync_dataset(
        "relational-intra", n_src=300, n_tar=200, dim=16,
        num_classes=4, avg_degree=4, seed=0,
    )
    src_d, tar_d, _, _ = dataset_conversion(dict(data), seed=0)
    return src_d, tar_d


MAX_CLS, SIZE = 4, 1600


def test_within_shapes_match_host(domains):
    src_d, _ = domains
    host = PairEnumerator(src_d, "train", np.random.default_rng(0))
    h1, h2 = host.sampling(MAX_CLS, SIZE)
    dev = DevicePairSampler(src_d, MAX_CLS, SIZE)
    d1, d2 = dev.sample(jax.random.PRNGKey(0))
    assert d1.shape == h1.shape and d2.shape == h2.shape
    assert dev.num_pairs == len(h1)
    assert d1.dtype == jnp.int32


def test_within_indices_are_valid_train_rows(domains):
    src_d, _ = domains
    dev = DevicePairSampler(src_d, MAX_CLS, SIZE)
    d1, d2 = dev.sample(jax.random.PRNGKey(1))
    train = np.asarray(src_d["train_mask"])
    for d in (np.asarray(d1), np.asarray(d2)):
        assert train[d].all(), "sampled a non-train row"


def test_within_pairs_are_class_balanced_cartesian(domains):
    """Each side must draw per_class ids from each selected class; the
    cartesian pair layout implies side-1 class pattern tiles and side-2
    repeats (pair_enumeration order)."""
    src_d, _ = domains
    y = np.asarray(src_d["y"])
    dev = DevicePairSampler(src_d, MAX_CLS, SIZE)
    d1, d2 = (np.asarray(a) for a in dev.sample(jax.random.PRNGKey(2)))
    n = int(np.sqrt(len(d1)))
    # side 1 tiles: first n entries repeat across the whole array
    assert (d1.reshape(n, n) == d1[:n]).all()
    # side 2 repeats: each of the n blocks is constant
    assert (d2.reshape(n, n) == d2.reshape(n, n)[:, :1]).all()
    # per-class draw counts are equal on each side
    per_class = dev.per_class
    counts1 = np.bincount(y[d1[:n]], minlength=y.max() + 1)
    assert sorted(counts1[counts1 > 0].tolist()) == [per_class] * dev.m


def test_cross_sides_come_from_their_domains(domains):
    src_d, tar_d = domains
    dev = DevicePairSamplerCross(src_d, tar_d, MAX_CLS, SIZE)
    c1, c2 = (np.asarray(a) for a in dev.sample(jax.random.PRNGKey(3)))
    assert (c1 < src_d["x"].shape[0]).all()
    assert (c2 < tar_d["x"].shape[0]).all()
    assert np.asarray(src_d["train_mask"])[c1].all()
    assert np.asarray(tar_d["train_mask"])[c2].all()
    host = PairEnumeratorCross(src_d, tar_d, "train",
                               np.random.default_rng(0))
    h1, _ = host.sampling(MAX_CLS, SIZE)
    assert c1.shape == h1.shape


def test_sampling_is_deterministic_in_key(domains):
    src_d, _ = domains
    dev = DevicePairSampler(src_d, MAX_CLS, SIZE)
    a1, a2 = dev.sample(jax.random.PRNGKey(7))
    b1, b2 = dev.sample(jax.random.PRNGKey(7))
    c1, _ = dev.sample(jax.random.PRNGKey(8))
    assert (np.asarray(a1) == np.asarray(b1)).all()
    assert (np.asarray(a2) == np.asarray(b2)).all()
    assert (np.asarray(a1) != np.asarray(c1)).any()


def test_epoch_targets_match_labels(domains):
    src_d, tar_d = domains
    samplers, labels = build_device_samplers(src_d, tar_d, MAX_CLS, SIZE)
    idxs, y_pairs = sample_epoch_on_device(
        samplers, labels, jax.random.PRNGKey(0)
    )
    y_src = np.asarray(src_d["y"])
    y_tar = np.asarray(tar_d["y"])
    np.testing.assert_array_equal(
        np.asarray(y_pairs["src"]),
        (y_src[np.asarray(idxs["src1"])]
         == y_src[np.asarray(idxs["src2"])]).astype(np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(y_pairs["cross"]),
        (y_src[np.asarray(idxs["cross1"])]
         == y_tar[np.asarray(idxs["cross2"])]).astype(np.float32),
    )


def test_class_subset_rotates_when_over_cap(domains):
    """With more nonempty classes than max_class_num, different keys must
    select different class subsets (reference picks a random subset per
    sampling call)."""
    src_d, _ = domains
    y = np.asarray(src_d["y"])
    dev = DevicePairSampler(src_d, 2, SIZE)
    assert dev.m == 2 < dev.num_nonempty
    seen = set()
    for s in range(8):
        d1, _ = dev.sample(jax.random.PRNGKey(s))
        n = dev.per_class * dev.m
        seen.add(tuple(sorted(set(y[np.asarray(d1)[:n]].tolist()))))
    assert len(seen) > 1


def test_stage1_device_sampling_end_to_end(domains):
    src_d, tar_d = domains
    cfg = Stage1Config(
        hidden_dim=16, num_epoch=8, start_eval_epoch=4, eval_per_epoch=4,
        sample_size=400, max_class_num=4, sim_mode="mlp", backbone="mlp",
        eval_sample_size=400, scan_epochs=4, device_sampling=True,
        repeat=1, seed=0,
    )
    res = train_adversarial(src_d, tar_d, cfg)
    assert res["best"]["epoch"] > 0
    # pair scores are probabilities → f1 tuple entries in [0, 1]
    for v in res["best"]["val"]:
        assert 0.0 <= v <= 1.0


def test_balanced_sampler_matches_host_shapes_and_composition(domains):
    from bridged_gnn_tpu.train.device_sampler import DeviceBalancedSampler

    src_d, _ = domains
    y = np.asarray(src_d["y"])
    nc = int(y.max()) + 1
    host = PairEnumerator(src_d, "val", np.random.default_rng(0))
    h1, h2 = host.balanced_sampling(nc, 2000)
    dev = DeviceBalancedSampler(src_d, nc, 2000, "val")
    d1, d2 = (np.asarray(a) for a in dev.sample(jax.random.PRNGKey(0)))
    assert d1.shape == h1.shape and d2.shape == h2.shape
    # same/diff pair composition is identical to the host sampler's
    same_host = (y[h1] == y[h2]).sum()
    same_dev = (y[d1] == y[d2]).sum()
    assert same_host == same_dev
    val = np.asarray(src_d["val_mask"])
    assert val[d1].all() and val[d2].all()


def test_balanced_cross_sampler_domains(domains):
    from bridged_gnn_tpu.train.device_sampler import DeviceBalancedSampler

    src_d, tar_d = domains
    nc = int(np.asarray(src_d["y"]).max()) + 1
    dev = DeviceBalancedSampler(src_d, nc, 2000, "test", data2=tar_d)
    d1, d2 = (np.asarray(a) for a in dev.sample(jax.random.PRNGKey(1)))
    assert np.asarray(src_d["test_mask"])[d1].all()
    assert np.asarray(tar_d["test_mask"])[d2].all()


def test_device_evaluator_matches_host_evaluator(domains):
    """Same trained variables, device vs host eval: different pair
    streams but the same estimand — scores must agree to sampling noise
    on an easy synthetic problem, and both must be well-formed."""
    from bridged_gnn_tpu.graph import graph_from_dict
    from bridged_gnn_tpu.train.stage1 import (
        DeviceStage1Evaluator,
        Stage1Evaluator,
        build_model,
    )

    src_d, tar_d = domains
    cfg = Stage1Config(
        hidden_dim=16, num_epoch=6, start_eval_epoch=3, eval_per_epoch=3,
        sample_size=400, max_class_num=4, sim_mode="mlp", backbone="mlp",
        eval_sample_size=2000, scan_epochs=3, device_sampling=True,
        repeat=1, seed=0,
    )
    res = train_adversarial(src_d, tar_d, cfg)
    variables = res["variables"]
    model = build_model(cfg, src_d, tar_d)
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    dev = DeviceStage1Evaluator(
        model, g_src, None, g_tar, None, src_d, tar_d, cfg
    )
    host = Stage1Evaluator(
        model, None, g_src, None, g_tar, None, src_d, tar_d, cfg,
        np.random.default_rng(0),
    )
    d = dev(variables, "val", epoch=6)
    h = host(variables, "val", epoch=6)
    assert len(d) == len(h) == 5
    for dv, hv in zip(d, h):
        assert 0.0 <= dv <= 1.0
        assert abs(dv - hv) < 0.15, (d, h)


def test_device_evaluator_counts_reproduce_sklearn_binary_f1():
    """The count → binary-F1 path must be sklearn-exact for a fixed
    prediction vector."""
    from sklearn.metrics import f1_score

    from bridged_gnn_tpu.train.metrics import score_from_counts

    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 500)
    pred = rng.integers(0, 2, 500)
    oh_t = np.eye(2, dtype=np.int64)[y]
    oh_p = np.eye(2, dtype=np.int64)[pred]
    got = score_from_counts(
        (oh_t * oh_p).sum(0), oh_p.sum(0), oh_t.sum(0),
        metric="f1", f1_average="binary",
    )
    assert abs(got - f1_score(y, pred, average="binary")) < 1e-12


def test_dp_device_sampling_matches_unsharded(domains):
    """Device-sampled DP: with a 'pairs' sharding constraint on the
    sampled arrays, the jitted sample+step program must compute the
    same loss as the unsharded program (pairs are a pure function of
    the key), while GSPMD partitions the pair scoring."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from bridged_gnn_tpu.graph import graph_from_dict
    from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2
    from bridged_gnn_tpu.parallel import make_mesh
    from bridged_gnn_tpu.train.stage1 import build_model, make_train_steps

    src_d, tar_d = domains
    cfg = Stage1Config(hidden_dim=16, max_class_num=4, sample_size=6400,
                       sim_mode="mlp", backbone="mlp")
    g_src, g_tar = graph_from_dict(src_d), graph_from_dict(tar_d)
    model = build_model(cfg, src_d, tar_d)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        g_src.x, None, g_tar.x, None,
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        mask_src=g_src.node_mask, mask_tar=g_tar.node_mask,
        method=AdversarialLearnerV2.init_all,
    )
    params, bs = variables["params"], variables["batch_stats"]
    samplers, labels = build_device_samplers(src_d, tar_d, 4, 6400)
    sim_step, _, tx_st, _, _ = make_train_steps(
        model, g_src, None, g_tar, None, cfg.use_clf
    )
    opt = tx_st.init(params)
    key = jax.random.PRNGKey(5)
    drop = jax.random.PRNGKey(3)

    def run(pair_sharding):
        idxs, y_pairs = sample_epoch_on_device(
            samplers, labels, key, pair_sharding=pair_sharding
        )
        return sim_step(params, bs, opt, drop, idxs, y_pairs)

    _, _, _, loss_ref, _ = jax.jit(lambda: run(None))()
    mesh = make_mesh(8, ("pairs",))
    sharding = NamedSharding(mesh, P("pairs"))
    _, _, _, loss_dp, _ = jax.jit(lambda: run(sharding))()
    np.testing.assert_allclose(float(loss_ref), float(loss_dp), rtol=1e-5)


def test_device_and_host_sampling_converge_alike(domains):
    """Distribution equivalence in effect: the same config trained with
    host-numpy vs device sampling must reach comparable cross-domain
    val pair F1 on the easy synthetic problem (streams differ, the
    estimator does not)."""
    src_d, tar_d = domains
    base = dict(
        hidden_dim=16, num_epoch=30, start_eval_epoch=10, eval_per_epoch=10,
        sample_size=1600, max_class_num=4, sim_mode="mlp", backbone="mlp",
        eval_sample_size=2000, scan_epochs=10, repeat=1, seed=0,
    )
    res_host = train_adversarial(
        src_d, tar_d, Stage1Config(**base, device_sampling=False)
    )
    res_dev = train_adversarial(
        src_d, tar_d, Stage1Config(**base, device_sampling=True)
    )
    f1_host = res_host["best"]["val"][2]
    f1_dev = res_dev["best"]["val"][2]
    # the device stream must train at least as well (generous margin for
    # stream-level noise at this tiny scale)
    assert f1_dev > 0.6, (f1_host, f1_dev)
    assert f1_dev > f1_host - 0.15, (f1_host, f1_dev)


def test_device_sampling_requires_scan_mode(domains):
    src_d, tar_d = domains
    cfg = Stage1Config(num_epoch=2, device_sampling=True, scan_epochs=0)
    with pytest.raises(ValueError, match="scan_epochs"):
        train_adversarial(src_d, tar_d, cfg)


def test_device_evaluator_both_matches_per_split(domains):
    """The fused both-splits eval (one dispatch, shared domain encodes;
    VERDICT r3 item 4) must reproduce the per-split calls bit-exactly —
    identical sampling keys, identical scores."""
    from bridged_gnn_tpu.graph import graph_from_dict
    from bridged_gnn_tpu.train.stage1 import (
        DeviceStage1Evaluator,
        build_model,
    )

    src_d, tar_d = domains
    cfg = Stage1Config(
        hidden_dim=16, num_epoch=3, start_eval_epoch=999,
        sample_size=400, max_class_num=4, sim_mode="mlp", backbone="mlp",
        eval_sample_size=2000, scan_epochs=3, device_sampling=True,
        repeat=1, seed=0,
    )
    res = train_adversarial(src_d, tar_d, cfg)
    variables = res["variables"]
    model = build_model(cfg, src_d, tar_d)
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    dev = DeviceStage1Evaluator(
        model, g_src, None, g_tar, None, src_d, tar_d, cfg
    )
    val_b, test_b = dev.both(variables, epoch=7)
    val_s = dev(variables, "val", epoch=7)
    test_s = dev(variables, "test", epoch=7)
    assert val_b == val_s
    assert test_b == test_s
