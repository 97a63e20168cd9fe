"""Pair sampler semantics vs the reference's documented behavior."""

import numpy as np
import pytest

from bridged_gnn_tpu.train.samplers import (
    PairEnumerator,
    PairEnumeratorCross,
    enumerate_all_pairs,
)


def _data(rng, n=200, c=4):
    y = rng.integers(0, c, size=n)
    return dict(
        y=y,
        train_mask=np.ones(n, dtype=bool),
        val_mask=np.zeros(n, dtype=bool),
        test_mask=np.zeros(n, dtype=bool),
    )


def test_sampling_shapes_and_membership(rng):
    d = _data(rng)
    enu = PairEnumerator(d, "train", rng)
    i1, i2 = enu.sampling(max_class_num=2, sample_size=10000)
    # reference: per_class = sqrt(10000)/2 = 50 per class per side →
    # (50·2)² = 10000 cartesian pairs (models.py:494-501)
    assert len(i1) == len(i2) == 10000
    assert set(np.unique(d["y"][i1])) <= set(range(4))


def test_sampling_cartesian_structure(rng):
    d = _data(rng)
    enu = PairEnumerator(d, "train", rng)
    i1, i2 = enu.sampling(max_class_num=2, sample_size=100)
    # p1 tiles, p2 repeats (pair_enumeration order, models.py:265-282)
    k = int(np.sqrt(len(i1)))
    assert np.array_equal(i1[:k], i1[k:2 * k])
    assert (i2[:k] == i2[0]).all()


def test_balanced_sampling_half_same_class(rng):
    d = _data(rng)
    enu = PairEnumerator(d, "train", rng)
    i1, i2 = enu.balanced_sampling(max_class_num=4, sample_size=8000)
    same = (d["y"][i1] == d["y"][i2]).mean()
    # 50% same-class / 50% different-class by construction
    # (models.py:456-471); class buckets make same-pairs exactly same-class
    assert 0.45 < same < 0.56


def test_cross_sampler_draws_from_correct_domains(rng):
    src = _data(rng, n=150)
    tar = _data(rng, n=100)
    enu = PairEnumeratorCross(src, tar, "train", rng)
    i1, i2 = enu.sampling(max_class_num=3, sample_size=900)
    assert i1.max() < 150 and i2.max() < 100


def test_split_restriction(rng):
    d = _data(rng)
    d["train_mask"][:] = False
    d["train_mask"][:50] = True
    enu = PairEnumerator(d, "train", rng)
    i1, i2 = enu.sampling(max_class_num=2, sample_size=400)
    assert i1.max() < 50 and i2.max() < 50


def test_enumerate_all_pairs_order():
    p1, p2 = enumerate_all_pairs(np.array([1, 2, 3]), np.array([7, 8]))
    assert list(p1) == [1, 2, 3, 1, 2, 3]
    assert list(p2) == [7, 7, 7, 8, 8, 8]


def test_empty_split_raises(rng):
    d = _data(rng)
    enu = PairEnumerator(d, "val", rng)  # empty val split
    with pytest.raises(ValueError):
        enu.sampling(2, 100)
