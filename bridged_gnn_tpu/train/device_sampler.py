"""Device-resident class-balanced pair sampling for stage-1 training.

TPU-native redesign of the reference pair enumerators
(models/models.py:265-512, mirrored host-side in train/samplers.py):
instead of sampling pair indices with host numpy and shipping
``O(sample_size)`` index stacks to the device every epoch, the class
buckets are uploaded once as a padded ``[num_classes, max_bucket]``
matrix and each epoch's pairs are drawn *inside* the jitted train step
from a ``jax.random`` key.  In scan mode this makes the whole training
segment device-resident: zero host→device traffic per epoch and no
host-RNG synchronization point.

Semantics mirror ``PairEnumerator.sampling`` (reference
models.py:484-512): pick ``min(#nonempty, max_class_num)`` classes
(uniform subset without replacement when over the cap), draw
``int(sqrt(sample_size) / max_class_num)`` node ids per class per side
uniformly *with replacement*, and emit the full cartesian product in
``pair_enumeration`` order (tile × repeat, models.py:265-282).  The
random stream is jax.random rather than numpy — pair *distributions*
match, streams do not (documented production knob, not a parity mode).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bridged_gnn_tpu.train.samplers import _class_buckets, _split_mask


def _bucket_matrix(buckets: Dict[int, np.ndarray], keep: np.ndarray):
    """Pad per-class index lists to a [len(keep), max_bucket] int32 matrix."""
    max_bucket = max(int(len(buckets[c])) for c in keep)
    ids = np.zeros((len(keep), max_bucket), dtype=np.int32)
    sizes = np.zeros(len(keep), dtype=np.int32)
    for row, c in enumerate(keep):
        b = buckets[c]
        ids[row, : len(b)] = b
        sizes[row] = len(b)
    return jnp.asarray(ids), jnp.asarray(sizes)


def _draw(key: jax.Array, ids: jax.Array, sizes: jax.Array,
          rows: jax.Array, per_class: int) -> jax.Array:
    """Uniform-with-replacement draw of ``per_class`` ids from each of the
    selected bucket rows; returns the concatenation, shape
    [len(rows) * per_class]."""
    sel_ids = ids[rows]                       # [m, max_bucket]
    sel_sizes = sizes[rows].astype(jnp.float32)  # [m]
    u = jax.random.uniform(key, (rows.shape[0], per_class))
    r = jnp.minimum(
        (u * sel_sizes[:, None]).astype(jnp.int32),
        sizes[rows][:, None] - 1,
    )
    return jnp.take_along_axis(sel_ids, r, axis=1).reshape(-1)


def _cartesian(idx1: jax.Array, idx2: jax.Array):
    """pair_enumeration order (models.py:265-282): idx1 tiled, idx2 repeated."""
    n = idx1.shape[0]
    return jnp.tile(idx1, n), jnp.repeat(idx2, n)


def _build_buckets(data, data2, mode: str):
    """Per-class bucket dicts for one domain — or, with ``data2``, for a
    cross-domain pair where the usable classes are those nonempty in
    *both* domains (reference models.py:284-375). Returns
    ``(buckets1, buckets2, nonempty)`` with ``buckets2 is buckets1`` in
    the within-domain case."""
    y = np.asarray(data["y"])
    num_classes = int(y.max()) + 1
    b1 = _class_buckets(y, _split_mask(data, mode), num_classes)
    if data2 is not None:
        y2 = np.asarray(data2["y"])
        b2 = _class_buckets(y2, _split_mask(data2, mode), num_classes)
        nonempty = np.array([
            c for c in range(num_classes) if len(b1[c]) and len(b2[c])
        ])
        if len(nonempty) == 0:
            raise ValueError("no class has samples in both domains")
    else:
        b2 = b1
        nonempty = np.array(
            [c for c in range(num_classes) if len(b1[c])]
        )
        if len(nonempty) == 0:
            raise ValueError("no class has samples in this split")
    return b1, b2, nonempty


class DevicePairSampler:
    """Device sampler mirroring ``PairEnumerator.sampling`` (reference
    models.py:484-512). Side 1 draws from ``data``'s buckets; with
    ``data2`` given, side 2 draws from ``data2``'s buckets instead (the
    ``PairEnumeratorCross`` variant, models.py:284-375).

    ``sample(key)`` returns ``(pair1, pair2)`` int32 arrays of static
    length ``(per_class * m)**2`` where
    ``per_class = int(sqrt(sample_size) / max_class_num)`` and
    ``m = min(#nonempty classes, max_class_num)`` — identical shapes to
    the host sampler's output for the same config.
    """

    def __init__(self, data: Dict[str, np.ndarray],
                 max_class_num: int, sample_size: int,
                 mode: str = "train",
                 data2: Optional[Dict[str, np.ndarray]] = None):
        b1, b2, nonempty = _build_buckets(data, data2, mode)
        self.num_nonempty = len(nonempty)
        self.m = min(self.num_nonempty, max_class_num)
        self.per_class = int(np.sqrt(sample_size) / max_class_num)
        if self.per_class < 1:
            raise ValueError(
                f"sample_size {sample_size} too small for "
                f"max_class_num {max_class_num}"
            )
        self.ids1, self.sizes1 = _bucket_matrix(b1, nonempty)
        self.ids2, self.sizes2 = (
            (self.ids1, self.sizes1) if data2 is None
            else _bucket_matrix(b2, nonempty)
        )

    @property
    def num_pairs(self) -> int:
        return (self.per_class * self.m) ** 2

    def _rows(self, key: jax.Array) -> jax.Array:
        if self.num_nonempty <= self.m:
            return jnp.arange(self.m, dtype=jnp.int32)
        # uniform subset without replacement (reference rng.choice(...,
        # replace=False), models.py:489): permute and take the first m
        return jax.random.permutation(key, self.num_nonempty)[: self.m]

    def sample(self, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        k_cls, k1, k2 = jax.random.split(key, 3)
        rows = self._rows(k_cls)
        idx1 = _draw(k1, self.ids1, self.sizes1, rows, self.per_class)
        idx2 = _draw(k2, self.ids2, self.sizes2, rows, self.per_class)
        return _cartesian(idx1, idx2)


def DevicePairSamplerCross(data_src, data_tar, max_class_num, sample_size,
                           mode: str = "train") -> DevicePairSampler:
    """Cross-domain convenience constructor: side 1 from source buckets,
    side 2 from target buckets."""
    return DevicePairSampler(
        data_src, max_class_num, sample_size, mode, data2=data_tar
    )


class DeviceBalancedSampler:
    """Device mirror of ``PairEnumerator.balanced_sampling`` (reference
    models.py:448-483): for every ordered pair of selected classes
    ``(c1, c2)`` draw ``same`` pairs when ``c1 == c2`` else ``diff``
    pairs, with ``same = int(0.5·sample_size / max_class_num)`` and
    ``diff = int(0.5·sample_size / (max_class_num·(max_class_num−1)))``
    — both computed from the *argument* ``max_class_num``, as the host
    sampler does, so empty classes shrink the total pair count
    identically. Used by the device-resident stage-1 evaluator.

    ``data2``: optional second domain for the cross variant (side 1
    drawn from ``data``'s buckets, side 2 from ``data2``'s; classes
    restricted to those nonempty in both)."""

    def __init__(self, data: Dict[str, np.ndarray],
                 max_class_num: int, sample_size: int,
                 mode: str = "train",
                 data2: Optional[Dict[str, np.ndarray]] = None):
        b1, b2, nonempty = _build_buckets(data, data2, mode)
        self.num_nonempty = len(nonempty)
        self.m = min(self.num_nonempty, max_class_num)
        same = int(0.5 * sample_size / max_class_num)
        diff = (
            int(0.5 * sample_size / (max_class_num * (max_class_num - 1)))
            if max_class_num > 1 else 0
        )
        self.ids1, self.sizes1 = _bucket_matrix(b1, nonempty)
        self.ids2, self.sizes2 = _bucket_matrix(b2, nonempty)
        # static slot-row pattern of the (c1, c2) blocks: slot indices in
        # 0..m-1, mapped through the (possibly random) class-row selection
        # at sample time
        r1, r2 = [], []
        for i in range(self.m):
            for j in range(self.m):
                n = same if i == j else diff
                if n == 0:
                    continue
                r1.append(np.full(n, i, dtype=np.int32))
                r2.append(np.full(n, j, dtype=np.int32))
        if not r1:
            raise ValueError(
                f"sample_size {sample_size} too small for "
                f"max_class_num {max_class_num}"
            )
        self._slots1 = jnp.asarray(np.concatenate(r1))
        self._slots2 = jnp.asarray(np.concatenate(r2))

    @property
    def num_pairs(self) -> int:
        return int(self._slots1.shape[0])

    def _rows(self, key: jax.Array) -> jax.Array:
        if self.num_nonempty <= self.m:
            return jnp.arange(self.m, dtype=jnp.int32)
        return jax.random.permutation(key, self.num_nonempty)[: self.m]

    def sample(self, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        k_cls, k1, k2 = jax.random.split(key, 3)
        rows = self._rows(k_cls)

        def draw(k, ids, sizes, slot_rows):
            r = rows[slot_rows]                       # [P] bucket rows
            u = jax.random.uniform(k, slot_rows.shape)
            col = jnp.minimum(
                (u * sizes[r].astype(jnp.float32)).astype(jnp.int32),
                sizes[r] - 1,
            )
            return ids[r, col]

        return (
            draw(k1, self.ids1, self.sizes1, self._slots1),
            draw(k2, self.ids2, self.sizes2, self._slots2),
        )


def build_device_samplers(src_d: Dict[str, np.ndarray],
                          tar_d: Dict[str, np.ndarray],
                          max_class_num: int, sample_size: int):
    """The three train-split samplers used by the stage-1 step, plus the
    device-resident label arrays needed to compute pair targets on device."""
    samplers = dict(
        src=DevicePairSampler(src_d, max_class_num, sample_size),
        tar=DevicePairSampler(tar_d, max_class_num, sample_size),
        cross=DevicePairSamplerCross(
            src_d, tar_d, max_class_num, sample_size
        ),
    )
    labels = dict(
        src=jnp.asarray(np.asarray(src_d["y"]), dtype=jnp.int32),
        tar=jnp.asarray(np.asarray(tar_d["y"]), dtype=jnp.int32),
    )
    return samplers, labels


def sample_epoch_on_device(samplers: Dict, labels: Dict, key: jax.Array,
                           pair_sharding=None):
    """One epoch's pair indices + binary targets, entirely on device.

    Returns ``(idxs, y_pairs)`` with the same dict layout the host
    ``sample_epoch`` produces (train/stage1.py), so the jitted step
    functions are shared between the host- and device-sampling paths.

    ``pair_sharding``: optional sharding (e.g.
    ``NamedSharding(mesh, P('pairs'))``) constrained onto every sampled
    pair array — under a mesh, GSPMD then partitions the downstream
    pair scoring data-parallel (SURVEY §2c item 2) while the sampling
    itself stays on device. Pairs are a pure function of ``key``, so the
    sharded and unsharded programs compute identical batches.
    """
    k_s, k_t, k_c = jax.random.split(key, 3)
    s1, s2 = samplers["src"].sample(k_s)
    t1, t2 = samplers["tar"].sample(k_t)
    c1, c2 = samplers["cross"].sample(k_c)
    idxs = dict(src1=s1, src2=s2, tar1=t1, tar2=t2, cross1=c1, cross2=c2)
    if pair_sharding is not None:
        idxs = {
            k: jax.lax.with_sharding_constraint(v, pair_sharding)
            for k, v in idxs.items()
        }
        s1, s2, t1, t2, c1, c2 = (
            idxs["src1"], idxs["src2"], idxs["tar1"], idxs["tar2"],
            idxs["cross1"], idxs["cross2"],
        )
    y = dict(
        src=(labels["src"][s1] == labels["src"][s2]).astype(jnp.float32),
        tar=(labels["tar"][t1] == labels["tar"][t2]).astype(jnp.float32),
        cross=(labels["src"][c1] == labels["tar"][c2]).astype(jnp.float32),
    )
    return idxs, y
